"""Multi-host (multi-process) runtime posture.

The reference is strictly single-process (SURVEY §2: no torch.distributed
anywhere); this framework's parity surface is the single-slice data mesh in
mesh.py. Multi-host is nevertheless a first-class, documented path:

- **Single slice, many hosts** (e.g. v5e-256): `jax.distributed.initialize`
  joins the processes; `jax.devices()` then returns the GLOBAL device list, so
  `make_mesh(n)` builds a mesh spanning hosts and the same
  jit(shard_map(train_step)) program runs unchanged — gradient pmean and BN
  psum ride ICI exactly as on one host. Each process feeds its local batch
  shard via `shard_host_local_batch`.
- **Multi-slice (DCN)**: only the pmean/psum reductions cross slices — the
  model is replicated and activations never leave a chip — so the data axis
  is the ONLY axis that would map onto DCN, and it is bandwidth-light
  (one grads-sized all-reduce per step). A 2-D ("dcn", "ici") mesh with the
  batch split hierarchically is the natural extension; it is intentionally
  NOT built here because no reference capability needs it (SURVEY §5: "DCN
  enters only if multi-slice is added").

This module is exercised for real only on multi-host deployments; in this
repo's single-process environments initialize() is a no-op unless configured,
and everything else degrades to the single-process behavior.
"""

from __future__ import annotations

import os

import numpy as np


def maybe_initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Join the JAX multi-host runtime when configured; returns True if so.

    Configuration comes from explicit args or the standard JAX env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID); on cloud
    TPU pods `jax.distributed.initialize()` also auto-detects from metadata.
    Single-process runs (no config present) return False and touch nothing.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return False

    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def shard_host_local_batch(local_batch, mesh, batch_axis: int = 0):
    """Assemble a global batch-sharded jax.Array from per-process host data.

    Single-process: plain device_put with the data sharding. Multi-process:
    each host contributes its local shard of the global batch
    (jax.make_array_from_process_local_data), so no host ever materializes
    the full global batch. `batch_axis` selects which axis is the sharded
    batch axis (1 for scan-of-k stacked feeds of shape (k, B, ...)).
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(*([None] * batch_axis), "data")
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), local_batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        local_batch,
    )
