"""Worker process for the 2-process jax.distributed CPU test.

Run as: python tests/distributed_worker.py <pid> <nproc> <coordinator> <out>

Each worker exposes 4 virtual CPU devices, joins the coordination service,
builds the GLOBAL 8-device data mesh, feeds its process-local half of a
deterministic global batch through shard_host_local_batch, runs ONE sharded
GAN train step, and dumps the post-step params/batch_stats/metrics to <out>.
The parent test asserts both workers agree and match the single-process
8-device run on the same global batch.
"""

import os
import pickle
import sys


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    coordinator, out_path = sys.argv[3], sys.argv[4]

    # Must precede any backend initialization (the container's sitecustomize
    # pre-imports jax but the backend only initializes on first use).
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")

    from monkeynet_tpu.parallel.distributed import (
        maybe_initialize_distributed,
        shard_host_local_batch,
    )

    assert maybe_initialize_distributed(
        coordinator_address=coordinator, num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()

    import numpy as np
    import optax

    from monkeynet_tpu.parallel.mesh import make_mesh, make_sharded_train_step
    from monkeynet_tpu.tasks.build import init_models
    from monkeynet_tpu.tasks.train import create_train_state

    from tests.test_train import TINY_CONFIG

    models, params, stats = init_models(
        TINY_CONFIG, jax.random.PRNGKey(0), (16, 16, 3), axis_name="data"
    )
    optimizer = optax.sgd(1.0)  # post-step delta == gradient (see test_train)
    state = create_train_state(params, stats, optimizer)

    mesh = make_mesh(4 * nproc)  # global mesh spanning both processes
    step = make_sharded_train_step(
        models, TINY_CONFIG["train_params"], optimizer, mesh=mesh
    )

    # The same global batch as tests.test_train._batch(B=8); this process
    # contributes rows [pid*4, (pid+1)*4).
    rng = np.random.RandomState(0)
    source = rng.rand(8, 1, 16, 16, 3).astype(np.float32)
    video = rng.rand(8, 1, 16, 16, 3).astype(np.float32)
    lo, hi = pid * 4, (pid + 1) * 4
    x = shard_host_local_batch(
        {"source": source[lo:hi], "video": video[lo:hi]}, mesh
    )

    state, out = step(state, x)
    result = {
        "params": jax.tree.map(np.asarray, state.params),
        "batch_stats": jax.tree.map(np.asarray, state.batch_stats),
        "metrics": np.asarray(out["metrics"]),
    }
    with open(out_path, "wb") as f:
        pickle.dump(result, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
