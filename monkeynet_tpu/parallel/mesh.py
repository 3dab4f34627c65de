"""Data-parallel training over a 1-D device mesh.

This is the TPU-native replacement for the reference's parallel runtime
(sync_batchnorm/replicate.py DataParallelWithCallback + thread-rendezvous
sync-BN): the batch is sharded over the 'data' mesh axis, parameters and
optimizer states are replicated, gradients are `lax.pmean`'d and BN statistics
`lax.psum`'d over ICI inside the single compiled train step. XLA schedules
the collectives; there is no replicate/scatter/gather per call and no master
device.

The same program runs on a virtual 8-device CPU mesh for tests
(xla_force_host_platform_device_count) and on a real TPU slice unchanged.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from monkeynet_tpu.tasks.train import make_train_step


def make_mesh(num_devices: int | None = None, devices=None) -> Mesh:
    """1-D data mesh over the first `num_devices` devices.

    Raises when fewer devices exist than requested — silently truncating
    would let an N-way run "succeed" while validating a smaller mesh.
    """
    devices = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        if len(devices) < num_devices:
            raise ValueError(
                f"requested a {num_devices}-device mesh but only "
                f"{len(devices)} JAX device(s) are available; for a virtual "
                f"mesh set JAX_PLATFORMS=cpu and XLA_FLAGS="
                f"--xla_force_host_platform_device_count={num_devices}"
            )
        devices = devices[:num_devices]
    return Mesh(np.array(devices), ("data",))


def shard_batch(batch, mesh: Mesh):
    """Place a host batch with its leading axis sharded over the data axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def make_frame_sharded_animator(generator, variables, mesh: Mesh):
    """Multi-chip batch-of-frames inference: every frame is independent given
    its keypoints, so the frame axis shards cleanly over the mesh (SURVEY §5's
    'sequence' dimension). Params replicate ONCE at construction; GSPMD
    partitions the generator. Ragged frame counts are padded to a mesh
    multiple inside the engine and trimmed after.

    Returns fn(source, kp_driving, kp_source) -> generator outputs with the
    frame axis sharded over 'data'.
    """
    from monkeynet_tpu.tasks.animate import Animator

    return Animator(generator, variables, mesh=mesh).device_call


def make_sharded_train_step(models, train_params, optimizer, num_devices=None,
                            mesh: Mesh | None = None):
    """jit(shard_map(train_step)) over a 1-D data mesh.

    Returns fn(state, batch) -> (state, out); state replicated, batch sharded
    on the leading (batch) axis. Per-sample outputs stay sharded; metrics are
    pmean'd and come back replicated.
    """
    if mesh is None:
        mesh = make_mesh(num_devices)
    step = make_train_step(models, train_params, optimizer, axis_name="data")

    out_specs = (
        P(),  # state: replicated (grads pmean'd, BN stats psum'd)
        {
            "metrics": P(),
            "video_prediction": P("data"),
            "video_deformed": P("data"),
            "kp_joined": P("data"),
        },
    )
    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P("data")),
        out_specs=out_specs,
    )
    return jax.jit(sharded, donate_argnums=0)


def make_sharded_multi_train_step(models, train_params, optimizer,
                                  num_devices=None, mesh: Mesh | None = None,
                                  augment=None):
    """jit(shard_map(scan-of-k train steps)) over a 1-D data mesh.

    Same sharding contract as make_sharded_train_step, but the batch leaves
    are stacked (k, B, ...) with the BATCH axis (axis 1) sharded over 'data';
    the k per-step batches run back-to-back on-device in one program (see
    tasks/train.make_multi_train_step for why).

    With `augment` set (device-feed mode), the input is {'videos': the
    replicated HBM-resident dataset, 'plans': (k, B, ...) plan arrays with
    the batch axis sharded} and the out dict additionally carries the
    sharded per-step augmented 'source'/'video'.
    """
    from monkeynet_tpu.tasks.train import make_multi_train_step

    if mesh is None:
        mesh = make_mesh(num_devices)
    multi = make_multi_train_step(models, train_params, optimizer,
                                  axis_name="data", augment=augment)
    vis_out = {
        "metrics": P(),
        "video_prediction": P(None, "data"),
        "video_deformed": P(None, "data"),
        "kp_joined": P(None, "data"),
    }
    if augment is None:
        in_specs = (P(), P(None, "data"))
    else:
        in_specs = (P(), {"videos": P(), "plans": P(None, "data")})
        vis_out = {**vis_out, "source": P(None, "data"),
                   "video": P(None, "data")}
    sharded = jax.shard_map(
        multi,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(), vis_out),
    )
    return jax.jit(sharded, donate_argnums=0)
