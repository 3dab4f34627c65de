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
    devices = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), ("data",))


def shard_batch(batch, mesh: Mesh):
    """Place a host batch with its leading axis sharded over the data axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def make_frame_sharded_animator(generator, variables, mesh: Mesh):
    """Multi-chip batch-of-frames inference: every frame is independent given
    its keypoints, so the frame axis shards cleanly over the mesh (SURVEY §5's
    'sequence' dimension). Params replicate; GSPMD partitions the generator.

    Returns fn(source, kp_driving, kp_source) -> generator outputs with the
    frame axis sharded over 'data'.
    """
    import jax.numpy as jnp

    replicated = NamedSharding(mesh, P())
    frame_sharded = NamedSharding(mesh, P(None, "data"))

    @jax.jit
    def run(variables, source, kp_driving, kp_source):
        return generator.apply(variables, source, kp_driving, kp_source,
                               train=False)

    def animate(source, kp_driving, kp_source):
        variables_r = jax.device_put(variables, replicated)
        source = jax.device_put(jnp.asarray(source), replicated)
        kp_driving = jax.tree.map(
            lambda v: jax.device_put(jnp.asarray(v), frame_sharded), kp_driving
        )
        kp_source = jax.tree.map(
            lambda v: jax.device_put(jnp.asarray(v), replicated), kp_source
        )
        return run(variables_r, source, kp_driving, kp_source)

    return animate


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
