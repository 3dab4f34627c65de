"""Frame-sharded multi-chip inference == single-device output."""

import numpy as np

import jax
import jax.numpy as jnp

from monkeynet_tpu.parallel.mesh import make_frame_sharded_animator, make_mesh
from monkeynet_tpu.tasks.build import init_models

from .test_train import TINY_CONFIG


import pytest


@pytest.mark.parametrize("D", [16, 5])  # divisible and ragged frame counts
def test_frame_sharded_generator_matches_single_device(D):
    models, params, bs = init_models(TINY_CONFIG, jax.random.PRNGKey(0), (16, 16, 3))
    gen_vars = {"params": params["generator"], "batch_stats": bs["generator"]}
    gen = models["generator"]

    rng = np.random.RandomState(0)
    source = jnp.asarray(rng.rand(1, 1, 16, 16, 3).astype(np.float32))
    kp_d = {
        "mean": jnp.asarray((rng.rand(1, D, 3, 2) * 2 - 1).astype(np.float32) * 0.7),
    }
    a = rng.randn(1, D, 3, 2, 2).astype(np.float32) * 0.05
    kp_d["var"] = jnp.asarray(
        np.matmul(a.transpose(0, 1, 2, 4, 3), a) + 0.02 * np.eye(2, dtype=np.float32)
    )
    kp_s = {k: v[:, :1] for k, v in kp_d.items()}

    ref = gen.apply(gen_vars, source, kp_d, kp_s, train=False)

    mesh = make_mesh(8)
    animate = make_frame_sharded_animator(gen, gen_vars, mesh)
    out = animate(source, kp_d, kp_s)

    assert out["video_prediction"].shape[1] == D
    np.testing.assert_allclose(
        np.asarray(out["video_prediction"]),
        np.asarray(ref["video_prediction"]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["video_deformed"]),
        np.asarray(ref["video_deformed"]),
        atol=1e-5,
    )


def test_distributed_helpers_single_process():
    """maybe_initialize_distributed is a no-op without config;
    shard_host_local_batch places a batch sharded over the mesh."""
    from monkeynet_tpu.parallel.distributed import (
        maybe_initialize_distributed,
        shard_host_local_batch,
    )

    assert maybe_initialize_distributed() is False

    mesh = make_mesh(8)
    batch = {"x": np.arange(16, dtype=np.float32).reshape(16, 1)}
    placed = shard_host_local_batch(batch, mesh)
    assert placed["x"].sharding.spec == jax.sharding.PartitionSpec("data")
    np.testing.assert_array_equal(np.asarray(placed["x"]), batch["x"])
