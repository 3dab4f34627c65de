"""SyncBatchNorm invariants.

The load-bearing property (reference: sync_batchnorm/batchnorm.py:113-125):
training-mode statistics over a batch sharded across N devices, reduced with
psum, must equal single-device full-batch statistics — output AND running
stats. Plus torch train-mode parity on one device.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from monkeynet_tpu.models.blocks import SyncBatchNorm

from .reference_shim import load_reference

REF = load_reference()
needs_ref = pytest.mark.skipif(REF is None, reason="torch reference unavailable")

FEATURES = 6


def _data(B=16):
    rng = np.random.RandomState(0)
    return (rng.randn(B, 2, 4, 4, FEATURES) * 2 + 1).astype(np.float32)


def test_sharded_bn_equals_full_batch():
    x = _data()
    devices = jax.devices()
    n = len(devices)
    assert n == 8

    # Single-device reference: full batch, no axis_name.
    bn = SyncBatchNorm(FEATURES)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), True)
    full_out, full_state = bn.apply(
        variables, jnp.asarray(x), True, mutable=["batch_stats"]
    )

    # Sharded: batch split over the data axis, stats psum'd.
    bn_sync = SyncBatchNorm(FEATURES, axis_name="data")
    mesh = Mesh(np.array(devices), ("data",))

    def step(params, batch_stats, xs):
        out, new_state = bn_sync.apply(
            {"params": params, "batch_stats": batch_stats},
            xs,
            True,
            mutable=["batch_stats"],
        )
        return out, new_state["batch_stats"]

    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(), P("data")),
        out_specs=(P("data"), P()),
    )
    out, stats = jax.jit(sharded)(
        variables["params"], variables["batch_stats"], jnp.asarray(x)
    )

    np.testing.assert_allclose(np.asarray(out), np.asarray(full_out), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(stats["mean"]),
        np.asarray(full_state["batch_stats"]["mean"]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(stats["var"]),
        np.asarray(full_state["batch_stats"]["var"]),
        atol=1e-5,
    )


@needs_ref
def test_train_mode_matches_torch():
    import torch

    x = _data(B=4)
    bn_t = torch.nn.BatchNorm3d(FEATURES)
    bn_t.train()
    with torch.no_grad():
        # torch layout (B, C, D, H, W)
        ref = bn_t(torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))).numpy()

    bn = SyncBatchNorm(FEATURES)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), True)
    out, state = bn.apply(variables, jnp.asarray(x), True, mutable=["batch_stats"])

    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 4, 1, 2, 3)), ref, atol=1e-5
    )
    # Running stats: unbiased variance, momentum 0.1.
    np.testing.assert_allclose(
        np.asarray(state["batch_stats"]["mean"]),
        bn_t.running_mean.numpy(),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(state["batch_stats"]["var"]),
        bn_t.running_var.numpy(),
        atol=1e-4,
    )


@needs_ref
def test_eval_mode_matches_torch():
    import torch

    x = _data(B=4)
    bn_t = torch.nn.BatchNorm3d(FEATURES)
    with torch.no_grad():
        bn_t.running_mean.copy_(torch.arange(FEATURES).float() * 0.1)
        bn_t.running_var.copy_(torch.arange(FEATURES).float() * 0.3 + 0.5)
        bn_t.weight.copy_(torch.randn(FEATURES))
        bn_t.bias.copy_(torch.randn(FEATURES))
    bn_t.eval()
    with torch.no_grad():
        ref = bn_t(torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))).numpy()

    bn = SyncBatchNorm(FEATURES)
    variables = {
        "params": {
            "scale": jnp.asarray(bn_t.weight.detach().numpy()),
            "bias": jnp.asarray(bn_t.bias.detach().numpy()),
        },
        "batch_stats": {
            "mean": jnp.asarray(bn_t.running_mean.numpy()),
            "var": jnp.asarray(bn_t.running_var.numpy()),
        },
    }
    out = bn.apply(variables, jnp.asarray(x), False)
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 4, 1, 2, 3)), ref, atol=1e-5
    )
