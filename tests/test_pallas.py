"""Pallas kernel correctness harness: each kernel vs its jnp reference
(values AND gradients), run in interpreter mode on the CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from monkeynet_tpu.ops.sampling import grid_sample


def _data(B=2, H=12, W=16, C=5, Ho=9, Wo=7, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.randn(B, H, W, C).astype(np.float32)
    grid = (rng.rand(B, Ho, Wo, 2).astype(np.float32) * 2.6) - 1.3
    return jnp.asarray(img), jnp.asarray(grid)


def test_warp_forward_matches_reference():
    from monkeynet_tpu.ops.pallas.warp import grid_sample_pallas

    img, grid = _data()
    ref = grid_sample(img, grid)
    with pltpu.force_tpu_interpret_mode():
        out = grid_sample_pallas(img, grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_warp_gradients_match_reference():
    from monkeynet_tpu.ops.pallas.warp import grid_sample_pallas

    img, grid = _data(B=1, H=8, W=8, C=3, Ho=4, Wo=4, seed=1)

    def loss_ref(i, g):
        return (grid_sample(i, g) ** 2).sum()

    def loss_pl(i, g):
        return (grid_sample_pallas(i, g) ** 2).sum()

    dref_i, dref_g = jax.grad(loss_ref, argnums=(0, 1))(img, grid)
    with pltpu.force_tpu_interpret_mode():
        dpl_i, dpl_g = jax.grad(loss_pl, argnums=(0, 1))(img, grid)

    np.testing.assert_allclose(np.asarray(dpl_i), np.asarray(dref_i), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dpl_g), np.asarray(dref_g), atol=1e-3)


def test_warp_production_size_matches_reference():
    """A production-shaped plane (multiple of the lane width, several output
    tiles) through the separable-kernel path."""
    from monkeynet_tpu.ops.pallas import warp as warp_mod

    img, grid = _data(B=1, H=48, W=48, C=3, Ho=8, Wo=8, seed=2)
    ref = grid_sample(img, grid)
    with pltpu.force_tpu_interpret_mode():
        out = warp_mod.grid_sample_pallas(img, grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def loss_ref(i, g):
        return (grid_sample(i, g) ** 2).sum()

    def loss_pl(i, g):
        return (warp_mod.grid_sample_pallas(i, g) ** 2).sum()

    dref_i, dref_g = jax.grad(loss_ref, argnums=(0, 1))(img, grid)
    with pltpu.force_tpu_interpret_mode():
        dpl_i, dpl_g = jax.grad(loss_pl, argnums=(0, 1))(img, grid)
    np.testing.assert_allclose(np.asarray(dpl_i), np.asarray(dref_i), atol=1e-4)
    # d_grid entries reach O(1e2); rtol covers f32 accumulation-order noise
    np.testing.assert_allclose(
        np.asarray(dpl_g), np.asarray(dref_g), atol=1e-3, rtol=1e-4
    )


def test_warp_oversized_plane_falls_back_to_xla():
    """Planes past the VMEM budget defer to the XLA gather (no pallas_call)."""
    from monkeynet_tpu.ops.pallas.warp import grid_sample_pallas

    img, grid = _data(B=1, H=256, W=256, C=40, Ho=4, Wo=4, seed=3)
    assert 256 * 256 * 40 * 4 > 8 * 1024 * 1024
    ref = grid_sample(img, grid)
    out = grid_sample_pallas(img, grid)  # no interpret ctx: must not hit Mosaic
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("variance", ["matrix", "single", 0.01])
@pytest.mark.parametrize("norm", [None, "sum", 10.0])
def test_kp2gaussian_pallas_matches_reference(variance, norm):
    from monkeynet_tpu.ops.gaussian import kp2gaussian
    from monkeynet_tpu.ops.pallas.heatmap import kp2gaussian_pallas

    rng = np.random.RandomState(0)
    B, D, K = 2, 3, 4
    kp = {"mean": jnp.asarray((rng.rand(B, D, K, 2) * 2 - 1).astype(np.float32) * 0.7)}
    if variance == "matrix":
        a = rng.randn(B, D, K, 2, 2).astype(np.float32) * 0.05
        kp["var"] = jnp.asarray(
            np.matmul(a.transpose(0, 1, 2, 4, 3), a) + 0.02 * np.eye(2, dtype=np.float32)
        )
    elif variance == "single":
        kp["var"] = jnp.asarray(rng.rand(B, D, K, 1, 1).astype(np.float32) * 0.05 + 0.01)

    ref = np.asarray(kp2gaussian(kp, (16, 12), variance))
    if norm == "sum":
        ref = ref / ref.sum(axis=(-1, -2), keepdims=True)
    elif norm is not None:
        ref = ref / norm

    out = kp2gaussian_pallas(kp, (16, 12), variance, norm_const=norm, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


@pytest.mark.parametrize("variance,clip", [("matrix", None), ("matrix", 0.05), ("single", None), (0.01, None)])
def test_gaussian2kp_pallas_matches_reference(variance, clip):
    from monkeynet_tpu.ops.gaussian import gaussian2kp, spatial_softmax
    from monkeynet_tpu.ops.pallas.softargmax import gaussian2kp_pallas

    rng = np.random.RandomState(1)
    B, D, H, W, K = 2, 3, 16, 12, 4
    logits = jnp.asarray(rng.randn(B, D, H, W, K).astype(np.float32))

    heat = spatial_softmax(logits, temperature=0.1)
    ref = gaussian2kp(heat, variance, clip)
    out = gaussian2kp_pallas(logits, 0.1, variance, clip, interpret=True)

    np.testing.assert_allclose(np.asarray(out["mean"]), np.asarray(ref["mean"]), atol=1e-5)
    if variance in ("matrix", "single"):
        # clip rescale divides by the smallest singular value, amplifying
        # float32 noise when it is tiny
        tol = 2e-2 if clip else 1e-4
        np.testing.assert_allclose(
            np.asarray(out["var"]), np.asarray(ref["var"]), atol=1e-4, rtol=tol
        )


def test_enabled_gating(monkeypatch):
    """Per-kernel defaults + env overrides (ops/pallas/__init__.enabled)."""
    import monkeynet_tpu.ops.pallas as pkg

    monkeypatch.setattr(pkg, "_on_tpu", lambda: True)

    monkeypatch.delenv("MONKEYNET_PALLAS", raising=False)
    # warp defaults on for eval AND train; the other three stay opt-in
    assert pkg.enabled("warp") and pkg.enabled("warp", train=True)
    for k in ("heatmap", "softargmax", "combine"):
        assert not pkg.enabled(k) and not pkg.enabled(k, train=True)

    monkeypatch.setenv("MONKEYNET_PALLAS", "0")
    assert not pkg.enabled("warp")

    monkeypatch.setenv("MONKEYNET_PALLAS", "1")
    assert pkg.enabled("heatmap", train=True)

    # comma-separated subset force-enables exactly those kernels
    monkeypatch.setenv("MONKEYNET_PALLAS", "heatmap, combine")
    assert pkg.enabled("heatmap") and pkg.enabled("combine", train=True)
    assert not pkg.enabled("warp")

    # nothing dispatches Mosaic off-TPU, even force-enabled
    monkeypatch.setattr(pkg, "_on_tpu", lambda: False)
    monkeypatch.setenv("MONKEYNET_PALLAS", "1")
    assert not pkg.enabled("warp")
    monkeypatch.delenv("MONKEYNET_PALLAS")
    assert not pkg.enabled("warp")


def test_dense_motion_combine_forward_matches_reference():
    from monkeynet_tpu.ops.pallas.combine import (
        dense_motion_combine_pallas,
        dense_motion_combine_reference,
    )

    rng = np.random.RandomState(2)
    B, D, H, W, K1 = 2, 3, 12, 16, 5
    logits = jnp.asarray(rng.randn(B, D, H, W, K1).astype(np.float32))
    diff = jnp.asarray(rng.randn(B, D, K1, 2).astype(np.float32) * 0.3)
    corr = jnp.asarray(rng.randn(B, D, H, W, 2).astype(np.float32) * 0.1)

    ref = dense_motion_combine_reference(logits, diff, corr)
    out = dense_motion_combine_pallas(logits, diff, corr, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_dense_motion_combine_gradients_match_reference():
    from monkeynet_tpu.ops.pallas.combine import (
        dense_motion_combine_pallas,
        dense_motion_combine_reference,
    )

    rng = np.random.RandomState(3)
    B, D, H, W, K1 = 1, 2, 8, 8, 4
    logits = jnp.asarray(rng.randn(B, D, H, W, K1).astype(np.float32))
    diff = jnp.asarray(rng.randn(B, D, K1, 2).astype(np.float32) * 0.3)
    corr = jnp.asarray(rng.randn(B, D, H, W, 2).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.randn(B, D, H, W, 2).astype(np.float32))

    def loss_ref(l, d, c):
        return jnp.sum(dense_motion_combine_reference(l, d, c) * w)

    def loss_pl(l, d, c):
        return jnp.sum(dense_motion_combine_pallas(l, d, c, True) * w)

    ref_grads = jax.grad(loss_ref, argnums=(0, 1, 2))(logits, diff, corr)
    pl_grads = jax.grad(loss_pl, argnums=(0, 1, 2))(logits, diff, corr)
    for a, b in zip(pl_grads, ref_grads):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
