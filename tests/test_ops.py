"""Unit + golden parity tests for core ops (grid, 2x2 math, sampling, gaussians)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monkeynet_tpu.ops import (
    gaussian2kp,
    grid_sample,
    kp2gaussian,
    make_coordinate_grid,
    mat2_det,
    mat2_inverse,
    mat2_smallest_singular,
    mat2_trace,
    resize_bilinear,
    resize_nearest,
)
from monkeynet_tpu.ops.gaussian import spatial_softmax

from .reference_shim import load_reference

REF = load_reference()
needs_ref = pytest.mark.skipif(REF is None, reason="torch reference unavailable")


def rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


# ---------------------------------------------------------------- grid / mat2


def test_coordinate_grid_endpoints():
    g = make_coordinate_grid((5, 7))
    assert g.shape == (5, 7, 2)
    np.testing.assert_allclose(g[0, 0], [-1, -1])
    np.testing.assert_allclose(g[-1, -1], [1, 1])
    np.testing.assert_allclose(g[0, -1], [1, -1])  # xy order: x is width axis
    np.testing.assert_allclose(g[2, 3], [0, 0])


@needs_ref
def test_coordinate_grid_matches_reference():
    import torch
    from modules.util import make_coordinate_grid as ref_grid

    ours = np.asarray(make_coordinate_grid((13, 9)))
    theirs = ref_grid((13, 9), torch.FloatTensor(0).type()).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_mat2_inverse_exact():
    m = rand(4, 3, 2, 2) + 3 * np.eye(2, dtype=np.float32)
    inv = np.asarray(mat2_inverse(jnp.asarray(m)))
    np.testing.assert_allclose(np.matmul(m, inv), np.broadcast_to(np.eye(2), m.shape), atol=1e-4)


@needs_ref
def test_mat2_helpers_match_reference():
    import torch
    from modules.util import matrix_det, matrix_inverse, matrix_trace, smallest_singular

    m = rand(2, 5, 2, 2) + 2 * np.eye(2, dtype=np.float32)
    tm = torch.from_numpy(m)

    np.testing.assert_allclose(
        np.asarray(mat2_det(jnp.asarray(m)))[..., None],
        matrix_det(tm).numpy(),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(mat2_trace(jnp.asarray(m)))[..., None],
        matrix_trace(tm).numpy(),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(mat2_inverse(jnp.asarray(m), eps=1e-6)),
        matrix_inverse(tm, eps=1e-6).numpy(),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(mat2_smallest_singular(jnp.asarray(m))),
        smallest_singular(tm).numpy(),
        atol=1e-4,
    )


# ------------------------------------------------------------------- sampling


@needs_ref
def test_grid_sample_matches_torch_align_corners():
    import torch
    import torch.nn.functional as F

    img = rand(2, 3, 9, 11, seed=1)  # NCHW for torch
    # grid in [-1.3, 1.3] to exercise zeros padding
    grid = (np.random.RandomState(2).rand(2, 6, 5, 2).astype(np.float32) * 2.6) - 1.3

    ref = F.grid_sample(
        torch.from_numpy(img),
        torch.from_numpy(grid),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=True,
    ).numpy()  # (2, 3, 6, 5)

    ours = np.asarray(
        grid_sample(jnp.asarray(img.transpose(0, 2, 3, 1)), jnp.asarray(grid))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@needs_ref
def test_resize_nearest_matches_torch():
    import torch
    import torch.nn.functional as F

    x = rand(2, 4, 6, 8, seed=3)
    # x2 upsample (decoder path)
    ref = F.interpolate(torch.from_numpy(x), scale_factor=2, mode="nearest").numpy()
    ours = np.asarray(
        resize_nearest(jnp.asarray(x.transpose(0, 2, 3, 1)), (12, 16))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref)

    # x0.25 downsample (kp-detector scale_factor path)
    ref = F.interpolate(torch.from_numpy(x), scale_factor=0.5, mode="nearest").numpy()
    ours = np.asarray(
        resize_nearest(jnp.asarray(x.transpose(0, 2, 3, 1)), (3, 4))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref)


@needs_ref
def test_resize_bilinear_matches_torch():
    import torch
    import torch.nn.functional as F

    x = rand(2, 3, 7, 9, seed=4)
    ref = F.interpolate(
        torch.from_numpy(x), size=(14, 5), mode="bilinear", align_corners=False
    ).numpy()
    ours = np.asarray(
        resize_bilinear(jnp.asarray(x.transpose(0, 2, 3, 1)), (14, 5))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_resize_nearest_fast_paths_match_index_rule():
    """The broadcast/strided-slice fast paths (integer ratios) must equal the
    legacy index rule src = floor(dst * in / out) exactly — including mixed
    up/down axes and the non-integer fallback."""

    def by_index_rule(x, out_hw):
        Ho, Wo = out_hw
        rows = (jnp.arange(Ho) * x.shape[-3]) // Ho
        cols = (jnp.arange(Wo) * x.shape[-2]) // Wo
        return jnp.take(jnp.take(x, rows, axis=-3), cols, axis=-2)

    rng = np.random.RandomState(11)
    cases = [
        (8, 8, (16, 16)),  # x2 up (decoder)
        (8, 8, (2, 2)),    # x4 down (flow pyramid)
        (16, 8, (4, 16)),  # down rows, up cols
        (8, 8, (3, 5)),    # non-integer fallback
        (7, 7, (14, 14)),  # odd-size x2
        (8, 8, (12, 12)),  # non-integer 1.5x fallback
    ]
    for H, W, out in cases:
        x = jnp.asarray(rng.rand(2, 3, H, W, 5).astype(np.float32))
        got = np.asarray(resize_nearest(x, out))
        want = np.asarray(by_index_rule(x, out))
        assert got.shape == want.shape
        np.testing.assert_array_equal(got, want, err_msg=f"{(H, W, out)}")


# ------------------------------------------------------------------- gaussians


def _kp(B=2, D=3, K=4, matrix=True, seed=5):
    rng = np.random.RandomState(seed)
    mean = (rng.rand(B, D, K, 2).astype(np.float32) * 2 - 1) * 0.8
    kp = {"mean": mean}
    if matrix:
        a = rng.randn(B, D, K, 2, 2).astype(np.float32) * 0.05
        kp["var"] = np.matmul(a.transpose(0, 1, 2, 4, 3), a) + 0.02 * np.eye(
            2, dtype=np.float32
        )
    return kp


@needs_ref
@pytest.mark.parametrize("variance", ["matrix", 0.01])
def test_kp2gaussian_matches_reference(variance):
    import torch
    from modules.keypoint_detector import kp2gaussian as ref_kp2gaussian

    kp = _kp(matrix=(variance == "matrix"))
    tkp = {k: torch.from_numpy(v) for k, v in kp.items()}
    ref = ref_kp2gaussian(tkp, (16, 12), kp_variance=variance).numpy()
    ours = np.asarray(
        kp2gaussian({k: jnp.asarray(v) for k, v in kp.items()}, (16, 12), variance)
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@needs_ref
@pytest.mark.parametrize("variance,clip", [("matrix", None), ("matrix", 0.01), ("single", None)])
def test_gaussian2kp_matches_reference(variance, clip):
    import torch
    import torch.nn.functional as F
    from modules.keypoint_detector import gaussian2kp as ref_gaussian2kp

    B, K, D, H, W = 2, 4, 3, 16, 12
    logits = rand(B, K, D, H, W, seed=6)
    heat_t = F.softmax(torch.from_numpy(logits).view(B, K, D, -1) / 0.1, dim=3).view(
        B, K, D, H, W
    )
    ref = ref_gaussian2kp(heat_t, kp_variance=variance, clip_variance=clip)
    ref = {k: v.numpy() for k, v in ref.items()}

    # ours: (B, D, H, W, K) layout
    heat_j = spatial_softmax(
        jnp.asarray(logits.transpose(0, 2, 3, 4, 1)), temperature=0.1
    )
    ours = gaussian2kp(heat_j, kp_variance=variance, clip_variance=clip)

    np.testing.assert_allclose(np.asarray(ours["mean"]), ref["mean"], atol=1e-5)
    if variance != "scalar":
        # clip path goes through sqrt; allow float32 noise
        np.testing.assert_allclose(
            np.asarray(ours["var"]), ref["var"], atol=1e-4, rtol=1e-4
        )


def test_kp_math_is_f32_under_bf16():
    """Mixed-precision policy (ops/gaussian.py): kp math always runs f32.

    The regression this guards: a bf16 covariance's determinant a*d - b*c
    cancels catastrophically (can round to <= 0), flipping the mahalanobis
    exponent's sign so kp2gaussian overflows — the actions recipe NaN'd
    within 10 train steps under compute_dtype=bfloat16 before the policy."""
    # A near-degenerate PSD covariance (what soft-argmax yields once the
    # detector's heatmaps concentrate): f32 det is tiny-positive, but the
    # same det computed in bf16 arithmetic rounds to exactly zero.
    var32 = np.array(
        [[0.01664637, 0.01596367], [0.01596367, 0.01538104]], np.float32
    )
    assert var32[0, 0] * var32[1, 1] - var32[0, 1] * var32[1, 0] > 0
    vb = jnp.asarray(var32, jnp.bfloat16)
    det_bf16 = vb[0, 0] * vb[1, 1] - vb[0, 1] * vb[1, 0]  # bf16 arithmetic
    assert float(det_bf16) <= 0, "fixture must exhibit the bf16 cancellation"

    # Once a var is STORED in bf16 the damage is done (upcasting cannot
    # restore the cancelled bits) — so the policy keeps the kp pytree f32
    # end-to-end: bf16 logits in, f32 mean/var out, and the rendered
    # heatmap of the full bf16 pipeline stays finite and bounded.
    logits = jnp.asarray(rand(1, 1, 16, 16, 3, seed=3) * 40.0, jnp.bfloat16)
    soft = spatial_softmax(logits, 0.1)  # sharply peaked
    assert soft.dtype == jnp.float32
    kp = gaussian2kp(soft, "matrix")
    assert kp["mean"].dtype == jnp.float32
    assert kp["var"].dtype == jnp.float32
    heat = kp2gaussian(kp, (16, 16), "matrix")
    assert heat.dtype == jnp.float32
    assert bool(jnp.isfinite(heat).all())
    assert float(heat.max()) <= 1.0 + 1e-5


def test_kp_gaussian_roundtrip():
    """kp -> gaussian -> (normalize) -> soft-argmax recovers the kp mean."""
    kp = {"mean": jnp.asarray([[[[0.3, -0.4], [-0.6, 0.1]]]], dtype=jnp.float32)}
    heat = kp2gaussian(kp, (64, 64), kp_variance=0.005)  # (1,1,2,64,64)
    heat = heat / heat.sum(axis=(-1, -2), keepdims=True)
    heat = jnp.transpose(heat, (0, 1, 3, 4, 2))  # (B,D,H,W,K)
    out = gaussian2kp(heat, kp_variance="scalar-none")
    np.testing.assert_allclose(np.asarray(out["mean"]), np.asarray(kp["mean"]), atol=2e-2)


def test_shift_sample_matches_grid_sample():
    from monkeynet_tpu.ops.sampling import shift_sample, warp_video
    from monkeynet_tpu.ops.grid import make_coordinate_grid

    rng = np.random.RandomState(7)
    B, H, W, C, N = 2, 9, 11, 4, 5
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    shifts = jnp.asarray((rng.rand(B, N, 2).astype(np.float32) * 2.4) - 1.2)

    grid = make_coordinate_grid((H, W))
    grids = grid[None, None] + shifts[:, :, None, None, :]
    ref = warp_video(img, grids)
    out = shift_sample(img, shifts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
