"""Keypoint <-> gaussian-heatmap transforms.

The keypoint pytree convention used across the framework:
    kp = {'mean': (B, D, K, 2) xy in [-1, 1],
          'var':  (B, D, K, 2, 2)}           # present iff kp_variance != scalar
('var' is (B, D, K, 1, 1) in 'single' mode.)

Behavior parity targets in the reference repo (semantics, not code):
  - kp2gaussian: modules/keypoint_detector.py:7-40
    (keypoint -> unnormalized gaussian heatmap; 'matrix' / 'single' / scalar
    variance modes).
  - gaussian2kp: modules/keypoint_detector.py:43-78
    (softmaxed heatmap -> soft-argmax mean + covariance; the +1e-7 heatmap
    floor is applied *after* softmax and the mean is NOT renormalized — kept
    bit-faithful because training parity depends on it).

Heatmap layouts: kp2gaussian returns (B, D, K, H, W); gaussian2kp consumes
(B, D, H, W, K) — the natural channels-last output of the hourglass.

Mixed-precision policy: keypoint math always runs in float32, whatever the
compute dtype of the surrounding network. The covariance determinant
`a*d - b*c` cancels catastrophically in bfloat16 (a non-positive det flips
the mahalanobis exponent's sign and the heatmap exp overflows — measured:
the actions recipe NaNs within 10 steps under compute_dtype=bfloat16), and
keypoints are coordinates, where bf16's 8-bit mantissa quantizes positions
by ~0.25 px at 64^2. These ops are a negligible share of step FLOPs, so both
transforms upcast internally and return float32; callers cast dense outputs
back to the feature dtype where they join conv inputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from monkeynet_tpu.ops.grid import (
    make_coordinate_grid,
    mat2_inverse,
    mat2_smallest_singular,
)


def kp2gaussian(kp, spatial_size, kp_variance="matrix"):
    """Render keypoints as gaussian heatmaps.

    Args:
      kp: keypoint pytree (see module docstring).
      spatial_size: (h, w) of the output heatmap.
      kp_variance: 'matrix' | 'single' | float.

    Returns:
      (B, D, K, H, W) float32 heatmaps, each peaking at 1 at the keypoint
      mean (computed in f32 regardless of input dtype — module docstring).
    """
    mean = kp["mean"].astype(jnp.float32)  # (B, D, K, 2)
    h, w = spatial_size
    grid = make_coordinate_grid((h, w), dtype=mean.dtype)  # (H, W, 2)

    # (B, D, K, H, W) displacement components
    dx = grid[None, None, None, :, :, 0] - mean[:, :, :, None, None, 0]
    dy = grid[None, None, None, :, :, 1] - mean[:, :, :, None, None, 1]

    if kp_variance == "matrix":
        # quadratic form (g - mu)^T Sigma^{-1} (g - mu) expanded elementwise:
        # with Sigma = [[a, b], [c, d]], Sigma^{-1} = [[d, -b], [-c, a]]/det,
        # q = (d*dx^2 - (b + c)*dx*dy + a*dy^2) / det.
        # Fully VPU-friendly — no tiny 2x2 matmuls — and divides by det once
        # at the end for accuracy.
        var = kp["var"].astype(jnp.float32)
        a = var[..., 0, 0][:, :, :, None, None]
        b = var[..., 0, 1][:, :, :, None, None]
        c = var[..., 1, 0][:, :, :, None, None]
        d = var[..., 1, 1][:, :, :, None, None]
        det = a * d - b * c
        under_exp = (d * dx * dx - (b + c) * dx * dy + a * dy * dy) / det
        out = jnp.exp(-0.5 * under_exp)
    elif kp_variance == "single":
        var = kp["var"].astype(jnp.float32)
        var = var[..., 0, 0][:, :, :, None, None]  # (B, D, K, 1, 1)
        out = jnp.exp(-0.5 * (dx * dx + dy * dy) / var)
    else:
        out = jnp.exp(-0.5 * (dx * dx + dy * dy) / kp_variance)

    return out


def gaussian2kp(heatmap, kp_variance="matrix", clip_variance=None):
    """Soft-argmax a (softmaxed) heatmap into keypoint mean (+ covariance).

    Args:
      heatmap: (B, D, H, W, K), expected to be a spatial softmax output.
      kp_variance: 'matrix' | 'single' | float (scalar -> mean only).
      clip_variance: optional float; clamps the covariance's smallest singular
        value from below by rescaling the matrix.

    Returns:
      keypoint pytree {'mean', ['var']}, always float32 (module docstring).
    """
    B, D, H, W, K = heatmap.shape
    heatmap = heatmap.astype(jnp.float32)
    heatmap = heatmap + 1e-7  # eps floor applied after softmax, no renorm
    grid = make_coordinate_grid((H, W), dtype=heatmap.dtype)  # (H, W, 2)

    # mean: sum_{h,w} p(h,w) * g(h,w)  -> (B, D, K, 2)
    mean = jnp.einsum("bdhwk,hwc->bdkc", heatmap, grid)
    kp = {"mean": mean}

    if kp_variance == "matrix":
        mean_sub = grid[None, None, :, :, None, :] - mean[:, :, None, None, :, :]
        # (B, D, H, W, K, 2); outer product weighted by heatmap, summed.
        var = jnp.einsum("bdhwki,bdhwkj,bdhwk->bdkij", mean_sub, mean_sub, heatmap)
        if clip_variance:
            min_norm = jnp.asarray(clip_variance, var.dtype)
            sg = mat2_smallest_singular(var)[..., None]  # (B, D, K, 1, 1)
            var = jnp.maximum(min_norm, sg) * var / sg
        kp["var"] = var
    elif kp_variance == "single":
        mean_sub = grid[None, None, :, :, None, :] - mean[:, :, None, None, :, :]
        var = jnp.einsum("bdhwki,bdhwk->bdki", mean_sub**2, heatmap)
        var = jnp.mean(var, axis=-1)[..., None, None]  # (B, D, K, 1, 1)
        kp["var"] = var

    return kp


def spatial_softmax(x, temperature=1.0):
    """Softmax over the (H, W) dims of an (B, D, H, W, K) heatmap.

    Computed and returned in float32 (feeds the soft-argmax reductions)."""
    B, D, H, W, K = x.shape
    flat = x.astype(jnp.float32).reshape(B, D, H * W, K) / temperature
    flat = jax.nn.softmax(flat, axis=2)
    return flat.reshape(B, D, H, W, K)
