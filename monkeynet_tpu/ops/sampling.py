"""Sampling / resize primitives with torch-0.4.1-compatible semantics.

The whole deformation pathway of the framework hinges on exact sampler
semantics (reference behavior: `F.grid_sample` with implicit
align_corners=True and zeros padding — modules/generator.py:51-58,
modules/movement_embedding.py:76-87 — and `F.interpolate` legacy-nearest /
trilinear for flow and feature resizing).

Layouts here are channels-last:
  images   (B, H, W, C)
  videos   (B, D, H, W, C)
  grids    (..., 2) with xy order in [-1, 1]

The jnp implementations lower to XLA gathers; a fused Pallas gather kernel
(ops/pallas/grid_sample.py) replaces `grid_sample` on the hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample(image, grid):
    """Bilinear sampling of `image` at `grid` locations.

    Args:
      image: (B, H, W, C) float array.
      grid:  (B, Ho, Wo, 2) xy coordinates in [-1, 1]; align_corners=True
             convention (-1 maps to pixel 0, +1 maps to pixel N-1).

    Out-of-range sample corners contribute zero (zeros padding).

    Returns:
      (B, Ho, Wo, C) sampled output.
    """
    B, H, W, C = image.shape
    dtype = image.dtype

    x = (grid[..., 0] + 1.0) * 0.5 * (W - 1)  # (B, Ho, Wo)
    y = (grid[..., 1] + 1.0) * 0.5 * (H - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = (x - x0).astype(dtype)
    wx0 = 1.0 - wx1
    wy1 = (y - y0).astype(dtype)
    wy0 = 1.0 - wy1

    flat = image.reshape(B, H * W, C)

    def corner(xi, yi, wgt):
        valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        idx = (yc * W + xc).reshape(B, -1)  # (B, Ho*Wo)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)  # (B, Ho*Wo, C)
        vals = vals.reshape(image.shape[:1] + xi.shape[1:] + (C,))
        w_eff = jnp.where(valid, wgt, jnp.zeros_like(wgt))
        return vals * w_eff[..., None]

    out = (
        corner(x0, y0, wx0 * wy0)
        + corner(x1, y0, wx1 * wy0)
        + corner(x0, y1, wx0 * wy1)
        + corner(x1, y1, wx1 * wy1)
    )
    return out


def warp_video(source, grid, train: bool = False):
    """Warp a single-frame source with a per-frame sampling grid.

    This is the framework's "3D warp trick": the source has one frame and the
    grid's z coordinate is identically 0, so trilinear 3D sampling degenerates
    to per-output-frame 2D bilinear sampling of the single source frame
    (reference behavior: modules/generator.py:51-58 with T=1 input).

    With MONKEYNET_PALLAS=1 the warp runs through the Pallas one-hot-matmul
    gather kernel (ops/pallas/warp.py) instead of the XLA gather; the default
    is XLA on every path (see ops/pallas/__init__.py for the measured
    keep/retire rationale). The `train` flag reaches the per-kernel gate so
    a future default can differ per path.

    Args:
      source: (B, H, W, C) the (single) source frame features.
      grid:   (B, D, Ho, Wo, 2) xy sampling grid per output frame.
      train:  whether this is a training (differentiated) call.

    Returns:
      (B, D, Ho, Wo, C)
    """
    from monkeynet_tpu.ops import pallas as pallas_pkg

    B, D, Ho, Wo, _ = grid.shape
    sampler = grid_sample
    if pallas_pkg.enabled("warp", train):
        from monkeynet_tpu.ops.pallas.warp import grid_sample_pallas

        sampler = grid_sample_pallas
    out = sampler(source, grid.reshape(B, D * Ho, Wo, 2))
    return out.reshape(B, D, Ho, Wo, -1)


def _shift_matrices(offsets, size):
    """Bilinear 1-D shift operators: offsets (..., N) in pixels ->
    (..., N, size, size) matrices R with (R @ v)[i] = lerp(v[i+k], v[i+k+1], f)
    where offset = k + f; out-of-range taps contribute zero (zeros padding)."""
    k = jnp.floor(offsets)
    f = (offsets - k)[..., None, None]
    k = k[..., None, None].astype(jnp.int32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (size, size), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (size, size), 1)
    src = rows + k  # (..., N, size, size) target source index per output row
    return (cols == src) * (1.0 - f) + (cols == src + 1) * f


def shift_sample(image, shifts):
    """Sample `image` at constant per-slot translations, MXU-formulated.

    Equivalent to grid_sample(image, coordinate_grid + shift) for a constant
    shift — the per-keypoint "rigidly shifted source copies" of the movement
    embedding (reference modules/movement_embedding.py:76-87). A constant
    translation makes bilinear sampling SEPARABLE, so instead of a per-pixel
    gather (slow on TPU) it becomes two batched one-hot matmuls.

    Args:
      image:  (B, H, W, C).
      shifts: (B, N, 2) xy in normalized [-1, 1] units (align_corners scale).

    Returns:
      (B, N, H, W, C), zeros padding outside the source.
    """
    B, H, W, C = image.shape
    dtype = image.dtype
    # normalized shift -> pixel offset of the SOURCE position per output pixel
    off_x = shifts[..., 0] * 0.5 * (W - 1)
    off_y = shifts[..., 1] * 0.5 * (H - 1)
    Ry = _shift_matrices(off_y, H).astype(dtype)  # (B, N, H, H)
    Rx = _shift_matrices(off_x, W).astype(dtype)  # (B, N, W, W)
    # columns first: (B, N, W, W) x (B, H, W, C) -> (B, N, H, W, C)
    tmp = jnp.einsum("bnxX,bhXc->bnhxc", Rx, image)
    return jnp.einsum("bnyY,bnYxc->bnyxc", Ry, tmp)


def resize_nearest(x, out_hw):
    """Legacy-nearest spatial resize of (..., H, W, C) to out_hw.

    Index rule: src = floor(dst * in / out) — torch's legacy `nearest`
    interpolate, which the reference relies on for x2 decoder upsampling and
    for `scale_factor` pre-downscales.
    """
    H, W = x.shape[-3], x.shape[-2]
    Ho, Wo = out_hw
    if (Ho, Wo) == (H, W):
        return x

    def axis_is_fast(size, out):
        return out % size == 0 or size % out == 0

    if axis_is_fast(H, Ho) and axis_is_fast(W, Wo):
        # Integer up/down ratios cover every resize the models emit (x2
        # decoder upsamples, power-of-two flow/embedding pyramid resizes,
        # scale_factor pre-downscales). floor(i*in/out) degenerates to
        # repeat (out = f*in) or stride (in = r*out), so express them as
        # broadcast/reshape and strided slice: their VJPs are a window
        # reduce and a pad, instead of the scatter-add a gather transpose
        # costs on TPU (measured 0.2 ms per up-block in the fused GAN step).
        if H % Ho == 0 and Ho != H:
            x = x[..., :: H // Ho, :, :]
        if W % Wo == 0 and Wo != W:
            x = x[..., :, :: W // Wo, :]
        fr, fc = Ho // x.shape[-3], Wo // x.shape[-2]
        if fr > 1 or fc > 1:
            lead = x.shape[:-3]
            h, w, c = x.shape[-3:]
            x = x[..., :, None, :, None, :]
            x = jnp.broadcast_to(x, lead + (h, fr, w, fc, c))
            x = x.reshape(lead + (h * fr, w * fc, c))
        return x

    rows = (jnp.arange(Ho) * H) // Ho
    cols = (jnp.arange(Wo) * W) // Wo
    x = jnp.take(x, rows, axis=-3)
    x = jnp.take(x, cols, axis=-2)
    return x


def _linear_weights(in_size, out_size, align_corners):
    """1-D source indices + lerp weights for linear interpolation."""
    if align_corners and out_size > 1:
        src = jnp.arange(out_size, dtype=jnp.float32) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
        src = jnp.clip(src, 0.0, in_size - 1)
    lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, in_size - 1)
    hi = jnp.clip(lo + 1, 0, in_size - 1)
    w_hi = src - lo.astype(jnp.float32)
    return lo, hi, w_hi


def resize_bilinear(x, out_hw, align_corners=False):
    """Bilinear spatial resize of (..., H, W, C), half-pixel by default.

    Matches torch `F.interpolate(mode='bilinear'/'trilinear')` sampling when
    the temporal size is unchanged (the only way the reference uses
    trilinear: resizing the flow field's spatial dims).
    """
    H, W = x.shape[-3], x.shape[-2]
    Ho, Wo = out_hw
    if (Ho, Wo) == (H, W):
        return x
    rlo, rhi, rw = _linear_weights(H, Ho, align_corners)
    clo, chi, cw = _linear_weights(W, Wo, align_corners)
    rw = rw.astype(x.dtype)
    cw = cw.astype(x.dtype)

    top = jnp.take(x, rlo, axis=-3)
    bot = jnp.take(x, rhi, axis=-3)
    x = top * (1.0 - rw[:, None, None]) + bot * rw[:, None, None]
    left = jnp.take(x, clo, axis=-2)
    right = jnp.take(x, chi, axis=-2)
    return left * (1.0 - cw[:, None]) + right * cw[:, None]


def resize_trilinear_video(x, out_hw):
    """Resize the spatial dims of a video (B, D, H, W, C), 'trilinear' mode.

    The temporal dim is unchanged; with half-pixel coordinates and identical
    in/out sizes the temporal axis maps identically, so this reduces to
    per-frame bilinear — which is exactly what we compute.
    """
    return resize_bilinear(x, out_hw, align_corners=False)


def resize_video(x, out_hw, mode="nearest"):
    """Dispatch helper for the config-selectable `interpolation_mode`."""
    if mode == "nearest":
        return resize_nearest(x, out_hw)
    elif mode in ("trilinear", "bilinear"):
        return resize_bilinear(x, out_hw, align_corners=False)
    raise ValueError(f"unknown interpolation mode: {mode}")
