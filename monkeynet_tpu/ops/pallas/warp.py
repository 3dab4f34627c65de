"""Pallas bilinear warp (grid_sample) kernel for TPU.

Replaces the XLA gather used by ops.sampling.grid_sample on the hot warp path
(deformable skip connections, per-kp shifted source copies). TPUs have no
fast per-element vector gather, so the kernel reformulates bilinear sampling
as a small dense matmul that rides the MXU:

  For a tile of T output pixels, build the (T, H*W) interpolation matrix
  A = sum_corner w_corner * onehot(idx_corner)   (VPU: iota compare + scale)
  then   out_tile = A @ src_flat                 (MXU: (T, HW) x (HW, C))

A has at most 4 non-zeros per row; materializing it densely trades FLOPs for
the MXU's bandwidth, which wins for the small source planes this model warps
(<= 64x64 per skip level at training resolution).

Semantics match ops.sampling.grid_sample exactly: align_corners=True,
zeros padding (out-of-range corners contribute 0).

The custom VJP computes d_src = A^T @ d_out (same matmul trick transposed)
and the analytic d_grid from the gathered corner values.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Output pixels per kernel step; multiple of the fp32 sublane tile (8, 128).
TILE = 256


def _corner_matrix(xi, yi, w, H, W, dtype):
    """(T,) int corner coords + weights -> (T, H*W) scaled one-hot rows."""
    valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
    xc = jnp.clip(xi, 0, W - 1)
    yc = jnp.clip(yi, 0, H - 1)
    flat_idx = yc * W + xc  # (T,)
    w_eff = jnp.where(valid, w, 0.0).astype(dtype)  # (T,)
    cols = jax.lax.broadcasted_iota(jnp.int32, (xi.shape[0], H * W), 1)
    return jnp.where(
        cols == flat_idx[:, None], w_eff[:, None], jnp.zeros((), dtype)
    )


def _build_A(grid_tile, H, W, dtype):
    """(T, 2) xy grid in [-1, 1] -> (T, H*W) bilinear interpolation matrix."""
    x = (grid_tile[:, 0] + 1.0) * 0.5 * (W - 1)
    y = (grid_tile[:, 1] + 1.0) * 0.5 * (H - 1)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx1 = x - x0f
    wy1 = y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1
    A = _corner_matrix(x0, y0, (1 - wx1) * (1 - wy1), H, W, dtype)
    A += _corner_matrix(x1, y0, wx1 * (1 - wy1), H, W, dtype)
    A += _corner_matrix(x0, y1, (1 - wx1) * wy1, H, W, dtype)
    A += _corner_matrix(x1, y1, wx1 * wy1, H, W, dtype)
    return A


def _fwd_kernel(src_ref, grid_ref, out_ref, *, H, W):
    A = _build_A(grid_ref[0], H, W, src_ref.dtype)  # (TILE, H*W)
    # MXU accumulator must be 32-bit even for bf16 operands.
    out_ref[0] = jnp.dot(
        A, src_ref[0], preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _dsrc_kernel(grid_ref, dout_ref, dsrc_ref, *, H, W):
    A = _build_A(grid_ref[0], H, W, dout_ref.dtype)  # (TILE, H*W)
    contrib = jnp.dot(
        A.T, dout_ref[0], preferred_element_type=jnp.float32
    ).astype(dsrc_ref.dtype)

    @pl.when(pl.program_id(1) == 0)
    def _():
        dsrc_ref[0] = jnp.zeros_like(dsrc_ref[0])

    dsrc_ref[0] += contrib


def _dgrid_kernel(src_ref, grid_ref, dout_ref, dgrid_ref, *, H, W):
    """Analytic gradient w.r.t. the sampling grid.

    d out/d x = (W-1)/2 * [(1-wy)(v10 - v00) + wy(v11 - v01)], similarly y;
    corner values gathered with the same one-hot matmuls.
    """
    g = grid_ref[0]
    dtype = src_ref.dtype
    x = (g[:, 0] + 1.0) * 0.5 * (W - 1)
    y = (g[:, 1] + 1.0) * 0.5 * (H - 1)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx1 = (x - x0f)[:, None]
    wy1 = (y - y0f)[:, None]
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1
    ones = jnp.ones_like(x)

    def corner_vals(xi, yi):
        A = _corner_matrix(xi, yi, ones, H, W, dtype)
        return jnp.dot(
            A, src_ref[0], preferred_element_type=jnp.float32
        ).astype(dtype)  # (T, C)

    v00 = corner_vals(x0, y0)
    v10 = corner_vals(x1, y0)
    v01 = corner_vals(x0, y1)
    v11 = corner_vals(x1, y1)

    dout = dout_ref[0]  # (T, C)
    dx_pix = jnp.sum(
        dout * ((1 - wy1) * (v10 - v00) + wy1 * (v11 - v01)), axis=-1
    )
    dy_pix = jnp.sum(
        dout * ((1 - wx1) * (v01 - v00) + wx1 * (v11 - v10)), axis=-1
    )
    dgrid_ref[0] = jnp.stack(
        [dx_pix * (0.5 * (W - 1)), dy_pix * (0.5 * (H - 1))], axis=-1
    ).astype(dgrid_ref.dtype)


def _pad_to(n, m):
    return ((n + m - 1) // m) * m


def grid_sample_pallas(image, grid):
    """Drop-in for ops.sampling.grid_sample: image (B, H, W, C),
    grid (B, Ho, Wo, 2) -> (B, Ho, Wo, C).

    Computes in float32 internally: sub-pixel sampling coordinates lose
    precision in bf16, and Mosaic's bf16 lowering of the one-hot matmul is
    not supported on this toolchain. Output keeps the input dtype.
    """
    in_dtype = image.dtype
    if in_dtype != jnp.float32:
        image = image.astype(jnp.float32)
        grid = grid.astype(jnp.float32)
    B, H, W, C = image.shape
    _, Ho, Wo, _ = grid.shape
    N = Ho * Wo
    Np = _pad_to(N, TILE)
    grid_flat = grid.reshape(B, N, 2)
    if Np != N:
        grid_flat = jnp.pad(
            grid_flat, ((0, 0), (0, Np - N), (0, 0)), constant_values=-2.0
        )
    out = _warp(image.reshape(B, H * W, C), grid_flat, H, W)
    return out[:, :N].reshape(B, Ho, Wo, C).astype(in_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _warp(src_flat, grid_flat, H, W):
    return _warp_fwd_impl(src_flat, grid_flat, H, W)


def _warp_fwd_impl(src_flat, grid_flat, H, W):
    B, HW, C = src_flat.shape
    _, Np, _ = grid_flat.shape
    kernel = functools.partial(_fwd_kernel, H=H, W=W)
    return pl.pallas_call(
        kernel,
        grid=(B, Np // TILE),
        in_specs=[
            pl.BlockSpec((1, HW, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, 2), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, C), src_flat.dtype),
    )(src_flat, grid_flat)


def _warp_fwd(src_flat, grid_flat, H, W):
    return _warp_fwd_impl(src_flat, grid_flat, H, W), (src_flat, grid_flat)


def _warp_bwd(H, W, res, dout):
    src_flat, grid_flat = res
    B, HW, C = src_flat.shape
    _, Np, _ = grid_flat.shape

    dsrc = pl.pallas_call(
        functools.partial(_dsrc_kernel, H=H, W=W),
        grid=(B, Np // TILE),
        in_specs=[
            pl.BlockSpec((1, TILE, 2), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, HW, C), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, HW, C), src_flat.dtype),
    )(grid_flat, dout)

    dgrid = pl.pallas_call(
        functools.partial(_dgrid_kernel, H=H, W=W),
        grid=(B, Np // TILE),
        in_specs=[
            pl.BlockSpec((1, HW, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, 2), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, 2), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, 2), grid_flat.dtype),
    )(src_flat, grid_flat, dout)

    return dsrc, dgrid


_warp.defvjp(_warp_fwd, _warp_bwd)
