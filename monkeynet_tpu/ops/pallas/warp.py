"""Pallas bilinear warp (grid_sample) kernel for TPU.

Replaces the XLA gather used by ops.sampling.grid_sample on the hot warp path
(deformable skip connections, per-kp shifted source copies). TPUs have no
fast per-element vector gather, so the kernel reformulates bilinear sampling
as a small dense matmul that rides the MXU:

  For a tile of T output pixels, build the (HW, T) interpolation matrix
  A = sum_corner w_corner * onehot(idx_corner)   (VPU: iota compare + scale)
  then   out_tile = src @ A                      (MXU: (C, HW) x (HW, T))

A has at most 4 non-zeros per column; materializing it densely trades FLOPs
for the MXU's bandwidth, which wins for the small source planes this model
warps (<= 64x64 per skip level at training resolution).

Layout: everything runs channels-on-sublanes / pixels-on-lanes ((C, HW)
source, (C, T) output tiles). The naive pixels-on-sublanes layout puts C on
the 128-wide lane dim, and the model's small channel counts (3-35) pad 4-40x
— at 128^2 that alone blows the 16 MB scoped-VMEM budget. A is built and
consumed in (CHUNK_COLS, T) slabs for the same reason (a dense (HW, T) slab
is 16.8 MB at 128^2); a one-hot column has its nonzero in exactly one slab,
so slab-wise accumulation is exact.

Semantics match ops.sampling.grid_sample exactly: align_corners=True,
zeros padding (out-of-range corners contribute 0).

The custom VJP computes d_src = d_out @ A^T (same matmul trick transposed)
and the analytic d_grid from the gathered corner values.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from monkeynet_tpu.ops.pallas import pad_to

# Output pixels per kernel step; multiple of the fp32 lane tile width.
TILE = 256
# Source-pixel rows of A materialized per slab (2 MB per (CHUNK_COLS, TILE)
# f32 slab): keeps kernel VMEM size-invariant in H*W.
CHUNK_COLS = 2048


def _col_chunks(HW):
    cs = min(HW, CHUNK_COLS)
    return [(c0, min(cs, HW - c0)) for c0 in range(0, HW, cs)]


def _pixel_coords(grid_tile, H, W):
    """(T, 2) xy grid in [-1, 1] -> corner indices + fractional weights."""
    x = (grid_tile[:, 0] + 1.0) * 0.5 * (W - 1)
    y = (grid_tile[:, 1] + 1.0) * 0.5 * (H - 1)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx1 = x - x0f
    wy1 = y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    return x0, y0, x0 + 1, y0 + 1, wx1, wy1


def _corner_matrix(xi, yi, w, H, W, c0, cs, dtype):
    """(T,) int corner coords + weights -> (cs, T) scaled one-hot columns for
    source pixels [c0, c0+cs)."""
    valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
    xc = jnp.clip(xi, 0, W - 1)
    yc = jnp.clip(yi, 0, H - 1)
    flat_idx = yc * W + xc  # (T,)
    w_eff = jnp.where(valid, w, 0.0).astype(dtype)  # (T,)
    rows = jax.lax.broadcasted_iota(jnp.int32, (cs, xi.shape[0]), 0) + c0
    return jnp.where(
        rows == flat_idx[None, :], w_eff[None, :], jnp.zeros((), dtype)
    )


def _build_A(coords, H, W, c0, cs, dtype):
    """Corner coords -> (cs, T) bilinear interpolation matrix slab."""
    x0, y0, x1, y1, wx1, wy1 = coords
    A = _corner_matrix(x0, y0, (1 - wx1) * (1 - wy1), H, W, c0, cs, dtype)
    A += _corner_matrix(x1, y0, wx1 * (1 - wy1), H, W, c0, cs, dtype)
    A += _corner_matrix(x0, y1, (1 - wx1) * wy1, H, W, c0, cs, dtype)
    A += _corner_matrix(x1, y1, wx1 * wy1, H, W, c0, cs, dtype)
    return A


def _fwd_kernel(src_ref, grid_ref, out_ref, *, H, W):
    coords = _pixel_coords(grid_ref[0], H, W)
    C, T = src_ref.shape[1], grid_ref.shape[1]
    # MXU accumulator must be 32-bit even for bf16 operands.
    acc = jnp.zeros((C, T), jnp.float32)
    for c0, cs in _col_chunks(src_ref.shape[2]):
        A = _build_A(coords, H, W, c0, cs, src_ref.dtype)  # (cs, T)
        acc += jnp.dot(
            src_ref[0, :, c0:c0 + cs], A, preferred_element_type=jnp.float32
        )
    out_ref[0] = acc.astype(out_ref.dtype)


def _dsrc_kernel(grid_ref, dout_ref, dsrc_ref, *, H, W):
    coords = _pixel_coords(grid_ref[0], H, W)
    dout = dout_ref[0]  # (C, T)

    @pl.when(pl.program_id(1) == 0)
    def _():
        dsrc_ref[0] = jnp.zeros_like(dsrc_ref[0])

    for c0, cs in _col_chunks(dsrc_ref.shape[2]):
        A = _build_A(coords, H, W, c0, cs, dout.dtype)  # (cs, T)
        dsrc_ref[0, :, c0:c0 + cs] += jnp.dot(
            dout, A.T, preferred_element_type=jnp.float32
        ).astype(dsrc_ref.dtype)


def _dgrid_kernel(src_ref, grid_ref, dout_ref, dgrid_ref, *, H, W):
    """Analytic gradient w.r.t. the sampling grid.

    d out/d x = (W-1)/2 * [(1-wy)(v10 - v00) + wy(v11 - v01)], similarly y;
    corner values gathered with the same one-hot matmuls.
    """
    g = grid_ref[0]
    dtype = src_ref.dtype
    x0, y0, x1, y1, wx1, wy1 = _pixel_coords(g, H, W)
    wx1 = wx1[None, :]
    wy1 = wy1[None, :]
    ones = jnp.ones_like(g[:, 0])

    def corner_vals(xi, yi):
        acc = jnp.zeros((src_ref.shape[1], g.shape[0]), jnp.float32)
        for c0, cs in _col_chunks(src_ref.shape[2]):
            A = _corner_matrix(xi, yi, ones, H, W, c0, cs, dtype)
            acc += jnp.dot(
                src_ref[0, :, c0:c0 + cs], A,
                preferred_element_type=jnp.float32,
            )
        return acc.astype(dtype)  # (C, T)

    v00 = corner_vals(x0, y0)
    v10 = corner_vals(x1, y0)
    v01 = corner_vals(x0, y1)
    v11 = corner_vals(x1, y1)

    dout = dout_ref[0]  # (C, T)
    dx_pix = jnp.sum(
        dout * ((1 - wy1) * (v10 - v00) + wy1 * (v11 - v01)), axis=0
    )
    dy_pix = jnp.sum(
        dout * ((1 - wx1) * (v01 - v00) + wx1 * (v11 - v10)), axis=0
    )
    dgrid_ref[0] = jnp.stack(
        [dx_pix * (0.5 * (W - 1)), dy_pix * (0.5 * (H - 1))], axis=-1
    ).astype(dgrid_ref.dtype)


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
    # Defer to XLA's gather outside the kernel's design envelope:
    # - planes past 128^2: the dense interpolation matmul is O(N*HW) vs the
    #   gather's O(N), and the per-kernel slab unroll (HW/CHUNK_COLS bodies,
    #   x4 corners in the VJP) grows the Mosaic compile linearly — measured
    #   128^2 is already near break-even (fwd 1.24x, fwd+bwd 0.95x) and 256^2
    #   blew the remote compile helper's memory;
    # - full (C, HW) planes past ~4 MB: they must stay resident in VMEM
    #   (double-buffered against the ~16 MB scoped limit, shared with the
    #   dsrc output block). The model's real warps are all within both bounds
    #   (the largest, 64ch at 128^2 in the vox recipe, is exactly 4 MB).
    if H * W > 16384 or H * W * C * 4 > 4 * 1024 * 1024:
        from monkeynet_tpu.ops.sampling import grid_sample

        return grid_sample(image, grid).astype(in_dtype)
    N = Ho * Wo
    Np = pad_to(N, TILE)
    grid_flat = grid.reshape(B, N, 2)
    if Np != N:
        grid_flat = jnp.pad(
            grid_flat, ((0, 0), (0, Np - N), (0, 0)), constant_values=-2.0
        )
    src_t = image.reshape(B, H * W, C).swapaxes(1, 2)  # (B, C, HW)
    out = _warp(src_t, grid_flat, H, W)  # (B, C, Np)
    return (
        out[:, :, :N].swapaxes(1, 2).reshape(B, Ho, Wo, C).astype(in_dtype)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _warp(src_t, grid_flat, H, W):
    return _warp_fwd_impl(src_t, grid_flat, H, W)


def _warp_fwd_impl(src_t, grid_flat, H, W):
    B, C, HW = src_t.shape
    _, Np, _ = grid_flat.shape
    kernel = functools.partial(_fwd_kernel, H=H, W=W)
    return pl.pallas_call(
        kernel,
        grid=(B, Np // TILE),
        in_specs=[
            pl.BlockSpec((1, C, HW), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, 2), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, TILE), lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, Np), src_t.dtype),
    )(src_t, grid_flat)


def _warp_fwd(src_t, grid_flat, H, W):
    return _warp_fwd_impl(src_t, grid_flat, H, W), (src_t, grid_flat)


def _warp_bwd(H, W, res, dout):
    src_t, grid_flat = res
    B, C, HW = src_t.shape
    _, Np, _ = grid_flat.shape

    dsrc = pl.pallas_call(
        functools.partial(_dsrc_kernel, H=H, W=W),
        grid=(B, Np // TILE),
        in_specs=[
            pl.BlockSpec((1, TILE, 2), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, TILE), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, HW), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, HW), src_t.dtype),
    )(grid_flat, dout)

    dgrid = pl.pallas_call(
        functools.partial(_dgrid_kernel, H=H, W=W),
        grid=(B, Np // TILE),
        in_specs=[
            pl.BlockSpec((1, C, HW), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, 2), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, TILE), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, 2), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, 2), grid_flat.dtype),
    )(src_t, grid_flat, dout)

    return dsrc, dgrid


_warp.defvjp(_warp_fwd, _warp_bwd)
