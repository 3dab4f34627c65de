"""Pallas bilinear warp (grid_sample) kernel for TPU — separable formulation.

Replaces the XLA gather used by ops.sampling.grid_sample on the hot warp path
(deformable skip connections, per-kp shifted source copies; reference
modules/generator.py:51-58, modules/movement_embedding.py:76-87). TPUs have
no fast per-element vector gather, so sampling is reformulated as dense
matmuls that ride the MXU — but unlike a (HW, T) one-hot interpolation
matrix (O(N*HW) FLOPs, slab-unrolled compiles), the bilinear weight is
SEPARABLE:

  weight((y,x) -> p) = hat(y_p - y) * hat(x_p - x),   hat(d) = relu(1 - |d|)

and hat reproduces align_corners=True bilinear with zeros padding EXACTLY,
including image borders (a sample at x in (-1, 0) puts weight 1+x on column
0 and the invalid column -1 simply has no row). So for a tile of T output
pixels we build two small dense matrices

  Ax[t, ix] = hat(x_t - ix)          (T, W)   VPU iota compare
  AyT[h, t] = hat(y_t - h)           (H, T)

and contract them against the (C*H, W)-shaped source with two ops:

  forward:  Q = src2 @ Ax^T            (MXU, (C*H, W) x (W, T))
            out[c,t] = sum_h Q[(c,h),t] * AyT[h,t]        (VPU reduce)
  d_src:    Z[(c,h),t] = dout[c,t] * AyT[h,t]
            dsrc2 += Z @ Ax            (MXU)
  d_grid:   same contractions with the one-hot DIFFERENCE matrices
            Dx[t,ix] = 1{ix=x0+1} - 1{ix=x0} (right-difference, matching
            the corner formulation's subgradient at integer coordinates —
            the identity-grid-at-init case) and DyT analogously.

FLOPs are O(N * (H + W) * C) instead of O(N * HW * C) and there is no
Python slab unroll, so the Mosaic compile is size-independent (the round-2
one-hot kernel inflated train-graph compiles past 50 minutes).

Operand dtype is preserved (bf16 in -> bf16 matmuls with f32 accumulation
via preferred_element_type); sampling coordinates and weight construction
are always f32. d_src accumulates in f32 regardless of operand dtype.

Layouts: source and d_src travel as (B, C*H, W) (host-side transpose);
per-tile weight matrices want the grid both sublane- and lane-oriented, so
the wrapper passes the flat grid twice — (B, N, 2) and (B, 2, N).
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


def _iota_f32(shape, dim):
    # Mosaic's tpu.iota is integer-only; build int32 and cast.
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(jnp.float32)


def _hat_rows(x, W):
    """x: (T, 1) sublane-oriented pixel coords -> (T, W) bilinear rows."""
    ix = _iota_f32((x.shape[0], W), 1)
    return jnp.maximum(0.0, 1.0 - jnp.abs(x - ix))


def _hat_cols(y, H):
    """y: (1, T) lane-oriented pixel coords -> (H, T) bilinear columns."""
    iy = _iota_f32((H, y.shape[1]), 0)
    return jnp.maximum(0.0, 1.0 - jnp.abs(y - iy))


def _diff_rows(x, W):
    """(T, W) right-difference one-hots: 1{ix=floor(x)+1} - 1{ix=floor(x)}."""
    x0 = jnp.floor(x)
    ix = _iota_f32((x.shape[0], W), 1)
    return (ix == (x0 + 1.0)).astype(jnp.float32) - (ix == x0).astype(
        jnp.float32
    )


def _diff_cols(y, H):
    y0 = jnp.floor(y)
    iy = _iota_f32((H, y.shape[1]), 0)
    return (iy == (y0 + 1.0)).astype(jnp.float32) - (iy == y0).astype(
        jnp.float32
    )


def _px(v, n):
    """[-1, 1] grid coordinate -> pixel coordinate (align_corners=True)."""
    return (v + 1.0) * 0.5 * (n - 1)


_NT = (((1,), (1,)), ((), ()))  # dot_general: contract dim 1 with dim 1
_NN = (((1,), (0,)), ((), ()))  # dot_general: plain row x column


def _fwd_kernel(src_ref, gs_ref, gl_ref, out_ref, *, H, W, C):
    xs = _px(gs_ref[0][:, 0:1].astype(jnp.float32), W)  # (T, 1) sublanes
    yl = _px(gl_ref[0][1:2, :].astype(jnp.float32), H)  # (1, T) lanes
    dtype = src_ref.dtype
    Ax = _hat_rows(xs, W).astype(dtype)  # (T, W)
    AyT = _hat_cols(yl, H)  # (H, T) f32: weights the f32 accumulator
    q = jax.lax.dot_general(
        src_ref[0], Ax, _NT, preferred_element_type=jnp.float32
    )  # (C*H, T)
    T = q.shape[-1]
    out = jnp.sum(q.reshape(C, H, T) * AyT[None], axis=1)  # (C, T)
    out_ref[0] = out.astype(out_ref.dtype)


def _dsrc_kernel(gs_ref, gl_ref, dout_ref, dsrc_ref, *, H, W, C):
    xs = _px(gs_ref[0][:, 0:1].astype(jnp.float32), W)
    yl = _px(gl_ref[0][1:2, :].astype(jnp.float32), H)
    dtype = dout_ref.dtype
    Ax = _hat_rows(xs, W).astype(dtype)  # (T, W)
    AyT = _hat_cols(yl, H).astype(dtype)  # (H, T)

    @pl.when(pl.program_id(1) == 0)
    def _():
        dsrc_ref[0] = jnp.zeros_like(dsrc_ref[0])

    dout = dout_ref[0]  # (C, T)
    T = dout.shape[-1]
    z = (dout[:, None, :] * AyT[None]).reshape(C * H, T)
    dsrc_ref[0] += jax.lax.dot_general(
        z, Ax, _NN, preferred_element_type=jnp.float32
    )


def _dgrid_kernel(src_ref, gs_ref, gl_ref, dout_ref, dgrid_ref, *, H, W, C):
    """d out/d x = (W-1)/2 * sum_{c,h} dout * hat_y * (src[.,x0+1]-src[.,x0]),
    and symmetrically for y — the corner formulation's analytic gradient,
    expressed with difference one-hots so it stays two MXU contractions."""
    xs = _px(gs_ref[0][:, 0:1].astype(jnp.float32), W)  # (T, 1)
    yl = _px(gl_ref[0][1:2, :].astype(jnp.float32), H)  # (1, T)
    dtype = src_ref.dtype
    src2 = src_ref[0]  # (C*H, W)
    dout = dout_ref[0].astype(jnp.float32)  # (C, T)
    T = dout.shape[-1]

    qx = jax.lax.dot_general(
        src2, _diff_rows(xs, W).astype(dtype), _NT,
        preferred_element_type=jnp.float32,
    ).reshape(C, H, T)
    dx = jnp.sum(
        dout * jnp.sum(qx * _hat_cols(yl, H)[None], axis=1),
        axis=0, keepdims=True,
    )  # (1, T)

    qy = jax.lax.dot_general(
        src2, _hat_rows(xs, W).astype(dtype), _NT,
        preferred_element_type=jnp.float32,
    ).reshape(C, H, T)
    dy = jnp.sum(
        dout * jnp.sum(qy * _diff_cols(yl, H)[None], axis=1),
        axis=0, keepdims=True,
    )  # (1, T)

    dgrid_ref[0, 0:1, :] = (dx * (0.5 * (W - 1))).astype(dgrid_ref.dtype)
    dgrid_ref[0, 1:2, :] = (dy * (0.5 * (H - 1))).astype(dgrid_ref.dtype)


# Kernel envelope: the full (C*H, W) source plane (and the f32 d_src
# accumulator) must stay VMEM-resident. 8 MB of f32 source covers every warp
# the shipped recipes perform (the largest, 64ch at 128^2 in vox, is 4 MB);
# beyond that, defer to the XLA gather.
_MAX_SRC_BYTES = 8 * 1024 * 1024


def _within_envelope(H, W, C, itemsize):
    return H * W * C * itemsize <= _MAX_SRC_BYTES


def grid_sample_pallas(image, grid):
    """Drop-in for ops.sampling.grid_sample: image (B, H, W, C),
    grid (B, Ho, Wo, 2) -> (B, Ho, Wo, C). Keeps the operand dtype end to
    end (bf16 stays bf16 on the matmuls, accumulating in f32)."""
    B, H, W, C = image.shape
    _, Ho, Wo, _ = grid.shape
    if not _within_envelope(H, W, C, image.dtype.itemsize):
        from monkeynet_tpu.ops.sampling import grid_sample

        return grid_sample(image, grid)
    N = Ho * Wo
    Np = pad_to(N, TILE)
    grid_flat = grid.reshape(B, N, 2)
    if Np != N:
        grid_flat = jnp.pad(
            grid_flat, ((0, 0), (0, Np - N), (0, 0)), constant_values=-2.0
        )
    # (B, C*H, W): C,H merge on sublanes so both contractions are 2-D dots.
    src2 = image.transpose(0, 3, 1, 2).reshape(B, C * H, W)
    grid_lane = grid_flat.swapaxes(1, 2)  # (B, 2, Np): lane-oriented copy
    out = _warp(src2, grid_flat, grid_lane, H, W, C)  # (B, C, Np)
    return out[:, :, :N].swapaxes(1, 2).reshape(B, Ho, Wo, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _warp(src2, grid_flat, grid_lane, H, W, C):
    return _warp_fwd_impl(src2, grid_flat, grid_lane, H, W, C)


def _warp_fwd_impl(src2, grid_flat, grid_lane, H, W, C):
    B, CH, _ = src2.shape
    _, Np, _ = grid_flat.shape
    kernel = functools.partial(_fwd_kernel, H=H, W=W, C=C)
    return pl.pallas_call(
        kernel,
        grid=(B, Np // TILE),
        in_specs=[
            pl.BlockSpec((1, CH, W), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, 2), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, TILE), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, TILE), lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, Np), src2.dtype),
    )(src2, grid_flat, grid_lane)


def _warp_fwd(src2, grid_flat, grid_lane, H, W, C):
    out = _warp_fwd_impl(src2, grid_flat, grid_lane, H, W, C)
    return out, (src2, grid_flat, grid_lane)


def _warp_bwd(H, W, C, res, dout):
    src2, grid_flat, grid_lane = res
    B, CH, _ = src2.shape
    _, Np, _ = grid_flat.shape

    dsrc = pl.pallas_call(
        functools.partial(_dsrc_kernel, H=H, W=W, C=C),
        grid=(B, Np // TILE),
        in_specs=[
            pl.BlockSpec((1, TILE, 2), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, TILE), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, TILE), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, CH, W), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        # f32 accumulation across tiles regardless of operand dtype.
        out_shape=jax.ShapeDtypeStruct((B, CH, W), jnp.float32),
    )(grid_flat, grid_lane, dout)

    dgrid_lane = pl.pallas_call(
        functools.partial(_dgrid_kernel, H=H, W=W, C=C),
        grid=(B, Np // TILE),
        in_specs=[
            pl.BlockSpec((1, CH, W), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, 2), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, TILE), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, TILE), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, TILE), lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2, Np), grid_flat.dtype),
    )(src2, grid_flat, grid_lane, dout)

    dgrid = dgrid_lane.swapaxes(1, 2)
    return dsrc.astype(src2.dtype), dgrid, jnp.zeros_like(grid_lane)


_warp.defvjp(_warp_fwd, _warp_bwd)
