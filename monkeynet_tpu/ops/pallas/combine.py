"""Fused dense-motion combine: mask softmax x per-kp displacement + correction
+ identity grid in one VMEM pass (SURVEY §7 kernel 4; reference
modules/dense_motion_module.py:52-76).

The per-keypoint difference "fields" are spatially constant — they are just
kp_source - kp_driving broadcast over the plane — so the combine is really a
per-pixel softmax over K+1 mask logits followed by a (2, K+1) @ (K+1, hw)
matmul against the per-frame displacement table. The jnp path materializes the
softmax output and (at reference fidelity) a (B, D, h, w, K+1, 2) difference
tensor in HBM; this kernel reads the logits once, keeps everything
(exp/normalize/matmul/grid add) in VMEM, and writes only the (2, hw) flow.

Layout: channels-on-sublanes / pixels-on-lanes ((K+1, hw) logits, (2, hw)
flow). With pixels on sublanes the K+1 and 2 channel dims land on the 128-wide
lane dim and pad 11x/64x — enough to blow the 16 MB scoped-VMEM budget at
128^2. Pixels are additionally block-tiled (LANE_TILE per step) so VMEM stays
bounded at any resolution. One program per (batch-frame, pixel-tile); float32
accumulation regardless of input dtype.

Backward is closed-form softmax/matmul math in plain jnp (custom VJP below):
  p = softmax(l); rel = p @ d
  dcorr = g;  dd_k = sum_pix p_k g;  dl = p * (g.d - sum_j p_j (g.d_j))
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from monkeynet_tpu.ops.pallas import pad_to

# Pixels per kernel step: (K+1, 32768) f32 logits block is 1.4 MB at K=10.
LANE_TILE = 32768


def _kernel(logits_ref, diff_ref, corr_ref, out_ref, *, H, W, Lb):
    x = logits_ref[0].astype(jnp.float32)  # (K1, Lb)
    m = jnp.max(x, axis=0, keepdims=True)
    e = jnp.exp(x - m)
    p = e / jnp.sum(e, axis=0, keepdims=True)
    dmat = diff_ref[0].astype(jnp.float32)  # (2, K1)
    rel = jnp.dot(dmat, p, preferred_element_type=jnp.float32)  # (2, Lb)
    rel = rel + corr_ref[0].astype(jnp.float32)
    idx = (
        jax.lax.broadcasted_iota(jnp.int32, (1, Lb), 1)
        + pl.program_id(1) * Lb
    )
    xs = (idx % W).astype(jnp.float32)
    ys = (idx // W).astype(jnp.float32)
    gx = 2.0 * xs / (W - 1) - 1.0
    gy = 2.0 * ys / (H - 1) - 1.0
    grid = jnp.concatenate([gx, gy], axis=0)  # (2, Lb)
    out_ref[0] = (grid + rel).astype(out_ref.dtype)


def _forward(logits, diff, corr, interpret=False):
    B, D, H, W, K1 = logits.shape
    N = B * D
    HW = H * W
    Lb = min(HW, LANE_TILE)
    HWp = pad_to(HW, Lb)
    lg = logits.reshape(N, HW, K1).swapaxes(1, 2)  # (N, K1, HW)
    cr = corr.reshape(N, HW, 2).swapaxes(1, 2)  # (N, 2, HW)
    if HWp != HW:
        lg = jnp.pad(lg, ((0, 0), (0, 0), (0, HWp - HW)))
        cr = jnp.pad(cr, ((0, 0), (0, 0), (0, HWp - HW)))
    kernel = functools.partial(_kernel, H=H, W=W, Lb=Lb)
    out = pl.pallas_call(
        kernel,
        grid=(N, HWp // Lb),
        in_specs=[
            pl.BlockSpec((1, K1, Lb), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, K1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, Lb), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, Lb), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 2, HWp), logits.dtype),
        interpret=interpret,
    )(lg, diff.reshape(N, K1, 2).swapaxes(1, 2), cr)
    return out[:, :, :HW].swapaxes(1, 2).reshape(B, D, H, W, 2)


def dense_motion_combine_reference(logits, diff, corr):
    """Pure-jnp reference: softmax over K+1 masks, MXU-friendly einsum against
    the per-frame displacement table, + correction + identity grid."""
    from monkeynet_tpu.ops.grid import make_coordinate_grid

    p = jax.nn.softmax(logits, axis=-1)
    rel = jnp.einsum("bdhwk,bdkc->bdhwc", p, diff)
    rel = rel + corr
    grid = make_coordinate_grid(logits.shape[2:4], dtype=rel.dtype)
    return rel + grid[None, None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def dense_motion_combine_pallas(logits, diff, corr, interpret=False):
    """logits (B,D,h,w,K+1), diff (B,D,K+1,2), corr (B,D,h,w,2)
    -> absolute sampling grid (B,D,h,w,2)."""
    return _forward(logits, diff, corr, interpret)


def _fwd(logits, diff, corr, interpret):
    return _forward(logits, diff, corr, interpret), (logits, diff)


def _bwd(interpret, res, g):
    logits, diff = res
    p = jax.nn.softmax(logits, axis=-1)  # (B,D,h,w,K1)
    dcorr = g
    ddiff = jnp.einsum("bdhwk,bdhwc->bdkc", p, g)
    t = jnp.einsum("bdhwc,bdkc->bdhwk", g, diff)  # g . d_k per pixel
    dlogits = p * (t - jnp.sum(p * t, axis=-1, keepdims=True))
    return dlogits, ddiff, dcorr


dense_motion_combine_pallas.defvjp(_fwd, _bwd)
