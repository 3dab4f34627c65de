"""Fused Pallas kp2gaussian: keypoint -> gaussian heatmap in one pass.

One program per (batch, frame, keypoint) renders the full (H, W) plane:
coordinate grid (broadcasted iota), mahalanobis quadratic form, exp, and the
optional 'sum'/constant normalization — without materializing the
(B, D, K, H, W, 2) displacement intermediates the jnp reference streams
through HBM. Used by the movement-embedding call sites behind
ops.pallas.enabled().

Semantics match ops.gaussian.kp2gaussian ('matrix' / 'single' / scalar
variance) plus the normalize step of MovementEmbedding._normalize_heatmap.
"""

from __future__ import annotations

import functools
from typing import Optional, Union

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(mx_ref, my_ref, va_ref, vbc_ref, vd_ref, out_ref, *, H, W,
            matrix, norm_const):
    # Per-kp scalars arrive as five 1-D SMEM arrays indexed by program id.
    # 1-D rather than a packed (N, k) table: SMEM pads the trailing dim to
    # 128 lanes, so (1280, 2) costs 640 KB of the 1 MB budget while 5x(1280,)
    # costs 25 KB (N = B*D*K reaches 1280 in 128-frame transfer chunks).
    i = pl.program_id(0)
    dtype = out_ref.dtype
    # Mosaic requires integer iota; cast after (interpret mode allows f32).
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).astype(jnp.float32)
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).astype(jnp.float32)
    gx = 2.0 * xs / (W - 1) - 1.0
    gy = 2.0 * ys / (H - 1) - 1.0
    dx = gx - mx_ref[i]
    dy = gy - my_ref[i]
    if matrix:
        a = va_ref[i]
        bc = vbc_ref[i]
        d = vd_ref[i]
        # bc packs b + c (covariances are symmetric, so b == c == bc/2)
        det = a * d - (bc * 0.5) * (bc * 0.5)
        q = (d * dx * dx - bc * dx * dy + a * dy * dy) / det
    else:
        q = (dx * dx + dy * dy) / va_ref[i]
    heat = jnp.exp(-0.5 * q)
    if norm_const == "sum":
        heat = heat / jnp.sum(heat)
    elif norm_const is not None:
        heat = heat / norm_const
    out_ref[0] = heat.astype(dtype)


def kp2gaussian_pallas(
    kp,
    spatial_size,
    kp_variance: Union[str, float] = "matrix",
    norm_const: Optional[Union[str, float]] = None,
    interpret: bool = False,
):
    """Render (+ optionally normalize) keypoint gaussians.

    Returns (B, D, K, H, W), same as ops.gaussian.kp2gaussian followed by
    MovementEmbedding._normalize_heatmap when norm_const is given.
    """
    mean = kp["mean"]
    B, D, K, _ = mean.shape
    H, W = spatial_size
    N = B * D * K
    mean_flat = mean.reshape(N, 2).astype(jnp.float32)
    mx, my = mean_flat[:, 0], mean_flat[:, 1]

    matrix = kp_variance == "matrix"
    if matrix:
        var = kp["var"].reshape(N, 2, 2).astype(jnp.float32)
        va = var[:, 0, 0]
        vbc = var[:, 0, 1] + var[:, 1, 0]
        vd = var[:, 1, 1]
    elif kp_variance == "single":
        va = kp["var"].reshape(N).astype(jnp.float32)
        vbc = vd = jnp.zeros_like(va)
    else:
        va = jnp.full((N,), float(kp_variance), jnp.float32)
        vbc = vd = jnp.zeros_like(va)

    kernel = functools.partial(
        _kernel, H=H, W=W, matrix=matrix, norm_const=norm_const
    )
    out = pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 5,
        out_specs=pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, W), mean.dtype),
        interpret=interpret,
    )(mx, my, va, vbc, vd)
    return out.reshape(B, D, K, H, W)
