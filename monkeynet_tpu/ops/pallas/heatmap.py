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


def _kernel(mean_ref, var_ref, out_ref, *, H, W, matrix, norm_const):
    # mean_ref (N, 2) and var_ref (N, 3) live in SMEM (scalar access);
    # var packs [a, b_plus_c, d] (or [v, _, _] for scalar variance).
    i = pl.program_id(0)
    dtype = out_ref.dtype
    # Mosaic requires integer iota; cast after (interpret mode allows f32).
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).astype(jnp.float32)
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).astype(jnp.float32)
    gx = 2.0 * xs / (W - 1) - 1.0
    gy = 2.0 * ys / (H - 1) - 1.0
    dx = gx - mean_ref[i, 0]
    dy = gy - mean_ref[i, 1]
    if matrix:
        a = var_ref[i, 0]
        bc = var_ref[i, 1]
        d = var_ref[i, 2]
        # bc packs b + c (covariances are symmetric, so b == c == bc/2)
        det = a * d - (bc * 0.5) * (bc * 0.5)
        q = (d * dx * dx - bc * dx * dy + a * dy * dy) / det
    else:
        q = (dx * dx + dy * dy) / var_ref[i, 0]
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

    matrix = kp_variance == "matrix"
    if matrix:
        var = kp["var"].reshape(N, 2, 2).astype(jnp.float32)
        packed = jnp.stack(
            [var[:, 0, 0], var[:, 0, 1] + var[:, 1, 0], var[:, 1, 1]], axis=-1
        )
    elif kp_variance == "single":
        packed = jnp.broadcast_to(
            kp["var"].reshape(N, 1).astype(jnp.float32), (N, 3)
        )
    else:
        packed = jnp.full((N, 3), float(kp_variance), jnp.float32)

    kernel = functools.partial(
        _kernel, H=H, W=W, matrix=matrix, norm_const=norm_const
    )
    out = pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, W), mean.dtype),
        interpret=interpret,
    )(mean_flat, packed)
    return out.reshape(B, D, K, H, W)
