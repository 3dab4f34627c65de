"""Fused Pallas gaussian2kp: heatmap logits -> keypoint mean + covariance.

One program per (batch, frame, keypoint) consumes the (H, W) logit plane and
produces the 6 keypoint statistics in a single pass through VMEM: temperature
softmax, the reference's +1e-7 floor, soft-argmax mean, and the second-moment
covariance — the jnp reference materializes (B, D, H, W, K, 2[,2])
intermediates in HBM between each of those steps.

Forward-only (inference path); training uses the jnp reference, whose
gradients XLA derives. Matches ops.gaussian.spatial_softmax + gaussian2kp.
"""

from __future__ import annotations

import functools
from typing import Optional, Union

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from monkeynet_tpu.ops.grid import mat2_smallest_singular


def _kernel(logits_ref, mx_ref, my_ref, vxx_ref, vxy_ref, vyy_ref, *, H, W,
            temperature, with_var):
    x = logits_ref[0].astype(jnp.float32) / temperature  # (H, W)
    x = x - jnp.max(x)
    p = jnp.exp(x)
    p = p / jnp.sum(p) + 1e-7  # eps floor AFTER softmax, not renormalized

    # Mosaic requires integer iota; cast after (interpret mode allows f32).
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).astype(jnp.float32)
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).astype(jnp.float32)
    gx = 2.0 * xs / (W - 1) - 1.0
    gy = 2.0 * ys / (H - 1) - 1.0

    mx = jnp.sum(p * gx)
    my = jnp.sum(p * gy)

    # Five 1-D SMEM outputs indexed by program id. 1-D rather than a packed
    # (N, 5) table: SMEM pads the trailing dim to 128 lanes, so the packed
    # form costs 64x the memory and overflows on long transfer chunks.
    i = pl.program_id(0)
    mx_ref[i] = mx
    my_ref[i] = my
    if with_var:
        dx = gx - mx
        dy = gy - my
        vxx_ref[i] = jnp.sum(p * dx * dx)
        vxy_ref[i] = jnp.sum(p * dx * dy)
        vyy_ref[i] = jnp.sum(p * dy * dy)


def gaussian2kp_pallas(
    logits,
    temperature: float,
    kp_variance: Union[str, float] = "matrix",
    clip_variance: Optional[float] = None,
    interpret: bool = False,
):
    """logits (B, D, H, W, K) pre-softmax -> kp dict, fused on TPU.

    Equivalent to spatial_softmax(logits, temperature) -> gaussian2kp(...).
    """
    B, D, H, W, K = logits.shape
    N = B * D * K
    planes = jnp.transpose(logits, (0, 1, 4, 2, 3)).reshape(N, H, W)

    with_var = kp_variance in ("matrix", "single")
    kernel = functools.partial(
        _kernel, H=H, W=W, temperature=temperature, with_var=with_var
    )
    vec = jax.ShapeDtypeStruct((N,), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, H, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 5,
        out_shape=[vec] * 5,
        interpret=interpret,
    )(planes)

    stats = jnp.stack(outs, axis=-1).reshape(B, D, K, 5).astype(logits.dtype)
    kp = {"mean": stats[..., :2]}
    if kp_variance == "matrix":
        var = jnp.stack(
            [
                jnp.stack([stats[..., 2], stats[..., 3]], axis=-1),
                jnp.stack([stats[..., 3], stats[..., 4]], axis=-1),
            ],
            axis=-2,
        )
        if clip_variance:
            sg = mat2_smallest_singular(var)[..., None]
            var = jnp.maximum(jnp.asarray(clip_variance, var.dtype), sg) * var / sg
        kp["var"] = var
    elif kp_variance == "single":
        # reference 'single': mean of the two per-axis second moments
        kp["var"] = ((stats[..., 2] + stats[..., 4]) * 0.5)[..., None, None]
    return kp
