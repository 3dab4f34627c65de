"""Dense motion module: sparse keypoint displacements -> dense backward flow.

Semantics mirror the reference DenseMotionModule
(modules/dense_motion_module.py:8-87):

  mask_embedding -> [grouped 1x1 SameBlocks + leaky_relu] -> hourglass
  -> softmax over K+1 mask channels
  flow = sum_k mask_k * per-kp-difference-field_k (+ correction) + identity grid

The hourglass's final conv is zero-initialized with bias `bg_init` on the
background mask logit so training starts from the identity deformation.

TPU divergence: we return the absolute sampling grid as (B, D, h, w, 2) xy —
the reference appends a constant z=0 third channel purely to drive torch's 3D
grid_sample over a single-frame source; our `warp_video` makes that channel
(and the trilinear machinery behind it) unnecessary.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from monkeynet_tpu.models.blocks import Hourglass, SameBlock
from monkeynet_tpu.models.movement_embedding import MovementEmbedding
from monkeynet_tpu.ops.grid import make_coordinate_grid
from monkeynet_tpu.ops.sampling import resize_nearest


def identity_deformation(source_image, kp_driving):
    """Identity sampling grid (B, D, h, w, 2) — the dense-motion-less fallback.

    Always f32: sampling coordinates are precision-critical under mixed
    precision (see ops/gaussian.py policy)."""
    B, _, h, w, _ = source_image.shape
    D = kp_driving["mean"].shape[1]
    grid = make_coordinate_grid((h, w), dtype=jnp.float32)
    return jnp.broadcast_to(grid[None, None], (B, D, h, w, 2))


class DenseMotion(nn.Module):
    block_expansion: int
    num_blocks: int
    max_features: int
    mask_embedding_params: Dict[str, Any]
    num_kp: int
    num_channels: int
    kp_variance: Union[str, float]
    use_correction: bool
    use_mask: bool
    bg_init: float = 2.0
    num_group_blocks: int = 0
    scale_factor: float = 1.0
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, source_image, kp_driving, kp_source, train: bool):
        """source_image (B, 1, H, W, C); returns (B, D, h, w, 2) sampling grid."""
        if self.scale_factor != 1:
            H, W = source_image.shape[-3], source_image.shape[-2]
            source_image = resize_nearest(
                source_image,
                (int(H * self.scale_factor), int(W * self.scale_factor)),
            )

        mask_embedding = MovementEmbedding(
            num_kp=self.num_kp,
            kp_variance=self.kp_variance,
            num_channels=self.num_channels,
            add_bg_feature_map=True,
            name="mask_embedding",
            **self.mask_embedding_params,
        )
        embed = mask_embedding(source_image, kp_driving, kp_source, train=train)

        for i in range(self.num_group_blocks):
            embed = SameBlock(
                mask_embedding.out_channels,
                groups=self.num_kp + 1,
                kernel_size=(1, 1, 1),
                padding=(0, 0, 0),
                axis_name=self.axis_name,
                name=f"group_block{i}",
            )(embed, train)
            embed = nn.leaky_relu(embed, 0.2)

        num_mask_ch = (self.num_kp + 1) * int(self.use_mask)
        out_ch = num_mask_ch + 2 * int(self.use_correction)
        bias_init_vals = (
            [self.bg_init] + [0.0] * self.num_kp
        ) * int(self.use_mask) + [0.0, 0.0] * int(self.use_correction)

        prediction = Hourglass(
            self.block_expansion,
            out_features=out_ch,
            num_blocks=self.num_blocks,
            max_features=self.max_features,
            axis_name=self.axis_name,
            final_kernel_init=nn.initializers.zeros,
            final_bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(
                bias_init_vals, dtype
            ),
            name="hourglass",
        )(embed, train)

        B, D, h, w, _ = prediction.shape

        if self.use_mask:
            # The per-kp difference "fields" of the reference
            # (dense_motion_module.py:52-68 via its difference embedding) are
            # spatially constant: kp_source - kp_driving, bg slot zero. The
            # combine is therefore softmax(masks) @ displacement-table — an
            # MXU einsum (jnp) or one fused VMEM pass (Pallas).
            # Sampling coordinates stay f32 under mixed precision (kp means
            # are f32 by the ops/gaussian.py policy; bf16 would quantize the
            # flow by ~0.25 px at 64^2). Conv features remain compute-dtype.
            kp_diff = kp_source["mean"] - kp_driving["mean"]  # (B, D, K, 2)
            kp_diff = jnp.concatenate(
                [jnp.zeros_like(kp_diff[:, :, :1]), kp_diff], axis=2
            ).astype(jnp.float32)
            logits = prediction[..., : self.num_kp + 1]
            if self.use_correction:
                corr = prediction[..., -2:].astype(jnp.float32)
            else:
                corr = jnp.zeros((B, D, h, w, 2), jnp.float32)
            from monkeynet_tpu.ops import pallas as _pallas

            if _pallas.enabled("combine", train):
                from monkeynet_tpu.ops.pallas.combine import (
                    dense_motion_combine_pallas,
                )

                return dense_motion_combine_pallas(
                    logits.astype(jnp.float32), kp_diff, corr
                )
            mask = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            relative = jnp.einsum("bdhwk,bdkc->bdhwc", mask, kp_diff) + corr
        else:
            relative = jnp.zeros((B, D, h, w, 2), jnp.float32)
            if self.use_correction:
                relative = relative + prediction[..., -2:].astype(jnp.float32)

        grid = make_coordinate_grid((h, w), dtype=relative.dtype)
        return relative + grid[None, None]
