"""Pix2Pix-style 3D patch discriminator over videos.

Semantics mirror the reference Discriminator (modules/discriminator.py:34-79):
optional kp-embedding heatmaps concatenated to the input; num_blocks down
blocks — VALID (1,4,4) conv, InstanceNorm on every block but the first,
leaky-relu 0.2, (1,2,2) avg-pool; a 1x1 conv score head. Returns the list of
ALL feature maps [input, feat_1, ..., feat_n, score] for the feature-matching
reconstruction loss.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Union

import jax.numpy as jnp
from flax import linen as nn

from monkeynet_tpu.models.blocks import Conv3D, InstanceNorm, avg_pool_2x2
from monkeynet_tpu.models.movement_embedding import MovementEmbedding
from monkeynet_tpu.ops.sampling import resize_nearest


class DiscDownBlock(nn.Module):
    """VALID (1,4,4) conv -> [InstanceNorm] -> leaky-relu(0.2) -> avg-pool."""

    features: int
    norm: bool = False
    kernel_size: int = 4

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        x = Conv3D(self.features, (1, k, k), (0, 0, 0), name="conv")(x)
        if self.norm:
            x = InstanceNorm(self.features, name="norm")(x)
        x = nn.leaky_relu(x, 0.2)
        return avg_pool_2x2(x)


class Discriminator(nn.Module):
    num_channels: int = 3
    num_kp: int = 10
    kp_variance: Union[str, float] = 0.01
    scale_factor: float = 1.0
    block_expansion: int = 64
    num_blocks: int = 4
    max_features: int = 512
    kp_embedding_params: Optional[Dict[str, Any]] = None

    @nn.compact
    def __call__(self, x, kp_driving, kp_source):
        """x: (B, D, H, W, C) video. Returns [x, feat_1..feat_n, score]."""
        out_maps = [x]
        if self.scale_factor != 1:
            H, W = x.shape[-3], x.shape[-2]
            x = resize_nearest(
                x, (int(H * self.scale_factor), int(W * self.scale_factor))
            )

        if self.kp_embedding_params is not None:
            heat = MovementEmbedding(
                num_kp=self.num_kp,
                kp_variance=self.kp_variance,
                num_channels=self.num_channels,
                name="kp_embedding",
                **self.kp_embedding_params,
            )(x, kp_driving, kp_source)
            out = jnp.concatenate([x, heat], axis=-1)
        else:
            out = x

        for i in range(self.num_blocks):
            out = DiscDownBlock(
                min(self.max_features, self.block_expansion * (2 ** (i + 1))),
                norm=(i != 0),
                name=f"down{i}",
            )(out)
            out_maps.append(out)

        score = Conv3D(1, (1, 1, 1), (0, 0, 0), name="score_conv")(out)
        out_maps.append(score)
        return out_maps
