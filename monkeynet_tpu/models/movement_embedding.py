"""Keypoint movement embedding: kp pairs -> dense conditioning maps.

Semantics mirror the reference MovementEmbeddingModule
(modules/movement_embedding.py:8-92). For each keypoint (with an optional
leading background slot) the embedding stacks, channel-interleaved per
keypoint:

    [ heatmap (1ch) | kp difference vectors (2ch) | rigidly-shifted source (Cch) ]

The per-keypoint interleaved channel order is load-bearing: the dense-motion
module's grouped 1x1 convs (groups = K+1) and its mask/difference reshapes
assume it.

Output layout here is (B, D, H, W, (K + bg) * cpk) channels-last; the
reference's (bs, C, d, h, w) is the same data transposed.
"""

from __future__ import annotations

from typing import Optional, Union

import jax.numpy as jnp
from flax import linen as nn

from monkeynet_tpu.ops.gaussian import kp2gaussian
from monkeynet_tpu.ops.grid import make_coordinate_grid
from monkeynet_tpu.ops.sampling import resize_nearest, shift_sample


class MovementEmbedding(nn.Module):
    num_kp: int
    kp_variance: Union[str, float]
    num_channels: int
    use_deformed_source_image: bool = False
    use_difference: bool = False
    use_heatmap: bool = True
    add_bg_feature_map: bool = False
    heatmap_type: str = "gaussian"  # 'gaussian' | 'difference'
    norm_const: Union[str, float] = "sum"
    scale_factor: float = 1.0

    @property
    def out_channels(self) -> int:
        per_kp = (
            int(self.use_heatmap)
            + 2 * int(self.use_difference)
            + self.num_channels * int(self.use_deformed_source_image)
        )
        return per_kp * (self.num_kp + int(self.add_bg_feature_map))

    def _normalize_heatmap(self, heatmap):
        """heatmap: (B, D, K, H, W)."""
        if self.norm_const == "sum":
            return heatmap / jnp.sum(heatmap, axis=(-1, -2), keepdims=True)
        return heatmap / self.norm_const

    def __call__(self, source_image, kp_driving, kp_source, train: bool = True):
        """source_image: (B, T, H, W, C) (T=1 on all real paths);
        kp dicts with mean (B, D, K, 2). Returns (B, D, h, w, out_channels).

        `train=False` enables the forward-only fused Pallas heatmap kernel
        (no VJP) on TPU; training always uses the differentiable jnp path."""
        if self.heatmap_type not in ("gaussian", "difference"):
            raise ValueError(f"bad heatmap_type {self.heatmap_type}")

        if self.scale_factor != 1:
            H, W = source_image.shape[-3], source_image.shape[-2]
            source_image = resize_nearest(
                source_image,
                (int(H * self.scale_factor), int(W * self.scale_factor)),
            )

        B, T, h, w, C = source_image.shape
        D = kp_driving["mean"].shape[1]
        Kb = self.num_kp + int(self.add_bg_feature_map)

        # Keypoint math is f32 (ops/gaussian.py mixed-precision policy);
        # the dense maps rejoin the conv path in the feature dtype.
        feat_dtype = source_image.dtype

        parts = []  # each (B, D, H, W, Kb, c_i)

        if self.use_heatmap:
            from monkeynet_tpu.ops import pallas as pallas_pkg

            if not train and pallas_pkg.enabled("heatmap"):
                from monkeynet_tpu.ops.pallas.heatmap import kp2gaussian_pallas

                render = lambda kp: kp2gaussian_pallas(  # noqa: E731
                    kp, (h, w), self.kp_variance, norm_const=self.norm_const
                )
            else:
                render = lambda kp: self._normalize_heatmap(  # noqa: E731
                    kp2gaussian(kp, (h, w), self.kp_variance)
                )
            heat = render(kp_driving)  # (B, D, K, h, w)
            if self.heatmap_type == "difference":
                heat = heat - render(kp_source)
            if self.add_bg_feature_map:
                heat = jnp.concatenate(
                    [jnp.zeros_like(heat[:, :, :1]), heat], axis=2
                )
            heat = heat.astype(feat_dtype)
            parts.append(jnp.transpose(heat, (0, 1, 3, 4, 2))[..., None])

        if self.use_difference or self.use_deformed_source_image:
            kp_diff = kp_source["mean"] - kp_driving["mean"]  # (B, D, K, 2)
            if self.add_bg_feature_map:
                kp_diff = jnp.concatenate(
                    [jnp.zeros_like(kp_diff[:, :, :1]), kp_diff], axis=2
                )  # (B, D, Kb, 2)

        if self.use_difference:
            diff_maps = jnp.broadcast_to(
                kp_diff.astype(feat_dtype)[:, :, None, None], (B, D, h, w, Kb, 2)
            )
            parts.append(diff_maps)

        if self.use_deformed_source_image:
            # Rigid per-kp shift of the source. The shift is CONSTANT per
            # (frame, keypoint), so bilinear sampling separates into two
            # batched matmuls (ops.sampling.shift_sample) instead of a
            # per-pixel gather — the single hottest op in the generator.
            src = source_image.transpose(0, 2, 3, 1, 4).reshape(B, h, w, T * C)
            deformed = shift_sample(src, kp_diff.reshape(B, D * Kb, 2))
            deformed = deformed.reshape(B, D, Kb, h, w, T * C)
            parts.append(jnp.transpose(deformed, (0, 1, 3, 4, 2, 5)))

        # (B, D, h, w, Kb, cpk) -> per-kp channel interleave.
        out = jnp.concatenate(parts, axis=-1)
        return out.reshape(B, D, h, w, -1)
