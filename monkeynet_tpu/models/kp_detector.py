"""Unsupervised keypoint detector.

Semantics mirror the reference KPDetector (modules/keypoint_detector.py:81-109):
optional nearest pre-downscale by `scale_factor`, hourglass -> per-kp heatmap,
spatial softmax with temperature, soft-argmax to mean (+ covariance, optionally
clipped). All tensors NDHWC; the heatmap never leaves (B, D, H, W, K) layout.
"""

from __future__ import annotations

from typing import Optional, Union

from flax import linen as nn

from monkeynet_tpu.models.blocks import Hourglass
from monkeynet_tpu.ops.gaussian import gaussian2kp, spatial_softmax
from monkeynet_tpu.ops.sampling import resize_nearest


class KPDetector(nn.Module):
    """Video -> keypoint pytree {'mean': (B,D,K,2), 'var': (B,D,K,2,2)}."""

    block_expansion: int
    num_kp: int
    num_channels: int
    max_features: int
    num_blocks: int
    temperature: float
    kp_variance: Union[str, float]
    scale_factor: float = 1.0
    clip_variance: Optional[float] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        """x: (B, D, H, W, C) video."""
        if self.scale_factor != 1:
            H, W = x.shape[-3], x.shape[-2]
            x = resize_nearest(x, (int(H * self.scale_factor), int(W * self.scale_factor)))

        heatmap = Hourglass(
            self.block_expansion,
            out_features=self.num_kp,
            num_blocks=self.num_blocks,
            max_features=self.max_features,
            axis_name=self.axis_name,
            name="predictor",
        )(x, train)

        if not train:
            from monkeynet_tpu.ops import pallas as pallas_pkg

            if pallas_pkg.enabled("softargmax"):
                # fused softmax + soft-argmax + covariance (forward-only)
                from monkeynet_tpu.ops.pallas.softargmax import gaussian2kp_pallas

                return gaussian2kp_pallas(
                    heatmap, self.temperature, self.kp_variance, self.clip_variance
                )

        heatmap = spatial_softmax(heatmap, temperature=self.temperature)
        return gaussian2kp(heatmap, self.kp_variance, self.clip_variance)
