"""Motion-transfer generator: source frame + kp pair -> animated frames.

Semantics mirror the reference MotionTransferGenerator (modules/generator.py:
10-82): appearance encoder over the source frame; dense backward flow from the
dense-motion module; EVERY encoder skip is warped by the (resized) flow;
optional kp-embedding maps concatenated to every skip; U-Net decode; ResBlock
refinement head; sigmoid output. Returns both the refined prediction and the
directly-warped source (`video_deformed`).

TPU-first: all frames in D are generated in one batched XLA program (the
reference loops frames in Python at eval — reconstruction.py:12-25); warps are
2D bilinear gathers via `warp_video` (no 3D grid_sample / z channel).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Union

import jax.numpy as jnp
from flax import linen as nn

from monkeynet_tpu.models.blocks import Conv3D, Decoder, Encoder, ResBlock
from monkeynet_tpu.models.dense_motion import DenseMotion, identity_deformation
from monkeynet_tpu.models.movement_embedding import MovementEmbedding
from monkeynet_tpu.ops.sampling import resize_video, warp_video


class MotionTransferGenerator(nn.Module):
    num_channels: int
    num_kp: int
    kp_variance: Union[str, float]
    block_expansion: int
    max_features: int
    num_blocks: int
    num_refinement_blocks: int
    dense_motion_params: Optional[Dict[str, Any]] = None
    kp_embedding_params: Optional[Dict[str, Any]] = None
    interpolation_mode: str = "nearest"
    axis_name: Optional[str] = None

    def _deform_input(self, inp, deformation, train: bool):
        """Warp (B, 1, h, w, C) input by flow (B, D, hf, wf, 2), resizing the
        flow to the input's spatial size first (reference: deform_input,
        modules/generator.py:51-58)."""
        h, w = inp.shape[2], inp.shape[3]
        flow = resize_video(deformation, (h, w), mode=self.interpolation_mode)
        return warp_video(inp[:, 0], flow, train=train)

    @nn.compact
    def __call__(self, source_image, kp_driving, kp_source, train: bool):
        """source_image (B, 1, H, W, C); kp dicts (B, D, K, ...).

        Returns {'video_prediction', 'video_deformed'}: (B, D, H, W, C)."""
        appearance_skips = Encoder(
            self.block_expansion,
            num_blocks=self.num_blocks,
            max_features=self.max_features,
            axis_name=self.axis_name,
            name="appearance_encoder",
        )(source_image, train)

        if self.dense_motion_params is not None:
            deformation = DenseMotion(
                num_kp=self.num_kp,
                num_channels=self.num_channels,
                kp_variance=self.kp_variance,
                axis_name=self.axis_name,
                name="dense_motion",
                **self.dense_motion_params,
            )(source_image, kp_driving, kp_source, train)
        else:
            deformation = identity_deformation(source_image, kp_driving)

        skips = [
            self._deform_input(skip, deformation, train)
            for skip in appearance_skips
        ]

        if self.kp_embedding_params is not None:
            embedding = MovementEmbedding(
                num_kp=self.num_kp,
                kp_variance=self.kp_variance,
                num_channels=self.num_channels,
                name="kp_embedding",
                **self.kp_embedding_params,
            )(source_image, kp_driving, kp_source, train=train)  # (B, D, H, W, E)
            skips = [
                jnp.concatenate(
                    [
                        skip,
                        resize_video(
                            embedding,
                            (skip.shape[2], skip.shape[3]),
                            mode=self.interpolation_mode,
                        ),
                    ],
                    axis=-1,
                )
                for skip in skips
            ]

        video_deformed = self._deform_input(source_image, deformation, train)

        out = Decoder(
            self.block_expansion,
            out_features=self.num_channels,
            num_blocks=self.num_blocks,
            max_features=self.max_features,
            use_last_conv=False,
            axis_name=self.axis_name,
            name="video_decoder",
        )(skips, train)

        for i in range(self.num_refinement_blocks):
            out = ResBlock(
                out.shape[-1], axis_name=self.axis_name, name=f"refine{i}"
            )(out, train)
        out = Conv3D(
            self.num_channels, (1, 1, 1), (0, 0, 0), name="final_conv"
        )(out)
        video_prediction = nn.sigmoid(out)

        return {
            "video_prediction": video_prediction,
            "video_deformed": video_deformed,
        }
