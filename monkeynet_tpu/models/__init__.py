"""Model components: keypoint detector, motion modules, generator, discriminator."""

from monkeynet_tpu.models.blocks import (
    Conv3D,
    Decoder,
    DownBlock,
    Encoder,
    Hourglass,
    InstanceNorm,
    ResBlock,
    SameBlock,
    SyncBatchNorm,
    UpBlock,
)
from monkeynet_tpu.models.kp_detector import KPDetector
from monkeynet_tpu.models.movement_embedding import MovementEmbedding
from monkeynet_tpu.models.dense_motion import DenseMotion, identity_deformation
from monkeynet_tpu.models.generator import MotionTransferGenerator
from monkeynet_tpu.models.discriminator import Discriminator
from monkeynet_tpu.models.prediction import KeypointPredictor

__all__ = [
    "Conv3D",
    "SyncBatchNorm",
    "InstanceNorm",
    "DownBlock",
    "UpBlock",
    "SameBlock",
    "ResBlock",
    "Encoder",
    "Decoder",
    "Hourglass",
    "KPDetector",
    "MovementEmbedding",
    "DenseMotion",
    "identity_deformation",
    "MotionTransferGenerator",
    "Discriminator",
    "KeypointPredictor",
]
