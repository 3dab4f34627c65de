"""Host-side data pipeline: video decode, augmentation, prefetching loader."""

from monkeynet_tpu.data.io import read_video
from monkeynet_tpu.data.dataset import FramesDataset, PairedDataset
from monkeynet_tpu.data.loader import DataLoader
from monkeynet_tpu.data.augmentation import (
    AllAugmentationTransform,
    SelectRandomFrames,
    VideoToTensor,
)

__all__ = [
    "read_video",
    "FramesDataset",
    "PairedDataset",
    "DataLoader",
    "AllAugmentationTransform",
    "SelectRandomFrames",
    "VideoToTensor",
]
