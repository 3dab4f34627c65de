"""Datasets: per-video frame files and transfer pairs.

Behavior parity with the reference (frames_dataset.py:43-131): predefined
train/test subfolders or a random 80/20 split (same sklearn split + seed so
our train/test partition matches the reference's exactly); train items go
through the augmentation pipeline, test items are returned whole; PairedDataset
pairs videos either from a CSV pairs list or by seeded random index pairs.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from monkeynet_tpu.data.augmentation import AllAugmentationTransform, VideoToTensor
from monkeynet_tpu.data.io import read_video


class FramesDataset:
    def __init__(
        self,
        root_dir: str,
        augmentation_params: Optional[dict] = None,
        image_shape=(64, 64, 3),
        is_train: bool = True,
        random_seed: int = 0,
        pairs_list: Optional[str] = None,
        transform=None,
        cache_videos: bool = False,
    ):
        self.root_dir = root_dir
        self.image_shape = tuple(image_shape)
        self.pairs_list = pairs_list
        # Optional uint8 RAM cache: on single-core hosts the PNG decode is the
        # training bottleneck; caching trades ~H*W*3*T bytes per video for
        # decode-once semantics.
        self.cache_videos = cache_videos
        self._cache: dict = {}

        images = sorted(os.listdir(root_dir))
        if os.path.exists(os.path.join(root_dir, "train")):
            assert os.path.exists(os.path.join(root_dir, "test"))
            train_images = sorted(os.listdir(os.path.join(root_dir, "train")))
            test_images = sorted(os.listdir(os.path.join(root_dir, "test")))
            self.root_dir = os.path.join(root_dir, "train" if is_train else "test")
        else:
            from sklearn.model_selection import train_test_split

            train_images, test_images = train_test_split(
                images, random_state=random_seed, test_size=0.2
            )
        self.images = train_images if is_train else test_images

        if transform is not None:
            self.transform = transform
        elif is_train:
            self.transform = AllAugmentationTransform(**(augmentation_params or {}))
        else:
            self.transform = VideoToTensor()

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx, rng=None):
        name = os.path.join(self.root_dir, self.images[idx])
        if self.cache_videos and idx in self._cache:
            # uint8 straight into the transform: conversion to float happens
            # after frame selection (augmentation._to_float), so a T-frame
            # cached video never pays a full-video float conversion per item.
            video = self._cache[idx]
        else:
            video = read_video(name, image_shape=self.image_shape)
            if self.cache_videos:
                self._cache[idx] = (video * 255.0 + 0.5).astype(np.uint8)
                video = self._cache[idx]
        try:
            out = self.transform(video, rng=rng)
        except TypeError:
            out = self.transform(video)
        out["name"] = os.path.basename(name)
        return out


class PairedDataset:
    """(driving, source) pairs for transfer mode."""

    def __init__(self, initial_dataset: FramesDataset, number_of_pairs: int, seed: int = 0):
        self.initial_dataset = initial_dataset
        pairs_list = initial_dataset.pairs_list
        rng = np.random.RandomState(seed)

        if pairs_list is None:
            max_idx = min(number_of_pairs, len(initial_dataset))
            xy = np.mgrid[:max_idx, :max_idx].reshape(2, -1).T
            number_of_pairs = min(xy.shape[0], number_of_pairs)
            choice = rng.choice(xy.shape[0], number_of_pairs, replace=False)
            self.pairs = [tuple(p) for p in xy[choice]]
        else:
            import pandas as pd

            images = initial_dataset.images
            name_to_index = {name: i for i, name in enumerate(images)}
            pairs = pd.read_csv(pairs_list)
            pairs = pairs[
                np.logical_and(
                    pairs["source"].isin(images), pairs["driving"].isin(images)
                )
            ]
            number_of_pairs = min(pairs.shape[0], number_of_pairs)
            self.pairs = [
                (name_to_index[pairs["driving"].iloc[i]],
                 name_to_index[pairs["source"].iloc[i]])
                for i in range(number_of_pairs)
            ]

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, idx):
        driving_idx, source_idx = self.pairs[idx]
        first = self.initial_dataset[driving_idx]
        second = self.initial_dataset[source_idx]
        out = {f"driving_{k}": v for k, v in first.items()}
        out.update({f"source_{k}": v for k, v in second.items()})
        return out
