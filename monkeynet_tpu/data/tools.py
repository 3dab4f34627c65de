"""Dataset preparation utilities.

Capability parity with the reference's data helpers:
  - split_train_test: 90/10 folder split (reference data/split.py).
  - preprocess_frames_dir: a directory of per-video frame folders -> one
    stacked-frame JPG/PNG per video, resized square (reference
    data/preprocess_vox.py, which flattens VoxCeleb frame dirs to 256^2
    stacked JPGs and warns on >100-frame videos).

Run as modules:
  python -m monkeynet_tpu.data.tools split <dir> [--test_size 0.1]
  python -m monkeynet_tpu.data.tools preprocess <in_dir> <out_dir> [--size 256]
"""

from __future__ import annotations

import os
import shutil


def split_train_test(root_dir: str, test_size: float = 0.1, seed: int = 0) -> None:
    """Move the files in root_dir into train/ and test/ subfolders."""
    from sklearn.model_selection import train_test_split

    files = sorted(
        f
        for f in os.listdir(root_dir)
        if os.path.isfile(os.path.join(root_dir, f))
    )
    if not files:
        raise ValueError(f"no files to split in {root_dir}")
    train, test = train_test_split(files, random_state=seed, test_size=test_size)
    for split, names in (("train", train), ("test", test)):
        os.makedirs(os.path.join(root_dir, split), exist_ok=True)
        for name in names:
            shutil.move(
                os.path.join(root_dir, name), os.path.join(root_dir, split, name)
            )


def preprocess_frames_dir(
    in_dir: str, out_dir: str, size: int = 256, fmt: str = "jpg",
    max_frames_warn: int = 100,
) -> None:
    """Each subfolder of in_dir holds one video's frames; write one stacked-
    frame image per video to out_dir."""
    import cv2
    import numpy as np
    import imageio.v2 as imageio

    os.makedirs(out_dir, exist_ok=True)
    for video in sorted(os.listdir(in_dir)):
        vdir = os.path.join(in_dir, video)
        if not os.path.isdir(vdir):
            continue
        frames = sorted(os.listdir(vdir))
        if len(frames) > max_frames_warn:
            print(f"WARNING: {video} has {len(frames)} frames")
        resized = []
        for frame in frames:
            img = imageio.imread(os.path.join(vdir, frame))
            resized.append(
                cv2.resize(np.asarray(img), (size, size), interpolation=cv2.INTER_AREA)
            )
        stacked = np.concatenate(resized, axis=1)
        imageio.imsave(os.path.join(out_dir, f"{video}.{fmt}"), stacked)


def main():
    from argparse import ArgumentParser

    parser = ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)
    s = sub.add_parser("split")
    s.add_argument("root_dir")
    s.add_argument("--test_size", type=float, default=0.1)
    s.add_argument("--seed", type=int, default=0)
    p = sub.add_parser("preprocess")
    p.add_argument("in_dir")
    p.add_argument("out_dir")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--format", default="jpg")
    args = parser.parse_args()
    if args.cmd == "split":
        split_train_test(args.root_dir, args.test_size, args.seed)
    else:
        preprocess_frames_dir(args.in_dir, args.out_dir, args.size, args.format)


if __name__ == "__main__":
    main()
