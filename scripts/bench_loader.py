#!/usr/bin/env python
"""Microbenchmark the host data pipeline against a target train-step rate.

Usage:
    python scripts/bench_loader.py --config configs/shapes.yaml \
        [--batches 50] [--workers 4]

Prints batches/s for the decode+augment+collate pipeline (and items/s), so it
can be compared directly with the train step's consumption rate (steps/s in
log.txt / BENCH results). On this class of single-core hosts the loader is
the training bottleneck; this gives the number to watch.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/shapes.yaml")
    ap.add_argument("--batches", type=int, default=50)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--batch_size", type=int, default=None)
    args = ap.parse_args()

    from monkeynet_tpu.data.dataset import FramesDataset
    from monkeynet_tpu.data.loader import DataLoader
    from monkeynet_tpu.utils.config import load_config

    config = load_config(args.config)
    dataset = FramesDataset(is_train=True, **config["dataset_params"])
    bs = args.batch_size or config["train_params"]["batch_size"]
    loader = DataLoader(
        dataset, batch_size=bs, shuffle=True, num_workers=args.workers
    )

    # Warm one batch (cache fill, thread spin-up), then time. Re-iterate the
    # loader across epochs so short datasets (actions: 1 batch/epoch) still
    # measure `--batches` batches.
    it = iter(loader)
    next(it)
    t0 = time.perf_counter()
    n = 0
    while n < args.batches:
        for batch in it:
            n += 1
            if n >= args.batches:
                break
        else:
            it = iter(loader)
    dt = time.perf_counter() - t0
    print(
        f"loader: {n / dt:.2f} batches/s ({n * bs / dt:.1f} items/s) "
        f"at batch_size={bs} workers={args.workers} "
        f"({dt / n * 1000:.1f} ms/batch)"
    )


if __name__ == "__main__":
    main()
