#!/usr/bin/env python
"""Measure each rung of the train-step feed ladder on the real chip.

The gap between "device-resident steps/s" and "sustained steps/s in log.txt"
is host/feed overhead; this script attributes it rung by rung:

  1. step_device_resident  — jitted GAN step on one resident batch (ceiling)
  2. loader_only           — decode+augment+collate+quantize batches/s
  3. loader_put            — + device_put per batch (no step)
  4. full_sync             — loader + blocking device_put + step (old path)
  5. full_prefetch         — loader + device_prefetch overlap (current path)

Usage: python scripts/feed_ladder.py [--config configs/actions.yaml]
       [--steps 150]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/actions.yaml")
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--workers", type=int, default=4)
    args = ap.parse_args()

    from monkeynet_tpu.utils.jax_setup import setup_jax

    jax = setup_jax()

    from monkeynet_tpu.data.dataset import FramesDataset
    from monkeynet_tpu.data.loader import (
        DataLoader,
        device_prefetch,
        quantize_feed,
    )
    from monkeynet_tpu.tasks.build import init_models
    from monkeynet_tpu.tasks.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
        multistep_lr,
    )
    from monkeynet_tpu.utils.config import load_config

    config = load_config(args.config)
    tp = config["train_params"]
    image_shape = tuple(config["dataset_params"].get("image_shape", (64, 64, 3)))
    dataset = FramesDataset(is_train=True, **config["dataset_params"])
    bs = tp["batch_size"]
    feed_uint8 = tp.get("feed_dtype") == "uint8"
    post = quantize_feed if feed_uint8 else None

    def make_loader():
        return DataLoader(
            dataset, batch_size=bs, shuffle=True, drop_last=True,
            num_workers=args.workers, seed=0, postprocess=post,
        )

    models, params, batch_stats = init_models(
        config, jax.random.PRNGKey(0), image_shape
    )
    optimizer = make_optimizer(multistep_lr(tp["lr"], tp["epoch_milestones"], 1))
    state = create_train_state(params, batch_stats, optimizer)
    step_fn = jax.jit(
        make_train_step(models, tp, optimizer, axis_name=None), donate_argnums=0
    )

    # one real batch to compile with + use as the resident batch
    loader = make_loader()
    first = next(iter(loader))
    x0 = jax.device_put({"source": first["source"], "video": first["video"]})
    state, out = step_fn(state, x0)
    jax.block_until_ready(out["metrics"])

    results = {}
    n = args.steps

    # 1. device-resident ceiling (donation consumes x each step: re-put once,
    # reuse via copy inside jit is fine since batch isn't donated)
    t0 = time.perf_counter()
    for _ in range(n):
        state, out = step_fn(state, x0)
    jax.block_until_ready(out["metrics"])
    dt = time.perf_counter() - t0
    results["step_device_resident"] = round(n / dt, 2)

    # 2. loader only
    loader = make_loader()
    stream = loader.stream(10_000)
    next(stream)
    t0 = time.perf_counter()
    for i, (_, _b) in enumerate(stream):
        if i + 1 >= n:
            break
    dt = time.perf_counter() - t0
    results["loader_only"] = round(n / dt, 2)
    del stream

    # 3. loader + device_put (blocking on the result each batch)
    loader = make_loader()
    stream = loader.stream(10_000)
    next(stream)
    t0 = time.perf_counter()
    for i, (_, b) in enumerate(stream):
        x = jax.device_put({"source": b["source"], "video": b["video"]})
        jax.block_until_ready(x)
        if i + 1 >= n:
            break
    dt = time.perf_counter() - t0
    results["loader_put"] = round(n / dt, 2)
    del stream

    # 4. full loop, synchronous feed (the pre-overlap consumer path)
    loader = make_loader()
    stream = loader.stream(10_000)
    t0 = time.perf_counter()
    for i, (_, b) in enumerate(stream):
        x = jax.device_put({"source": b["source"], "video": b["video"]})
        state, out = step_fn(state, x)
        if i + 1 >= n:
            break
    jax.block_until_ready(out["metrics"])
    dt = time.perf_counter() - t0
    results["full_sync"] = round(n / dt, 2)
    del stream

    # 5. full loop with device_prefetch (current train_loop path)
    loader = make_loader()

    def place(b):
        return jax.device_put({"source": b["source"], "video": b["video"]}), b

    t0 = time.perf_counter()
    i = 0
    for _, (x, _b) in device_prefetch(loader.stream(10_000), place):
        state, out = step_fn(state, x)
        i += 1
        if i >= n:
            break
    jax.block_until_ready(out["metrics"])
    dt = time.perf_counter() - t0
    results["full_prefetch"] = round(n / dt, 2)

    results["batch_size"] = bs
    results["feed_uint8"] = feed_uint8
    print(json.dumps(results))


if __name__ == "__main__":
    main()
