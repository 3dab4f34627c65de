#!/usr/bin/env python
"""Instrumented scan-of-k train loop: attribute the per-chunk wall-clock.

Replicates tasks/train_loop's chunked consumer/feeder, but times each phase:
  feeder: pull (k batches from loader), stack, put (device placement)
  consumer: wait (blocked on the prefetch queue), dispatch (step_fn call)
and the device: chunk compute time (measured separately, device-resident).

Usage: python scripts/chunk_probe.py [--config configs/actions.yaml]
       [--chunks 12] [--k 30] [--workers 2]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/actions.yaml")
    ap.add_argument("--chunks", type=int, default=12)
    ap.add_argument("--k", type=int, default=30)
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--prefetch", type=int, default=None)
    ap.add_argument("--device-feed", action="store_true",
                    help="HBM-resident dataset + on-device augmentation "
                         "from host-built plans (data/device_feed.py)")
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
        make_multi_train_step,
        make_optimizer,
        multistep_lr,
    )
    from monkeynet_tpu.utils.config import load_config

    config = load_config(args.config)
    tp = config["train_params"]
    k = args.k
    image_shape = tuple(config["dataset_params"].get("image_shape", (64, 64, 3)))
    dataset = FramesDataset(is_train=True, **config["dataset_params"])
    bs = tp["batch_size"]
    feed_uint8 = tp.get("feed_dtype") == "uint8"

    loader = DataLoader(
        dataset, batch_size=bs, shuffle=True, drop_last=True,
        num_workers=args.workers, seed=0,
        postprocess=quantize_feed if feed_uint8 else None,
    )
    loader.prefetch = args.prefetch if args.prefetch is not None else 2 * k

    models, params, batch_stats = init_models(
        config, jax.random.PRNGKey(0), image_shape
    )
    optimizer = make_optimizer(multistep_lr(tp["lr"], tp["epoch_milestones"], 1))
    state = create_train_state(params, batch_stats, optimizer)
    augment = videos_dev = None
    if args.device_feed:
        from monkeynet_tpu.data.device_feed import (
            build_video_cache,
            make_device_augment,
            plan_stream,
        )

        videos_np, lengths = build_video_cache(dataset)
        videos_dev = jax.device_put(videos_np)
        jax.block_until_ready(videos_dev)
        augment = make_device_augment(dataset.transform, image_shape)

    step_fn = jax.jit(
        make_multi_train_step(models, tp, optimizer, axis_name=None,
                              augment=augment),
        donate_argnums=0,
    )

    T = {"pull": [], "stack": [], "put": [], "wait": [], "dispatch": []}

    if args.device_feed:
        stream = plan_stream(dataset, dataset.transform, lengths, bs, 0, 0,
                             100000)
    else:
        stream = loader.stream(100000)

    def chunked():
        while True:
            t0 = time.perf_counter()
            buf = [next(stream)[1] for _ in range(k)]
            t1 = time.perf_counter()
            T["pull"].append(t1 - t0)
            yield buf

    def place(buf):
        t0 = time.perf_counter()
        keys = buf[0].keys() if args.device_feed else ("source", "video")
        x = {key: np.stack([b[key] for b in buf]) for key in keys}
        t1 = time.perf_counter()
        x = jax.device_put(x)
        jax.block_until_ready(x)
        t2 = time.perf_counter()
        T["stack"].append(t1 - t0)
        T["put"].append(t2 - t1)
        if args.device_feed:
            x = {"videos": videos_dev, "plans": x}
        return x

    # device-resident ceiling for the k-chunk program
    warm = place(next(chunked()))
    state, out = step_fn(state, warm)
    jax.block_until_ready(out["metrics"])
    resident = (
        warm if args.device_feed
        else jax.device_put(jax.tree.map(np.asarray, warm))
    )
    t0 = time.perf_counter()
    n_res = 4
    for _ in range(n_res):
        state, out = step_fn(state, resident)
    jax.block_until_ready(out["metrics"])
    chunk_compute = (time.perf_counter() - t0) / n_res
    for v in T.values():
        v.clear()

    it = iter(device_prefetch(
        ((0, buf) for buf in chunked()), lambda b: (place(b), None)
    ))
    t_start = time.perf_counter()
    done = 0
    t_prev = time.perf_counter()
    for _, (x, _b) in it:
        t0 = time.perf_counter()
        T["wait"].append(t0 - t_prev)
        state, out = step_fn(state, x)
        t1 = time.perf_counter()
        T["dispatch"].append(t1 - t0)
        t_prev = t1
        done += 1
        if done >= args.chunks:
            break
    jax.block_until_ready(out["metrics"])
    total = time.perf_counter() - t_start

    res = {
        "k": k,
        "chunk_compute_device_resident_ms": round(chunk_compute * 1e3, 1),
        "device_resident_steps_per_s": round(k / chunk_compute, 1),
        "sustained_steps_per_s": round(args.chunks * k / total, 1),
    }
    for key, vals in T.items():
        if vals:
            res[f"{key}_ms_mean"] = round(float(np.mean(vals)) * 1e3, 1)
            res[f"{key}_ms_max"] = round(float(np.max(vals)) * 1e3, 1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
