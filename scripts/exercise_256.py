#!/usr/bin/env python
"""256x256 mixed-precision + remat training exercise (vox-scale shapes).

VoxCeleb itself is not distributable, so this synthesizes a 256^2 stacked-
frame dataset of moving textured shapes and trains the vox recipe's model on
the real chip for a bounded number of steps, for each (compute_dtype, remat)
combination, recording steps/s and device memory stats. This validates the
memory/throughput behavior the vox config's `remat: true` +
`compute_dtype: bfloat16` were designed for.

    python scripts/exercise_256.py --steps 60 --batch 4 [--combos all]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import copy
import json
import tempfile
import time

import numpy as np


def make_dataset(root: str, n_train: int = 24, T: int = 2, S: int = 256):
    """Moving textured squares at 256^2, stacked-frame JPG like vox."""
    import imageio.v2 as imageio

    rng = np.random.RandomState(0)
    for split, n in (("train", n_train), ("test", 4)):
        os.makedirs(os.path.join(root, split), exist_ok=True)
        for i in range(n):
            video = np.zeros((T, S, S, 3), np.float32)
            base = rng.rand(S, S, 3) * 0.2
            x0, y0 = rng.randint(20, S - 120, size=2)
            tex = rng.rand(80, 80, 3) * 0.8 + 0.2
            for t in range(T):
                video[t] = base
                x, y = x0 + 12 * t, y0 + 9 * t
                video[t, y : y + 80, x : x + 80] = tex
            stacked = np.concatenate(list(video), axis=1)
            imageio.imsave(
                os.path.join(root, split, f"{split}{i:03d}.jpg"),
                (stacked * 255).astype(np.uint8),
            )


def run_combo(config, dataset, steps, dtype, remat, log_root):
    import jax

    from monkeynet_tpu.tasks.train_loop import train

    config = copy.deepcopy(config)
    tp = config["train_params"]
    if dtype:
        tp["compute_dtype"] = dtype
    else:
        tp.pop("compute_dtype", None)
    tp["remat"] = remat
    # Bound the run: epochs sized so steps_per_epoch * epochs ~ steps.
    spe = max(1, len(dataset) // tp["batch_size"])
    tp["num_epochs"] = max(1, -(-steps // spe))
    tp["epoch_milestones"] = [10**6]
    tp["log_params"] = {"log_freq_iter": 20, "cpk_freq_epoch": 10**6}

    tag = f"dtype={dtype or 'f32'}_remat={remat}"
    t0 = time.perf_counter()
    try:
        train(config, os.path.join(log_root, tag), dataset)
    except Exception as e:
        return {"combo": tag, "ok": False, "error": f"{type(e).__name__}: {e}"}
    wall = time.perf_counter() - t0
    n_steps = tp["num_epochs"] * spe
    stats = {}
    try:
        ms = jax.local_devices()[0].memory_stats() or {}
        stats = {
            k: ms[k]
            for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
            if k in ms
        }
    except Exception:
        pass
    return {
        "combo": tag,
        "ok": True,
        "steps": n_steps,
        "steps_per_sec_incl_compile": round(n_steps / wall, 3),
        "memory": stats,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--data_dir", default=None)
    ap.add_argument(
        "--combos",
        default="all",
        help="'all' or comma list like 'bfloat16:true,none:false'",
    )
    args = ap.parse_args()

    from monkeynet_tpu.utils.jax_setup import setup_jax

    setup_jax()

    from monkeynet_tpu.data.dataset import FramesDataset
    from monkeynet_tpu.utils.config import load_config

    root = args.data_dir or tempfile.mkdtemp(prefix="synth256_")
    if not os.path.isdir(os.path.join(root, "train")):
        make_dataset(root)

    config = load_config("configs/vox.yaml")
    config["dataset_params"]["root_dir"] = root
    config["train_params"]["batch_size"] = args.batch

    dataset = FramesDataset(is_train=True, **config["dataset_params"])

    if args.combos == "all":
        combos = [("bfloat16", True), ("bfloat16", False),
                  (None, True), (None, False)]
    else:
        combos = []
        for spec in args.combos.split(","):
            d, r = spec.split(":")
            combos.append((None if d == "none" else d, r == "true"))

    log_root = tempfile.mkdtemp(prefix="ex256_log_")
    if len(combos) > 1:
        # One combo per process: running several 256^2 train programs in one
        # process wedged the tunneled backend (the second combo died with a
        # generic FAILED_PRECONDITION even at sizes that run fine fresh).
        import subprocess
        import sys as _sys

        for dtype, remat in combos:
            spec = f"{dtype or 'none'}:{'true' if remat else 'false'}"
            subprocess.run(
                [_sys.executable, os.path.abspath(__file__),
                 "--steps", str(args.steps), "--batch", str(args.batch),
                 "--data_dir", root, "--combos", spec],
                check=False,
            )
        return

    for dtype, remat in combos:
        res = run_combo(config, dataset, args.steps, dtype, remat, log_root)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
