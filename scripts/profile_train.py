#!/usr/bin/env python
"""Ablation profile of the fused train step: where do the milliseconds go?

Times jitted sub-programs of the taichi-size train step (batch 32, 64^2,
synthetic device-resident data) so the bottleneck is attributable without
trace spelunking on a tunneled backend. Optionally captures a jax.profiler
trace of the full step (--trace DIR).

    python scripts/profile_train.py [--trace /tmp/trace]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np

H = W = 64
B = 32


def timeit(jax, fn, *args, runs=20):
    """Pipelined timing: queue `runs` dispatches, block once at the end, so
    the ~30ms tunnel dispatch latency amortizes instead of dominating."""
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / runs * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None)
    ap.add_argument("--batch", type=int, default=B)
    ap.add_argument("--bf16", action="store_true",
                    help="train step with compute_dtype=bfloat16")
    ap.add_argument("--remat", action="store_true")
    args = ap.parse_args()

    from monkeynet_tpu.utils.jax_setup import setup_jax

    jax = setup_jax()
    import jax.numpy as jnp

    from monkeynet_tpu.tasks.build import init_models
    from monkeynet_tpu.tasks.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
        multistep_lr,
        split_kp,
    )
    from monkeynet_tpu.utils.config import load_config

    config = load_config("configs/taichi.yaml")
    tp = dict(config["train_params"])
    models, params, stats = init_models(config, jax.random.PRNGKey(0), (H, W, 3))
    gen, disc, kp_det = (
        models["generator"], models["discriminator"], models["kp_detector"]
    )
    gen_vars = {"params": params["generator"], "batch_stats": stats["generator"]}
    disc_vars = {"params": params["discriminator"],
                 "batch_stats": stats.get("discriminator", {})}
    kp_vars = {"params": params["kp_detector"], "batch_stats": stats["kp_detector"]}

    b = args.batch
    rng = np.random.RandomState(0)
    source = jnp.asarray(rng.rand(b, 1, H, W, 3).astype(np.float32))
    video = jnp.asarray(rng.rand(b, 1, H, W, 3).astype(np.float32))
    both = jnp.concatenate([source, video], axis=1)

    results = {}

    # --- full train step ---
    if args.bf16:
        tp["compute_dtype"] = "bfloat16"
    if args.remat:
        tp["remat"] = True
    optimizer = make_optimizer(multistep_lr(tp["lr"], tp["epoch_milestones"], 100))
    state = create_train_state(params, stats, optimizer)
    step = jax.jit(make_train_step(models, tp, optimizer))
    results["full_train_step"] = timeit(
        jax, lambda s: step(s, {"source": source, "video": video})[1]["metrics"],
        state,
    )

    # --- forward pieces (eval-mode, batched like the step) ---
    kp_fwd = jax.jit(lambda v, x: kp_det.apply(v, x, False))
    kp_joined = kp_fwd(kp_vars, both)
    kps = split_kp(kp_joined, False)
    results["kp_detector_fwd"] = timeit(jax, kp_fwd, kp_vars, both)

    gen_fwd = jax.jit(lambda v, s, kd, ks: gen.apply(v, s, kd, ks, train=False))
    gen_out = gen_fwd(gen_vars, source, kps["kp_driving"], kps["kp_source"])
    results["generator_fwd"] = timeit(
        jax, gen_fwd, gen_vars, source, kps["kp_driving"], kps["kp_source"]
    )

    disc_fwd = jax.jit(
        lambda v, x, kd, ks: disc.apply(v, x, kd, ks)[-1]
    )
    results["discriminator_fwd"] = timeit(
        jax, disc_fwd, disc_vars, video, kps["kp_driving"], kps["kp_source"]
    )

    # --- generator internals: isolate the skip-warp gather cost ---
    from monkeynet_tpu.ops.pallas.warp import grid_sample_pallas
    from monkeynet_tpu.ops.sampling import grid_sample

    feat = jnp.asarray(rng.rand(b, 64, 64, 35).astype(np.float32))
    flows = jnp.asarray((rng.rand(b, 64, 64, 2) * 2 - 1).astype(np.float32))
    results["one_warp_64x64x35_xla"] = timeit(
        jax, jax.jit(grid_sample), feat, flows
    )
    results["one_warp_64x64x35_pallas"] = timeit(
        jax, jax.jit(grid_sample_pallas), feat, flows
    )
    # scale reference: a 3x3 conv moving the same activation bytes
    kern = jnp.asarray(rng.randn(3, 3, 35, 35).astype(np.float32) * 0.1)
    conv = jax.jit(
        lambda x, k: jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    )
    results["conv3x3_64x64x35"] = timeit(jax, conv, feat, kern)

    # warp fwd+bwd for both implementations (backward = scatter-add for the
    # image cotangent; the suspected train-path bottleneck)
    for name, sampler in (("xla", grid_sample), ("pallas", grid_sample_pallas)):
        g = jax.jit(
            jax.grad(lambda im, gr: jnp.sum(sampler(im, gr) ** 2), argnums=(0, 1))
        )
        results[f"one_warp_fwd_bwd_{name}"] = timeit(jax, g, feat, flows)

    # grad-enabled generator (fwd+bwd) to see backward amplification
    def gen_loss(p, s, kd, ks):
        out = gen.apply(
            {"params": p, "batch_stats": gen_vars["batch_stats"]},
            s, kd, ks, train=False,
        )
        return jnp.mean(jnp.abs(out["video_prediction"] - video))

    gen_grad = jax.jit(jax.grad(gen_loss))
    results["generator_fwd_bwd"] = timeit(
        jax, gen_grad, gen_vars["params"], source,
        kps["kp_driving"], kps["kp_source"],
    )

    if args.trace:
        jax.profiler.start_trace(args.trace)
        for _ in range(5):
            state, out = step(state, {"source": source, "video": video})
        jax.block_until_ready(out["metrics"])
        jax.profiler.stop_trace()
        results["trace_dir"] = args.trace

    sps = 1000.0 / results["full_train_step"]
    results["steps_per_sec"] = round(sps, 2)
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
