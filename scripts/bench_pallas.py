#!/usr/bin/env python
"""Bench all four Pallas kernels against their XLA/jnp references on the real
chip, at the sizes they were designed for (64^2 baseline + 128^2 + 256^2 vox
scale). Emits one JSON line per (kernel, size) with both times and the ratio,
feeding the keep/retire decision recorded in RESULTS.md.

    python scripts/bench_pallas.py [--sizes 64,128,256] [--frames 16]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time


def _timeit(jax, fn, *args, runs=30):
    """Pipelined timing: queue `runs` dispatches, block once at the end, so
    the ~26 ms tunnel dispatch latency amortizes instead of dominating (a
    per-call block would measure latency, not kernel time)."""
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(runs):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / runs)
    return best


def bench_size(jax, jnp, S, D, K=10, B=1):
    import numpy as np

    from monkeynet_tpu.ops.gaussian import (
        gaussian2kp,
        kp2gaussian,
        spatial_softmax,
    )
    from monkeynet_tpu.ops.pallas.combine import (
        dense_motion_combine_pallas,
        dense_motion_combine_reference,
    )
    from monkeynet_tpu.ops.pallas.heatmap import kp2gaussian_pallas
    from monkeynet_tpu.ops.pallas.softargmax import gaussian2kp_pallas
    from monkeynet_tpu.ops.pallas.warp import grid_sample_pallas
    from monkeynet_tpu.ops.sampling import grid_sample

    rng = np.random.RandomState(0)
    results = []

    # --- kp2gaussian: kp -> (B, D, K, S, S) heatmaps ---
    kp = {
        "mean": jnp.asarray((rng.rand(B, D, K, 2) * 2 - 1).astype(np.float32) * 0.7)
    }
    a = rng.randn(B, D, K, 2, 2).astype(np.float32) * 0.05
    kp["var"] = jnp.asarray(
        np.matmul(a.transpose(0, 1, 2, 4, 3), a)
        + 0.02 * np.eye(2, dtype=np.float32)
    )
    ref = jax.jit(lambda kp: kp2gaussian(kp, (S, S), "matrix") / 10.0)
    pal = jax.jit(
        lambda kp: kp2gaussian_pallas(kp, (S, S), "matrix", norm_const=10.0)
    )
    t_ref, t_pal = _timeit(jax, ref, kp), _timeit(jax, pal, kp)
    results.append(("kp2gaussian", t_ref, t_pal))

    # --- gaussian2kp: (B, D, S, S, K) logits -> kp ---
    logits = jnp.asarray(rng.randn(B, D, S, S, K).astype(np.float32))
    ref = jax.jit(
        lambda x: gaussian2kp(spatial_softmax(x, 0.1), "matrix", None)
    )
    pal = jax.jit(lambda x: gaussian2kp_pallas(x, 0.1, "matrix", None))
    t_ref, t_pal = _timeit(jax, ref, logits), _timeit(jax, pal, logits)
    results.append(("gaussian2kp", t_ref, t_pal))

    # --- grid_sample warp: (B*D, S, S, C) by true per-pixel flows ---
    C = 8  # a mid-level feature map
    img = jnp.asarray(rng.rand(B * D, S, S, C).astype(np.float32))
    grid = jnp.asarray((rng.rand(B * D, S, S, 2) * 2 - 1).astype(np.float32))
    ref = jax.jit(grid_sample)
    pal = jax.jit(grid_sample_pallas)
    t_ref = _timeit(jax, ref, img, grid)
    t_pal = _timeit(jax, pal, img, grid)
    results.append(("grid_sample", t_ref, t_pal))

    # fwd+bwd (the train-path cost: XLA's backward is a scatter-add)
    ref_g = jax.jit(
        jax.grad(lambda i, g: jnp.sum(grid_sample(i, g) ** 2), argnums=(0, 1))
    )
    pal_g = jax.jit(
        jax.grad(
            lambda i, g: jnp.sum(grid_sample_pallas(i, g) ** 2), argnums=(0, 1)
        )
    )
    t_ref = _timeit(jax, ref_g, img, grid)
    t_pal = _timeit(jax, pal_g, img, grid)
    results.append(("grid_sample_fwd_bwd", t_ref, t_pal))

    # --- dense-motion combine ---
    K1 = K + 1
    lg = jnp.asarray(rng.randn(B, D, S, S, K1).astype(np.float32))
    df = jnp.asarray(rng.randn(B, D, K1, 2).astype(np.float32) * 0.3)
    cr = jnp.asarray(rng.randn(B, D, S, S, 2).astype(np.float32) * 0.1)
    ref = jax.jit(dense_motion_combine_reference)
    pal = jax.jit(lambda l, d, c: dense_motion_combine_pallas(l, d, c))
    t_ref = _timeit(jax, ref, lg, df, cr)
    t_pal = _timeit(jax, pal, lg, df, cr)
    results.append(("dense_motion_combine", t_ref, t_pal))

    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="64,128,256")
    ap.add_argument("--frames", type=int, default=16)
    args = ap.parse_args()

    from monkeynet_tpu.utils.jax_setup import setup_jax

    jax = setup_jax()
    import jax.numpy as jnp

    for S in [int(s) for s in args.sizes.split(",")]:
        for name, t_ref, t_pal in bench_size(jax, jnp, S, args.frames):
            print(
                json.dumps(
                    {
                        "kernel": name,
                        "size": S,
                        "xla_ms": round(t_ref * 1e3, 3),
                        "pallas_ms": round(t_pal * 1e3, 3),
                        "pallas_speedup": round(t_ref / t_pal, 3),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
