#!/usr/bin/env python
"""Focused A/B of the separable Pallas warp kernel vs the XLA gather,
f32 AND bf16 operands, fwd and fwd+bwd, with compile wall-clock per variant
(the round-2 one-hot kernel's train-graph compile blew past 50 min; the
separable kernel's compile must be size-independent).

    python scripts/bench_warp.py [--sizes 64,128] [--frames 16] [--ch 8]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time


def _timeit(jax, fn, *args, runs=30):
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="64,128")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--ch", type=int, default=8)
    args = ap.parse_args()

    from monkeynet_tpu.utils.jax_setup import setup_jax

    jax = setup_jax()
    import jax.numpy as jnp
    import numpy as np

    from monkeynet_tpu.ops.pallas.warp import grid_sample_pallas
    from monkeynet_tpu.ops.sampling import grid_sample

    rng = np.random.RandomState(0)
    for S in [int(s) for s in args.sizes.split(",")]:
        B, C = args.frames, args.ch
        img_np = rng.rand(B, S, S, C).astype(np.float32)
        grid_np = (rng.rand(B, S, S, 2) * 2 - 1).astype(np.float32)
        for dtype in (jnp.float32, jnp.bfloat16):
            img = jnp.asarray(img_np, dtype=dtype)
            grid = jnp.asarray(grid_np)  # coords stay f32
            for tag, fn in (("xla", grid_sample), ("pallas", grid_sample_pallas)):
                fwd = jax.jit(fn)
                t0 = time.perf_counter()
                jax.block_until_ready(fwd(img, grid))
                c_fwd = time.perf_counter() - t0
                t_fwd = _timeit(jax, fwd, img, grid)

                g = jax.jit(
                    jax.grad(
                        lambda i, gr: jnp.sum(
                            fn(i, gr).astype(jnp.float32) ** 2
                        ),
                        argnums=(0, 1),
                    )
                )
                t0 = time.perf_counter()
                jax.block_until_ready(g(img, grid))
                c_bwd = time.perf_counter() - t0
                t_bwd = _timeit(jax, g, img, grid)
                print(
                    json.dumps(
                        {
                            "size": S,
                            "dtype": str(jnp.dtype(dtype).name),
                            "impl": tag,
                            "fwd_ms": round(t_fwd * 1e3, 3),
                            "fwdbwd_ms": round(t_bwd * 1e3, 3),
                            "compile_fwd_s": round(c_fwd, 1),
                            "compile_bwd_s": round(c_bwd, 1),
                        }
                    ),
                    flush=True,
                )


if __name__ == "__main__":
    main()
