#!/usr/bin/env python
"""Microbench: three exact formulations of `conv3x3 SAME on nearest-2x input`.

The UpBlock hot op (reference modules/util.py UpBlock3D: interpolate(scale=2)
-> conv3x3) admits three TPU formulations with identical math:

  a) materialized: broadcast-reshape nearest upsample, then 3x3 conv at the
     doubled resolution (36 taps/output-pixel worth of MACs at 4x pixels).
  b) phase: one 2x2 conv at the LOW resolution producing 4*Cout phase
     channels (tap sums), then an explicit depth-to-space interleave
     (16 taps/output, but the interleave is a relayout op at full res).
  c) lhs-dilated: one conv_general_dilated with lhs_dilation=(2,2) and a
     4x4 kernel whose taps are the row/col sums T @ k @ T^T,
     T = [[1,0,0],[1,1,0],[0,1,1],[0,0,1]] — the transposed-conv identity
     `conv3x3(nearest2(x)) == convT(x, k conv box2x2, stride 2)`. XLA's conv
     emitter owns the phase bookkeeping; no explicit relayout is emitted.

Prints fwd and fwd+bwd ms per variant at the decoder shapes of the taichi
train step, f32 and bf16, plus a value check of (b) and (c) against (a).

    python scripts/bench_upconv.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np


def timeit(jax, fn, *args, runs=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / runs * 1e3


def main():
    from monkeynet_tpu.utils.jax_setup import setup_jax

    jax = setup_jax()
    import jax.numpy as jnp
    from jax import lax

    from monkeynet_tpu.ops.sampling import resize_nearest

    DN = ("NHWC", "HWIO", "NHWC")

    def up_conv_a(x, k):
        H, W = x.shape[1], x.shape[2]
        up = resize_nearest(x, (2 * H, 2 * W))
        return lax.conv_general_dilated(
            up, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=DN
        )

    def up_conv_b(x, k):
        co = k.shape[-1]
        r0 = jnp.stack([k[0], k[1] + k[2]], axis=0)
        r1 = jnp.stack([k[0] + k[1], k[2]], axis=0)

        def col_sums(kk):
            c0 = jnp.stack([kk[:, 0], kk[:, 1] + kk[:, 2]], axis=1)
            c1 = jnp.stack([kk[:, 0] + kk[:, 1], kk[:, 2]], axis=1)
            return c0, c1

        k00, k01 = col_sums(r0)
        k10, k11 = col_sums(r1)
        dense = jnp.concatenate([k00, k01, k10, k11], axis=-1)
        y = lax.conv_general_dilated(
            x, dense, (1, 1), ((1, 1), (1, 1)), dimension_numbers=DN
        )
        N, Hp, Wp, _ = y.shape
        H, W = Hp - 1, Wp - 1
        y = y.reshape(N, Hp, Wp, 2, 2, co)
        ph = jnp.stack(
            [y[:, :H, :W, 0, 0], y[:, :H, 1:, 0, 1],
             y[:, 1:, :W, 1, 0], y[:, 1:, 1:, 1, 1]],
            axis=3,
        ).reshape(N, H, W, 2, 2, co)
        return ph.transpose(0, 1, 3, 2, 4, 5).reshape(N, 2 * H, 2 * W, co)

    T = jnp.asarray(
        [[1, 0, 0], [1, 1, 0], [0, 1, 1], [0, 0, 1]], dtype=jnp.float32
    )

    def up_conv_c(x, k):
        k4 = jnp.einsum("ua,vb,abio->uvio", T.astype(k.dtype), T.astype(k.dtype), k)
        return lax.conv_general_dilated(
            x, k4, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
            dimension_numbers=DN,
        )

    variants = {"a_materialized": up_conv_a, "b_phase": up_conv_b,
                "c_lhs_dilated": up_conv_c}

    # taichi-step decoder shapes (B*D=32 frames; generator video_decoder +
    # dense-motion hourglass decoder + kp-detector decoder, 64^2 recipe).
    shapes = [
        (32, 2, 2, 1024, 512),
        (32, 4, 4, 1024, 512),
        (32, 8, 8, 768, 256),
        (32, 16, 16, 384, 128),
        (32, 32, 32, 192, 64),
        (64, 32, 32, 96, 35),
    ]

    rng = np.random.RandomState(0)
    results = {}
    # value check at one shape, f32. TPU's DEFAULT conv precision is
    # single-pass bf16, where summing taps before vs after rounding differs
    # by ~bf16 eps — force true-f32 passes so the check tests the MATH.
    xv = jnp.asarray(rng.randn(2, 5, 7, 6).astype(np.float32))
    kv = jnp.asarray(rng.randn(3, 3, 6, 4).astype(np.float32))
    with jax.default_matmul_precision("highest"):
        ref = np.asarray(up_conv_a(xv, kv))
        for name, fn in variants.items():
            got = np.asarray(fn(xv, kv))
            err = float(np.abs(got - ref).max())
            results[f"check_{name}_max_abs_err"] = err
            assert err < 1e-4, (name, err)

    for dtype in (jnp.float32, jnp.bfloat16):
        dname = np.dtype(dtype).name if dtype == jnp.float32 else "bf16"
        for (n, h, w, ci, co) in shapes:
            x = jnp.asarray(rng.randn(n, h, w, ci).astype(np.float32)).astype(dtype)
            k = jnp.asarray(
                (rng.randn(3, 3, ci, co) * 0.05).astype(np.float32)
            ).astype(dtype)
            key = f"{dname}_{n}x{h}x{w}x{ci}->{co}"
            row = {}
            for name, fn in variants.items():
                f = jax.jit(fn)
                row[f"{name}_fwd_ms"] = round(timeit(jax, f, x, k), 4)
                g = jax.jit(jax.grad(
                    lambda xx, kk: jnp.sum(fn(xx, kk).astype(jnp.float32) ** 2),
                    argnums=(0, 1),
                ))
                row[f"{name}_fwdbwd_ms"] = round(timeit(jax, g, x, k), 4)
            results[key] = row
            print(key, json.dumps(row), flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
