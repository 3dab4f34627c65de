"""Fused Pallas TPU kernels for the framework's hot non-conv ops.

Each kernel has a pure-jnp reference implementation in monkeynet_tpu.ops and
a correctness diff harness in tests/test_pallas.py (values AND gradients,
interpret mode) plus an on-chip compiled parity check (RESULTS.md).

Gating (`enabled(kernel, train)`): per-kernel defaults in `_DEFAULT_ON`,
set from three layers of v5e measurement per round (RESULTS.md has the
tables).

Round-3 state: **warp is default-ON for eval AND train.** The round-2
one-hot warp kernel lost the engine-level bf16 A/B (f32-internal, forfeited
the bandwidth halving) and blew the train-graph Mosaic compile past 50 min
(Python slab unroll), so round 2 shipped everything opt-in. The round-3
SEPARABLE warp kernel (ops/pallas/warp.py: two thin (T, W)/(H, T) hat-weight
matrices instead of a dense (HW, T) one-hot) removes both objections:

- operand dtype is preserved (bf16 matmuls, f32 accumulation), and the
  engine-level A/B now goes the other way: taichi-64 bf16 transfer 3277 fps
  (XLA gather) -> 4489 fps (kernel) on v5e;
- compile is size-independent (~1 s per variant; no unroll), and the fused
  GAN train step improves 20.9 -> 23.8 steps/s (warp backward 13.1 -> 3.8 ms
  per 64^2x35 warp — the round-2 profile's scatter-add bottleneck).

heatmap / softargmax / combine remain opt-in: their microbenches are within
noise (0.8-1.4x) and the round-2 engine A/B showed no win; `_DEFAULT_ON`
gains a kernel per-mode when measurement justifies it.

MONKEYNET_PALLAS=0 force-disables everything; MONKEYNET_PALLAS=1
force-enables everything on a TPU backend (bench/ablation knob; kernels
without a VJP still guard themselves behind `not train` at the call site);
MONKEYNET_PALLAS=<name>[,<name>...] force-enables exactly that subset
(e.g. MONKEYNET_PALLAS=warp), for per-kernel attribution.
"""

import os

# kernel name -> modes it is default-enabled in ("eval", "train").
_DEFAULT_ON: dict = {"warp": ("eval", "train")}


def _on_tpu() -> bool:
    try:
        import jax

        d = jax.devices()[0]
        return d.platform == "tpu" or str(d.device_kind).startswith("TPU")
    except Exception:
        return False


def enabled(kernel: str = "warp", train: bool = False) -> bool:
    env = os.environ.get("MONKEYNET_PALLAS")
    if env == "0":
        return False
    if env == "1":
        # Force-enable is a TPU-only bench knob: Mosaic kernels have no
        # interpret fallback at the call sites, so dispatching them on a
        # CPU/GPU backend would crash eval.
        return _on_tpu()
    if env:  # comma-separated subset, e.g. "warp" or "warp,heatmap"
        return kernel in {k.strip() for k in env.split(",")} and _on_tpu()
    mode = "train" if train else "eval"
    return mode in _DEFAULT_ON.get(kernel, ()) and _on_tpu()


def pad_to(n: int, m: int) -> int:
    """Round n up to the next multiple of m (block/tile padding helper)."""
    return ((n + m - 1) // m) * m
