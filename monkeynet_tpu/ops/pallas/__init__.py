"""Fused Pallas TPU kernels for the framework's hot non-conv ops.

Each kernel has a pure-jnp reference implementation in monkeynet_tpu.ops and
a correctness diff harness in tests/test_pallas.py (values AND gradients,
interpret mode) plus an on-chip compiled parity check (RESULTS.md).

Gating (`enabled(kernel, train)`): ALL kernels are opt-in via
MONKEYNET_PALLAS=1, a decision recorded from three layers of v5e measurement
(RESULTS.md has the full tables):

- Isolated f32 microbenches (pipelined timing, dispatch latency amortized):
  `warp` beats the XLA gather at production sizes (fwd 2.2 -> 1.8 ms at 64^2,
  13.1 -> 10.5 ms at 128^2 for 16-frame C=8 warps; fwd+bwd 5.8 -> 4.6 ms at
  64^2 but 0.96x at 128^2); `heatmap` ~1.1-1.4x; `combine`/`softargmax` are a
  wash (0.8-1.4x, within the ~±20% noise of these ~1 ms ops).
- End-to-end eval: the production TransferEngine runs bf16, and these kernels
  compute in f32 internally (sub-pixel coordinate precision + Mosaic bf16
  matmul lowering limits), forfeiting the bf16 bandwidth halving XLA's fused
  gather keeps: 3776 fps with XLA vs 3116 fps with kernels on — the
  microbench win inverts at the engine level.
- Train: the fused GAN step is not warp-bound (same 21.4 steps/s either way)
  and differentiating through the slab-unrolled Mosaic VJP kernels inflated
  the remote train-step compile from ~4 min to >50 min.

The kernels stay maintained, parity-tested (values AND gradients, interpret
mode + on-chip), and VMEM/SMEM-safe at 64^2-256^2 — they are the right
starting point if a future f32 eval pipeline or a bf16-capable Mosaic matmul
lowering shifts the tradeoff; `_DEFAULT_ON` flips a kernel on per-name when
measurement justifies it.

MONKEYNET_PALLAS=0 force-disables everything (belt and suspenders);
MONKEYNET_PALLAS=1 force-enables everything, train included (bench/ablation
use; kernels without a VJP still guard themselves behind `not train` at the
call site).
"""

import os

_DEFAULT_ON: frozenset = frozenset()


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
    return kernel in _DEFAULT_ON and not train and _on_tpu()


def pad_to(n: int, m: int) -> int:
    """Round n up to the next multiple of m (block/tile padding helper)."""
    return ((n + m - 1) // m) * m
