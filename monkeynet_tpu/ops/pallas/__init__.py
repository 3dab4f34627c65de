"""Fused Pallas TPU kernels for the framework's hot non-conv ops.

Each kernel has a pure-jnp reference implementation in monkeynet_tpu.ops and
a correctness diff harness in tests/test_pallas.py (values AND gradients,
interpret mode) plus an on-chip compiled parity check (RESULTS.md).

Gating (`enabled(kernel)`): on TPU backends the kernels that measured FASTER
than XLA at production sizes and have exact/custom-VJP semantics are ON by
default — `warp` (one-hot-matmul bilinear gather + scatter VJP: 5.6 -> 3.4 ms
fwd, 12.8 -> 8.9 ms fwd+bwd for a 64^2x35 batch-32 warp on v5e), `combine`
(fused dense-motion combine, exact), and `heatmap` (fused kp2gaussian,
eval-path only — no VJP). `softargmax` stays opt-in: its fusion win is small
and its on-chip delta (~2e-3 on kp means) is the largest of the set.

MONKEYNET_PALLAS=0 force-disables everything (emergency escape hatch);
MONKEYNET_PALLAS=1 force-enables everything (as in round 1).
"""

import os

_DEFAULT_ON = {"warp", "combine", "heatmap"}


def _on_tpu() -> bool:
    try:
        import jax

        d = jax.devices()[0]
        return d.platform == "tpu" or str(d.device_kind).startswith("TPU")
    except Exception:
        return False


def enabled(kernel: str = "warp") -> bool:
    env = os.environ.get("MONKEYNET_PALLAS")
    if env == "0":
        return False
    if env == "1":
        return True
    return kernel in _DEFAULT_ON and _on_tpu()
