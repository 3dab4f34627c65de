"""Fused Pallas TPU kernels for the framework's hot non-conv ops.

Each kernel has a pure-jnp reference implementation in monkeynet_tpu.ops; the
Pallas versions are swapped in behind `monkeynet_tpu.ops.pallas.enabled()`
(env MONKEYNET_PALLAS=1) after passing the correctness diff harness in
tests/test_pallas.py.
"""

import os


def enabled() -> bool:
    return os.environ.get("MONKEYNET_PALLAS", "0") == "1"
