"""Process-level jax setup: platform override + persistent compile cache.

Remote-compiled TPU programs (and big fused train steps generally) cost
minutes on first compile; the persistent cache makes every later process
start hot.
"""

from __future__ import annotations

import os


def setup_jax(platform: str | None = None, cache_dir: str | None = None):
    if platform:
        os.environ["JAX_PLATFORMS"] = platform
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    cache_dir = cache_dir or os.environ.get(
        "MONKEYNET_XLA_CACHE", os.path.expanduser("~/.cache/monkeynet_tpu/xla")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization, never a hard failure

    # Pay the first device->host transfer stall now: on tunneled TPU
    # backends the first fetch of a process can block for minutes while the
    # reverse channel comes up. One tiny warmup fetch makes every later
    # fetch predictable.
    try:
        import numpy as _np
        import jax.numpy as _jnp

        _np.asarray(_jnp.zeros((1,)))
    except Exception:
        pass
    return jax
