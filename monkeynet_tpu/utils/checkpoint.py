"""Checkpoint save/restore.

Capability parity with the reference Logger.save_cpk/load_cpk (logger.py:
43-66): one file holding every model's params + batch stats + all optimizer
states + epoch/step counters; any subset restorable. Our format is msgpack of
numpy pytrees (flax.serialization); `load_any` also transparently ingests the
reference's published torch `.pth.tar` checkpoints via the layout converter
(utils/torch_import.py) so eval parity against published weights works out of
the box.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, payload: Dict[str, Any]) -> None:
    payload = jax.tree.map(lambda x: np.asarray(x), payload)
    data = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def _restore_like(template, loaded):
    """Shape loaded (dict-of-numpy) into template's pytree structure."""
    return serialization.from_state_dict(template, loaded)


def load_any(
    path: str,
    variables_templates: Optional[Dict[str, Any]] = None,
):
    """Load either our msgpack checkpoint or a reference torch .pth.tar.

    Returns the raw payload dict for msgpack checkpoints. For torch
    checkpoints, `variables_templates` must map model name ('generator',
    'kp_detector', 'discriminator') -> flax variables pytree; returns
    {'<model>': converted_variables, 'epoch': int, 'it': int}, plus — when
    the checkpoint carries the reference's Adam state_dicts (reference
    logger.py:43-47 saves them, :49-66 restores them on resume) —
    'optimizer_<model>': {'step', 'mu', 'nu'} pytrees shaped like the
    model's params, ready for restore_adam_moments.
    """
    with open(path, "rb") as f:
        magic = f.read(2)
    if magic == b"PK" or path.endswith((".pth", ".pth.tar", ".pt")):
        from monkeynet_tpu.utils.torch_import import (
            import_adam_state,
            import_state_dict,
            load_torch_checkpoint,
        )

        assert variables_templates is not None, "torch import needs model templates"
        raw = load_torch_checkpoint(path)
        out: Dict[str, Any] = {}
        for name, template in variables_templates.items():
            if name in raw:
                out[name] = import_state_dict(template, raw[name])
                opt_raw = raw.get(f"optimizer_{name}")
                if opt_raw is not None:
                    step, mu, nu = import_adam_state(
                        template["params"], raw[name], opt_raw
                    )
                    out[f"optimizer_{name}"] = {
                        "step": step, "mu": mu, "nu": nu
                    }
        out["epoch"] = int(raw.get("epoch", 0))
        out["it"] = int(raw.get("it", 0))
        return out
    return load_checkpoint(path)
