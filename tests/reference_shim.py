"""Import helpers for golden-value parity tests against the PyTorch reference.

The reference at /root/reference targets torch 0.4.1; this shim patches the
handful of removed APIs so its modules import and run under modern torch on
CPU. Used ONLY by tests — the framework itself never touches torch.

Tests that need the reference should call `load_reference()` and skip if it
returns None.
"""

from __future__ import annotations

import sys

REFERENCE_PATH = "/root/reference"


def load_reference():
    try:
        import torch
    except ImportError:
        return None

    # torch.gesv(B, A) -> (A^{-1} B, LU) was removed; solve() is the modern
    # equivalent (reference uses it in modules/util.py:223, transfer.py:54).
    if not hasattr(torch, "gesv"):
        torch.gesv = lambda b, a: (torch.linalg.solve(a, b), None)

    # torch 0.4.1 grid_sample had align_corners=True semantics; the default
    # flipped to False in torch 1.3. Pin the original behavior so golden
    # outputs match what the reference (and its published checkpoints)
    # actually computed.
    import torch.nn.functional as F

    if not getattr(F.grid_sample, "_monkeynet_pinned", False):
        _orig_grid_sample = F.grid_sample

        def _grid_sample_041(input, grid, mode="bilinear", padding_mode="zeros",
                             align_corners=None):
            return _orig_grid_sample(
                input, grid, mode=mode, padding_mode=padding_mode,
                align_corners=True,
            )

        _grid_sample_041._monkeynet_pinned = True
        F.grid_sample = _grid_sample_041

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)

    try:
        import modules.util as ref_util  # noqa: F401
        import modules.keypoint_detector as ref_kp  # noqa: F401

        return sys.modules
    except Exception:
        return None


def to_torch(x):
    import torch

    return torch.from_numpy(__import__("numpy").asarray(x)).float()
