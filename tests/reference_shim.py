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

    # skimage is not installed; the reference's eval drivers import it at
    # module scope (frames_dataset.py:2, logger.py:6). Stub just enough for
    # imports to succeed — tests only use the pure-torch functions.
    if "skimage" not in sys.modules:
        import types

        import numpy as _np

        skimage = types.ModuleType("skimage")
        skimage.io = types.ModuleType("skimage.io")
        skimage.img_as_float32 = lambda x: _np.asarray(x, dtype=_np.float32)
        skimage.img_as_ubyte = lambda x: (_np.asarray(x) * 255).astype(_np.uint8)
        skimage.img_as_float = lambda x: _np.asarray(x, dtype=_np.float64)
        color = types.ModuleType("skimage.color")
        color.gray2rgb = lambda x: _np.repeat(_np.asarray(x)[..., None], 3, -1)
        transform = types.ModuleType("skimage.transform")
        transform.resize = None
        transform.rotate = None
        util = types.ModuleType("skimage.util")
        util.pad = _np.pad
        draw = types.ModuleType("skimage.draw")
        draw.circle = None
        skimage.color, skimage.transform, skimage.util, skimage.draw = (
            color, transform, util, draw,
        )
        for name, mod in {
            "skimage": skimage,
            "skimage.io": skimage.io,
            "skimage.color": color,
            "skimage.transform": transform,
            "skimage.util": util,
            "skimage.draw": draw,
        }.items():
            sys.modules[name] = mod

    if "torchvision" not in sys.modules:
        import types

        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        tv.transforms.functional = types.ModuleType(
            "torchvision.transforms.functional"
        )
        tv.transforms.ToPILImage = object
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
        sys.modules["torchvision.transforms.functional"] = tv.transforms.functional

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
