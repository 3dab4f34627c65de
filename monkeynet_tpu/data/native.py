"""ctypes bindings for the native (C++ libpng/libjpeg) data-loader core.

Builds native/libmonkeynet_io.so on first use if the toolchain is available;
callers fall back to the imageio path when the library can't be loaded
(io.read_video handles the dispatch).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmonkeynet_io.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _load_failed = True
            return None
        lib.mk_probe.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.mk_probe.restype = ctypes.c_int
        lib.mk_decode_stacked.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        lib.mk_decode_stacked.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def read_stacked(path: str, frame_h: int, frame_w: int) -> Optional[np.ndarray]:
    """Decode a stacked-frame PNG/JPG to (T, frame_h, frame_w, 3) float32,
    or None when the native core is unavailable / declines the file."""
    lib = get_lib()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.mk_probe(path.encode(), ctypes.byref(h), ctypes.byref(w)) != 0:
        return None
    # Native decode only at the file's own frame size (the training hot
    # path): the file height must equal the requested frame height and the
    # width must tile into requested-width frames (square or not, matching
    # the reference's slice-by-image_shape semantics,
    # frames_dataset.py:26-29). Requests at a different size (e.g. demo.py
    # reading the bundled 128^2 pair at 64^2) take the Python fallback,
    # which slices at the native size and then resizes — never shears.
    if h.value != frame_h or w.value % frame_w != 0:
        return None
    max_frames = w.value // frame_w
    out = np.empty((max_frames, frame_h, frame_w, 3), np.float32)
    t = lib.mk_decode_stacked(
        path.encode(),
        frame_h,
        frame_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_frames,
    )
    if t <= 0:
        return None
    return out[:t]
