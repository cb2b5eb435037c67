"""Native runtime: C++ feature loader with transparent Python fallback.

`load_features(path, key, max_rows, l2norm)` reads .npy / .npz feature files
through libfeatload.so (built from featload.cpp on first use) and falls back
to numpy when the native library is unavailable or declines the file
(unsupported dtype/rank). The native path fuses the row-wise l2
normalization and skips the Python zip/npy machinery — the hot loop of
dataset preloading (reference start_end_dataset.py:153-218).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libfeatload.so")
_lock = threading.Lock()
_lib = None
_lib_failed = False


def _get_lib():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        src = os.path.join(_HERE, "featload.cpp")
        try:
            if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)
            ):
                subprocess.run(
                    ["make", "-s", "libfeatload.so"],
                    cwd=_HERE,
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            lib.fl_load.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
                ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
            ]
            lib.fl_load.restype = ctypes.POINTER(ctypes.c_float)
            lib.fl_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
            lib.fl_free.restype = None
            _lib = lib
        except Exception:
            _lib_failed = True
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def load_features(
    path: str,
    key: str = "features",
    max_rows: int = 0,
    l2norm: bool = False,
) -> Optional[np.ndarray]:
    """Native read; returns None if the native path cannot handle the file."""
    lib = _get_lib()
    if lib is None or path.endswith(".pt"):
        return None
    rows = ctypes.c_long()
    cols = ctypes.c_long()
    ptr = lib.fl_load(
        path.encode(), key.encode(), max_rows, int(l2norm),
        ctypes.byref(rows), ctypes.byref(cols),
    )
    if not ptr:
        return None
    try:
        view = np.ctypeslib.as_array(ptr, shape=(rows.value, cols.value))
        return view.copy()
    finally:
        lib.fl_free(ptr)
