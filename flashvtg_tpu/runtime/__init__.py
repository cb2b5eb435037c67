"""Native runtime: C++ feature loader + metric kernels, Python fallbacks.

`load_features(path, key, max_rows, l2norm)` reads .npy / .npz feature files
through libfeatload.so (built from featload.cpp on first use) and falls back
to numpy when the native library is unavailable or declines the file
(unsupported dtype/rank). The native path fuses the row-wise l2
normalization and skips the Python zip/npy machinery — the hot loop of
dataset preloading (reference start_end_dataset.py:153-218).

`mr_ap_batch(...)` runs the batched greedy-matching detection AP
(libmrap.so from mr_ap.cpp) — the per-query hot loop of the MR metric
suite (reference standalone_eval/utils.py:83-166 runs it in a
multiprocessing.Pool(8); here it is one C++ pass). Bit-identical to the
Python implementation in eval/metrics.py; queries the kernel declines
(G == 0, G > 15, P > 126 — see mr_ap.cpp header) are reported back for the
Python fallback.
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


_MRAP_PATH = os.path.join(_HERE, "libmrap.so")
_mrap = None
_mrap_failed = False


def _get_mrap():
    global _mrap, _mrap_failed
    if _mrap is not None or _mrap_failed:
        return _mrap
    with _lock:
        if _mrap is not None or _mrap_failed:
            return _mrap
        src = os.path.join(_HERE, "mr_ap.cpp")
        try:
            if not os.path.exists(_MRAP_PATH) or (
                os.path.getmtime(_MRAP_PATH) < os.path.getmtime(src)
            ):
                subprocess.run(
                    ["make", "-s", "libmrap.so"],
                    cwd=_HERE,
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_MRAP_PATH)
            dp = ctypes.POINTER(ctypes.c_double)
            lp = ctypes.POINTER(ctypes.c_long)
            lib.mr_ap_batch.argtypes = [
                dp, lp, dp, lp, ctypes.c_long, dp, ctypes.c_long,
                dp, ctypes.POINTER(ctypes.c_ubyte),
            ]
            lib.mr_ap_batch.restype = ctypes.c_long
            lib.hl_ap_batch.argtypes = [
                dp, lp, dp, ctypes.c_long, ctypes.c_long, dp,
            ]
            lib.hl_ap_batch.restype = ctypes.c_long
            _mrap = lib
        except Exception:
            _mrap_failed = True
    return _mrap


def mr_ap_native_available() -> bool:
    return _get_mrap() is not None


def mr_ap_batch(preds_list, gts_list, thresholds):
    """Batched detection AP. preds_list: per-query (P_i, 3) float64 arrays
    of [start, end, score] rows; gts_list: per-query (G_i, 2) float64
    arrays. Returns (ap (n, n_thds) float64, handled (n,) bool) — rows with
    handled=False must be computed by the Python path. None when the native
    library is unavailable."""
    lib = _get_mrap()
    if lib is None:
        return None
    n = len(preds_list)
    pred_off = np.zeros(n + 1, np.int64)
    gt_off = np.zeros(n + 1, np.int64)
    for i, (p, g) in enumerate(zip(preds_list, gts_list)):
        pred_off[i + 1] = pred_off[i] + len(p)
        gt_off[i + 1] = gt_off[i] + len(g)
    pred_arrs = []
    for p in preds_list:
        a = np.asarray(p, np.float64)
        if a.size and (a.ndim != 2 or a.shape[1] < 3):
            raise ValueError(
                "mr_ap_batch: prediction rows must be [start, end, score, ...] "
                f"with >= 3 columns, got shape {a.shape}"
            )
        pred_arrs.append(a.reshape(-1, a.shape[1] if a.size else 3)[:, :3])
    preds = (
        np.concatenate(pred_arrs) if pred_off[-1] else np.zeros((0, 3))
    )
    gts = (
        np.concatenate([np.asarray(g, np.float64).reshape(-1, 2) for g in gts_list])
        if gt_off[-1] else np.zeros((0, 2))
    )
    thds = np.ascontiguousarray(thresholds, np.float64)
    out = np.zeros((n, len(thds)), np.float64)
    handled = np.zeros(n, np.uint8)
    preds = np.ascontiguousarray(preds)
    gts = np.ascontiguousarray(gts)
    dp = ctypes.POINTER(ctypes.c_double)
    lp = ctypes.POINTER(ctypes.c_long)
    lib.mr_ap_batch(
        preds.ctypes.data_as(dp), pred_off.ctypes.data_as(lp),
        gts.ctypes.data_as(dp), gt_off.ctypes.data_as(lp),
        n, thds.ctypes.data_as(dp), len(thds),
        out.ctypes.data_as(dp), handled.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return out, handled.astype(bool)


def hl_ap_batch(scores_list, labels_list):
    """Batched binary ranking AP: per query, one (n_i,) float64 score vector
    and a (K, n_i) float64 label matrix (K identical across queries).
    Returns (n, K) AP — bit-identical to per-column binary_ap. None when
    the native library is unavailable."""
    lib = _get_mrap()
    if lib is None or not scores_list:
        return None
    n = len(scores_list)
    k = int(np.asarray(labels_list[0]).shape[0])
    off = np.zeros(n + 1, np.int64)
    for i, s in enumerate(scores_list):
        off[i + 1] = off[i] + len(s)
    scores = np.ascontiguousarray(
        np.concatenate([np.asarray(s, np.float64) for s in scores_list])
        if off[-1] else np.zeros(0)
    )
    labels = np.ascontiguousarray(
        np.concatenate(
            [np.asarray(m, np.float64).reshape(k, -1).ravel()
             for m in labels_list]
        ) if off[-1] else np.zeros(0)
    )
    out = np.zeros((n, k), np.float64)
    dp = ctypes.POINTER(ctypes.c_double)
    lp = ctypes.POINTER(ctypes.c_long)
    lib.hl_ap_batch(
        scores.ctypes.data_as(dp), off.ctypes.data_as(lp),
        labels.ctypes.data_as(dp), n, k, out.ctypes.data_as(dp),
    )
    return out
