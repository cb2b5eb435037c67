"""Static-shape padding / bucketing utilities (host-side, numpy).

Replaces the dynamic batch-max padding of the reference collate
(/root/reference/utils/tensor_utils.py:5-53 `pad_sequences_1d`) with padding to
*fixed bucket lengths* so that every jitted program sees a static shape. XLA
compiles once per (bucket, batch-size) pair; masks carry the true lengths.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

# Default video-length buckets; chosen to cover QVHighlights (75), Charades
# (~195 at 1 clip/s), TVSum (1000) and TACoS (unbounded) with few recompiles.
DEFAULT_BUCKETS = (75, 128, 256, 512, 1024, 2048, 4096)


def bucket_length(length: int, buckets: Sequence[int] = DEFAULT_BUCKETS) -> int:
    """Smallest bucket >= length (last bucket if none fits)."""
    for b in buckets:
        if length <= b:
            return b
    return int(buckets[-1])


def pad_to_length(arr: np.ndarray, length: int, axis: int = 0):
    """Zero-pad `arr` along `axis` to `length`; returns (padded, valid_mask)."""
    arr = np.asarray(arr)
    n = arr.shape[axis]
    if n > length:
        sl = [slice(None)] * arr.ndim
        sl[axis] = slice(0, length)
        arr = arr[tuple(sl)]
        n = length
    pad_width = [(0, 0)] * arr.ndim
    pad_width[axis] = (0, length - n)
    padded = np.pad(arr, pad_width)
    mask = np.zeros(length, dtype=np.float32)
    mask[:n] = 1.0
    return padded, mask


def pad_batch(seqs, length: int, dtype=np.float32):
    """Pad a list of (L_i, ...) arrays to a (B, length, ...) batch + mask."""
    seqs = [np.asarray(s, dtype=dtype) for s in seqs]
    extra = seqs[0].shape[1:]
    out = np.zeros((len(seqs), length) + extra, dtype=dtype)
    mask = np.zeros((len(seqs), length), dtype=np.float32)
    for i, s in enumerate(seqs):
        n = min(len(s), length)
        out[i, :n] = s[:n]
        mask[i, :n] = 1.0
    return out, mask
