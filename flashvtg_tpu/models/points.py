"""Static anchor-point generation and pyramid validity masks.

Oracle: blocks/generator.py (PointGenerator) and blocks/blocks.py mask
pooling. The reference caches per-level buffers of rows
(center, reg_min, reg_max, stride) and slices them to each level's dynamic
length; here everything is precomputed for the *static padded* length, and
per-sample validity is expressed with masks:

  * "pool" masks: a point is valid if its receptive stride-window covers at
    least one valid clip (max-pool semantics — what the reference training
    path uses on batch-padded inputs).
  * "strict" masks: a point is valid iff it exists in the reference's
    *unpadded* computation, i.e. its level index < the chained VALID-conv
    output length of the true sequence length. Used at eval time for
    bit-comparable candidate sets.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from flashvtg_tpu.models.components import pool_mask


def pyramid_level_sizes(length: int, strides: Sequence[int]) -> Tuple[int, ...]:
    """Static per-level sequence lengths for a padded length `length`.

    Levels with stride > length are structurally absent (size 0), mirroring
    the reference's `if x.size(1) < s: continue` skip.
    """
    sizes = []
    for s in strides:
        if length < s:
            sizes.append(0)
            continue
        l = length
        p = int(np.log2(s))
        for _ in range(p):
            l = (l - 2) // 2 + 1  # VALID conv, kernel 2, stride 2
        sizes.append(l)
    return tuple(sizes)


def generate_points(length: int, strides: Sequence[int], clip: bool = True):
    """Anchor rows (center, reg_min, reg_max, stride) for all present levels.

    Returns an (N, 4) float32 numpy array, N = sum of level sizes. Centers at
    level stride s are 0, s, 2s, ... (generator.py:44 arange(0, buffer, s));
    regression ranges chain (0, s1), (s1, s2), ..., (s_last, inf)
    (generator.py:26-30).
    """
    reg_ranges, last = [], 0.0
    for s in strides[1:]:
        reg_ranges.append((last, float(s)))
        last = float(s)
    reg_ranges.append((last, float("inf")))

    sizes = pyramid_level_sizes(length, strides)
    rows = []
    for s, rng, size in zip(strides, reg_ranges, sizes):
        if size == 0:
            continue
        centers = np.arange(size, dtype=np.float32) * s
        level = np.stack(
            [
                centers,
                np.full(size, rng[0], np.float32),
                np.full(size, rng[1], np.float32),
                np.full(size, float(s), np.float32),
            ],
            axis=1,
        )
        rows.append(level)
    return np.concatenate(rows, axis=0)


def pyramid_masks_pool(video_mask: jnp.ndarray, strides: Sequence[int]):
    """Per-level (B, L_s) masks via max-pooling (training semantics)."""
    length = video_mask.shape[1]
    masks = []
    for s in strides:
        if length < s:
            continue
        masks.append(pool_mask(video_mask, s))
    return tuple(masks)


def pyramid_masks_strict(valid_lengths: np.ndarray, length: int, strides):
    """Per-sample strict point-validity over the concatenated point axis.

    Args:
      valid_lengths: (B,) true (unpadded) sequence lengths, host numpy.
      length: static padded length the points were generated for.

    Returns:
      (B, N) float32 mask over the concatenated points; and (B,) counts of
      valid points (for host-side truncation of top-k results).
    """
    valid_lengths = np.asarray(valid_lengths)
    sizes = pyramid_level_sizes(length, strides)
    per_level_valid = []
    for s, size in zip(strides, sizes):
        if size == 0:
            continue
        # chained VALID-conv output length of the true length; 0 if absent
        l = valid_lengths.copy()
        p = int(np.log2(s))
        for _ in range(p):
            l = np.maximum((l - 2) // 2 + 1, 0)
        l = np.where(valid_lengths >= s, l, 0)
        idx = np.arange(size)[None, :]
        per_level_valid.append((idx < l[:, None]).astype(np.float32))
    mask = np.concatenate(per_level_valid, axis=1)
    return mask, mask.sum(axis=1).astype(np.int64)
