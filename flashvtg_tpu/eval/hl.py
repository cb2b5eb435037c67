"""Highlight-detection evaluation protocols for TVSum / YouTube-HL.

Oracle: FlashVTG/inference.py:118-229 (compute_hl_results), which follows the
UMT top-5 mAP protocol: rank clips by predicted saliency, binarize each
annotator's scores at the median (TVSum) or use the binary labels
(YouTube-HL), and accumulate a trapezoidal AP over the top-k ranked clips.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


def _ranked_trapezoid_ap(ranked_labels: Sequence[float]) -> float:
    """The reference's incremental AP accumulation (inference.py:175-187)."""
    num_gt = float(sum(ranked_labels))
    if num_gt == 0:
        return 0.0
    hits = ap = rec = 0.0
    prc = 1.0
    for j, gt in enumerate(ranked_labels):
        hits += gt
        _rec = hits / num_gt
        _prc = hits / (j + 1)
        ap += (_rec - rec) * (prc + _prc) / 2
        rec, prc = _rec, _prc
    return float(ap)


def tvsum_video_ap(pred: np.ndarray, label_rows: np.ndarray, topk: int = 5):
    """Per-video APs across the 20 TVSum annotators.

    Args:
      pred: (L,) predicted clip saliency; label_rows: (L, 20) raw scores.
    """
    label_rows = np.asarray(label_rows, dtype=np.float64)
    cur_pred = np.asarray(pred[: len(label_rows)], dtype=np.float64)
    inds = np.argsort(-cur_pred, kind="stable")
    aps = []
    for i in range(label_rows.shape[1]):
        col = label_rows[:, i]
        binary = (col > np.median(col)).astype(np.float64)
        ranked = binary[inds][:topk]
        aps.append(_ranked_trapezoid_ap(list(ranked)))
    return aps


def youtube_video_ap(pred: np.ndarray, labels: np.ndarray):
    """Single AP over the full ranking with binary labels
    (inference.py:189-214; note: no top-k truncation on this path)."""
    labels = np.asarray(labels, dtype=np.float64).squeeze()
    cur_pred = np.asarray(pred[: len(labels)], dtype=np.float64)
    inds = np.argsort(-cur_pred, kind="stable")
    ranked = labels[inds]
    return [_ranked_trapezoid_ap(list(ranked))]


def compute_hl_map(dset_name: str, preds: List[np.ndarray], labels: List) -> float:
    """Mean AP over all eval videos of one domain."""
    collected = []
    for pred, label in zip(preds, labels):
        if dset_name == "tvsum":
            collected.append(tvsum_video_ap(pred, np.asarray(label)))
        elif dset_name == "youtube_uni":
            collected.append(youtube_video_ap(pred, np.asarray(label)))
        else:
            raise ValueError(f"not an HL dataset: {dset_name}")
    return float(np.mean(collected))
