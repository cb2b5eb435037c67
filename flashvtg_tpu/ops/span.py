"""Temporal-span math as pure jnp functions.

Semantics oracle: /root/reference/FlashVTG/span_utils.py (span_xx_to_cxw :4,
span_cxw_to_xx :25, temporal_iou :44, generalized_temporal_iou :91). All
functions are shape-polymorphic, jit-safe and differentiable; they operate on
float arrays whose last axis is 2 (a [start, end] or [center, width] pair).
"""

from __future__ import annotations

import jax.numpy as jnp


def span_xx_to_cxw(spans):
    """(..., 2) [st, ed] -> (..., 2) [center, width]."""
    center = (spans[..., 0] + spans[..., 1]) * 0.5
    width = spans[..., 1] - spans[..., 0]
    return jnp.stack([center, width], axis=-1)


def span_cxw_to_xx(spans):
    """(..., 2) [center, width] -> (..., 2) [st, ed]."""
    st = spans[..., 0] - 0.5 * spans[..., 1]
    ed = spans[..., 0] + 0.5 * spans[..., 1]
    return jnp.stack([st, ed], axis=-1)


def temporal_iou_and_union(spans1, spans2):
    """Pairwise IoU and union between two span sets.

    Args:
      spans1: (..., N, 2) in [st, ed] format.
      spans2: (..., M, 2).

    Returns:
      iou: (..., N, M); union: (..., N, M). Degenerate pairs with zero union
      produce inf/nan exactly like the reference (no epsilon is added).
    """
    areas1 = spans1[..., 1] - spans1[..., 0]
    areas2 = spans2[..., 1] - spans2[..., 0]
    left = jnp.maximum(spans1[..., :, None, 0], spans2[..., None, :, 0])
    right = jnp.minimum(spans1[..., :, None, 1], spans2[..., None, :, 1])
    inter = jnp.clip(right - left, 0, None)
    union = areas1[..., :, None] + areas2[..., None, :] - inter
    return inter / union, union


def temporal_iou(spans1, spans2):
    return temporal_iou_and_union(spans1, spans2)[0]


def temporal_intersection_over_pred(gt_spans, pred_spans):
    """(N, 2) x (M, 2) -> (N, M) intersection normalized by pred length."""
    left = jnp.maximum(gt_spans[..., :, None, 0], pred_spans[..., None, :, 0])
    right = jnp.minimum(gt_spans[..., :, None, 1], pred_spans[..., None, :, 1])
    inter = jnp.clip(right - left, 0, None)
    return inter / (pred_spans[..., None, :, 1] - pred_spans[..., None, :, 0])


def generalized_temporal_iou(spans1, spans2):
    """Pairwise 1-D gIoU (https://giou.stanford.edu/), (..., N, M)."""
    iou, union = temporal_iou_and_union(spans1, spans2)
    left = jnp.minimum(spans1[..., :, None, 0], spans2[..., None, :, 0])
    right = jnp.maximum(spans1[..., :, None, 1], spans2[..., None, :, 1])
    enclosing = jnp.clip(right - left, 0, None)
    return iou - (enclosing - union) / enclosing
