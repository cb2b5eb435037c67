"""Vectorized temporal non-maximum suppression.

The reference performs NMS host-side with Python loops
(/root/reference/FlashVTG/inference.py:36-57 `post_processing_mr_nms` and
/root/reference/utils/temporal_nms.py:25-74 `temporal_nms`). Here the greedy
suppression runs as a fixed-trip-count `lax.fori_loop` over a static number of
candidates so it jit-compiles, vmaps over the query batch, and stays on device.

Semantics of `suppress_overlaps` (matches `post_processing_mr_nms`):
  repeat over all N windows: pick the highest-scoring unprocessed window and
  mark it processed; then either zero every unprocessed window with
  IoU >= thd ("normal"), or scale every unprocessed window's score by
  (1 - IoU) with no threshold gate ("linear" soft-NMS). Windows are never
  dropped — suppressed ones keep score 0 and sink in the final sort.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from flashvtg_tpu.ops.span import temporal_iou

NEG = -1e18


@functools.partial(jax.jit, static_argnames=("nms_type",))
def temporal_nms_scores(spans, scores, nms_thd, nms_type: str = "normal"):
    """Greedy temporal NMS on one query's candidate set.

    Args:
      spans: (N, 2) [st, ed] windows (any order).
      scores: (N,) confidence scores.
      nms_thd: IoU threshold (scalar).
      nms_type: "normal" (hard zeroing) or "linear" (score *= 1 - IoU).

    Returns:
      new_scores: (N,) suppressed scores, same row order as the input.
    """
    if nms_type not in ("normal", "linear"):
        raise ValueError(f"Unknown nms_type: {nms_type}")
    n = spans.shape[0]
    iou = temporal_iou(spans, spans)  # (N, N)

    def body(_, state):
        scores_cur, processed = state
        cand = jnp.where(processed, NEG, scores_cur)
        pick = jnp.argmax(cand)
        remaining = jnp.logical_and(~processed, jnp.arange(n) != pick)
        if nms_type == "normal":
            hit = jnp.logical_and(iou[pick] >= nms_thd, remaining)
            scores_new = jnp.where(hit, 0.0, scores_cur)
        else:
            # linear soft-NMS decays every remaining window, no threshold gate
            # (oracle: inference.py:48 `bnd[i+1:, -1] *= 1 - iou`)
            scores_new = jnp.where(
                remaining, scores_cur * (1.0 - iou[pick]), scores_cur
            )
        processed = processed.at[pick].set(True)
        return scores_new, processed

    scores_out, _ = jax.lax.fori_loop(
        0, n, body, (scores.astype(jnp.float32), jnp.zeros(n, dtype=bool))
    )
    return scores_out


def suppress_overlaps(spans, scores, nms_thd, nms_type: str = "normal"):
    """Batched NMS + stable descending re-sort.

    Args:
      spans: (B, N, 2); scores: (B, N).

    Returns:
      spans_sorted: (B, N, 2), scores_sorted: (B, N) — rows reordered by the
      post-suppression scores (stable sort, equal scores keep input order).
    """
    new_scores = jax.vmap(temporal_nms_scores, in_axes=(0, 0, None, None))(
        spans, scores, nms_thd, nms_type
    )
    order = jnp.argsort(-new_scores, axis=-1, stable=True)
    spans_sorted = jnp.take_along_axis(spans, order[..., None], axis=1)
    scores_sorted = jnp.take_along_axis(new_scores, order, axis=1)
    return spans_sorted, scores_sorted


def temporal_nms_keep(spans, scores, nms_thd, max_after_nms: int):
    """Keep-list greedy NMS (oracle: utils/temporal_nms.py:25-74).

    Returns indices of kept windows (host-side numpy helper for tools), at
    most `max_after_nms` of them, in descending-score order.
    """
    import numpy as np

    order = np.argsort(-np.asarray(scores), kind="stable")
    spans = np.asarray(spans)[order]
    keep = []
    suppressed = np.zeros(len(order), dtype=bool)
    for i in range(len(order)):
        if suppressed[i]:
            continue
        keep.append(order[i])
        if len(keep) >= max_after_nms:
            break
        rest = spans[i + 1 :]
        if len(rest) == 0:
            break
        left = np.maximum(spans[i, 0], rest[:, 0])
        right = np.minimum(spans[i, 1], rest[:, 1])
        inter = np.clip(right - left, 0, None)
        union = (spans[i, 1] - spans[i, 0]) + (rest[:, 1] - rest[:, 0]) - inter
        iou = np.where(union > 0, inter / np.where(union > 0, union, 1.0), 0.0)
        suppressed[i + 1 :] |= iou > nms_thd
    return np.asarray(keep, dtype=np.int64)
