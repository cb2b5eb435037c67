"""Elementary loss primitives (jnp, mask/avg_factor-reduced).

Oracles: blocks/loss.py + blocks/utils.py (weight_reduce_loss) and the
nncore-registry losses named by the model configs (FocalLoss, L1Loss,
DynamicBCELoss come from the external nncore package in the reference; their
semantics are reimplemented here following the mmdet-style formulations that
nncore mirrors).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def weight_reduce(loss, weight=None, avg_factor=None, reduction="mean"):
    """Elementwise weighting + reduction (oracle: blocks/utils.py:26-52)."""
    if weight is not None:
        loss = loss * weight
    if avg_factor is not None:
        if reduction != "mean":
            raise ValueError("avg_factor requires mean reduction")
        return loss.sum() / avg_factor
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss


def bce_with_logits(pred, target):
    """Numerically stable binary cross entropy on logits."""
    return jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))


def sigmoid_focal_loss(
    pred, target, weight=None, avg_factor=None, alpha=0.25, gamma=2.0
):
    """Sigmoid focal loss (nncore `FocalLoss`, mmdet formulation)."""
    p = jax.nn.sigmoid(pred)
    pt = (1 - p) * target + p * (1 - target)
    focal_weight = (alpha * target + (1 - alpha) * (1 - target)) * pt**gamma
    loss = bce_with_logits(pred, target) * focal_weight
    return weight_reduce(loss, weight, avg_factor)


def l1_loss(pred, target, weight=None, avg_factor=None):
    return weight_reduce(jnp.abs(pred - target), weight, avg_factor)


def dynamic_bce_loss(pred, target, weight=None, avg_factor=None):
    """BCE-with-logits against per-sample max-normalized soft targets.

    Reconstruction of nncore's `DynamicBCELoss` (used by the HD configs,
    data/HD.py:12, whose raw targets — e.g. TVSum agg scores / 80 * 12 — are
    not bounded by 1): targets are scaled into [0, 1] by each sample's max
    before a standard BCE. Only affects HD training dynamics, not any eval
    parity gate.
    """
    row_max = jnp.maximum(target.max(axis=-1, keepdims=True), 1e-6)
    soft = jnp.clip(target / row_max, 0.0, 1.0)
    return weight_reduce(bce_with_logits(pred, soft), weight, avg_factor)


def quality_focal_loss(
    pred, label, score, weight=None, avg_factor=None, beta=2.0
):
    """Quality focal loss (oracle: blocks/loss.py:14-40).

    Negatives: BCE to 0 scaled by sigmoid(pred)^beta. Positives (label > 0):
    BCE to the IoU quality `score` scaled by |score - sigmoid(pred)|^beta.
    """
    p = jax.nn.sigmoid(pred)
    neg = bce_with_logits(pred, jnp.zeros_like(pred)) * p**beta
    pos = bce_with_logits(pred, score) * jnp.abs(score - p) ** beta
    loss = jnp.where(label > 0, pos, neg)
    return weight_reduce(loss, weight, avg_factor)


def distribution_focal_loss(pred, label, weight=None, avg_factor=None):
    """Distribution focal loss over discretized offsets
    (oracle: blocks/loss.py:43-71). pred: (B, N, C) bin logits; label: (B, N)
    continuous targets in [0, C-1)."""
    c = pred.shape[-1]
    disl = jnp.clip(label.astype(jnp.int32), 0, c - 1)
    disr = jnp.clip(disl + 1, 0, c - 1)
    wl = disr.astype(pred.dtype) - label
    wr = label - disl.astype(pred.dtype)
    logp = jax.nn.log_softmax(pred, axis=-1)
    ce_l = -jnp.take_along_axis(logp, disl[..., None], axis=-1)[..., 0]
    ce_r = -jnp.take_along_axis(logp, disr[..., None], axis=-1)[..., 0]
    loss = ce_l * wl + ce_r * wr
    return weight_reduce(loss, weight, avg_factor)


def sampled_nce_loss(
    video_emb,
    query_emb,
    video_msk,
    saliency,
    pos_clip,
    direction=("row", "col"),
    temperature=0.07,
    max_scale=100.0,
):
    """Sampled InfoNCE between clip embeddings and the pooled query
    (oracle: blocks/loss.py:141-191 SampledNCELoss).

    Only clips whose saliency does not exceed the positive clip's saliency
    participate (loss_msk), which removes other positives from the negatives.
    """
    b = video_emb.shape[0]
    batch_inds = jnp.arange(b)
    pos_scores = saliency[batch_inds, pos_clip][:, None]
    loss_msk = (saliency <= pos_scores) * video_msk

    scale = jnp.minimum(jnp.exp(jnp.log(1.0 / temperature)), max_scale)
    vn = video_emb / jnp.linalg.norm(video_emb, axis=-1, keepdims=True).clip(1e-8)
    qn = query_emb / jnp.linalg.norm(query_emb, axis=-1, keepdims=True).clip(1e-8)
    i_sim = (vn * qn).sum(-1) * scale  # (B, L) cosine * scale
    # finite mask value, NOT -inf: under fixed-bucket padding a clip column
    # can be masked in EVERY row, and log-softmax over an all--inf column
    # poisons the backward pass with NaNs (the reference's batch-max padding
    # never produces such columns). -1e30 underflows identically in the
    # softmax for any row/column with at least one valid entry.
    i_sim = i_sim + jnp.where(loss_msk > 0, 0.0, -1e30)

    loss = 0.0
    if "row" in direction:
        met = jax.nn.log_softmax(i_sim, axis=1)[batch_inds, pos_clip]
        loss = loss - met.sum() / b
    if "col" in direction:
        met = jax.nn.log_softmax(i_sim.T, axis=1)[pos_clip, batch_inds]
        loss = loss - met.sum() / b
    return loss
