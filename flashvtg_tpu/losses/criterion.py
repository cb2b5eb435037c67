"""Training criterion: bundle (cls/reg/sal) + saliency + label losses.

Oracles: FlashVTG/model.py:306-686 (SetCriterion) and blocks/loss.py:195-380
(BundleLoss). Everything is vectorized with masks and static shapes — the
reference's per-sample Python loops (target assignment, the four near-identical
rank-contrastive blocks, dynamic real-negative gathers) become batched jnp
with row weighting, so the whole loss evaluates inside the jitted train step.

Target conventions (produced by flashvtg_tpu/data):
  * gt_windows: (B, M, 2) in *seconds*, padded with +inf (the reference pads
    GT boundaries with inf too, model.py:654-667 — the assignment math is
    built to absorb it).
  * saliency_all_labels: (B, Lv) float; saliency_pos/neg_labels: (B, P) int.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from flashvtg_tpu.losses.basic import (
    bce_with_logits,
    dynamic_bce_loss,
    l1_loss,
    quality_focal_loss,
    sampled_nce_loss,
    sigmoid_focal_loss,
)

NEG_LARGE = -1e3  # reference uses -1e+3 for masked saliency scores


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Loss bundle + weights (reference CLI flags and data/MR*.py loss_cfg)."""

    # weight_dict (model.py:815-820)
    label_loss_coef: float = 4.0
    lw_saliency: float = 0.1
    lw_reg: float = 0.2
    lw_cls: float = 1.0
    lw_sal: float = 0.1
    lw_wattn: float = 1.0
    saliency_margin: float = 0.2
    # BundleLoss pieces (data/MR.py / data/HD.py loss_cfg)
    sample_radius: float = 1.5
    loss_cls: Optional[str] = "focal"  # focal | dynamic_bce | None
    loss_reg: Optional[str] = "l1"  # l1 | None
    loss_sal: Optional[str] = "nce"  # nce | None
    nce_direction: Tuple[str, ...] = ("row", "col")
    loss_qfl: bool = False
    clip_length: float = 2.0
    dset_name: str = "hl"


# ---------------------------------------------------------------------------
# Saliency losses (SetCriterion.loss_saliency, model.py:348-643)
# ---------------------------------------------------------------------------

def rank_contrastive_loss(scores, labels, valid, row_weight):
    """12-level ranking contrastive loss over one score matrix.

    For rank thresholds 1..11, clips with label >= t are positives; the
    masked log-softmax over the (score/tau) row scores the positives
    (oracle: the four identical blocks at model.py:370-390 etc.).

    Args:
      scores: (B, L) raw scores with invalid entries already at -1e3.
      labels: (B, L) integer-ish saliency levels.
      valid: (B, L) 1 = valid clip.
      row_weight: (B,) row inclusion weight (real/false-neg masking).

    Returns scalar: mean over weighted rows, averaged over the 12 levels.
    """
    tau = 0.5
    denom_rows = jnp.maximum(row_weight.sum(), 1e-6)
    total = 0.0
    for t in range(1, 12):
        pos = (labels >= t).astype(scores.dtype) * valid
        any_pos_row = (pos.sum(axis=1) > 0).astype(scores.dtype)
        logits = scores / tau
        logits = logits - logits.max(axis=1, keepdims=True)
        log_prob = logits - jnp.log(jnp.exp(logits).sum(axis=1, keepdims=True) + 1e-6)
        mean_log_prob_pos = (pos * log_prob * valid).sum(1) / (pos.sum(1) + 1e-6)
        row_loss = -mean_log_prob_pos * any_pos_row
        # `if pos_mask.sum()==0: continue` contributes 0 — same as summing
        level_has_pos = (pos.sum() > 0).astype(scores.dtype)
        total = total + level_has_pos * (row_loss * row_weight).sum() / denom_rows
    return total / 12.0


def margin_pair_loss(scores, pos_idx, neg_idx, margin):
    """Hinge between sampled positive and negative clips
    (oracle: model.py:429-439)."""
    b, p = pos_idx.shape
    rows = jnp.arange(b)[:, None]
    pos = scores[rows, pos_idx]
    neg = scores[rows, neg_idx]
    return jnp.clip(margin + neg - pos, 0, None).sum() / (b * p) * 2.0


def _masked_scores(scores, valid):
    return valid * scores + (1.0 - valid) * NEG_LARGE


def _saliency_channel(
    scores,
    scores_neg,
    labels,
    valid,
    real_neg,
    pos_idx,
    neg_idx,
    margin,
    neg_pair_weight,
    neg_is_prob: bool,
    include_false_neg_rank: bool = True,
):
    """One saliency channel (encoder scores or t2v attention values).

    Folds the reference's real-neg / false-neg / no-neg branches into a
    single masked computation (equivalent when static shapes are kept; see
    models/flashvtg.py docstring).

    `include_false_neg_rank=False` reproduces a reference bug: in the
    attention channel the false-negative rank-contrastive term is
    accumulated into the *already consumed* saliency-channel variable
    (model.py:524 `loss_rank_contrastive += ...` after it was folded into
    loss_saliency at :444), so it never reaches any output.
    """
    b, l = scores.shape
    have_neg = scores_neg is not None

    loss = margin_pair_loss(scores, pos_idx, neg_idx, margin)

    if have_neg:
        # neg-pair push-down loss over rows with a real negative
        if neg_is_prob:
            per_clip = -jnp.log(jnp.clip(1.0 - scores_neg, 1e-12, None))
        else:
            per_clip = -jnp.log(
                jnp.clip(1.0 - jax.nn.sigmoid(scores_neg), 1e-12, None)
            )
        row_sums = (per_clip * valid).sum(axis=1)
        n_real = jnp.maximum(real_neg.sum(), 1e-6)
        loss_neg_pair = (row_sums * real_neg).sum() / n_real
        loss = loss + neg_pair_weight * loss_neg_pair

        # rank contrastive on [pos video scores ; neg-text scores] rows
        cat_scores = _masked_scores(
            jnp.concatenate([scores, scores_neg], axis=1),
            jnp.concatenate([valid, valid], axis=1),
        )
        cat_labels = jnp.concatenate([labels, jnp.zeros_like(labels)], axis=1)
        cat_valid = jnp.concatenate([valid, valid], axis=1)
        loss = loss + rank_contrastive_loss(cat_scores, cat_labels, cat_valid, real_neg)

        # false-neg rows use the original scores only. Reference quirk: when
        # exactly ONE row is a false negative, the reference's
        # `scores[mask].unsqueeze(0)` (model.py:394-398) yields a 3-D tensor
        # whose softmax runs over a singleton axis, collapsing the term to
        # ~1e-6 — i.e. effectively zero. Reproduced via the count > 1 gate.
        if include_false_neg_rank:
            false_neg = 1.0 - real_neg
            loss = loss + jnp.where(
                false_neg.sum() > 1,
                rank_contrastive_loss(
                    _masked_scores(scores, valid), labels, valid, false_neg
                ),
                0.0,
            )
    else:
        loss = loss + rank_contrastive_loss(
            _masked_scores(scores, valid), labels, valid, jnp.ones((b,))
        )
    return loss


def loss_saliency(outputs, targets, cfg: LossConfig):
    """Composite saliency loss over both channels (model.py:348-643)."""
    labels = targets["saliency_all_labels"]
    valid = outputs["video_msk"].astype(jnp.float32)
    pos_idx = targets["saliency_pos_labels"]
    neg_idx = targets["saliency_neg_labels"]
    real_neg = outputs.get("real_neg_mask")
    have_neg = "saliency_scores_neg" in outputs

    # youtube_uni zeroes the neg-pair terms (model.py:441-444, :544-547)
    npw = 0.0 if cfg.dset_name == "youtube_uni" else 1.0

    sal = _saliency_channel(
        outputs["saliency_scores"],
        outputs.get("saliency_scores_neg") if have_neg else None,
        labels,
        valid,
        real_neg if have_neg else None,
        pos_idx,
        neg_idx,
        cfg.saliency_margin,
        npw,
        neg_is_prob=False,
    )

    attn = _saliency_channel(
        outputs["t2vattnvalues"],
        outputs.get("t2vattnvalues_neg") if have_neg else None,
        labels,
        valid,
        real_neg if have_neg else None,
        pos_idx,
        neg_idx,
        cfg.saliency_margin,
        npw,
        neg_is_prob=True,
        include_false_neg_rank=not have_neg,
    )
    # BCE of the attention channel against binarized saliency
    # (model.py:538-542; note: unmasked over the padded length, as in the
    # reference where the label tensor is batch-padded with zeros)
    probs = jnp.clip(outputs["t2vattnvalues"], 1e-7, 1 - 1e-7)
    binary = jnp.clip(labels, 0.0, 1.0)
    bce = -(binary * jnp.log(probs) + (1 - binary) * jnp.log(1 - probs)).mean()

    return sal + cfg.lw_wattn * (attn + bce)


# ---------------------------------------------------------------------------
# Label loss (SetCriterion.loss_labels, model.py:339-346)
# ---------------------------------------------------------------------------

def loss_label(outputs, targets):
    sal = targets["saliency_all_labels"]
    conf = outputs["out_class"][:, : sal.shape[1], 0]

    def norm(x):
        return (x - x.min()) / (x.max() - x.min())

    return ((norm(sal) - norm(conf)) ** 2).mean()


# ---------------------------------------------------------------------------
# Bundle losses (BundleLoss, blocks/loss.py:195-380)
# ---------------------------------------------------------------------------

def assign_targets(points, gt_bnd, sample_radius):
    """Anchor-point target assignment, batched (oracle: loss.py:214-267).

    Args:
      points: (N, 4) rows (center, reg_min, reg_max, stride) in clip units.
      gt_bnd: (B, M, 2) GT boundaries in clip units, +inf padded.

    Returns:
      cls_tgt: (B, N) in {0, 1}; reg_tgt: (B, N, 2) stride-normalized offsets.
    """
    center = points[:, 0][None, :, None]  # (1, N, 1)
    stride = points[:, 3][None, :, None]
    gt_valid = jnp.isfinite(gt_bnd).all(-1)  # (B, M)
    gs = gt_bnd[:, None, :, 0]  # (B, 1, M)
    ge = gt_bnd[:, None, :, 1]
    # use a large finite stand-in for padded GT rows to avoid inf-inf NaNs
    big = 1e9
    gs = jnp.where(gt_valid[:, None, :], gs, big)
    ge = jnp.where(gt_valid[:, None, :], ge, big)

    s = center - gs  # (B, N, M)
    e = ge - center
    lens = jnp.where(gt_valid, gt_bnd[..., 1] - gt_bnd[..., 0], jnp.inf)  # (B, M)
    lens = jnp.broadcast_to(lens[:, None, :], s.shape)

    if sample_radius > 0:
        gc = (gs + ge) / 2
        t_min = gc - stride * sample_radius
        t_max = gc + stride * sample_radius
        dist_s = center - jnp.maximum(t_min, gs)
        dist_e = jnp.minimum(t_max, ge) - center
        cls_msk = jnp.minimum(dist_s, dist_e) >= 0
    else:
        cls_msk = jnp.minimum(s, e) >= 0

    reg_dist = jnp.maximum(s, e)
    reg_msk = (reg_dist >= points[None, :, 1, None]) & (
        reg_dist <= points[None, :, 2, None]
    )

    lens = jnp.where(cls_msk & reg_msk & gt_valid[:, None, :], lens, jnp.inf)
    min_len = lens.min(axis=2)  # (B, N)
    min_idx = lens.argmin(axis=2)

    matched = (lens <= min_len[..., None] + 1e-3) & jnp.isfinite(lens)
    cls_tgt = jnp.clip(matched.sum(axis=2), 0, 1).astype(jnp.float32)

    r_all = jnp.stack([s, e], axis=-1)  # (B, N, M, 2)
    r_sel = jnp.take_along_axis(r_all, min_idx[..., None, None], axis=2)[:, :, 0]
    reg_tgt = r_sel / stride
    return cls_tgt, reg_tgt


def _pred_gt_iou(points, reg_pred, reg_tgt):
    """Per-point IoU between decoded pred and GT boxes (loss.py:269-300)."""
    center = points[None, :, 0]
    stride = points[None, :, 3]
    ps = center - reg_pred[..., 0] * stride
    pe = center + reg_pred[..., 1] * stride
    gs = center - reg_tgt[..., 0] * stride
    ge = center + reg_tgt[..., 1] * stride
    inter = jnp.clip(jnp.minimum(pe, ge) - jnp.maximum(ps, gs), 0, None)
    union = jnp.clip(jnp.maximum(pe, ge) - jnp.minimum(ps, gs), 1e-6, None)
    return inter / union


def bundle_losses(outputs, targets, cfg: LossConfig) -> Dict[str, jnp.ndarray]:
    out: Dict[str, jnp.ndarray] = {}
    points = outputs["point"]
    msk = jnp.concatenate(outputs["pymid_msk"], axis=1).astype(jnp.float32)
    cls_tgt = None

    if cfg.loss_reg is not None or cfg.loss_qfl:
        gt_clip = targets["gt_windows"] * (1.0 / cfg.clip_length)  # * fps
        cls_tgt, reg_tgt = assign_targets(points, gt_clip, cfg.sample_radius)

    if cfg.loss_reg == "l1":
        w = jnp.repeat(cls_tgt[..., None], 2, axis=-1)
        out["loss_reg"] = l1_loss(
            outputs["out_coord"], reg_tgt, weight=w, avg_factor=w.sum()
        )
    if cfg.loss_reg is None:
        cls_tgt = targets["saliency_all_labels"]

    src = outputs["out_class"][..., 0]
    if cfg.loss_cls == "focal":
        out["loss_cls"] = sigmoid_focal_loss(
            src, cls_tgt, weight=msk, avg_factor=msk.sum()
        )
    elif cfg.loss_cls == "dynamic_bce":
        # HD path: out_class covers the stride-1 level only; targets are the
        # (padded) per-clip saliency array
        n = min(src.shape[1], cls_tgt.shape[1])
        out["loss_cls"] = dynamic_bce_loss(
            src[:, :n], cls_tgt[:, :n], weight=msk[:, :n], avg_factor=msk[:, :n].sum()
        )

    if cfg.loss_sal == "nce":
        out["loss_sal"] = sampled_nce_loss(
            outputs["video_emb"],
            outputs["query_emb"],
            outputs["video_msk"].astype(jnp.float32),
            targets["saliency_all_labels"],
            targets["saliency_pos_labels"][:, 0],
            direction=cfg.nce_direction,
        )

    if cfg.loss_qfl:
        score = _pred_gt_iou(points, outputs["out_coord"], reg_tgt)
        out["loss_qfl"] = quality_focal_loss(
            src, cls_tgt, score, weight=msk, avg_factor=msk.sum()
        )
    return out


# ---------------------------------------------------------------------------
# Entry points
# ---------------------------------------------------------------------------

def compute_losses(outputs, targets, cfg: LossConfig) -> Dict[str, jnp.ndarray]:
    losses = bundle_losses(outputs, targets, cfg)
    losses["loss_label"] = loss_label(outputs, targets)
    losses["loss_saliency"] = loss_saliency(outputs, targets, cfg)
    return losses


def loss_keys(cfg: LossConfig) -> Tuple[str, ...]:
    """The exact key set `compute_losses` produces for `cfg` — declared
    up front so the train step can return a stacked loss vector without any
    trace-time side channel (pinned by tests/test_criterion_parity.py)."""
    keys = ["loss_label", "loss_saliency"]
    if cfg.loss_reg == "l1":
        keys.append("loss_reg")
    if cfg.loss_cls in ("focal", "dynamic_bce"):
        keys.append("loss_cls")
    if cfg.loss_sal == "nce":
        keys.append("loss_sal")
    if cfg.loss_qfl:
        keys.append("loss_qfl")
    return tuple(sorted(keys))


def weighted_total(losses: Dict[str, jnp.ndarray], cfg: LossConfig):
    """Weighted sum over the reference weight_dict keys (train.py:62-64).

    Keys outside the weight_dict (e.g. loss_qfl) are logged but excluded
    from the optimization target, matching the reference quirk.
    """
    weights = {
        "loss_label": cfg.label_loss_coef,
        "loss_saliency": cfg.lw_saliency,
        "loss_reg": cfg.lw_reg,
        "loss_cls": cfg.lw_cls,
        "loss_sal": cfg.lw_sal,
    }
    return sum(losses[k] * w for k, w in weights.items() if k in losses)
