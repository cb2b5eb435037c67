"""Loss stack for the FlashVTG_ms variant.

Oracle: /root/reference/FlashVTG_ms/loss.py (SetCriterion, :250-675). The
_ms criterion is modular: margin ranking + rank-contrastive + BCE helpers
(:190-246), focal cls with alpha=-1 (:566-585), L1-or-DFL regression
(:543-564), sim-score SampledNCE (:532-541), phrase-slot orthogonality
(:417-429) and QFL (:587-601). The saliency composite keeps only the
real-negative blocks (no false-neg branches, unlike the core criterion).

The default losses list is ["saliency", "labels", "phrase_slot", "sal",
"reg", "cls", "qfl"] with weight 0 on loss_qfl (model.py:424-433) — QFL is
computed but does not influence the total.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from flashvtg_tpu.losses.basic import (
    bce_with_logits,
    distribution_focal_loss,
    quality_focal_loss,
)
from flashvtg_tpu.losses.criterion import (
    NEG_LARGE,
    _masked_scores,
    assign_targets,
    margin_pair_loss,
    rank_contrastive_loss,
)


@dataclasses.dataclass(frozen=True)
class MSLossConfig:
    label_loss_coef: float = 4.0
    lw_saliency: float = 0.1
    lw_reg: float = 0.2
    lw_cls: float = 1.0
    lw_sal: float = 0.1
    lw_phrase: float = 1.0
    lw_wattn: float = 1.0
    saliency_margin: float = 0.2
    sample_radius: float = 1.5
    use_dfl: bool = False
    num_bins: int = 16
    clip_length: float = 2.0
    dset_name: str = "tvsum"
    phrase_ortho_r: float = 0.5
    # EOS InfoNCE (loss.py:431-460); off by default — it is outside the
    # reference's default losses list (model.py:433) and its producer module
    # was deleted from the reference source (only a stale .pyc remains)
    use_eos: bool = False
    lw_eos: float = 1.0


def ms_targets(points, gt_windows, cfg: MSLossConfig):
    """cls/reg targets; with DFL, offsets quantized to bin units
    (loss.py:328-333)."""
    gt_clip = gt_windows * (1.0 / cfg.clip_length)
    cls_tgt, reg_tgt = assign_targets(points, gt_clip, cfg.sample_radius)
    if cfg.use_dfl:
        bin_size = cfg.sample_radius / (cfg.num_bins - 1)
        reg_tgt = jnp.clip(reg_tgt, 0.0, cfg.sample_radius - 1e-8) / bin_size
        reg_tgt = jnp.where(
            reg_tgt >= cfg.num_bins - 1, reg_tgt - 1e-3, reg_tgt
        )
    return cls_tgt, reg_tgt


def loss_cls_ms(out_class, cls_tgt, pymid_msk):
    """Focal loss with alpha=-1 (no class balancing), loss.py:566-585."""
    pred = out_class[..., 0]
    msk = jnp.concatenate(pymid_msk, axis=1).astype(jnp.float32)
    p = jax.nn.sigmoid(pred)
    pt = p * cls_tgt + (1 - p) * (1 - cls_tgt)
    loss = bce_with_logits(pred, cls_tgt) * (1 - pt) ** 2.0
    return (loss * msk).sum() / msk.sum()


def loss_reg_ms(out_coord, cls_tgt, reg_tgt, cfg: MSLossConfig):
    if not cfg.use_dfl:
        msk = jnp.repeat(cls_tgt[..., None], 2, axis=-1)
        diff = jnp.abs(out_coord - reg_tgt) * msk
        return diff.sum() / jnp.maximum(msk.sum(), 1.0)
    nb = cfg.num_bins
    msk = cls_tgt
    ls = distribution_focal_loss(
        out_coord[..., :nb], reg_tgt[..., 0], weight=msk, avg_factor=msk.sum()
    )
    le = distribution_focal_loss(
        out_coord[..., nb:], reg_tgt[..., 1], weight=msk, avg_factor=msk.sum()
    )
    return (ls + le) * 0.5


def loss_sal_ms(sim_score, video_msk, saliency, pos_clip,
                temperature=0.07, max_scale=100.0):
    """Sim-score SampledNCE (loss.py:138-188; cosine computed in the model)."""
    b = sim_score.shape[0]
    rows = jnp.arange(b)
    pos_scores = saliency[rows, pos_clip][:, None]
    loss_msk = (saliency <= pos_scores) * video_msk
    scale = jnp.minimum(jnp.exp(jnp.log(1.0 / temperature)), max_scale)
    # finite mask value (see losses/basic.py sampled_nce_loss): all-masked
    # columns under fixed-bucket padding would NaN the backward with -inf
    i_sim = sim_score * scale + jnp.where(loss_msk > 0, 0.0, -1e30)
    loss = 0.0
    loss -= jax.nn.log_softmax(i_sim, axis=1)[rows, pos_clip].sum() / b
    loss -= jax.nn.log_softmax(i_sim.T, axis=1)[pos_clip, rows].sum() / b
    return loss


def loss_phrase_slot(slot_att, r=0.5):
    """Orthogonality of slot attention maps (loss.py:417-429)."""
    n = slot_att.shape[1]
    eye = jnp.eye(n)[None] * r
    gram = jnp.einsum("bnl,bml->bnm", slot_att, slot_att)
    p = jnp.sqrt(jnp.clip(((gram - eye) ** 2).sum(axis=(1, 2)), 1e-12, None))
    return (p**2).mean()


def loss_qfl_ms(outputs, cls_tgt, reg_tgt, cfg: MSLossConfig):
    points = outputs["point"]
    msk = jnp.concatenate(outputs["pymid_msk"], axis=1).astype(jnp.float32)
    center = points[None, :, 0]
    stride = points[None, :, 3]
    coord = outputs["out_coord"]
    if cfg.use_dfl:
        nb = cfg.num_bins
        bins = jnp.arange(nb, dtype=coord.dtype)
        start = (jax.nn.softmax(coord[..., :nb], -1) * bins).sum(-1)
        end = (jax.nn.softmax(coord[..., nb:], -1) * bins).sum(-1)
    else:
        start, end = coord[..., 0], coord[..., 1]
    ps, pe = center - start * stride, center + end * stride
    gs = center - reg_tgt[..., 0] * stride
    ge = center + reg_tgt[..., 1] * stride
    inter = jnp.clip(jnp.minimum(pe, ge) - jnp.maximum(ps, gs), 0, None)
    union = jnp.clip(jnp.maximum(pe, ge) - jnp.minimum(ps, gs), 1e-6, None)
    score = inter / union
    return quality_focal_loss(
        outputs["out_class"][..., 0], cls_tgt, score, weight=msk,
        avg_factor=msk.sum(),
    )


def loss_eos_ms(eos_slot, eos_emb, context_agg, pos_clip, temperature=0.1):
    """EOS InfoNCE (oracle: FlashVTG_ms/loss.py:431-460).

    Two in-batch InfoNCE terms over l2-normalized vectors at temperature 0.1:
    (1) eos_slot[i] must retrieve eos_emb[i] among the batch; (2) eos_slot[i]
    must retrieve its own video's first positive-clip feature (from
    context_agg) among the batch.

    Args:
      eos_slot: (B, 1, C) video-side EOS summary slot.
      eos_emb: (B, 1, C) EOS sentence embedding.
      context_agg: (B, T, C) aggregated phrase-context video features.
      pos_clip: (B,) index of the first positive clip per row.
    """
    def l2n(x):
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(1e-12)

    slot = l2n(eos_slot[:, 0])  # (B, C)
    emb = l2n(eos_emb[:, 0])
    b = slot.shape[0]
    rows = jnp.arange(b)

    logits = slot @ emb.T / temperature
    loss_eos_eos = -jax.nn.log_softmax(logits, axis=1)[rows, rows].mean()

    pos_feat = l2n(context_agg[rows, pos_clip])  # (B, C)
    logits2 = slot @ pos_feat.T / temperature
    loss_eos_pos = -jax.nn.log_softmax(logits2, axis=1)[rows, rows].mean()
    return loss_eos_eos + loss_eos_pos


def loss_saliency_ms(outputs, targets, cfg: MSLossConfig):
    """Real-neg margin/rank/neg-pair + t2v channel with BCE (loss.py:471-530)."""
    labels = targets["saliency_all_labels"]
    valid = outputs["video_msk"].astype(jnp.float32)
    pos_idx = targets["saliency_pos_labels"]
    neg_idx = targets["saliency_neg_labels"]
    real_neg = outputs["real_neg_mask"]
    n_real = jnp.maximum(real_neg.sum(), 1e-6)

    def channel(scores, scores_neg, neg_is_prob):
        if neg_is_prob:
            per_clip = -jnp.log(jnp.clip(1.0 - scores_neg, 1e-12, None))
        else:
            per_clip = -jnp.log(
                jnp.clip(1.0 - jax.nn.sigmoid(scores_neg), 1e-12, None)
            )
        neg_pair = ((per_clip * valid).sum(1) * real_neg).sum() / n_real
        cat_scores = _masked_scores(
            jnp.concatenate([scores, scores_neg], axis=1),
            jnp.concatenate([valid, valid], axis=1),
        )
        cat_labels = jnp.concatenate([labels, jnp.zeros_like(labels)], axis=1)
        cat_valid = jnp.concatenate([valid, valid], axis=1)
        rank = rank_contrastive_loss(cat_scores, cat_labels, cat_valid, real_neg)
        # note: _ms margin loss has no *2 scale factor (loss.py:207-208)
        margin = margin_pair_loss(
            scores, pos_idx, neg_idx, cfg.saliency_margin
        ) / 2.0
        return margin + neg_pair + rank

    sal = channel(
        outputs["saliency_scores"], outputs["saliency_scores_neg"], False
    )
    attn = channel(
        outputs["t2vattnvalues"], outputs["t2vattnvalues_neg"], True
    )
    probs = jnp.clip(outputs["t2vattnvalues"], 1e-7, 1 - 1e-7)
    binary = jnp.clip(labels, 0.0, 1.0)
    bce = -(binary * jnp.log(probs) + (1 - binary) * jnp.log(1 - probs)).mean()
    return sal + cfg.lw_wattn * (attn + bce)


def loss_label_ms(outputs, targets):
    sal = targets["saliency_all_labels"]
    conf = outputs["out_class"][:, : sal.shape[1], 0]

    def norm(x):
        return (x - x.min()) / (x.max() - x.min())

    return ((norm(sal) - norm(conf)) ** 2).mean()


def compute_losses_ms(outputs, targets, cfg: MSLossConfig) -> Dict[str, jnp.ndarray]:
    cls_tgt, reg_tgt = ms_targets(outputs["point"], targets["gt_windows"], cfg)
    losses = {
        "loss_saliency": loss_saliency_ms(outputs, targets, cfg),
        "loss_label": loss_label_ms(outputs, targets),
        "loss_phrase_slot": loss_phrase_slot(
            outputs["slot_att"], cfg.phrase_ortho_r
        ),
        "loss_sal": loss_sal_ms(
            outputs["sim_score"],
            outputs["video_msk"].astype(jnp.float32),
            targets["saliency_all_labels"],
            targets["saliency_pos_labels"][:, 0],
        ),
        "loss_reg": loss_reg_ms(outputs["out_coord"], cls_tgt, reg_tgt, cfg),
        "loss_cls": loss_cls_ms(
            outputs["out_class"], cls_tgt, outputs["pymid_msk"]
        ),
        "loss_qfl": loss_qfl_ms(outputs, cls_tgt, reg_tgt, cfg),
    }
    if cfg.use_eos:
        losses["loss_eos"] = loss_eos_ms(
            outputs["eos_slot"],
            outputs["eos_emb"],
            outputs["context_agg"],
            targets["saliency_pos_labels"][:, 0],
        )
    return losses


def loss_keys_ms(cfg: MSLossConfig) -> Tuple[str, ...]:
    """The exact key set `compute_losses_ms` produces for `cfg` (see
    criterion.loss_keys)."""
    keys = [
        "loss_saliency", "loss_label", "loss_phrase_slot", "loss_sal",
        "loss_reg", "loss_cls", "loss_qfl",
    ]
    if cfg.use_eos:
        keys.append("loss_eos")
    return tuple(sorted(keys))


def weighted_total_ms(losses: Dict[str, jnp.ndarray], cfg: MSLossConfig):
    weights = {
        "loss_label": cfg.label_loss_coef,
        "loss_saliency": cfg.lw_saliency,
        "loss_reg": cfg.lw_reg,
        "loss_cls": cfg.lw_cls,
        "loss_sal": cfg.lw_sal,
        "loss_phrase_slot": cfg.lw_phrase,
        "loss_qfl": 0.0,  # in the weight_dict with weight 0 (model.py:431)
        "loss_eos": cfg.lw_eos,
    }
    return sum(losses[k] * w for k, w in weights.items() if k in losses)
