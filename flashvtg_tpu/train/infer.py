"""Batched inference: features -> ranked moments + saliency -> metrics.

Oracle: FlashVTG/inference.py (eval_epoch / compute_mr_results /
compute_hl_results). Key TPU re-design: the reference is locked to
batch-size-1 eval (model.py:248 assert) with per-query Python decode; here
forward + decode + top-k run as one jitted XLA program over a whole batch of
queries, and NMS runs batched on device. Host code only formats jsonl rows.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flashvtg_tpu.data.collate import Collator
from flashvtg_tpu.data.dataset import VTGDataset
from flashvtg_tpu.eval.hl import compute_hl_map
from flashvtg_tpu.eval.metrics import eval_submission
from flashvtg_tpu.eval.postprocess import build_post_processor
from flashvtg_tpu.models.flashvtg import FlashVTGModel, decode_boundaries
from flashvtg_tpu.models.points import pyramid_masks_strict
from flashvtg_tpu.ops.nms import suppress_overlaps


@functools.lru_cache(maxsize=16)
def make_eval_step(model: FlashVTGModel, top_k: int, precision: str = "float32",
                   saliency_only: bool = False):
    """One jitted program: forward + decode + rank for a query batch.

    `precision` sets the MXU matmul passes: "float32" (6-pass bf16, exact
    parity with the f32 reference), "tensorfloat32" (3-pass), or "bfloat16"
    (fastest; the default-precision TPU mode, ~1e-2 relative error).
    `saliency_only` skips the boundary decode (HL datasets consume only the
    saliency channel).
    """

    use_dfl = bool(getattr(model.cfg, "use_dfl", False))

    @jax.jit
    def step(params, src_txt, src_txt_mask, src_vid, src_vid_mask, point_valid):
        with jax.default_matmul_precision(precision):
            out = model.apply(
                params, src_txt, src_txt_mask, src_vid, src_vid_mask,
                point_valid=point_valid, train=False,
            )
        if saliency_only:
            sal = out["saliency_scores"]
            return sal, sal, sal  # uniform arity with the MR step
        if use_dfl:
            from flashvtg_tpu.models.flashvtg_ms import decode_boundaries_dfl

            spans, scores = decode_boundaries_dfl(
                out["out_class"], out["out_coord"], out["point"],
                model.cfg.clip_length, model.cfg.num_bins,
                model.cfg.sample_radius, point_valid=point_valid, top_k=top_k,
            )
        else:
            spans, scores = decode_boundaries(
                out["out_class"],
                out["out_coord"],
                out["point"],
                model.cfg.clip_length,
                point_valid=point_valid,
                top_k=top_k,
            )
        return spans, scores, out["saliency_scores"]

    return step


def _batched(dataset: VTGDataset, collator: Collator, bsz: int):
    n = len(dataset)
    for i in range(0, n, bsz):
        idx = list(range(i, min(i + bsz, n)))
        real = len(idx)
        while len(idx) < bsz:  # pad the tail batch for a static batch size
            idx.append(idx[-1])
        yield real, collator([dataset[j] for j in idx])


def run_mr_inference(
    cfg,
    model: FlashVTGModel,
    params,
    dataset: VTGDataset,
    nms_thd: Optional[float] = None,
) -> Tuple[List[dict], Optional[List[dict]]]:
    """Produce submission rows (and NMS'd rows) for an MR dataset."""
    collator = Collator(
        max_q_l=cfg.max_q_l,
        v_buckets=cfg.v_buckets,
        max_windows=cfg.max_windows,
        dset_name=cfg.dset_name,
        fixed_v_len=cfg.max_v_l if cfg.max_v_l > 0 else None,
    )
    step = make_eval_step(
        model, cfg.max_num_moment, getattr(cfg, "eval_precision", "float32")
    )
    nms = nms_thd if nms_thd is not None else cfg.nms_thd

    submission: List[dict] = []
    all_spans, all_scores = [], []
    for real, batch in _batched(dataset, collator, cfg.eval_bsz):
        lv = batch["src_vid"].shape[1]
        strict, counts = pyramid_masks_strict(
            batch["valid_v_lens"], lv, cfg.strides
        )
        spans, scores, saliency = step(
            params,
            batch["src_txt"],
            batch["src_txt_mask"],
            batch["src_vid"],
            batch["src_vid_mask"],
            jnp.asarray(strict),
        )
        spans = np.asarray(spans)
        scores = np.asarray(scores)
        saliency = np.asarray(saliency)
        for j in range(real):
            meta = batch["meta"][j]
            n = min(cfg.max_num_moment, int(counts[j]))
            dur = meta.get("duration", 1e9)
            win = np.clip(spans[j, :n], 0, dur)
            rows = [
                [float(f"{a:.4f}"), float(f"{b:.4f}"), float(f"{s:.4f}")]
                for (a, b), s in zip(win, scores[j, :n])
            ]
            entry = dict(
                qid=meta["qid"],
                query=meta.get("query", ""),
                vid=meta["vid"],
                pred_relevant_windows=rows,
            )
            lvalid = int(batch["valid_v_lens"][j])
            entry["pred_saliency_scores"] = [
                float(f"{s:.4f}") for s in saliency[j, :lvalid]
            ]
            submission.append(entry)
            all_spans.append(win)
            all_scores.append(np.asarray(scores[j, :n]))

    post = build_post_processor(cfg.dset_name, cfg.clip_length, cfg.v_feat_dim)
    submission = post(submission)

    if cfg.dset_name in ("charadesSTA", "charadesSTA_internvideo2", "tacos", "nlq"):
        for s in submission:
            s.pop("pred_saliency_scores", None)

    submission_nms = None
    if nms is not None and nms != -1:
        submission_nms = apply_nms(submission, nms, cfg.nms_type)
    return submission, submission_nms


def apply_nms(submission: List[dict], nms_thd: float, nms_type: str):
    """Batched on-device NMS over every query's ranked windows
    (replaces the host loop of inference.py:36-57)."""
    k = max(len(s["pred_relevant_windows"]) for s in submission)
    n = len(submission)
    spans = np.zeros((n, k, 2), np.float32)
    scores = np.zeros((n, k), np.float32)
    for i, s in enumerate(submission):
        rows = np.asarray(s["pred_relevant_windows"], np.float32)
        m = len(rows)
        spans[i, :m] = rows[:, :2]
        scores[i, :m] = rows[:, 2]
        # park unused slots far away so they cannot suppress real windows
        if m < k:
            far = 1e7 + np.arange(k - m, dtype=np.float32)[:, None] * 10
            spans[i, m:] = np.concatenate([far, far + 1], axis=1)

    out_spans, out_scores = suppress_overlaps(
        jnp.asarray(spans), jnp.asarray(scores), nms_thd, nms_type
    )
    out_spans, out_scores = np.asarray(out_spans), np.asarray(out_scores)
    result = []
    for i, s in enumerate(submission):
        m = len(s["pred_relevant_windows"])
        keep = out_spans[i, :, 0] < 1e6  # drop parked pad slots
        rows = [
            [float(a), float(b), float(f"{sc:.4f}")]
            for (a, b), sc in zip(out_spans[i][keep][:m], out_scores[i][keep][:m])
        ]
        result.append({**s, "pred_relevant_windows": rows})
    return result


def run_hl_inference(cfg, model: FlashVTGModel, params, dataset: VTGDataset):
    """TVSum / YouTube-HL: per-domain top-5 mAP over predicted saliency."""
    collator = Collator(
        max_q_l=cfg.max_q_l,
        v_buckets=cfg.v_buckets,
        dset_name=cfg.dset_name,
        fixed_v_len=cfg.max_v_l if cfg.max_v_l > 0 else None,
    )
    step = make_eval_step(
        model, cfg.max_num_moment, getattr(cfg, "eval_precision", "float32"),
        saliency_only=True,
    )
    preds, labels = [], []
    for real, batch in _batched(dataset, collator, cfg.eval_bsz):
        lv = batch["src_vid"].shape[1]
        strict, _ = pyramid_masks_strict(batch["valid_v_lens"], lv, cfg.strides)
        _, _, saliency = step(
            params,
            batch["src_txt"],
            batch["src_txt_mask"],
            batch["src_vid"],
            batch["src_vid_mask"],
            jnp.asarray(strict),
        )
        saliency = np.asarray(saliency)
        for j in range(real):
            preds.append(saliency[j])
            labels.append(batch["meta"][j]["label"])
    return {"brief": {"mAP": round(compute_hl_map(cfg.dset_name, preds, labels), 5)}}


def evaluate_submission(submission, gt_data, match_number=True):
    return eval_submission(submission, gt_data, verbose=False, match_number=match_number)
