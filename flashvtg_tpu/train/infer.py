"""Batched inference: features -> ranked moments + saliency -> metrics.

Oracle: FlashVTG/inference.py (eval_epoch / compute_mr_results /
compute_hl_results). Key TPU re-design: the reference is locked to
batch-size-1 eval (model.py:248 assert) with per-query Python decode; here
forward + decode + top-k (and, on the val split, the full criterion — the
reference logs eval losses too, inference.py:300-306) run as one jitted XLA
program over a whole batch of queries, and NMS runs batched on device. Host
code only formats jsonl rows. Batches are software-pipelined: up to
`PIPELINE_DEPTH` batches are dispatched before the oldest result is fetched,
so host-side collation and H2D transfers overlap device compute (per-dispatch
latency dominates on tunneled TPU targets).
"""

from __future__ import annotations

import functools
from collections import deque
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flashvtg_tpu.data.collate import Collator, device_arrays
from flashvtg_tpu.data.dataset import VTGDataset
from flashvtg_tpu.eval.hl import compute_hl_map
from flashvtg_tpu.eval.metrics import eval_submission
from flashvtg_tpu.eval.postprocess import build_post_processor
from flashvtg_tpu.models.flashvtg import FlashVTGModel, decode_boundaries
from flashvtg_tpu.models.points import pyramid_masks_strict
from flashvtg_tpu.ops.nms import suppress_overlaps

# batches in flight before the oldest is fetched; bounds device memory to
# O(depth) batches of inputs+outputs while hiding fetch latency
PIPELINE_DEPTH = 4


def _eval_shardings(mesh):
    """(data-axis sharding, replicated sharding) for sharded eval, or
    (None, None) when no mesh (or a trivial one) is given. Eval is
    embarrassingly data-parallel: batches shard over the mesh's "data" axis
    exactly like training batches, params/feed stay replicated, and each
    chip decodes its rows — the reference is locked to bsz=1 on one GPU
    (model.py:248)."""
    if mesh is None or mesh.shape.get("data", 1) <= 1:
        return None, None
    from flashvtg_tpu.parallel.mesh import data_axis_sharding, replicated

    return data_axis_sharding(mesh), replicated(mesh)


def _batch_putter(data_sh):
    """Returns put(arrs) placing a dict of batch-leading arrays: sharded
    over the data axis when every row count divides the mesh, else local.
    (Binary tail sub-batches rarely divide the mesh and then run on one
    device — acceptable: they are tiny and separately-compiled anyway.)"""

    def put(arrs):
        if data_sh is not None:
            n_data = data_sh.mesh.shape["data"]
            rows = {np.shape(v)[0] for v in arrs.values()}
            if all(r % n_data == 0 for r in rows):
                return {k: jax.device_put(v, data_sh) for k, v in arrs.items()}
        return {k: jnp.asarray(v) for k, v in arrs.items()}

    return put




@functools.lru_cache(maxsize=16)
def make_eval_step(model: FlashVTGModel, top_k: int, precision: str = "float32",
                   saliency_only: bool = False, loss_cfg=None,
                   use_feed: bool = False, packed: bool = False):
    """One jitted program: forward + decode + rank (+ criterion) for a batch.

    `precision` sets the MXU matmul passes: "float32" (6-pass bf16, exact
    parity with the f32 reference), "tensorfloat32" (3-pass), or "bfloat16"
    (fastest; the default-precision TPU mode, ~1e-2 relative error).
    `saliency_only` skips the boundary decode (HL datasets consume only the
    saliency channel). `loss_cfg` (a hashable LossConfig / MSLossConfig)
    additionally evaluates the criterion inside the same program — the batch
    must then carry labels; the negative trunk pass is forced to match the
    reference, whose `use_neg` branch is not train-gated (model.py:268).

    step(params, batch, point_valid) ->
        (spans, scores, saliency, losses_dict)
    With `use_feed` the signature becomes
    step(params, small_batch, idx, feed, point_valid): the feature/mask
    tensors are gathered on-device from the HBM-resident feed by row index
    (data/feed.py) instead of streaming ~tens of MB per batch over the
    host->device link.

    With `packed` the step instead returns ONE (B, C) float32 array laying
    out [spans·2K | scores·K | saliency·Lv | losses·L(broadcast rows)] —
    on tunneled targets every host fetch pays a ~25 ms round-trip
    regardless of size, so one fetch per batch instead of 3+L is the
    difference between a wire-bound and a device-bound eval. The returned
    function carries `.loss_keys` (static order of the loss block) and
    `.unpack(arr, lv)` -> (spans, scores, saliency, losses_dict).
    """

    use_dfl = bool(getattr(model.cfg, "use_dfl", False))

    def _losses(out, batch):
        from flashvtg_tpu.losses.criterion import compute_losses, weighted_total
        from flashvtg_tpu.losses.criterion_ms import (
            MSLossConfig,
            compute_losses_ms,
            weighted_total_ms,
        )

        if isinstance(loss_cfg, MSLossConfig):
            losses = compute_losses_ms(out, batch, loss_cfg)
            losses["weighted_loss_overall"] = weighted_total_ms(losses, loss_cfg)
        else:
            losses = compute_losses(out, batch, loss_cfg)
            losses["weighted_loss_overall"] = weighted_total(losses, loss_cfg)
        return losses

    def _step(params, batch, point_valid):
        with jax.default_matmul_precision(precision):
            out = model.apply(
                params,
                batch["src_txt"],
                batch["src_txt_mask"],
                batch["src_vid"],
                batch["src_vid_mask"],
                real_neg_mask=batch.get("real_neg_mask"),
                point_valid=point_valid,
                train=False,
                force_neg=loss_cfg is not None,
            )
        losses = _losses(out, batch) if loss_cfg is not None else {}
        if saliency_only:
            sal = out["saliency_scores"]
            return sal, sal, sal, losses  # uniform arity with the MR step
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
        return spans, scores, out["saliency_scores"], losses

    from flashvtg_tpu.losses import declared_loss_keys

    kys = declared_loss_keys(loss_cfg)

    def _packed_step(params, batch, point_valid):
        spans, scores, sal, losses = _step(params, batch, point_valid)
        b = sal.shape[0]
        parts = []
        if not saliency_only:
            parts += [spans.reshape(b, -1), scores]
        parts.append(sal)
        if kys:
            lvec = jnp.stack([losses[k] for k in kys]).astype(jnp.float32)
            parts.append(jnp.broadcast_to(lvec[None, :], (b, len(kys))))
        return jnp.concatenate(
            [p.astype(jnp.float32) for p in parts], axis=1
        )

    def _unpack(arr: np.ndarray, lv: int):
        """Host-side inverse of _packed_step for one fetched (B, C) array."""
        off = 0
        spans = scores = None
        if not saliency_only:
            k = (arr.shape[1] - lv - len(kys)) // 3
            spans = arr[:, : 2 * k].reshape(arr.shape[0], k, 2)
            scores = arr[:, 2 * k : 3 * k]
            off = 3 * k
        sal = arr[:, off : off + lv]
        losses = dict(zip(kys, arr[0, off + lv :].astype(float)))
        return spans, scores, sal, losses

    inner = _packed_step if packed else _step

    if not use_feed:
        fn = jax.jit(inner)
    else:

        @jax.jit
        def fn(params, small_batch, idx, feed, point_valid):
            batch = dict(small_batch)
            for k, store in feed.items():
                batch[k] = store[idx]
            return inner(params, batch, point_valid)

    fn.loss_keys = kys
    fn.unpack = _unpack
    return fn


def _tail_bucket(n: int, bsz: int) -> int:
    """Largest power-of-two (capped at bsz) that FITS a tail of n rows.
    The remainder splits into its binary decomposition (e.g. 14 -> 8+4+2),
    so every eval batch is exactly full at a static bucket size: no
    duplicated pad rows (which would bias in-jit eval-loss means) and no
    wasted recompute. Cost: the tail runs as up to log2(bsz) batches where
    the old pad-up scheme ran one — a few extra tiny dispatches (and, on a
    mesh, tail parts rarely divide the data axis, so they run single-chip)
    per eval epoch. The possible compiled sizes stay the powers of two up
    to bsz. Accepted: the tail is <1 batch of a split and the loss means
    must be exact."""
    b = 1
    while b * 2 <= min(n, bsz):
        b *= 2
    return b


def _batched(dataset: VTGDataset, collator: Collator, bsz: int, order=None):
    n = len(dataset)
    order = list(range(n)) if order is None else list(order)
    i = 0
    while i < n:
        take = bsz if n - i >= bsz else _tail_bucket(n - i, bsz)
        idx = order[i : i + take]
        yield len(idx), idx, collator([dataset[j] for j in idx])
        i += take


def _maybe_device_feed(cfg, dataset: VTGDataset, fixed_v_len, sharding=None):
    """HBM-resident eval feed (cached on the dataset across eval epochs);
    None when disabled, shapes are bucketed, the dataset applies per-access
    txt_drop (streamed and resident text would then differ), or the set
    exceeds what is LEFT of the shared HBM budget (the training feed may
    already be resident). Eval feeds always stay float32 (parity mode).
    `sharding` (usually replicated over the eval mesh) places the resident
    tensors on every chip of a data-parallel eval."""
    from flashvtg_tpu.data.feed import (
        build_device_feed,
        estimate_feed_bytes,
        resident_feed_bytes,
    )

    if getattr(cfg, "device_feed", "off") == "off" or fixed_v_len is None:
        return None
    if dataset.cfg.txt_drop_ratio > 0:
        return None
    key = (fixed_v_len, cfg.max_q_l, sharding)
    cached = getattr(dataset, "_device_feed_cache", None)
    if cached is not None and cached[0] == key:
        return cached[1]
    if cfg.device_feed != "on":
        est = estimate_feed_bytes(
            len(dataset), fixed_v_len, cfg.total_v_feat_dim,
            cfg.max_q_l, cfg.t_feat_dim, 4,
        )
        if est > cfg.device_feed_budget_gb * 2**30 - resident_feed_bytes():
            return None
    collator = Collator(
        max_q_l=cfg.max_q_l, v_buckets=cfg.v_buckets,
        dset_name=cfg.dset_name, fixed_v_len=fixed_v_len,
    )
    feed = build_device_feed(dataset, collator, sharding=sharding)
    dataset._device_feed_cache = (key, feed)
    return feed


def _has_labels(dataset: VTGDataset) -> bool:
    """Whether samples actually carry training labels (a test split may
    load_labels=True yet have no GT fields) — probed without consuming the
    dataset's label-sampling RNG stream."""
    if not len(dataset) or not dataset.cfg.load_labels:
        return False
    state = dataset.rng.getstate()
    try:
        _, sample = dataset[0]
    finally:
        dataset.rng.setstate(state)
    return "saliency_all_labels" in sample


def _eval_plan(cfg, dataset: VTGDataset):
    """(fixed_v_len, iteration order) for the eval batcher.

    With `bucket_eval` the queries are visited longest-video-first so each
    batch lands in one length bucket (homogeneous shapes -> few compiles,
    little padding); submissions are keyed by qid, so order is free."""
    if getattr(cfg, "bucket_eval", False):
        lens = [float(r.get("duration", 0.0)) for r in dataset.data]
        return None, list(np.argsort(lens)[::-1])
    return (cfg.max_v_l if cfg.max_v_l > 0 else None), None


def _strict_or_none(strict, valid_v_lens, lv):
    """Drop the strict pyramid mask for batches with no padded rows.

    When every video fills the bucket (valid len == lv) the strict masks are
    all-ones, so every masked op they feed is an identity — but the model
    still pays the compact-convolve-scatter of the conf head
    (models/flashvtg.py) for them. point_valid=None takes the direct path:
    bit-identical outputs (pinned by test_bucketing), measurably faster on
    full-length buckets (the common case on QVHighlights, where most videos
    span the full 75 clips)."""
    if int(np.min(valid_v_lens)) == lv:
        return None
    return strict


def _place_and_step(step, params, put, feed, batch, idx, strict):
    """Place one collated batch and invoke the jitted eval step — the one
    spot that knows the feed-mode vs streamed-mode calling conventions
    (shared by the MR and HL dispatch paths)."""
    extra = {} if strict is None else {"strict": strict}
    if feed is not None:
        from flashvtg_tpu.data.feed import FEED_KEYS

        small = put({
            k: v for k, v in device_arrays(batch).items()
            if k not in FEED_KEYS
        })
        placed = put({"idx": np.asarray(idx, np.int32), **extra})
        return step(params, small, placed["idx"], feed, placed.get("strict"))
    placed = put({**device_arrays(batch), **extra})
    strict_dev = placed.pop("strict", None)
    return step(params, placed, strict_dev)


def _pipelined(fn, items, depth: int = PIPELINE_DEPTH):
    """Dispatch fn over items keeping up to `depth` results in flight;
    yields (item, result) in order. fn must only *dispatch* device work —
    the caller's consumption of the result is the fence."""
    q: deque = deque()
    for item in items:
        q.append((item, fn(item)))
        if len(q) >= depth:
            yield q.popleft()
    while q:
        yield q.popleft()


def run_mr_inference(
    cfg,
    model: FlashVTGModel,
    params,
    dataset: VTGDataset,
    nms_thd: Optional[float] = None,
    loss_cfg=None,
    mesh=None,
) -> Tuple[List[dict], Optional[List[dict]], Dict[str, float]]:
    """Produce submission rows (and NMS'd rows) for an MR dataset.

    When `loss_cfg` is given and the dataset carries labels, the criterion is
    evaluated inside the same jitted program and per-batch means are
    aggregated into the returned eval-loss dict (reference parity:
    inference.py:300-306 accumulates criterion losses on the val split).
    With `mesh`, each batch is sharded over the mesh's "data" axis (params
    must be replicated over it) so eval runs data-parallel across chips.
    """
    fixed_v_len, order = _eval_plan(cfg, dataset)
    with_losses = loss_cfg is not None and _has_labels(dataset)
    data_sh, rep_sh = _eval_shardings(mesh)
    put = _batch_putter(data_sh)
    feed = _maybe_device_feed(cfg, dataset, fixed_v_len, sharding=rep_sh)
    collator = Collator(
        max_q_l=cfg.max_q_l,
        v_buckets=cfg.v_buckets,
        max_windows=cfg.max_windows,
        dset_name=cfg.dset_name,
        fixed_v_len=fixed_v_len,
        # feed mode: features are HBM-resident — don't pad them on the host
        pad_features=feed is None,
    )
    step = make_eval_step(
        model, cfg.max_num_moment, getattr(cfg, "eval_precision", "float32"),
        loss_cfg=loss_cfg if with_losses else None,
        use_feed=feed is not None, packed=True,
    )
    nms = nms_thd if nms_thd is not None else cfg.nms_thd

    def dispatch(item):
        real, idx, batch = item
        lv = fixed_v_len if feed is not None else batch["src_vid"].shape[1]
        strict, counts = pyramid_masks_strict(
            batch["valid_v_lens"], lv, cfg.strides
        )
        strict = _strict_or_none(strict, batch["valid_v_lens"], lv)
        dev = _place_and_step(step, params, put, feed, batch, idx, strict)
        return counts, lv, dev

    submission: List[dict] = []
    # eval losses: every batch is exactly full at its bucket size (binary
    # tail decomposition in _batched), so the per-batch in-jit means are
    # unbiased and aggregate weighted by true row counts
    loss_sums: Dict[str, float] = {}
    loss_weight = 0.0
    for (real, idx, batch), (counts, lv, dev) in _pipelined(
        dispatch, _batched(dataset, collator, cfg.eval_bsz, order)
    ):
        # ONE host fetch per batch: the packed array carries spans, scores,
        # saliency and the loss vector together (~25 ms round-trip each
        # fetch on tunneled chips — this loop used to pay it 3+L times)
        spans, scores, saliency, host_losses = step.unpack(np.asarray(dev), lv)
        if host_losses:
            for k, v in host_losses.items():
                loss_sums[k] = loss_sums.get(k, 0.0) + float(v) * real
            loss_weight += real
        # 4-decimal rounding via np.round IN FLOAT64 (vectorized): for
        # float32-origin values this reproduces float(f"{x:.4f}") exactly
        # (0 flips over 700k values incl. an adversarial decimal-tie set;
        # rounding in f32 flips ~1e-4 of them) and serializes as the clean
        # shortest-repr doubles the f-string produced — at ~100x fewer
        # Python-level ops over the ~300k values of a full val split
        sal_r = np.round(saliency.astype(np.float64), 4)
        for j in range(real):
            meta = batch["meta"][j]
            n = min(cfg.max_num_moment, int(counts[j]))
            dur = meta.get("duration", 1e9)
            win = np.clip(spans[j, :n], 0, dur)
            rows = np.round(
                np.concatenate(
                    [win, scores[j, :n, None]], axis=1
                ).astype(np.float64),
                4,
            ).tolist()
            entry = dict(
                qid=meta["qid"],
                query=meta.get("query", ""),
                vid=meta["vid"],
                pred_relevant_windows=rows,
            )
            lvalid = int(batch["valid_v_lens"][j])
            entry["pred_saliency_scores"] = sal_r[j, :lvalid].tolist()
            submission.append(entry)

    post = build_post_processor(cfg.dset_name, cfg.clip_length, cfg.v_feat_dim)
    submission = post(submission)

    if cfg.dset_name in ("charadesSTA", "charadesSTA_internvideo2", "tacos", "nlq"):
        for s in submission:
            s.pop("pred_saliency_scores", None)

    submission_nms = None
    if nms is not None and nms != -1:
        submission_nms = apply_nms(submission, nms, cfg.nms_type)
    eval_losses = {
        k: v / loss_weight for k, v in loss_sums.items()
    } if loss_weight else {}
    return submission, submission_nms, eval_losses


def apply_nms(submission: List[dict], nms_thd: float, nms_type: str):
    """Batched on-device NMS over every query's ranked windows
    (replaces the host loop of inference.py:36-57)."""
    k = max(len(s["pred_relevant_windows"]) for s in submission)
    n = len(submission)
    if all(len(s["pred_relevant_windows"]) == k for s in submission):
        # common case (every query ranked to the same top-k): one C-level
        # conversion instead of n separate np.asarray calls
        arr = np.asarray(
            [s["pred_relevant_windows"] for s in submission], np.float32
        )
        spans = np.ascontiguousarray(arr[..., :2])
        scores = np.ascontiguousarray(arr[..., 2])
    else:
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
        # scores serialize as the f64 expansion of their f32 value, NOT
        # re-rounded to 4dp: the reference's NMS round-trips each row
        # through a default-dtype torch.tensor (inference.py:39 + :54
        # .tolist()), so its nms jsonl carries f32 noise like
        # 0.4659000039100647 — reproduced here byte-for-byte
        rows = np.concatenate(
            [
                out_spans[i][keep][:m].astype(np.float64),
                out_scores[i][keep][:m].astype(np.float64)[:, None],
            ],
            axis=1,
        ).tolist()
        result.append({**s, "pred_relevant_windows": rows})
    return result


def run_hl_inference(cfg, model: FlashVTGModel, params, dataset: VTGDataset,
                     mesh=None):
    """TVSum / YouTube-HL: per-domain top-5 mAP over predicted saliency."""
    fixed_v_len, order = _eval_plan(cfg, dataset)
    data_sh, rep_sh = _eval_shardings(mesh)
    put = _batch_putter(data_sh)
    feed = _maybe_device_feed(cfg, dataset, fixed_v_len, sharding=rep_sh)
    collator = Collator(
        max_q_l=cfg.max_q_l,
        v_buckets=cfg.v_buckets,
        dset_name=cfg.dset_name,
        fixed_v_len=fixed_v_len,
        pad_features=feed is None,
    )
    step = make_eval_step(
        model, cfg.max_num_moment, getattr(cfg, "eval_precision", "float32"),
        saliency_only=True, use_feed=feed is not None,
    )

    def dispatch(item):
        real, idx, batch = item
        lv = fixed_v_len if feed is not None else batch["src_vid"].shape[1]
        strict, _ = pyramid_masks_strict(batch["valid_v_lens"], lv, cfg.strides)
        strict = _strict_or_none(strict, batch["valid_v_lens"], lv)
        return _place_and_step(step, params, put, feed, batch, idx, strict)

    preds, labels = [], []
    for (real, idx, batch), dev in _pipelined(
        dispatch, _batched(dataset, collator, cfg.eval_bsz, order)
    ):
        saliency = np.asarray(dev[2])
        for j in range(real):
            preds.append(saliency[j])
            labels.append(batch["meta"][j]["label"])
    return {"brief": {"mAP": round(compute_hl_map(cfg.dset_name, preds, labels), 5)}}


def evaluate_submission(submission, gt_data, match_number=True):
    return eval_submission(submission, gt_data, verbose=False, match_number=match_number)
