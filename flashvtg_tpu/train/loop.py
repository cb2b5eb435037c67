"""Training loop: jitted train step, StepLR, early stopping, checkpoints.

Oracle: FlashVTG/train.py (train / train_hl / train_epoch). TPU re-design:
  * one jitted train step containing forward (+ negative pass), all losses,
    global-norm gradient clipping and the AdamW update — no host round-trips
    inside an epoch beyond data feeding;
  * params/opt_state buffers are donated to the step, and per-step loss
    vectors accumulate into a donated on-device (steps, K) buffer so the
    host fetches exactly ONE array per epoch;
  * optax AdamW + piecewise-constant StepLR (gamma 0.5 every lr_drop epochs;
    the reference's `lr_scheduler.step(losses)` on a StepLR is epoch-stepped
    decay — quirk preserved in effect, not in API);
  * orbax checkpoints of the full train state (_latest each epoch, _best on
    metric improvement) with resume support;
  * data parallelism via jax.sharding, ON by default: `train()` builds a
    (data, model) mesh over the local chips whose data size is the largest
    device count dividing the batch size, shards every batch over "data",
    replicates params, and lets XLA insert the gradient all-reduce over ICI.
    Multi-host runs additionally split dataset rows per process (DCN level).
    The reference is strictly single-GPU (config.py:234).
"""

from __future__ import annotations

import contextlib
import dataclasses
import functools
import json
import logging
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from flashvtg_tpu.data.collate import Collator, device_arrays
from flashvtg_tpu.data.dataset import DataConfig, VTGDataset, strip_vid_suffix
from flashvtg_tpu.losses.criterion import compute_losses, weighted_total
from flashvtg_tpu.train.config import ExperimentConfig
from flashvtg_tpu.train.infer import run_hl_inference, run_mr_inference
from flashvtg_tpu.utils.io import AverageMeter, save_json, save_jsonl

logger = logging.getLogger(__name__)


def make_optimizer(cfg: ExperimentConfig, steps_per_epoch: int):
    """AdamW with StepLR(lr_drop, gamma) and global-norm clipping
    (oracle: inference.py:443-444 + train.py:72-75)."""
    boundaries = {}
    drop = cfg.lr_drop * steps_per_epoch
    if drop > 0:
        for k in range(1, 50):
            boundaries[k * drop] = cfg.lr_gamma
    schedule = optax.piecewise_constant_schedule(cfg.lr, boundaries)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip) if cfg.grad_clip > 0
        else optax.identity(),
        optax.adamw(schedule, weight_decay=cfg.wd),
    )
    return tx, schedule


def make_train_step(
    model, loss_cfg, tx, precision: str = "bfloat16",
    dropout_rng_impl: str = "threefry",
):
    """Build the jitted train step.

    Returns a host-facing callable
        run_step(params, opt_state, batch, rng) -> (params, opt_state, dict)
    with attributes for the production loop:
      * .device_step — same update, returns the stacked loss vector on
        device (no donation: callers may reuse their input buffers);
      * .epoch_step(params, opt_state, loss_buf, ix, batch, rng) — donates
        params/opt_state/loss_buf and writes the loss vector into row `ix`
        of the on-device buffer, so an epoch needs ONE host fetch;
      * .epoch_step_feed(params, opt_state, loss_buf, ix, small_batch, idx,
        feed, rng) — same, but the feature/mask tensors are gathered
        on-device from the HBM-resident `feed` (data/feed.py) via int32 row
        indices `idx`; the host ships only labels (KBs instead of ~50 MB);
      * .loss_keys — the static key order of the stacked vector (declared by
        losses.declared_loss_keys — no trace-time side channel).
    """
    from flashvtg_tpu.losses import declared_loss_keys
    from flashvtg_tpu.losses.criterion_ms import (
        MSLossConfig,
        compute_losses_ms,
        weighted_total_ms,
    )

    # The FUNCTION default is threefry — safe at every shape (rbg masks
    # cannot be rematerialized: compile OOM under chunked+remat attention,
    # docs/KERNELS.md). The fast rbg path is opt-in via
    # cfg.resolved_dropout_rng_impl(), which production callers (train(),
    # bench.py, scripts/bench_train.py) pass explicitly; "auto" is a
    # CONFIG value that must be resolved there (it needs the
    # attn_chunk/max_v_l context this function doesn't have). Fail loudly
    # on anything else: a typo ('rgb') would otherwise surface as a
    # generic jax error at trace time, after dataset/feed setup.
    if dropout_rng_impl == "auto":
        raise ValueError(
            "pass cfg.resolved_dropout_rng_impl(), not the literal 'auto'"
        )
    if dropout_rng_impl not in ("rbg", "threefry"):
        raise ValueError(
            f"unknown dropout_rng_impl {dropout_rng_impl!r}; expected "
            "'rbg' or 'threefry' (or 'auto' at the config level)"
        )
    is_ms = isinstance(loss_cfg, MSLossConfig)
    keys = declared_loss_keys(loss_cfg)

    def loss_fn(params, batch, rng):
        if dropout_rng_impl != "threefry":
            # Re-key the step's threefry sub-key into the fast generator:
            # the key CHAIN stays the bit-exact threefry split sequence
            # (_key_chain / scan-vs-per-step equality untouched), only the
            # mask bits inside the step come from the TPU-native RBG.
            # Dropout cost measured 50% of the flagship step under
            # threefry (docs/KERNELS.md round-5 decomposition).
            rng = jax.random.wrap_key_data(
                jnp.concatenate([rng, rng]), impl=dropout_rng_impl
            )
        out = model.apply(
            params,
            batch["src_txt"],
            batch["src_txt_mask"],
            batch["src_vid"],
            batch["src_vid_mask"],
            batch.get("real_neg_mask"),
            train=True,
            rngs={"dropout": rng},
        )
        if is_ms:
            losses = compute_losses_ms(out, batch, loss_cfg)
            total = weighted_total_ms(losses, loss_cfg)
        else:
            losses = compute_losses(out, batch, loss_cfg)
            total = weighted_total(losses, loss_cfg)
        losses["weighted_loss_overall"] = total
        return total, losses

    def _update(params, opt_state, batch, rng):
        with jax.default_matmul_precision(precision):
            (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, rng
            )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, jnp.stack([losses[k] for k in keys])

    step = jax.jit(_update)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def epoch_step(params, opt_state, loss_buf, ix, batch, rng):
        params, opt_state, vec = _update(params, opt_state, batch, rng)
        loss_buf = jax.lax.dynamic_update_slice(
            loss_buf, vec[None].astype(loss_buf.dtype), (ix, 0)
        )
        return params, opt_state, loss_buf

    def _gathered(small_batch, idx, feed):
        """Assemble a full batch: labels from the host + feature tensors
        gathered on-device from the HBM residents by row index."""
        batch = dict(small_batch)
        for k, store in feed.items():
            batch[k] = store[idx]
        return batch

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def epoch_step_feed(params, opt_state, loss_buf, ix, small_batch, idx,
                        feed, rng):
        batch = _gathered(small_batch, idx, feed)
        params, opt_state, vec = _update(params, opt_state, batch, rng)
        loss_buf = jax.lax.dynamic_update_slice(
            loss_buf, vec[None].astype(loss_buf.dtype), (ix, 0)
        )
        return params, opt_state, loss_buf

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def epoch_scan_feed(params, opt_state, loss_buf, i0, small_stack,
                        idx_stack, feed, subs):
        """K train steps in ONE dispatch: lax.scan over stacked per-step
        labels (K, B, ...), feed row indices (K, B) and dropout keys (K,).

        Same math as K epoch_step_feed calls with the same keys — what it
        removes is the per-step dispatch + transfer latency of the
        host<->TPU link, which dominates the wall clock once device compute
        per step is ~tens of ms (docs/KERNELS.md, train-step profile:
        21.5 ms device vs 46 ms wall at the flagship shape)."""

        def body(carry, xs):
            p, o = carry
            small, idx, sub = xs
            p, o, vec = _update(p, o, _gathered(small, idx, feed), sub)
            return (p, o), vec

        (params, opt_state), vecs = jax.lax.scan(
            body, (params, opt_state), (small_stack, idx_stack, subs)
        )
        loss_buf = jax.lax.dynamic_update_slice(
            loss_buf, vecs.astype(loss_buf.dtype), (i0, 0)
        )
        return params, opt_state, loss_buf

    def run_step(params, opt_state, batch, rng):
        params, opt_state, vec = step(params, opt_state, batch, rng)
        host = np.asarray(vec)
        return params, opt_state, dict(zip(keys, host.tolist()))

    run_step.device_step = step
    run_step.epoch_step = epoch_step
    run_step.epoch_step_feed = epoch_step_feed
    run_step.epoch_scan_feed = epoch_scan_feed
    run_step.loss_keys = list(keys)
    run_step.keys = lambda: list(keys)
    return run_step


def _dataset_cfg(cfg: ExperimentConfig, path: str, load_labels=True,
                 train=False) -> DataConfig:
    """`train=False` zeroes txt_drop_ratio — the reference applies text-row
    dropout to the training split only (train.py:392, inference.py:525,
    guarded by start_end_dataset.py:100)."""
    return DataConfig(
        dset_name=cfg.dset_name,
        data_path=path,
        v_feat_dirs=tuple(cfg.v_feat_dirs),
        q_feat_dir=cfg.t_feat_dir,
        q_feat_type=cfg.q_feat_type,
        max_q_l=cfg.max_q_l,
        max_v_l=cfg.max_v_l,
        data_ratio=cfg.data_ratio,
        ctx_mode=cfg.ctx_mode,
        normalize_v=not cfg.no_norm_vfeat,
        normalize_t=not cfg.no_norm_tfeat,
        load_labels=load_labels,
        clip_len=cfg.clip_length,
        max_windows=cfg.max_windows,
        txt_drop_ratio=cfg.txt_drop_ratio if train else 0.0,
        dset_domain=cfg.dset_domain,
        seed=cfg.seed,
        eos_first=getattr(cfg, "eos_first", False),
    )


def stop_metric(cfg: ExperimentConfig, brief: Dict[str, float]) -> float:
    """Model-selection metric per dataset (train.py:186-194, :321).

    Only the literal 'hl' dset_name selects by MR-full-mAP; the reference
    routes everything else MR-shaped — including qv_internvideo2, whose
    shipped script sets that dset_name — to the R1 average (the else
    branch of train.py:186-194)."""
    if cfg.dset_name in ("tvsum", "youtube_uni"):
        return brief["mAP"]
    if cfg.dset_name == "hl":
        return brief["MR-full-mAP"]
    if cfg.dset_name == "tacos":
        return brief["MR-full-R1@0.3"]
    return (brief["MR-full-R1@0.7"] + brief["MR-full-R1@0.5"]) / 2


def evaluate(cfg, model, params, eval_dataset, results_dir, tag="latest",
             loss_cfg=None, mesh=None, compute_metrics=None,
             split_name=None):
    """Eval pass; returns (metrics, metrics_nms, eval_losses). `loss_cfg`
    additionally evaluates the criterion on the eval split (reference logs
    per-epoch eval losses, inference.py:300-306 + train.py:183-184).
    `mesh` runs the eval data-parallel (params must be replicated over it).
    On multi-controller runs every host computes (redundant local eval, see
    train()) but only process 0 writes the submission/metric files.
    `compute_metrics` overrides the default split-name gate (needed for a
    --test_path split whose rows carry ground truth). `split_name` names
    the split component of the output files (default cfg.eval_split_name;
    the --test_path finals pass "test" so their artifacts are not labeled
    with the val split's name)."""
    if split_name is None:
        split_name = cfg.eval_split_name
    if compute_metrics is None:
        compute_metrics = cfg.eval_split_name == "val"
    is_proc0 = jax.process_index() == 0
    if cfg.dset_name in ("tvsum", "youtube_uni"):
        metrics = run_hl_inference(cfg, model, params, eval_dataset, mesh=mesh)
        if is_proc0:
            save_jsonl(
                [metrics], os.path.join(results_dir, f"{tag}_metric.jsonl")
            )
        return metrics, None, {}
    t0 = time.time()
    submission, submission_nms, eval_losses = run_mr_inference(
        cfg, model, params, eval_dataset, loss_cfg=loss_cfg, mesh=mesh
    )
    infer_s = time.time() - t0
    sub_path = os.path.join(
        results_dir, f"{tag}_{cfg.dset_name}_{split_name}_preds.jsonl"
    )
    if is_proc0:
        save_jsonl(submission, sub_path)
    metrics = metrics_nms = None
    # the NMS predictions are saved whenever NMS ran, metrics or not — the
    # reference writes *_nms_thd_*.jsonl unconditionally for nms_thd != -1
    # (eval_epoch_post_processing); on a GT-less test split those are the
    # leaderboard-submission artifacts
    if submission_nms is not None and is_proc0:
        save_jsonl(
            submission_nms,
            sub_path.replace(".jsonl", f"_nms_thd_{cfg.nms_thd}.jsonl"),
        )
    if compute_metrics:
        from flashvtg_tpu.eval.metrics import eval_submission

        t0 = time.time()
        metrics = eval_submission(submission, eval_dataset.data, verbose=False)
        logger.info(
            "eval timing: infer %.2fs, metrics %.2fs (%d queries)",
            infer_s, time.time() - t0, len(submission),
        )
        if is_proc0:
            save_json(
                metrics, sub_path.replace(".jsonl", "_metrics.json"),
                pretty=True,
            )
        if submission_nms is not None:
            metrics_nms = eval_submission(
                submission_nms, eval_dataset.data, verbose=False
            )
            if is_proc0:
                save_json(
                    metrics_nms,
                    sub_path.replace(
                        ".jsonl", f"_nms_thd_{cfg.nms_thd}_metrics.json"
                    ),
                    pretty=True,
                )
    return metrics, metrics_nms, eval_losses


def save_checkpoint(path: str, params, opt_state, epoch: int, cfg,
                    best_score: Optional[float] = None):
    """Full train state: params + optimizer state + epoch (reference saves
    {model, optimizer, lr_scheduler, epoch, opt}, train.py:200-233).

    Multi-controller: EVERY process must call this — orbax coordinates
    internally (primary host writes, the rest join its save barriers; a
    single-caller save deadlocks on `_Checkpointer:save_start`). Only the
    opt.json sidecar is process-0-gated.

    `best_score` (when known) lands in a `<name>.state.json` sidecar so a
    `--resume auto` crash recovery can restore the best-so-far bar instead
    of letting the first post-resume eval overwrite model_best with a
    worse model (kept outside the orbax tree for old-checkpoint
    compatibility)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        os.path.abspath(path),
        {
            "params": params,
            "opt_state": opt_state,
            "epoch": np.asarray(epoch),
        },
        force=True,
    )
    ckptr.wait_until_finished()
    if jax.process_index() == 0:
        cfg.save(
            os.path.join(os.path.dirname(os.path.abspath(path)), "opt.json")
        )
        if best_score is not None:
            state_path = os.path.abspath(path) + ".state.json"
            with open(state_path, "w") as f:
                json.dump({"best_score": float(best_score)}, f)


def load_checkpoint(path: str, like=None, opt_state_like=None):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    target = None
    if like is not None:
        target = {
            "params": like,
            "opt_state": opt_state_like,
            "epoch": np.asarray(0),
        }
        if opt_state_like is None:
            target.pop("opt_state")
    try:
        return ckptr.restore(os.path.abspath(path), target)
    except Exception:
        # older checkpoints without opt_state
        if target is not None and "opt_state" in target:
            target.pop("opt_state")
            return ckptr.restore(os.path.abspath(path), target)
        raise


def merge_partial_params(params, loaded):
    """Non-strict parameter preload: copy leaves whose path AND shape match
    (oracle: `--resume_adapter` + load_state_dict(strict=False),
    reference inference.py:447-451, config.py:63-68)."""
    copied = skipped = 0

    def merge(dst, src):
        nonlocal copied, skipped
        if isinstance(dst, dict):
            out = {}
            for k, v in dst.items():
                if isinstance(src, dict) and k in src:
                    out[k] = merge(v, src[k])
                else:
                    out[k] = v
            return out
        if (
            hasattr(dst, "shape")
            and hasattr(src, "shape")
            and tuple(dst.shape) == tuple(src.shape)
        ):
            copied += 1
            return jnp.asarray(src, dtype=dst.dtype)
        skipped += 1
        return dst

    merged = merge(dict(params), loaded)
    logger.info("resume_adapter: copied %d leaves, skipped %d", copied, skipped)
    return merged


def load_adapter(cfg: ExperimentConfig, params):
    """Apply --resume_adapter: partial, non-strict preload into `params`."""
    path = cfg.resume_adapter
    if path.endswith(".ckpt"):  # torch reference checkpoint
        from flashvtg_tpu.utils.torch_convert import load_torch_checkpoint

        mc = cfg.ms_model_config() if cfg.variant == "ms" else cfg.model_config()
        loaded = load_torch_checkpoint(path, mc)
    else:
        loaded = load_checkpoint(path)["params"]
    return merge_partial_params(params, loaded)


def global_real_neg_mask(global_vids, shuffled_rows, step: int,
                         local_bsz: int, pc: int, me: int) -> np.ndarray:
    """This host's slice of the negative-pair indicator for one GLOBAL batch.

    The model's negative pass rolls the assembled global batch
    (models/flashvtg.py jnp.roll over axis 0), whose layout is
    host-contiguous blocks (build_mesh_for). A per-host roll would mark the
    block-boundary rows wrong, so the mask is computed over the full global
    row order — reconstructible on every host from the shared shuffle."""
    from flashvtg_tpu.parallel.mesh import shard_rows_for_host

    g_rows = np.concatenate([
        shard_rows_for_host(shuffled_rows, p, pc)[
            step * local_bsz : (step + 1) * local_bsz
        ]
        for p in range(pc)
    ])
    from flashvtg_tpu.data.collate import rolled_neg_mask

    gmask = rolled_neg_mask([global_vids[j] for j in g_rows])
    return gmask[me * local_bsz : (me + 1) * local_bsz]


def build_mesh_for(bsz: int, devices=None):
    """Data-parallel mesh over the most devices whose count divides bsz
    (None when that is a single device).

    Multi-host: every process must contribute the SAME number of mesh
    devices (each ships bsz/process_count rows of the global batch), and
    hosts are laid out CONTIGUOUSLY along the data axis so the global batch
    is [host0 rows..., host1 rows, ...] — the layout the per-step global
    real_neg_mask computation assumes."""
    from flashvtg_tpu.parallel.mesh import make_mesh

    devices = list(devices if devices is not None else jax.devices())
    by_proc: Dict[int, list] = {}
    for d in devices:
        by_proc.setdefault(getattr(d, "process_index", 0), []).append(d)
    pc = len(by_proc)
    per_host_cap = min(len(v) for v in by_proc.values())
    k = max(
        (j for j in range(1, per_host_cap + 1) if bsz % (j * pc) == 0),
        default=0,
    )
    if k * pc <= 1:
        return None
    ordered = []
    for p in sorted(by_proc):
        ordered.extend(by_proc[p][:k])
    return make_mesh(ordered, data=k * pc, model=1)


@functools.partial(jax.jit, static_argnums=1)
def _key_chain(rng, k: int):
    """Advance `rng` by k sequential jax.random.split calls in ONE dispatch.

    Bit-identical to the host loop `rng, sub = jax.random.split(rng)`
    repeated k times (same unpack order), so the scan epoch path sees the
    exact dropout-key stream the per-step path would. Returns
    (advanced rng, stacked subs of shape (k,))."""

    def body(r, _):
        r, sub = jax.random.split(r)
        return r, sub

    return jax.lax.scan(body, rng, None, length=k)


def _prefetched(fn, n: int, depth: int = 2):
    """Yield (i, fn(i)) for i in range(n), computed by ONE worker thread up
    to `depth` items ahead of the consumer. Sequential single-worker order
    keeps any RNG stream inside fn identical to the inline loop; exceptions
    re-raise at the consumer."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def worker():
        for i in range(n):
            if stop.is_set():
                return
            try:
                item = (i, fn(i))
            except BaseException as e:  # surface in the consumer
                q.put((None, e))
                return
            q.put(item)
        q.put((None, None))  # end-of-stream

    t = threading.Thread(target=worker, daemon=True, name="batch-prefetch")
    t.start()
    try:
        while True:
            i, item = q.get()
            if i is None:
                if item is not None:
                    raise item
                return
            yield i, item
    finally:
        stop.set()
        # unblock a worker parked on a full queue
        while not q.empty():
            try:
                q.get_nowait()
            except queue.Empty:
                break


def find_auto_resume(cfg) -> Optional[str]:
    """Crash-recovery checkpoint discovery for `--resume auto`.

    Returns the newest `model_latest` under `cfg.results_root` whose run dir
    holds an opt.json matching THIS experiment's (dset_name, ctx_mode,
    exp_id) — scoped so a different experiment's checkpoint (possibly
    different shapes, or worse, same shapes resumed silently) is never
    picked up. Orbax checkpoints are atomic: a partial save never finalizes,
    so the newest finalized dir is always consistent."""
    import glob as _glob
    import json as _json

    def _same_experiment(ckpt_dir):
        opt_path = os.path.join(os.path.dirname(ckpt_dir), "opt.json")
        try:
            with open(opt_path) as f:
                saved = _json.load(f)
        except (OSError, ValueError):
            return False
        # identity AND shape-determining fields: a rerun that reuses exp_id
        # with a changed architecture must fall through to a fresh start,
        # not die later on an opaque orbax shape mismatch (ADVICE r3).
        shape_keys = (
            "variant", "hidden_dim", "nheads", "enc_layers", "t2v_layers",
            "dummy_layers", "num_dummies", "dim_feedforward", "strides",
            "v_feat_dim", "t_feat_dim", "max_v_l", "max_q_l",
            "kernel_size", "num_conv_layers", "num_mlp_layers",
            "n_input_proj", "num_phrase", "phrase_layers", "context_layers",
            "rank", "t_sa",
        )

        def _norm(v):
            return list(v) if isinstance(v, (list, tuple)) else v

        if not all(
            saved.get(k) == getattr(cfg, k)
            for k in ("dset_name", "ctx_mode", "exp_id")
        ):
            return False
        mismatched = [
            k for k in shape_keys
            if k in saved and _norm(saved[k]) != _norm(getattr(cfg, k, None))
        ]
        if mismatched:
            logger.info(
                "--resume auto: skipping %s (same exp_id but different "
                "model shape: %s)", ckpt_dir, ", ".join(mismatched),
            )
            return False
        return True

    candidates = sorted(
        (
            c
            for c in _glob.glob(
                os.path.join(cfg.results_root, "*", "model_latest")
            )
            if _same_experiment(c)
        ),
        key=os.path.getmtime,
    )
    return candidates[-1] if candidates else None


def train(cfg: ExperimentConfig, results_dir: Optional[str] = None, mesh=None):
    """Full training run; returns (best_params, best_score, results_dir).

    `mesh` overrides the automatic data-parallel mesh (pass a 1-device mesh
    or run with one visible device for strictly-local training)."""
    results_dir = results_dir or os.path.join(
        cfg.results_root,
        f"{cfg.dset_name}-{cfg.ctx_mode}-{cfg.exp_id}-{time.strftime('%Y-%m-%d-%H-%M-%S')}",
    )
    os.makedirs(results_dir, exist_ok=True)
    # multi-controller runs: process 0 owns every file artifact (opt.json,
    # snapshot, scalars, submissions, checkpoints); the others compute
    is_proc0 = jax.process_index() == 0
    if is_proc0:
        cfg.save(os.path.join(results_dir, "opt.json"))
        try:
            from flashvtg_tpu.utils.snapshot import snapshot_code

            snapshot_code(results_dir)
        except Exception as e:  # snapshot failures must never kill training
            logger.warning("code snapshot failed: %s", e)

    train_dataset = VTGDataset(_dataset_cfg(cfg, cfg.train_path, train=True))
    eval_dataset = (
        VTGDataset(
            _dataset_cfg(
                cfg, cfg.eval_path,
                load_labels=cfg.eval_split_name == "val",
            )
        )
        if cfg.eval_path
        else None
    )

    model = cfg.build_model()
    loss_cfg = cfg.ms_loss_config() if cfg.variant == "ms" else cfg.loss_config()
    collator = Collator(
        max_q_l=cfg.max_q_l,
        v_buckets=cfg.v_buckets,
        max_windows=cfg.max_windows,
        dset_name=cfg.dset_name,
        fixed_v_len=cfg.max_v_l if cfg.max_v_l > 0 else None,
    )

    # --- data-parallel mesh over local chips (jax.sharding SPMD) ---
    if mesh is None:
        mesh = build_mesh_for(cfg.bsz)
    if mesh is not None:
        from flashvtg_tpu.parallel.mesh import data_axis_sharding, replicated

        data_sh, rep_sh = data_axis_sharding(mesh), replicated(mesh)
        logger.info(
            "data-parallel mesh: %d devices on 'data'", mesh.shape["data"]
        )
    else:
        data_sh = rep_sh = None

    def put_batch(host_batch):
        if data_sh is not None:
            if jax.process_count() > 1:
                # multi-controller: each process contributes its local rows
                # of the global batch (the mesh's data axis spans all hosts)
                return {
                    k: jax.make_array_from_process_local_data(data_sh, v)
                    for k, v in host_batch.items()
                }
            return {k: jax.device_put(v, data_sh) for k, v in host_batch.items()}
        return {k: jnp.asarray(v) for k, v in host_batch.items()}

    def put_chunk(host_stack):
        """Place {key: (K, B, ...)} stacks with the BATCH axis (axis 1)
        split over the data mesh — the scan-epoch layout of put_batch."""
        if data_sh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            csh = NamedSharding(mesh, P(None, "data"))
            if jax.process_count() > 1:
                return {
                    k: jax.make_array_from_process_local_data(csh, v)
                    for k, v in host_stack.items()
                }
            return {k: jax.device_put(v, csh) for k, v in host_stack.items()}
        return {k: jnp.asarray(v) for k, v in host_stack.items()}

    def put_replicated(tree):
        if rep_sh is not None:
            from flashvtg_tpu.parallel.mesh import put_replicated_global

            return jax.tree.map(
                lambda x: (
                    put_replicated_global(x, rep_sh)
                    if hasattr(x, "shape") else x
                ),
                tree,
            )
        return tree

    rng = jax.random.PRNGKey(cfg.seed)
    init_batch = collator([train_dataset[i] for i in range(min(2, len(train_dataset)))])
    # jitted init: one compiled program instead of hundreds of eager ops
    # (eager dispatch is pathologically slow on remote-compile TPU targets)
    params = jax.jit(model.init, static_argnames="train")(
        {"params": rng, "dropout": rng},
        jnp.asarray(init_batch["src_txt"][:1]),
        jnp.asarray(init_batch["src_txt_mask"][:1]),
        jnp.asarray(init_batch["src_vid"][:1]),
        jnp.asarray(init_batch["src_vid_mask"][:1]),
        train=False,
    )
    if cfg.resume_adapter:
        params = load_adapter(cfg, params)
    steps_per_epoch = max(1, len(train_dataset) // cfg.bsz)
    n_epoch = cfg.n_epoch
    if cfg.debug:  # fast loop (reference config.py:32-33)
        steps_per_epoch, n_epoch = min(2, steps_per_epoch), min(1, n_epoch)
    tx, _ = make_optimizer(cfg, steps_per_epoch)
    opt_state = tx.init(params)
    start_epoch_override = None
    auto_resumed = False
    resumed_best_score = None
    prior_best_ckpt = None
    if cfg.resume == "auto":
        cfg = cfg.replace(resume=find_auto_resume(cfg), resume_all=True)
        if cfg.resume:
            auto_resumed = True
            logger.info("auto-resume from %s", cfg.resume)
    if cfg.resume:
        try:
            restored = load_checkpoint(
                cfg.resume, like=params,
                opt_state_like=opt_state if cfg.resume_all else None,
            )
        except Exception:
            # an AUTO-discovered checkpoint that fails to restore (e.g. a
            # shape-determining flag the opt.json gate doesn't cover) must
            # fall through to a fresh start, not kill the run; an EXPLICIT
            # --resume path stays a hard error — the user asked for it.
            if not auto_resumed:
                raise
            logger.warning(
                "--resume auto: checkpoint %s failed to restore against the "
                "current model shapes; starting fresh", cfg.resume,
                exc_info=True,
            )
            restored = None
        if restored is not None:
            params = restored["params"]
            if cfg.resume_all:
                if "opt_state" in restored:
                    opt_state = restored["opt_state"]
                start_epoch_override = int(restored.get("epoch", -1)) + 1
                # restore the best-so-far bar (and where its params live):
                # without it, the first post-resume eval would overwrite
                # model_best with a potentially worse model
                try:
                    with open(os.path.abspath(cfg.resume)
                              + ".state.json") as f:
                        resumed_best_score = float(
                            json.load(f)["best_score"]
                        )
                except (OSError, ValueError, KeyError):
                    resumed_best_score = None
                cand = os.path.join(
                    os.path.dirname(os.path.abspath(cfg.resume)), "model_best"
                )
                if os.path.isdir(cand):
                    prior_best_ckpt = cand
    params = put_replicated(params)
    opt_state = put_replicated(opt_state)
    step_fn = make_train_step(
        model, loss_cfg, tx, cfg.train_precision,
        dropout_rng_impl=cfg.resolved_dropout_rng_impl(),
    )
    keys = step_fn.loss_keys

    from flashvtg_tpu.utils.observability import (
        ScalarWriter,
        check_finite_tree,
        enable_debug_nans,
        profile_trace,
    )

    if cfg.debug_nans:
        enable_debug_nans(True)
    writer = ScalarWriter(
        os.path.join(results_dir, "tensorboard_log"),
        use_tensorboard=cfg.use_tensorboard,
        enabled=is_proc0,
        wandb_run=(
            {
                "project": cfg.wandb_project,
                "name": os.path.basename(results_dir),
                "config": dataclasses.asdict(cfg),
            }
            if cfg.use_wandb
            else None
        ),
    )
    # reference startup logging: TB "hyperparameters" text (train.py:113)
    # and the learnable-parameter count (train.py:405-414; all params are
    # trainable in both implementations)
    import json as _json

    writer.write_text(
        "hyperparameters",
        _json.dumps(dataclasses.asdict(cfg), indent=2, default=list),
    )
    n_params = sum(
        int(np.prod(x.shape)) for x in jax.tree.leaves(params)
        if hasattr(x, "shape")
    )
    logger.info(
        "Learnable Parameters: %.3fM (100.0%%)", n_params / 1024 / 1024
    )

    # --- HBM-resident feature feed (data/feed.py): one-time transfer of the
    # collated feature tensors; per-step host->device traffic becomes
    # indices + labels. Gated on fixed shapes, no text-drop randomness, and
    # the HBM budget. ---
    from flashvtg_tpu.data.feed import (
        FEED_KEYS,
        build_device_feed,
        estimate_feed_bytes,
        resident_feed_bytes,
    )

    feed = None
    if cfg.device_feed != "off" and cfg.max_v_l > 0 and cfg.txt_drop_ratio == 0:
        dtype_bytes = 2 if cfg.transfer_dtype == "bfloat16" else 4
        est = estimate_feed_bytes(
            len(train_dataset), cfg.max_v_l, cfg.total_v_feat_dim,
            cfg.max_q_l, cfg.t_feat_dim, dtype_bytes,
        )
        # SHARED budget: the eval feed will also go resident during
        # in-training eval; resident_feed_bytes() tracks what's already there
        remaining = cfg.device_feed_budget_gb * 2**30 - resident_feed_bytes()
        if cfg.device_feed == "on" or est <= remaining:
            feed = build_device_feed(
                train_dataset, collator, sharding=rep_sh,
                dtype=cfg.transfer_dtype if cfg.transfer_dtype != "float32"
                else None,
            )
        else:
            logger.info(
                "device feed disabled: %.1f GB exceeds budget %.1f GB",
                est / 2**30, cfg.device_feed_budget_gb,
            )

    # multi-host: each process feeds its own strided slice of the data (DCN
    # level) and its own bsz/process_count rows of each GLOBAL batch; the
    # mesh's data axis (spanning all hosts' chips) splits the assembled
    # global batch. steps_per_epoch and the LR schedule are defined in
    # global batches, so they are host-count invariant.
    from flashvtg_tpu.parallel.mesh import shard_rows_for_host

    pc = jax.process_count()
    if cfg.bsz % pc:
        raise ValueError(
            f"bsz={cfg.bsz} must be divisible by process_count={pc}"
        )
    local_bsz = cfg.bsz // pc
    # multi-controller eval strategy: every host evaluates the FULL eval
    # split redundantly on its own local chips (eval is deterministic, so
    # each host reaches identical metrics and the identical best/early-stop
    # decision with zero cross-host result gathering; eval cost is dwarfed
    # by training between evals). Process 0 alone writes files.
    eval_mesh = mesh
    if pc > 1:
        eval_mesh = build_mesh_for(cfg.eval_bsz, devices=jax.local_devices())

    def _eval_with(prms, dataset, tag, losses=None, compute_metrics=None,
                   split_name=None):
        if pc > 1:
            # params live on the cross-host mesh; pull the (fully
            # replicated, hence addressable) copy and re-place it on this
            # host's local eval mesh
            from flashvtg_tpu.parallel.mesh import replicate_params

            host_params = jax.tree.map(
                lambda x: np.asarray(x) if hasattr(x, "shape") else x, prms
            )
            prms = (
                replicate_params(eval_mesh, host_params)
                if eval_mesh is not None else host_params
            )
        return evaluate(
            cfg, model, prms, dataset, results_dir, tag=tag,
            loss_cfg=losses, mesh=eval_mesh,
            compute_metrics=compute_metrics, split_name=split_name,
        )
    # feed-mode batches skip feature padding entirely: features are gathered
    # on-device from the HBM residents, the host ships labels + indices
    step_collator = (
        dataclasses.replace(collator, pad_features=False)
        if feed is not None
        else collator
    )

    all_rows = np.arange(len(train_dataset))
    # multi-host negative-pair mask: the model rolls the assembled GLOBAL
    # batch (models/flashvtg.py jnp.roll), so the "rolled video differs"
    # indicator must be computed over the global row order, not per host.
    # Every host derives the same shuffle (same seed) and the same per-host
    # striding, so each can reconstruct the global order locally.
    from flashvtg_tpu.data.collate import neg_pair_base

    global_vids = neg_pair_base(
        [r["vid"] for r in train_dataset.data], cfg.dset_name
    )
    shuffler = np.random.default_rng(cfg.seed)
    # NOTE: params/opt_state buffers are donated to epoch_step, so stale
    # references (e.g. "best_params = params") would dangle; the best state
    # lives in the model_best checkpoint and is reloaded after the loop.
    best_score, have_best, es_cnt = 0.0, False, 0
    if resumed_best_score is not None:
        best_score = resumed_best_score
        logger.info("resume: best-so-far bar restored to %.4f "
                    "(prior model_best: %s)", best_score, prior_best_ckpt)
    if cfg.start_epoch is not None:
        start_epoch = cfg.start_epoch
    elif start_epoch_override is not None:
        start_epoch = start_epoch_override
    else:
        start_epoch = 0
    global_step = 0
    tdt = (
        np.dtype("bfloat16")
        if getattr(cfg, "transfer_dtype", "float32") == "bfloat16"
        else None
    )

    def run_eval_and_select(epoch: int, step: int) -> Optional[bool]:
        """One in-training evaluation: eval/* scalars, reference log lines,
        best-checkpoint selection. Returns None when metrics were not
        computed, else whether the model improved (model_best saved then).
        `epoch` is -1 for the --eval_untrained pre-loop eval; the eval.log
        line uses the raw 0-based epoch (reference train.py:161 quirk)."""
        nonlocal best_score, have_best
        label = "untrained" if epoch < 0 else f"epoch {epoch + 1}"
        metrics, _, eval_losses = _eval_with(
            params, eval_dataset, tag="latest", losses=loss_cfg,
        )
        if eval_losses:
            writer.write(step, eval_losses, prefix="eval/")
            logger.info(
                "[%s] eval losses %s", label,
                " ".join(f"{k} {v:.4f}" for k, v in eval_losses.items()),
            )
        if metrics is None:
            return None
        score = stop_metric(cfg, metrics["brief"])
        logger.info("[%s] eval %s", label, dict(metrics["brief"]))
        if is_proc0:
            # reference eval.log.txt line (train.py:159-169, formatter :250:
            # time [Epoch] e [Loss] ... [Metrics] <full metrics json>)
            import json as _json

            with open(os.path.join(results_dir, "eval.log.txt"), "a") as f:
                f.write(
                    "{} [Epoch] {:03d} [Loss] {} [Metrics] {}\n".format(
                        time.strftime("%Y_%m_%d_%H_%M_%S"), epoch,
                        " ".join(
                            f"{k} {v:.4f}"
                            for k, v in (eval_losses or {}).items()
                        ),
                        _json.dumps(metrics),
                    )
                )
        improved = score > best_score
        if improved:
            best_score, have_best = score, True
            # redundant per-host eval -> identical metrics on every host, so
            # every process takes this branch consistently and joins orbax's
            # collective save (required: orbax barriers across all
            # processes; primary host writes)
            save_checkpoint(
                os.path.join(results_dir, "model_best"),
                params, opt_state, epoch, cfg, best_score=score,
            )
        return improved

    if cfg.eval_untrained and eval_dataset is not None and start_epoch == 0:
        # reference --eval_untrained: start_epoch=-1 runs one eval-only
        # iteration before training (train.py:129 + the (epoch+1)%N gate),
        # participating in best-checkpoint selection with epoch=-1
        run_eval_and_select(-1, step=0)

    for epoch in range(start_epoch, n_epoch):
        shuffler.shuffle(all_rows)
        order = shard_rows_for_host(all_rows)
        meters: Dict[str, AverageMeter] = {}
        epoch_t0 = time.time()
        trace_ctx = (
            profile_trace(cfg.profile_dir) if epoch == start_epoch
            else contextlib.nullcontext()
        )
        # on-device loss accumulator: one (steps, K) fetch per epoch
        loss_buf = np.zeros((steps_per_epoch, len(keys)), np.float32)
        if rep_sh is not None:
            from flashvtg_tpu.parallel.mesh import put_replicated_global

            loss_buf = put_replicated_global(loss_buf, rep_sh)
        else:
            loss_buf = jnp.asarray(loss_buf)
        def host_batch_for(i):
            """Labels + bookkeeping for step i (features ride the feed in
            feed mode). Pure host work — safe to run one step ahead."""
            idx = order[i * local_bsz : (i + 1) * local_bsz]
            if len(idx) < local_bsz:
                return None
            batch = step_collator([train_dataset[j] for j in idx])
            host_batch = device_arrays(batch)
            if pc > 1 and "real_neg_mask" in host_batch:
                host_batch["real_neg_mask"] = global_real_neg_mask(
                    global_vids, all_rows, i, local_bsz, pc,
                    jax.process_index(),
                )
            return idx, host_batch

        # feed mode: fuse scan_steps train steps per dispatch (lax.scan) —
        # the per-dispatch tunnel latency otherwise dominates short-video
        # steps (docs/KERNELS.md train profile). Off under --debug /
        # --debug_nans (per-step granularity for inspection).
        scan_k = (
            cfg.scan_steps
            if feed is not None and not cfg.debug and not cfg.debug_nans
            else 0
        )
        steps_done = 0

        def small_labels(host_batch):
            """Labels only — feature tensors ride the HBM-resident feed."""
            return {
                k: v for k, v in host_batch.items() if k not in FEED_KEYS
            }

        def run_scan_epoch():
            """scan_k steps per dispatch (step_fn.epoch_scan_feed)."""
            nonlocal params, opt_state, loss_buf, rng, global_step, steps_done
            n_chunks = (steps_per_epoch + scan_k - 1) // scan_k

            def chunk_for(ci):
                made = [
                    host_batch_for(i)
                    for i in range(
                        ci * scan_k,
                        min((ci + 1) * scan_k, steps_per_epoch),
                    )
                ]
                made = [m for m in made if m is not None]
                if not made:
                    return None
                idx_stack = np.stack(
                    [np.asarray(m[0], np.int32) for m in made]
                )
                small = {
                    k: np.stack([m[1][k] for m in made])
                    for k in small_labels(made[0][1])
                }
                return idx_stack, small

            for _, made in _prefetched(chunk_for, n_chunks):
                if made is None:
                    continue
                idx_stack, small = made
                k = len(idx_stack)
                rng, subs = _key_chain(rng, k)
                params, opt_state, loss_buf = step_fn.epoch_scan_feed(
                    params, opt_state, loss_buf,
                    jnp.asarray(steps_done, jnp.int32),
                    put_chunk(small),
                    put_chunk({"idx": idx_stack})["idx"],
                    feed, subs,
                )
                global_step += k
                steps_done += k

        def run_per_step_epoch():
            """One dispatch per step (step_fn.epoch_step[_feed])."""
            nonlocal params, opt_state, loss_buf, rng, global_step, steps_done
            for i, made in _prefetched(host_batch_for, steps_per_epoch):
                if made is None:
                    continue
                idx, host_batch = made
                rng, sub = jax.random.split(rng)
                if feed is not None:
                    # HBM-resident features: ship labels + row indices only
                    params, opt_state, loss_buf = step_fn.epoch_step_feed(
                        params, opt_state, loss_buf,
                        jnp.asarray(i, jnp.int32),
                        put_batch(small_labels(host_batch)),
                        put_batch({"idx": np.asarray(idx, np.int32)})["idx"],
                        feed, sub,
                    )
                else:
                    if tdt is not None:
                        for k in ("src_vid", "src_txt"):
                            host_batch[k] = host_batch[k].astype(tdt)
                    # donated step: losses accumulate on device; host-side
                    # collation and the next H2D transfer overlap compute
                    params, opt_state, loss_buf = step_fn.epoch_step(
                        params, opt_state, loss_buf,
                        jnp.asarray(i, jnp.int32), put_batch(host_batch), sub,
                    )
                global_step += 1
                steps_done += 1

        with trace_ctx:
            # single-worker lookahead (_prefetched): the per-step label
            # resampling / collation (python-heavy, RNG-parity-bound)
            # overlaps the device compute of the previous step/chunk. One
            # worker consuming i in order keeps the dataset's label RNG
            # stream identical to the inline loop (per-step path pinned
            # sharded by test_multichip [scan_steps=0]; scan path pinned
            # against it by test_scan_epoch).
            if scan_k > 1:
                run_scan_epoch()
            else:
                run_per_step_epoch()
        # the single host fetch for the whole epoch
        host_vecs = np.asarray(loss_buf)[:steps_done]
        for s, vec in enumerate(host_vecs):
            host_losses = dict(zip(keys, vec.tolist()))
            for k, v in host_losses.items():
                meters.setdefault(k, AverageMeter()).update(v)
            writer.write(
                global_step - steps_done + s, host_losses, prefix="train/"
            )
        if cfg.debug_nans and meters and not all(
            np.isfinite(m.avg) for m in meters.values()
        ):
            check_finite_tree(params, "params")
        dt = time.time() - epoch_t0
        writer.write(
            global_step,
            {"epoch_seconds": dt,
             "steps_per_sec": max(steps_done, 1) / max(dt, 1e-9)},
            prefix="perf/",
        )
        logger.info(
            "[epoch %d] (%.1fs) %s",
            epoch + 1,
            dt,
            " ".join(f"{k} {m.avg:.4f}" for k, m in meters.items()),
        )
        if is_proc0:
            # reference-format epoch log line (train.py:93-103,
            # formatter train.py:249: "{time_str} [Epoch] {epoch:03d}
            # [Loss] {loss_str}\n")
            with open(os.path.join(results_dir, "train.log.txt"), "a") as f:
                f.write(
                    "{} [Epoch] {:03d} [Loss] {}\n".format(
                        time.strftime("%Y_%m_%d_%H_%M_%S"), epoch + 1,
                        " ".join(
                            f"{k} {m.avg:.4f}" for k, m in meters.items()
                        ),
                    )
                )

        if eval_dataset is not None and (epoch + 1) % cfg.eval_epoch == 0:
            improved = run_eval_and_select(epoch, step=global_step)
            if improved:
                es_cnt = 0
            elif improved is False:
                es_cnt += 1
                if cfg.max_es_cnt != -1 and es_cnt > cfg.max_es_cnt:
                    logger.info("early stop at epoch %d", epoch)
                    break
        save_checkpoint(
            os.path.join(results_dir, "model_latest"),
            params, opt_state, epoch, cfg, best_score=best_score,
        )
    writer.close()
    best_params = params
    if have_best:
        best_params = load_checkpoint(
            os.path.join(results_dir, "model_best"),
            like=params, opt_state_like=opt_state,
        )["params"]
    elif prior_best_ckpt is not None and best_score > 0.0:
        # resumed run never beat the pre-crash best: the best params live
        # in the PRIOR run's model_best
        best_params = load_checkpoint(
            prior_best_ckpt, like=params, opt_state_like=opt_state,
        )["params"]
        have_best = True
    if cfg.test_path and eval_dataset is not None:
        # FlashVTG_ms final evaluations (train.py:243-286): the best AND
        # latest models, each on the val split AND the --test_path split.
        test_dataset = VTGDataset(
            _dataset_cfg(
                cfg, cfg.test_path,
                load_labels=cfg.dset_name in ("tvsum", "youtube_uni"),
            )
        )
        # MR metrics need ground-truth windows in the annotations (a held-
        # out test jsonl without them still gets its predictions written).
        # ALL rows must carry GT — a mixed file would crash the matcher on
        # its first GT-less row, so metrics are skipped and the decision
        # logged with the row counts.
        n_rows = len(test_dataset.data)
        n_gt = sum(
            1 for r in test_dataset.data if "relevant_windows" in r
        )
        test_has_gt = n_rows > 0 and (
            n_gt == n_rows or cfg.dset_name in ("tvsum", "youtube_uni")
        )
        if not test_has_gt:
            logger.info(
                "[final] test split: %d/%d rows carry relevant_windows -> "
                "writing predictions only, skipping MR metrics", n_gt, n_rows,
            )
        finals = [("latest", params)] + (
            [("best", best_params)] if have_best else []
        )
        for which, prms in finals:
            m_val, _, _ = _eval_with(prms, eval_dataset, tag=f"val_{which}")
            m_test, _, _ = _eval_with(
                prms, test_dataset, tag=f"test_{which}",
                compute_metrics=test_has_gt, split_name="test",
            )
            for split, m in (("val", m_val), ("test", m_test)):
                if m is not None:
                    logger.info(
                        "[final] %s model on %s: %s",
                        which, split, dict(m["brief"]),
                    )
    return best_params, best_score, results_dir
