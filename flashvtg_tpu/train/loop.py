"""Training loop: jitted train step, StepLR, early stopping, checkpoints.

Oracle: FlashVTG/train.py (train / train_hl / train_epoch). TPU re-design:
  * one jitted train step containing forward (+ negative pass), all losses,
    global-norm gradient clipping and the AdamW update — no host round-trips
    inside an epoch beyond data feeding;
  * optax AdamW + piecewise-constant StepLR (gamma 0.5 every lr_drop epochs;
    the reference's `lr_scheduler.step(losses)` on a StepLR is epoch-stepped
    decay — quirk preserved in effect, not in API);
  * orbax checkpoints of the full train state (_latest each epoch, _best on
    metric improvement) with resume support;
  * data parallelism via jax.sharding: batch sharded over the mesh's "data"
    axis, params replicated; XLA inserts the gradient all-reduce.
"""

from __future__ import annotations

import contextlib
import dataclasses
import logging
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from flashvtg_tpu.data.collate import Collator
from flashvtg_tpu.data.dataset import DataConfig, VTGDataset
from flashvtg_tpu.losses.criterion import compute_losses, weighted_total
from flashvtg_tpu.models.flashvtg import FlashVTGModel
from flashvtg_tpu.train.config import ExperimentConfig
from flashvtg_tpu.train.infer import run_hl_inference, run_mr_inference
from flashvtg_tpu.utils.io import AverageMeter, save_json, save_jsonl

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int
    epoch: int


def make_optimizer(cfg: ExperimentConfig, steps_per_epoch: int):
    """AdamW with StepLR(lr_drop, gamma) and global-norm clipping
    (oracle: inference.py:443-444 + train.py:72-75)."""
    boundaries = {}
    drop = cfg.lr_drop * steps_per_epoch
    if drop > 0:
        scale = 1.0
        for k in range(1, 50):
            boundaries[k * drop] = cfg.lr_gamma
    schedule = optax.piecewise_constant_schedule(cfg.lr, boundaries)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip) if cfg.grad_clip > 0
        else optax.identity(),
        optax.adamw(schedule, weight_decay=cfg.wd),
    )
    return tx, schedule


def make_train_step(model, loss_cfg, tx, precision: str = "bfloat16"):
    from flashvtg_tpu.losses.criterion_ms import (
        MSLossConfig,
        compute_losses_ms,
        weighted_total_ms,
    )

    is_ms = isinstance(loss_cfg, MSLossConfig)

    def loss_fn(params, batch, rng):
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

    loss_keys: list = []

    @jax.jit
    def step(params, opt_state, batch, rng):
        with jax.default_matmul_precision(precision):
            (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, rng
            )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # stack scalars so the host fetches ONE array per step instead of one
        # RPC per loss (dispatch latency dominates on tunneled TPU targets)
        keys = sorted(losses)
        loss_keys.clear()
        loss_keys.extend(keys)
        return params, opt_state, jnp.stack([losses[k] for k in keys])

    def run_step(params, opt_state, batch, rng):
        params, opt_state, vec = step(params, opt_state, batch, rng)
        host = np.asarray(vec)
        return params, opt_state, dict(zip(loss_keys, host.tolist()))

    # async variant: returns the on-device loss vector without fetching, so
    # the next batch's host work and H2D transfer overlap this step's
    # compute; fetch once per epoch via `keys()`
    run_step.device_step = step
    run_step.keys = lambda: list(loss_keys)
    return run_step


def _dataset_cfg(cfg: ExperimentConfig, path: str, load_labels=True) -> DataConfig:
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
        txt_drop_ratio=cfg.txt_drop_ratio,
        dset_domain=cfg.dset_domain,
        seed=cfg.seed,
        eos_first=getattr(cfg, "eos_first", False),
    )


def stop_metric(cfg: ExperimentConfig, brief: Dict[str, float]) -> float:
    """Model-selection metric per dataset (train.py:186-194, :321)."""
    if cfg.dset_name in ("tvsum", "youtube_uni"):
        return brief["mAP"]
    if cfg.dset_name in ("hl", "qv_internvideo2"):
        return brief["MR-full-mAP"]
    if cfg.dset_name == "tacos":
        return brief["MR-full-R1@0.3"]
    return (brief["MR-full-R1@0.7"] + brief["MR-full-R1@0.5"]) / 2


def evaluate(cfg, model, params, eval_dataset, results_dir, tag="latest"):
    if cfg.dset_name in ("tvsum", "youtube_uni"):
        metrics = run_hl_inference(cfg, model, params, eval_dataset)
        save_jsonl([metrics], os.path.join(results_dir, f"{tag}_metric.jsonl"))
        return metrics, None
    submission, submission_nms = run_mr_inference(cfg, model, params, eval_dataset)
    sub_path = os.path.join(
        results_dir, f"{tag}_{cfg.dset_name}_{cfg.eval_split_name}_preds.jsonl"
    )
    save_jsonl(submission, sub_path)
    metrics = metrics_nms = None
    if cfg.eval_split_name == "val":
        from flashvtg_tpu.eval.metrics import eval_submission

        metrics = eval_submission(submission, eval_dataset.data, verbose=False)
        save_json(metrics, sub_path.replace(".jsonl", "_metrics.json"), pretty=True)
        if submission_nms is not None:
            save_jsonl(
                submission_nms,
                sub_path.replace(".jsonl", f"_nms_thd_{cfg.nms_thd}.jsonl"),
            )
            metrics_nms = eval_submission(
                submission_nms, eval_dataset.data, verbose=False
            )
            save_json(
                metrics_nms,
                sub_path.replace(".jsonl", f"_nms_thd_{cfg.nms_thd}_metrics.json"),
                pretty=True,
            )
    return metrics, metrics_nms


def save_checkpoint(path: str, params, opt_state, epoch: int, cfg):
    """Full train state: params + optimizer state + epoch (reference saves
    {model, optimizer, lr_scheduler, epoch, opt}, train.py:200-233)."""
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
    cfg.save(os.path.join(os.path.dirname(os.path.abspath(path)), "opt.json"))


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


def train(cfg: ExperimentConfig, results_dir: Optional[str] = None):
    """Full training run; returns (best_params, best_score, results_dir)."""
    results_dir = results_dir or os.path.join(
        cfg.results_root,
        f"{cfg.dset_name}-{cfg.ctx_mode}-{cfg.exp_id}-{time.strftime('%Y-%m-%d-%H-%M-%S')}",
    )
    os.makedirs(results_dir, exist_ok=True)
    cfg.save(os.path.join(results_dir, "opt.json"))
    try:
        from flashvtg_tpu.utils.snapshot import snapshot_code

        snapshot_code(results_dir)
    except Exception as e:  # snapshot failures must never kill training
        logger.warning("code snapshot failed: %s", e)

    train_dataset = VTGDataset(_dataset_cfg(cfg, cfg.train_path))
    eval_dataset = (
        VTGDataset(_dataset_cfg(cfg, cfg.eval_path)) if cfg.eval_path else None
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
    steps_per_epoch = max(1, len(train_dataset) // cfg.bsz)
    tx, _ = make_optimizer(cfg, steps_per_epoch)
    opt_state = tx.init(params)
    start_epoch_override = None
    if cfg.resume == "auto":
        # crash-recovery: resume from the newest model_latest under
        # results_root (orbax checkpoints are atomic — a partial save never
        # finalizes, so the newest finalized dir is always consistent)
        import glob as _glob

        candidates = sorted(
            _glob.glob(os.path.join(cfg.results_root, "*", "model_latest")),
            key=os.path.getmtime,
        )
        cfg = cfg.replace(
            resume=candidates[-1] if candidates else None, resume_all=True
        )
        if cfg.resume:
            logger.info("auto-resume from %s", cfg.resume)
    if cfg.resume:
        restored = load_checkpoint(
            cfg.resume, like=params,
            opt_state_like=opt_state if cfg.resume_all else None,
        )
        params = restored["params"]
        if cfg.resume_all:
            if "opt_state" in restored:
                opt_state = restored["opt_state"]
            start_epoch_override = int(restored.get("epoch", -1)) + 1
    step_fn = make_train_step(model, loss_cfg, tx, cfg.train_precision)

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
    )

    order = np.arange(len(train_dataset))
    shuffler = np.random.default_rng(cfg.seed)
    best_score, best_params, es_cnt = 0.0, params, 0
    if cfg.start_epoch is not None:
        start_epoch = cfg.start_epoch
    elif start_epoch_override is not None:
        start_epoch = start_epoch_override
    else:
        start_epoch = 0
    global_step = 0

    for epoch in range(start_epoch, cfg.n_epoch):
        shuffler.shuffle(order)
        meters: Dict[str, AverageMeter] = {}
        epoch_t0 = time.time()
        trace_ctx = (
            profile_trace(cfg.profile_dir) if epoch == start_epoch
            else contextlib.nullcontext()
        )
        epoch_vecs = []
        with trace_ctx:
            for i in range(steps_per_epoch):
                idx = order[i * cfg.bsz : (i + 1) * cfg.bsz]
                if len(idx) < cfg.bsz:
                    continue
                batch = collator([train_dataset[j] for j in idx])
                tdt = (
                    jnp.bfloat16
                    if getattr(cfg, "transfer_dtype", "float32") == "bfloat16"
                    else None
                )
                device_batch = {
                    k: jnp.asarray(
                        v,
                        dtype=tdt if tdt and k in ("src_vid", "src_txt") else None,
                    )
                    for k, v in batch.items()
                    if k not in ("vid", "qid", "meta", "valid_v_lens")
                }
                rng, sub = jax.random.split(rng)
                # async step: losses stay on device so host-side collation and
                # the H2D transfer of step i+1 overlap step i's compute
                params, opt_state, vec = step_fn.device_step(
                    params, opt_state, device_batch, sub
                )
                epoch_vecs.append(vec)
                global_step += 1
        # one host fetch per epoch
        keys = step_fn.keys()
        for s, vec in enumerate(epoch_vecs):
            host_losses = dict(zip(keys, np.asarray(vec).tolist()))
            for k, v in host_losses.items():
                meters.setdefault(k, AverageMeter()).update(v)
            writer.write(
                global_step - len(epoch_vecs) + s, host_losses, prefix="train/"
            )
        if cfg.debug_nans and meters and not all(
            np.isfinite(m.avg) for m in meters.values()
        ):
            check_finite_tree(params, "params")
        losses = host_losses if epoch_vecs else {}
        dt = time.time() - epoch_t0
        writer.write(
            global_step,
            {"epoch_seconds": dt,
             "steps_per_sec": max(steps_per_epoch, 1) / max(dt, 1e-9)},
            prefix="perf/",
        )
        logger.info(
            "[epoch %d] (%.1fs) %s",
            epoch + 1,
            dt,
            " ".join(f"{k} {m.avg:.4f}" for k, m in meters.items()),
        )

        if eval_dataset is not None and (epoch + 1) % cfg.eval_epoch == 0:
            metrics, _ = evaluate(cfg, model, params, eval_dataset, results_dir)
            if metrics is not None:
                score = stop_metric(cfg, metrics["brief"])
                logger.info("[epoch %d] eval %s", epoch + 1, dict(metrics["brief"]))
                if score > best_score:
                    best_score, best_params, es_cnt = score, params, 0
                    save_checkpoint(
                        os.path.join(results_dir, "model_best"),
                        params, opt_state, epoch, cfg,
                    )
                else:
                    es_cnt += 1
                    if cfg.max_es_cnt != -1 and es_cnt > cfg.max_es_cnt:
                        logger.info("early stop at epoch %d", epoch)
                        break
        save_checkpoint(
            os.path.join(results_dir, "model_latest"), params, opt_state, epoch, cfg
        )
    writer.close()
    return best_params, best_score, results_dir
