"""End-to-end slice: synthetic features -> dataset -> jitted inference ->
jsonl submission -> metric suite; plus a few training steps."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flashvtg_tpu.data.collate import Collator
from flashvtg_tpu.data.dataset import DataConfig, VTGDataset
from flashvtg_tpu.eval.metrics import eval_submission
from flashvtg_tpu.models.flashvtg import FlashVTGModel
from flashvtg_tpu.train.config import from_preset
from flashvtg_tpu.train.infer import run_mr_inference
from flashvtg_tpu.train.loop import make_optimizer, make_train_step
from flashvtg_tpu.utils.io import load_jsonl, save_jsonl

REF_GT = "/root/reference/data/highlight_val_release.jsonl"
N_QUERIES = 16
V_DIM, T_DIM = 32, 24  # tiny synthetic feature dims


@pytest.fixture(scope="module")
def synthetic_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("qvh")
    rows = load_jsonl(REF_GT)[:N_QUERIES]
    ann = root / "val.jsonl"
    save_jsonl(rows, ann)
    vdir = root / "vid_feats"
    qdir = root / "txt_feats"
    vdir.mkdir()
    qdir.mkdir()
    rng = np.random.default_rng(0)
    for r in rows:
        lv = int(r["duration"] / 2)
        np.savez(
            vdir / f"{r['vid']}.npz",
            features=rng.standard_normal((lv, V_DIM), dtype=np.float32),
        )
        lq = rng.integers(5, 20)
        np.savez(
            qdir / f"qid{r['qid']}.npz",
            last_hidden_state=rng.standard_normal((lq, T_DIM), dtype=np.float32),
        )
    return root, rows


def _config(root):
    return from_preset(
        "qvhighlights_slowclip",
        v_feat_dim=V_DIM,
        t_feat_dim=T_DIM,
        v_feat_dirs=(str(root / "vid_feats"),),
        t_feat_dir=str(root / "txt_feats"),
        train_path=str(root / "val.jsonl"),
        eval_path=str(root / "val.jsonl"),
        eval_bsz=8,
        bsz=8,
        num_dummies=4,
        t2v_layers=2,
        enc_layers=2,
        dummy_layers=1,
        num_mlp_layers=3,
        eval_precision="float32",
        train_precision="float32",
    )


@pytest.fixture(scope="module")
def model_and_params(synthetic_env):
    root, _ = synthetic_env
    cfg = _config(root)
    model = FlashVTGModel(cfg.model_config())
    rng = jax.random.PRNGKey(0)
    params = model.init(
        {"params": rng},
        jnp.zeros((1, cfg.max_q_l, T_DIM)),
        jnp.ones((1, cfg.max_q_l)),
        jnp.zeros((1, cfg.max_v_l, V_DIM + 2)),
        jnp.ones((1, cfg.max_v_l)),
        train=False,
    )
    return cfg, model, params


def test_inference_to_metrics(synthetic_env, model_and_params):
    root, rows = synthetic_env
    cfg, model, params = model_and_params
    dataset = VTGDataset(
        DataConfig(
            dset_name="hl",
            data_path=str(root / "val.jsonl"),
            v_feat_dirs=(str(root / "vid_feats"),),
            q_feat_dir=str(root / "txt_feats"),
            max_q_l=cfg.max_q_l,
            max_v_l=cfg.max_v_l,
            clip_len=2.0,
        )
    )
    submission, submission_nms, _ = run_mr_inference(cfg, model, params, dataset)
    assert len(submission) == N_QUERIES
    for s in submission:
        wins = s["pred_relevant_windows"]
        assert 0 < len(wins) <= cfg.max_num_moment
        for st, ed, score in wins:
            assert 0 <= st <= ed  # decoded + clamped + rounded
            assert st % cfg.clip_length == 0 and ed % cfg.clip_length == 0
            assert 0 <= score <= 1
        assert len(s["pred_saliency_scores"]) > 0
    # scores sorted descending
    scores = [w[2] for w in submission[0]["pred_relevant_windows"]]
    assert scores == sorted(scores, reverse=True)
    # NMS output exists (nms_thd=0.7 in preset) and is score-sorted
    assert submission_nms is not None
    nms_scores = [w[2] for w in submission_nms[0]["pred_relevant_windows"]]
    assert nms_scores == sorted(nms_scores, reverse=True)

    metrics = eval_submission(submission, rows, verbose=False)
    brief = metrics["brief"]
    assert "MR-full-mAP" in brief and "HL-min-VeryGood-mAP" in brief
    assert all(np.isfinite(v) for v in brief.values())


def test_train_steps_reduce_loss(synthetic_env, model_and_params):
    root, _ = synthetic_env
    cfg, _, params = model_and_params
    cfg = cfg.replace(use_neg=True)
    model = FlashVTGModel(cfg.model_config())
    dataset = VTGDataset(
        DataConfig(
            dset_name="hl",
            data_path=str(root / "val.jsonl"),
            v_feat_dirs=(str(root / "vid_feats"),),
            q_feat_dir=str(root / "txt_feats"),
            max_q_l=cfg.max_q_l,
            max_v_l=cfg.max_v_l,
            clip_len=2.0,
        )
    )
    collator = Collator(
        max_q_l=cfg.max_q_l,
        v_buckets=cfg.v_buckets,
        max_windows=cfg.max_windows,
        dset_name="hl",
        fixed_v_len=cfg.max_v_l,
    )
    batch = collator([dataset[i] for i in range(cfg.bsz)])
    device_batch = {
        k: jnp.asarray(v)
        for k, v in batch.items()
        if k not in ("vid", "qid", "meta", "valid_v_lens")
    }
    tx, _ = make_optimizer(cfg, steps_per_epoch=2)
    opt_state = tx.init(params)
    step = make_train_step(model, cfg.loss_config(), tx, "float32")

    rng = jax.random.PRNGKey(1)
    losses0 = None
    for i in range(8):
        rng, sub = jax.random.split(rng)
        params, opt_state, losses = step(params, opt_state, device_batch, sub)
        if losses0 is None:
            losses0 = {k: float(v) for k, v in losses.items()}
        for k, v in losses.items():
            assert np.isfinite(float(v)), f"{k} is not finite"
    # optimizing a fixed batch must reduce the weighted loss
    assert float(losses["weighted_loss_overall"]) < losses0["weighted_loss_overall"]
