"""Charades-STA and TACoS end-to-end slices on their real annotation files
(in-tree in the reference) with synthetic features: sub-as-query saliency
labels, clip_length=1 decode, saliency dropped from MR submissions, and the
TACoS string-qid path."""

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
from flashvtg_tpu.utils.io import load_jsonl, save_jsonl

V_DIM, T_DIM = 20, 16
N = 10


def _env(tmp_path, src_jsonl, clip_len, qid_prefix=""):
    rows = load_jsonl(src_jsonl)[:N]
    save_jsonl(rows, tmp_path / "anno.jsonl")
    (tmp_path / "vid").mkdir()
    (tmp_path / "txt").mkdir()
    rng = np.random.default_rng(0)
    for r in rows:
        lv = max(4, int(r["duration"] / clip_len))
        np.savez(tmp_path / "vid" / f"{r['vid']}.npz",
                 features=rng.standard_normal((lv, V_DIM), dtype=np.float32))
        np.savez(tmp_path / "txt" / f"qid{r['qid']}.npz",
                 last_hidden_state=rng.standard_normal((7, T_DIM), dtype=np.float32))
    return rows


def _run(tmp_path, preset, dset_name, clip_len, max_v_l):
    cfg = from_preset(
        preset,
        v_feat_dim=V_DIM,
        t_feat_dim=T_DIM,
        v_feat_dirs=(str(tmp_path / "vid"),),
        t_feat_dir=str(tmp_path / "txt"),
        eval_path=str(tmp_path / "anno.jsonl"),
        max_v_l=max_v_l,
        max_q_l=8,
        v_buckets=(64, 128),
        num_dummies=3, t2v_layers=1, enc_layers=1, dummy_layers=1,
        num_conv_layers=1, num_mlp_layers=2,
        eval_bsz=4, nms_thd=0.7, eval_precision="float32",
    )
    model = FlashVTGModel(cfg.model_config())
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init, static_argnames="train")(
        {"params": rng},
        jnp.zeros((1, 8, T_DIM)), jnp.ones((1, 8)),
        jnp.zeros((1, 64, V_DIM + 2)), jnp.ones((1, 64)),
        train=False,
    )
    dataset = VTGDataset(
        DataConfig(
            dset_name=dset_name, data_path=str(tmp_path / "anno.jsonl"),
            v_feat_dirs=(str(tmp_path / "vid"),),
            q_feat_dir=str(tmp_path / "txt"),
            max_q_l=8, max_v_l=max_v_l if max_v_l > 0 else 100_000_000,
            clip_len=clip_len, seed=7,
        )
    )
    return cfg, model, params, dataset


def test_charades_pipeline(tmp_path):
    rows = _env(
        tmp_path, "/root/reference/data/charades_sta/charades_sta_test_tvr_format.jsonl",
        clip_len=1.0,
    )
    cfg, model, params, dataset = _run(tmp_path, "charades", "charadesSTA", 1.0, 64)
    # sub-as-query labels present and binary
    _, inputs = dataset[0]
    assert set(np.unique(inputs["saliency_all_labels"])) <= {0.0, 1.0}
    assert inputs["saliency_pos_labels"].shape == (2,)

    submission, submission_nms, _ = run_mr_inference(cfg, model, params, dataset)
    assert len(submission) == N
    for s in submission:
        assert "pred_saliency_scores" not in s  # dropped for charades/tacos
        for st, ed, _ in s["pred_relevant_windows"]:
            assert st % 1.0 == 0 and ed <= 150  # clip_ts + round_multiple
    metrics = eval_submission(submission, rows, verbose=False)
    assert "MR-full-R1@0.5" in metrics["brief"]
    assert submission_nms is not None


def test_tacos_pipeline(tmp_path):
    rows = _env(tmp_path, "/root/reference/data/tacos/val.jsonl", clip_len=2.0)
    cfg, model, params, dataset = _run(tmp_path, "tacos", "tacos", 2.0, -1)
    submission, _, _ = run_mr_inference(cfg, model, params, dataset)
    assert len(submission) == N
    assert all(isinstance(s["qid"], str) for s in submission)
    for s in submission:
        assert "pred_saliency_scores" not in s
    metrics = eval_submission(submission, rows, verbose=False)
    assert np.isfinite(metrics["brief"]["MR-full-mIoU"])
