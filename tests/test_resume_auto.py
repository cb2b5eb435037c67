"""Crash recovery: `--resume auto` picks up the newest finalized
model_latest under results_root and continues from the next epoch
(reference analogue: --resume_all, inference.py:472-475; auto-discovery is
this framework's addition for unattended restarts)."""

import os

import numpy as np

from flashvtg_tpu.train.config import from_preset
from flashvtg_tpu.train.loop import load_checkpoint, train
from flashvtg_tpu.utils.synthetic import make_synthetic_qvh


def test_auto_resume_continues_epochs(tmp_path):
    ann, vdir, qdir = make_synthetic_qvh(
        str(tmp_path), n_queries=16, v_dim=16, t_dim=12, n_clips=16
    )
    cfg = from_preset(
        "qvhighlights_slowclip",
        v_feat_dim=16, t_feat_dim=12, max_v_l=16, max_q_l=12,
        hidden_dim=16, dim_feedforward=32, t2v_layers=1, enc_layers=1,
        dummy_layers=1, num_dummies=2, num_mlp_layers=2, num_conv_layers=1,
        bsz=8, eval_bsz=8, n_epoch=2, eval_epoch=10, nms_thd=-1.0,
        use_neg=True, train_precision="float32",
        train_path=ann, eval_path="", v_feat_dirs=(vdir,), t_feat_dir=qdir,
        results_root=str(tmp_path / "results"), use_tensorboard=False,
    )
    # "crashed" run: 2 of 4 epochs done
    _, _, run_dir = train(cfg, results_dir=str(tmp_path / "results" / "runA"))
    ck = load_checkpoint(os.path.join(run_dir, "model_latest"))
    assert int(np.asarray(ck["epoch"])) == 1  # 0-indexed last epoch

    # unattended restart: finds runA/model_latest, continues epochs 3-4
    p, _, run_dir2 = train(
        cfg.replace(resume="auto", n_epoch=4),
        results_dir=str(tmp_path / "results" / "runB"),
    )
    ck2 = load_checkpoint(os.path.join(run_dir2, "model_latest"))
    assert int(np.asarray(ck2["epoch"])) == 3
    import jax

    for leaf in jax.tree.leaves(p):
        assert np.all(np.isfinite(np.asarray(leaf)))
