"""--test_path second-split evaluation (FlashVTG_ms/train.py:243-286).

After training, the best AND latest models are each evaluated on the val
split and the --test_path split, with tagged prediction files — the _ms
trainer's surface, implemented in the shared production loop.
"""

import json
import os

import pytest

import numpy as np

from flashvtg_tpu.train.config import from_preset
from flashvtg_tpu.train.loop import train
from flashvtg_tpu.utils.synthetic import make_synthetic_qvh


@pytest.mark.slow
def test_test_path_final_evals(tmp_path):
    ann, vdir, qdir = make_synthetic_qvh(
        str(tmp_path), n_queries=16, v_dim=32, t_dim=24, n_clips=16
    )
    # second split: a disjoint subset of rows (features shared — the
    # multi-dir v_feat_dirs surface means dim-concat, not fallback)
    with open(ann) as f:
        rows = [json.loads(line) for line in f]
    ann2 = str(tmp_path / "test_split.jsonl")
    with open(ann2, "w") as f:
        for r in rows[-8:]:
            f.write(json.dumps(r) + "\n")

    cfg = from_preset(
        "qvhighlights_slowclip",
        v_feat_dim=32, t_feat_dim=24, max_v_l=16, max_q_l=12,
        hidden_dim=32, dim_feedforward=64, t2v_layers=1, enc_layers=1,
        dummy_layers=1, num_dummies=2, num_mlp_layers=2, num_conv_layers=1,
        bsz=8, eval_bsz=8, n_epoch=1, eval_epoch=1, nms_thd=-1.0,
        use_neg=True, train_precision="float32", eval_precision="float32",
        train_path=ann, eval_path=ann, test_path=ann2,
        v_feat_dirs=(vdir,), t_feat_dir=qdir,
        results_root=str(tmp_path / "results"), use_tensorboard=False,
    )

    _, score, results_dir = train(cfg, results_dir=str(tmp_path / "run"))

    # the filename's split component names the actual split evaluated
    # (ADVICE r3: test-split artifacts used to be mislabeled `..._val_...`)
    for tag, split in (("val_latest", "val"), ("test_latest", "test"),
                       ("val_best", "val"), ("test_best", "test")):
        path = os.path.join(results_dir, f"{tag}_hl_{split}_preds.jsonl")
        assert os.path.exists(path), tag
        metrics = path.replace(".jsonl", "_metrics.json")
        assert os.path.exists(metrics), tag  # both splits carry GT windows
    n_test = sum(1 for _ in open(
        os.path.join(results_dir, "test_latest_hl_test_preds.jsonl")
    ))
    assert n_test == 8  # the test split's own rows, not the val split's
    assert np.isfinite(score)

    # reference-format text logs (train.py:93-103 / :159-169)
    train_log = open(os.path.join(results_dir, "train.log.txt")).read()
    assert "[Epoch] 001 [Loss]" in train_log
    eval_log = open(os.path.join(results_dir, "eval.log.txt")).read()
    assert "[Metrics] {" in eval_log and "MR-full-mAP" in eval_log
