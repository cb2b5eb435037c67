"""Optional wandb sink of ScalarWriter (reference: the `_ms` trainer's
unconditional wandb.init + sync_tensorboard, FlashVTG_ms/train.py:124-125).

wandb is not installed in this image (and the reference's hard dependency on
it is exactly what we relax), so the live path is exercised against a stub
module injected into sys.modules, and the degraded path against the real
absent-package state.
"""

import json
import os
import sys
import types

import pytest

from flashvtg_tpu.utils.observability import ScalarWriter


class _StubRun:
    def __init__(self, kwargs):
        self.kwargs = kwargs
        self.logged = []
        self.finished = False

    def log(self, scalars, step=None):
        self.logged.append((step, dict(scalars)))

    def finish(self):
        self.finished = True


def _stub_wandb(recorder):
    mod = types.ModuleType("wandb")

    def init(**kwargs):
        recorder.append(_StubRun(kwargs))
        return recorder[-1]

    mod.init = init
    return mod


def test_wandb_sink_logs_and_finishes(tmp_path, monkeypatch):
    runs = []
    monkeypatch.setitem(sys.modules, "wandb", _stub_wandb(runs))
    w = ScalarWriter(
        str(tmp_path), use_tensorboard=False,
        wandb_run={"project": "FlashVTG", "name": "run-1",
                   "config": {"bsz": 32}},
    )
    w.write(0, {"loss_cls": 1.5}, prefix="train/")
    w.write(7, {"mAP": 33.0}, prefix="eval/")
    w.close()

    (run,) = runs
    assert run.kwargs["project"] == "FlashVTG"
    assert run.kwargs["name"] == "run-1"
    assert run.kwargs["config"] == {"bsz": 32}
    assert run.logged == [
        (0, {"train/loss_cls": 1.5}),
        (7, {"eval/mAP": 33.0}),
    ]
    assert run.finished
    # the jsonl sink is unaffected by the wandb mirror
    with open(tmp_path / "scalars.jsonl") as f:
        rows = [json.loads(line) for line in f]
    assert rows[0]["train/loss_cls"] == 1.5 and rows[1]["eval/mAP"] == 33.0


def test_wandb_missing_degrades_to_warning(tmp_path, monkeypatch, caplog):
    # force the not-installed state even if a future image ships wandb
    monkeypatch.setitem(sys.modules, "wandb", None)
    with caplog.at_level("WARNING"):
        w = ScalarWriter(
            str(tmp_path), use_tensorboard=False,
            wandb_run={"project": "FlashVTG", "name": "x", "config": {}},
        )
    assert any("wandb" in r.message for r in caplog.records)
    w.write(0, {"loss": 2.0})
    w.close()
    with open(tmp_path / "scalars.jsonl") as f:
        assert json.loads(f.readline())["loss"] == 2.0


@pytest.mark.slow
def test_train_wires_use_wandb(tmp_path, monkeypatch):
    """The production train() passes project/run-name/config through to
    wandb.init when --use_wandb is set."""
    import numpy as np

    from flashvtg_tpu.train.config import from_preset
    from flashvtg_tpu.train.loop import train
    from flashvtg_tpu.utils.synthetic import make_synthetic_qvh

    runs = []
    monkeypatch.setitem(sys.modules, "wandb", _stub_wandb(runs))
    ann, vdir, qdir = make_synthetic_qvh(
        str(tmp_path), n_queries=4, v_dim=16, t_dim=12, n_clips=8
    )
    cfg = from_preset(
        "qvhighlights_slowclip",
        v_feat_dim=16, t_feat_dim=12, max_v_l=8, max_q_l=6,
        hidden_dim=16, dim_feedforward=32, t2v_layers=1, enc_layers=1,
        dummy_layers=1, num_dummies=2, num_mlp_layers=2, num_conv_layers=1,
        bsz=4, eval_bsz=4, n_epoch=1, eval_epoch=2, nms_thd=-1.0,
        train_path=ann, eval_path="", v_feat_dirs=[vdir], t_feat_dir=qdir,
        results_root=str(tmp_path / "results"),
        train_precision="float32", use_tensorboard=False, use_wandb=True,
    )
    train(cfg, results_dir=str(tmp_path / "run"))
    (run,) = runs
    assert run.kwargs["project"] == "FlashVTG"
    assert run.kwargs["name"] == "run"
    assert run.kwargs["config"]["use_wandb"] is True
    assert run.kwargs["config"]["bsz"] == 4
    # per-step train losses + per-epoch perf scalars reached wandb
    assert any(
        any(k.startswith("train/") for k in row) for _, row in run.logged
    )
    assert run.finished
