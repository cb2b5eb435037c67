"""Reference TestOptions-era flags: --eval_untrained, --eval_results_dir,
the newly accepted inert flags, and the span_loss_type guard.

Oracle: reference config.py (flag definitions + TestOptions semantics),
train.py:129 (start_epoch=-1 on --eval_untrained), config.py:201-202
(eval_results_dir redirect), model.py:331 (SampledNCELoss() built with
defaults — --temperature never forwarded).
"""

import json
import logging
import os

import pytest

from flashvtg_tpu.train.config import ExperimentConfig, from_preset


def test_new_inert_flags_warn(caplog):
    cfg = from_preset(
        "qvhighlights_slowclip", temperature=0.5, a_feat_dir="/tmp/audio"
    )
    with caplog.at_level(logging.WARNING):
        cfg.warn_inert_flags()
    warned = " ".join(r.getMessage() for r in caplog.records)
    assert "temperature" in warned
    assert "a_feat_dir" in warned  # None-default flags warn when set at all


def test_defaults_do_not_warn(caplog):
    with caplog.at_level(logging.WARNING):
        from_preset("qvhighlights_slowclip").warn_inert_flags()
    assert not caplog.records


def test_span_loss_type_ce_rejected():
    cfg = ExperimentConfig(span_loss_type="ce")
    with pytest.raises(ValueError, match="span_loss_type"):
        cfg.build_model()


def test_reference_optjson_with_unknown_and_inert_keys_roundtrips(tmp_path):
    """A reference-produced opt.json carries every reference flag (incl.
    ones we drop entirely, like num_workers); load must tolerate them."""
    raw = {
        "dset_name": "hl", "bsz": 16, "temperature": 0.07,
        "no_sort_results": False, "num_workers": 4, "device": 0,
        "no_pin_memory": False, "span_loss_type": "l1",
        "a_feat_dim": None, "eval_id": None,
    }
    p = tmp_path / "opt.json"
    p.write_text(json.dumps(raw))
    cfg = ExperimentConfig.load(str(p))
    assert cfg.dset_name == "hl" and cfg.bsz == 16
    assert cfg.temperature == 0.07


def _tiny_train_cfg(tmp_path, **overrides):
    from flashvtg_tpu.utils.synthetic import make_synthetic_qvh

    ann, vdir, qdir = make_synthetic_qvh(
        str(tmp_path), n_queries=8, v_dim=16, t_dim=12, n_clips=8
    )
    kw = dict(
        v_feat_dim=16, t_feat_dim=12, max_v_l=8, max_q_l=6,
        hidden_dim=16, dim_feedforward=32, t2v_layers=1, enc_layers=1,
        dummy_layers=1, num_dummies=2, num_mlp_layers=2, num_conv_layers=1,
        bsz=4, eval_bsz=4, n_epoch=1, eval_epoch=1, nms_thd=-1.0,
        train_path=ann, eval_path=ann, v_feat_dirs=[vdir], t_feat_dir=qdir,
        results_root=str(tmp_path / "results"),
        train_precision="float32", eval_precision="float32",
        use_tensorboard=False,
    )
    kw.update(overrides)
    return from_preset("qvhighlights_slowclip", **kw)


@pytest.mark.slow
def test_eval_untrained_runs_eval_before_epoch0(tmp_path):
    from flashvtg_tpu.train.loop import train

    cfg = _tiny_train_cfg(tmp_path, eval_untrained=True)
    run_dir = str(tmp_path / "run")
    train(cfg, results_dir=run_dir)

    # eval.log.txt leads with the reference's epoch=-1 line
    lines = open(os.path.join(run_dir, "eval.log.txt")).read().splitlines()
    assert len(lines) == 2  # untrained + epoch 0
    assert "[Epoch] -01" in lines[0]
    # scalars carry TWO eval blocks, the untrained one at step 0
    eval_steps = []
    with open(os.path.join(run_dir, "tensorboard_log", "scalars.jsonl")) as f:
        for line in f:
            row = json.loads(line)
            if any(k.startswith("eval/") for k in row):
                eval_steps.append(row["step"])
    assert len(eval_steps) == 2 and eval_steps[0] == 0


def test_eval_results_dir_redirects_infer_outputs(tmp_path):
    from flashvtg_tpu.cli import main as cli_main
    from flashvtg_tpu.train.loop import train

    cfg = _tiny_train_cfg(tmp_path)
    run_dir = str(tmp_path / "run")
    train(cfg, results_dir=run_dir)

    redirect = str(tmp_path / "elsewhere")
    rc = cli_main(
        [
            "infer", "qvhighlights_slowclip",
            "--resume", os.path.join(run_dir, "model_latest"),
            "--eval_results_dir", redirect,
        ]
    )
    assert rc == 0
    produced = os.listdir(redirect)
    assert any(p.endswith("_preds.jsonl") for p in produced)
    assert any(p.endswith("_metrics.json") for p in produced)


def test_param_count_logged(tmp_path, caplog):
    from flashvtg_tpu.train.loop import train

    cfg = _tiny_train_cfg(tmp_path, eval_path="")
    with caplog.at_level(logging.INFO, logger="flashvtg_tpu.train.loop"):
        train(cfg, results_dir=str(tmp_path / "run"))
    assert any("Learnable Parameters" in r.getMessage() for r in caplog.records)


def test_testoptions_keep_list_not_restored_from_optjson(tmp_path):
    """TestOptions restores saved training flags EXCEPT the eval-time keep
    list (reference config.py:196-199: nms_thd, debug, results_root, ...).
    The invocation's own values — here the preset, the analogue of the
    reference inference script's explicit flag block — must win over the
    SAVED values for those keys, while everything else (dims, paths) is
    restored from opt.json."""
    from flashvtg_tpu.cli import main as cli_main
    from flashvtg_tpu.train.loop import train

    # trained with NMS off -> saved opt.json records nms_thd=-1
    cfg = _tiny_train_cfg(tmp_path)
    assert cfg.nms_thd == -1.0
    run_dir = str(tmp_path / "run")
    train(cfg, results_dir=run_dir)

    # the preset's own nms_thd=0.7 must win over the saved -1 (keep-list);
    # the saved dims/paths must still be restored or the checkpoint could
    # not even load (preset says hidden 256, the run used 16)
    out1 = str(tmp_path / "out1")
    cli_main(
        ["infer", "qvhighlights_slowclip",
         "--resume", os.path.join(run_dir, "model_latest"),
         "--eval_results_dir", out1]
    )
    produced = os.listdir(out1)
    assert any(p.endswith("_preds.jsonl") for p in produced)
    assert any("nms_thd_0.7" in p for p in produced)

    # an explicit CLI flag still wins over both
    out2 = str(tmp_path / "out2")
    cli_main(
        ["infer", "qvhighlights_slowclip",
         "--resume", os.path.join(run_dir, "model_latest"),
         "--eval_results_dir", out2, "--nms_thd", "-1"]
    )
    assert not any("nms" in p for p in os.listdir(out2))


def test_feature_interactions_smoke(tmp_path, monkeypatch):
    """All the round-3-late features at once on the production feed+scan
    path: --eval_untrained + --test_path + --use_wandb (stubbed) in one
    train() — pins the interactions (untrained eval before the scan epochs,
    final dual-split evals, every scalar mirrored to wandb)."""
    import sys

    from tests.test_wandb import _stub_wandb

    from flashvtg_tpu.train.loop import train

    runs = []
    monkeypatch.setitem(sys.modules, "wandb", _stub_wandb(runs))
    cfg = _tiny_train_cfg(
        tmp_path, eval_untrained=True, use_wandb=True, n_epoch=2,
        test_path=_tiny_train_cfg(tmp_path).eval_path,
    )
    # Pin that the tiny cfg really exercises the production feed+scan path
    # (scan enabled = >1); the exact chunk size is the swept production
    # default and moves with ExperimentConfig.scan_steps.
    from flashvtg_tpu.train.config import ExperimentConfig

    assert cfg.device_feed == "auto"
    assert cfg.scan_steps == ExperimentConfig.scan_steps and cfg.scan_steps > 1
    run_dir = str(tmp_path / "run")
    best_params, best_score, _ = train(cfg, results_dir=run_dir)
    assert best_score > 0

    # untrained + 2 per-epoch evals -> 3 eval.log lines, first at epoch -1
    lines = open(os.path.join(run_dir, "eval.log.txt")).read().splitlines()
    assert len(lines) == 3 and "[Epoch] -01" in lines[0]
    # final dual-split evals wrote val_/test_ submissions for latest + best
    produced = os.listdir(run_dir)
    for tag in ("val_latest", "val_best", "test_latest", "test_best"):
        assert any(p.startswith(tag) for p in produced), (tag, produced)
    # wandb saw train/, eval/ and perf/ scalars and was finished
    (run,) = runs
    logged_keys = {k for _, row in run.logged for k in row}
    assert any(k.startswith("train/") for k in logged_keys)
    assert any(k.startswith("eval/") for k in logged_keys)
    assert any(k.startswith("perf/") for k in logged_keys)
    assert run.finished


def test_live_reference_flag_surface_fully_covered(tmp_path):
    """Pin the 100%-flag-surface claim against the LIVE reference parser:
    every optional flag of BaseOptions (FlashVTG/config.py:21-169) is
    either an ExperimentConfig field or a documented drop, and an opt.json
    holding the reference's own defaults for ALL of them loads cleanly."""
    import dataclasses

    from tests.reference_oracle import install_nncore_stub

    install_nncore_stub()
    from FlashVTG.config import BaseOptions

    bo = BaseOptions()
    bo.initialize()
    defaults = {
        a.dest: a.default
        for a in bo.parser._actions
        if a.option_strings and a.dest != "help"
    }
    ours = {f.name for f in dataclasses.fields(ExperimentConfig)}
    dropped = {"device", "num_workers", "no_pin_memory"}  # docs/MIGRATION.md
    missing = set(defaults) - ours - dropped
    assert not missing, f"reference flags with no field here: {sorted(missing)}"

    p = tmp_path / "opt.json"
    p.write_text(json.dumps(defaults))
    cfg = ExperimentConfig.load(str(p))
    # spot-check a few restored reference defaults
    assert cfg.seed == defaults["seed"]
    assert cfg.lr == defaults["lr"]
    assert cfg.max_es_cnt == defaults["max_es_cnt"]

    # and the _ms parser's surface (adds --num_phrase etc.)
    from FlashVTG_ms.config import BaseOptions as MSBaseOptions

    ms = MSBaseOptions()
    ms.initialize()
    ms_defaults = {
        a.dest: a.default
        for a in ms.parser._actions
        if a.option_strings and a.dest != "help"
    }
    missing_ms = set(ms_defaults) - ours - dropped
    assert not missing_ms, f"_ms flags with no field here: {sorted(missing_ms)}"


def test_debug_fast_loop(tmp_path):
    """--debug truncates to <=2 steps and 1 epoch (reference config.py:32-33)
    and disables the scan epoch (per-step granularity for inspection)."""
    from flashvtg_tpu.train.loop import train

    cfg = _tiny_train_cfg(tmp_path, debug=True, n_epoch=5)
    run_dir = str(tmp_path / "run")
    train(cfg, results_dir=run_dir)
    steps = epochs = 0
    with open(os.path.join(run_dir, "tensorboard_log", "scalars.jsonl")) as f:
        for line in f:
            row = json.loads(line)
            steps += any(k.startswith("train/") for k in row)
            epochs += "perf/epoch_seconds" in row
    assert epochs == 1 and 1 <= steps <= 2
    lines = open(os.path.join(run_dir, "train.log.txt")).read().splitlines()
    assert len(lines) == 1


def test_data_ratio_slices_dataset(tmp_path):
    """--data_ratio trains on the first fraction of rows (reference
    config.py:34-37 + start_end_dataset.py data_ratio slice)."""
    from flashvtg_tpu.data.dataset import DataConfig, VTGDataset
    from flashvtg_tpu.utils.synthetic import make_synthetic_qvh

    ann, vdir, qdir = make_synthetic_qvh(
        str(tmp_path), n_queries=8, v_dim=16, t_dim=12, n_clips=8
    )
    kw = dict(
        dset_name="hl", data_path=ann, v_feat_dirs=(vdir,), q_feat_dir=qdir,
        max_q_l=6, max_v_l=8,
    )
    assert len(VTGDataset(DataConfig(**kw))) == 8
    assert len(VTGDataset(DataConfig(data_ratio=0.5, **kw))) == 4
    assert len(VTGDataset(DataConfig(data_ratio=0.3, **kw))) == 2  # floor
