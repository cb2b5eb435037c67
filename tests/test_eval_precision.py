"""--eval_precision modes: all three run the full eval path and agree.

The hardware-measured metric deltas live in docs/PRECISION.md (CPU
executes every matmul-precision mode with the same f32 kernels, so this
test pins the plumbing and the MR-metric agreement contract, not the TPU
numerics): float32 / tensorfloat32 / bfloat16 must all produce well-formed
submissions whose MR metrics match within the serving gate.
"""

import numpy as np
import pytest

from flashvtg_tpu.data.dataset import VTGDataset
from flashvtg_tpu.eval.metrics import eval_submission
from flashvtg_tpu.train.config import from_preset
from flashvtg_tpu.train.infer import run_mr_inference
from flashvtg_tpu.train.loop import _dataset_cfg
from flashvtg_tpu.utils.synthetic import make_synthetic_qvh

import jax
import jax.numpy as jnp


def test_precision_modes_agree(tmp_path):
    ann, vdir, qdir = make_synthetic_qvh(
        str(tmp_path), n_queries=16, v_dim=32, t_dim=24, n_clips=16
    )
    cfg = from_preset(
        "qvhighlights_slowclip",
        v_feat_dim=32, t_feat_dim=24, max_v_l=16, max_q_l=12,
        hidden_dim=32, dim_feedforward=64, t2v_layers=1, enc_layers=1,
        dummy_layers=1, num_dummies=2, num_mlp_layers=2, num_conv_layers=1,
        eval_bsz=8, nms_thd=-1.0,
        train_path=ann, eval_path=ann, v_feat_dirs=(vdir,), t_feat_dir=qdir,
    )
    model = cfg.build_model()
    rng = jax.random.PRNGKey(0)
    params = model.init(
        {"params": rng},
        jnp.zeros((1, 12, 24)), jnp.ones((1, 12)),
        jnp.zeros((1, 16, 34)), jnp.ones((1, 16)),
        train=False,
    )
    dataset = VTGDataset(_dataset_cfg(cfg, cfg.eval_path, load_labels=False))

    briefs = {}
    for prec in ("float32", "tensorfloat32", "bfloat16"):
        sub, _, _ = run_mr_inference(
            cfg.replace(eval_precision=prec), model, params, dataset
        )
        assert len(sub) == 16
        for row in sub:
            w = np.asarray(row["pred_relevant_windows"])
            assert w.ndim == 2 and w.shape[1] == 3
            assert np.isfinite(w).all()
        briefs[prec] = eval_submission(sub, dataset.data, verbose=False)[
            "brief"
        ]

    for key in ("MR-full-R1@0.5", "MR-full-R1@0.7", "MR-full-mAP"):
        vals = [briefs[p][key] for p in briefs]
        assert max(vals) - min(vals) <= 0.1, (key, briefs)


def test_serving_flag_applies_tf32_profile(tmp_path, monkeypatch):
    """`cli infer --serving` applies the documented serving profile
    (docs/PRECISION.md): eval_precision=tensorfloat32 — unless an explicit
    --eval_precision overrides it; without --serving the default stays
    float32 (parity against reference checkpoints assumes it)."""
    import orbax.checkpoint as ocp

    import flashvtg_tpu.train.loop as loop_mod
    from flashvtg_tpu.cli import main as cli_main

    ann, vdir, qdir = make_synthetic_qvh(
        str(tmp_path), n_queries=4, v_dim=32, t_dim=24, n_clips=16
    )
    flags = [
        "--v_feat_dim", "32", "--t_feat_dim", "24", "--max_v_l", "16",
        "--max_q_l", "12", "--hidden_dim", "32", "--dim_feedforward", "64",
        "--t2v_layers", "1", "--enc_layers", "1", "--dummy_layers", "1",
        "--num_dummies", "2", "--num_mlp_layers", "2",
        "--num_conv_layers", "1", "--eval_bsz", "4",
        "--v_feat_dirs", vdir, "--t_feat_dir", qdir, "--eval_path", ann,
    ]
    cfg = from_preset(
        "qvhighlights_slowclip",
        v_feat_dim=32, t_feat_dim=24, max_v_l=16, max_q_l=12,
        hidden_dim=32, dim_feedforward=64, t2v_layers=1, enc_layers=1,
        dummy_layers=1, num_dummies=2, num_mlp_layers=2, num_conv_layers=1,
    )
    model = cfg.build_model()
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 12, 24)), jnp.ones((1, 12)),
        jnp.zeros((1, 16, 34)), jnp.ones((1, 16)),
        train=False,
    )
    ckpt_dir = str(tmp_path / "ckpt")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(ckpt_dir, {"params": params, "epoch": np.asarray(0)})
    ckptr.wait_until_finished()

    seen = []

    def fake_evaluate(cfg, *a, **k):
        seen.append(cfg.eval_precision)
        return None, None, {}

    monkeypatch.setattr(loop_mod, "evaluate", fake_evaluate)

    base = ["infer", "qvhighlights_slowclip", *flags, "--resume", ckpt_dir]
    assert cli_main(base + ["--serving"]) == 0
    assert cli_main(base) == 0
    assert cli_main(base + ["--serving", "--eval_precision", "bfloat16"]) == 0
    assert seen == ["tensorfloat32", "float32", "bfloat16"]


def test_serving_never_persists_and_sidecar_eval_bsz_is_1(tmp_path):
    """Two invocation-time-vs-persisted contracts (PARITY.md deviation 7):
    (a) `serving` never round-trips through opt.json — a run trained with
    --serving must not flip later plain `cli infer --resume` calls to tf32,
    even against a stale opt.json that recorded it; (b) the reference-
    sidecar opt.json records eval_bsz=1 (the only value the reference model
    can eval at, model.py:248) while our own reload keeps the invocation's
    batched value via the keep-list."""
    import json

    from flashvtg_tpu.train.config import ExperimentConfig

    cfg = from_preset(
        "qvhighlights_slowclip", serving=True, eval_bsz=64,
    )
    opt_path = str(tmp_path / "opt.json")
    cfg.save(opt_path)
    raw = json.load(open(opt_path))
    assert "serving" not in raw, "serving must never persist"
    assert raw["eval_bsz"] == 1, "sidecar must be reference-runnable"

    # even a handcrafted stale record cannot re-enable serving on load
    raw["serving"] = True
    json.dump(raw, open(opt_path, "w"))
    loaded = ExperimentConfig.load(opt_path)
    assert loaded.serving is False
    assert loaded.eval_bsz == 1  # load() itself is verbatim; see keep-list
