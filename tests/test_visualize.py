"""Visualization CLI: prediction/GT figure + checkpoint-driven attention
maps (replaces reference tools/visualize*.py without their hard-coded
paths)."""

import os

import numpy as np
import pytest

pytest.importorskip("matplotlib")

import jax
import jax.numpy as jnp

from flashvtg_tpu.tools.visualize import main as viz_main
from flashvtg_tpu.train.config import from_preset
from flashvtg_tpu.train.loop import save_checkpoint
from flashvtg_tpu.utils.io import save_jsonl
from flashvtg_tpu.utils.synthetic import make_synthetic_qvh


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("viz")
    ann, vdir, qdir = make_synthetic_qvh(
        str(root), n_queries=4, v_dim=16, t_dim=12, n_clips=16
    )
    cfg = from_preset(
        "qvhighlights_slowclip",
        v_feat_dim=16, t_feat_dim=12, max_v_l=16, max_q_l=12,
        hidden_dim=16, dim_feedforward=32, t2v_layers=1, enc_layers=1,
        dummy_layers=1, num_dummies=2, num_mlp_layers=2, num_conv_layers=1,
        train_path=ann, eval_path=ann, v_feat_dirs=(vdir,), t_feat_dir=qdir,
    )
    model = cfg.build_model()
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init, static_argnames="train")(
        {"params": rng},
        jnp.zeros((1, cfg.max_q_l, 12)), jnp.ones((1, cfg.max_q_l)),
        jnp.zeros((1, cfg.max_v_l, 18)), jnp.ones((1, cfg.max_v_l)),
        train=False,
    )
    ckpt = str(root / "run" / "model_best")
    save_checkpoint(ckpt, params, {"n": np.asarray(0)}, 0, cfg)
    preds = [
        dict(
            qid=0, query="synthetic query 0", vid="synthvid_0000",
            pred_relevant_windows=[[0.0, 4.0, 0.9], [10.0, 20.0, 0.3]],
            pred_saliency_scores=[0.1] * 16,
        )
    ]
    preds_path = str(root / "preds.jsonl")
    save_jsonl(preds, preds_path)
    return root, ann, preds_path, ckpt


def test_plot_query_png(env):
    root, ann, preds_path, ckpt = env
    out = str(root / "fig.png")
    viz_main(["--preds", preds_path, "--gt", ann, "--qid", "0", "--out", out])
    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_compare_overlay_png(env):
    """--compare overlays a second submission's windows/saliency
    (tools/visualize_qd.py model-vs-model figure equivalent)."""
    root, ann, preds_path, ckpt = env
    other = [
        dict(
            qid=0, query="synthetic query 0", vid="synthvid_0000",
            pred_relevant_windows=[[2.0, 8.0, 0.7]],
            pred_saliency_scores=[0.5] * 16,
        )
    ]
    other_path = str(root / "other.jsonl")
    save_jsonl(other, other_path)
    out = str(root / "fig_cmp.png")
    viz_main([
        "--preds", preds_path, "--gt", ann, "--qid", "0", "--out", out,
        "--compare", other_path, "--labels", "flashvtg", "baseline",
    ])
    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_attention_maps_png(env):
    root, ann, preds_path, ckpt = env
    out = str(root / "fig2.png")
    viz_main([
        "--gt", ann, "--qid", "0", "--out", out,
        "--attention", "--ckpt", ckpt,
    ])
    attn_out = str(root / "fig2_attn.png")
    assert os.path.exists(attn_out) and os.path.getsize(attn_out) > 1000


def test_export_attention_shapes(env):
    from flashvtg_tpu.tools.visualize import export_attention_maps

    root, ann, preds_path, ckpt = env
    maps, meta, lv = export_attention_maps(ckpt, ann, 0)
    assert maps["token_attention"].shape[0] == lv
    assert maps["t2vattnvalues"].shape == (lv,)
    assert np.all(np.isfinite(maps["token_attention"]))


def test_phrase_maps_png(tmp_path):
    """--phrase renders the _ms phrase-pipeline bundle (reference
    tools/visualize_phrase.py equivalent) from an _ms checkpoint."""
    ann, vdir, qdir = make_synthetic_qvh(
        str(tmp_path), n_queries=3, v_dim=16, t_dim=12, n_clips=16
    )
    cfg = from_preset(
        "qvhighlights_slowclip",
        variant="ms", num_phrase=2, phrase_layers=1, context_layers=1,
        rank=8, t_sa=1,
        v_feat_dim=16, t_feat_dim=12, max_v_l=16, max_q_l=12,
        hidden_dim=16, dim_feedforward=32, t2v_layers=1, enc_layers=1,
        dummy_layers=1, num_dummies=2, num_mlp_layers=2, num_conv_layers=1,
        train_path=ann, eval_path=ann, v_feat_dirs=(vdir,), t_feat_dir=qdir,
    )
    model = cfg.build_model()
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init, static_argnames="train")(
        {"params": rng},
        jnp.zeros((1, cfg.max_q_l, 12)), jnp.ones((1, cfg.max_q_l)),
        jnp.zeros((1, cfg.max_v_l, 18)), jnp.ones((1, cfg.max_v_l)),
        train=False,
    )
    ckpt = str(tmp_path / "run" / "model_best")
    save_checkpoint(ckpt, params, {"n": np.asarray(0)}, 0, cfg)
    out = str(tmp_path / "fig3.png")
    viz_main(["--gt", ann, "--qid", "0", "--out", out,
              "--phrase", "--ckpt", ckpt])
    phrase_out = str(tmp_path / "fig3_phrase.png")
    assert os.path.exists(phrase_out) and os.path.getsize(phrase_out) > 1000

    from flashvtg_tpu.tools.visualize import export_attention_maps

    maps, _, lv = export_attention_maps(ckpt, ann, 0)
    n = cfg.num_phrase
    assert maps["context_emb"].shape[:2] == (n, lv)
    assert maps["context_refine"].shape[:2] == (n, lv)
    assert maps["slot_att"].shape[0] == n
    assert maps["context_agg"].shape[0] == lv
    assert np.all(np.isfinite(maps["context_refine"]))
