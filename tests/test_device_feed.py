"""HBM-resident training feed: feed-gathered batches must train identically
to streamed batches (data/feed.py + loop epoch_step_feed)."""

import numpy as np
import pytest

import jax

from flashvtg_tpu.data.collate import Collator
from flashvtg_tpu.data.dataset import VTGDataset
from flashvtg_tpu.data.feed import build_device_feed, estimate_feed_bytes
from flashvtg_tpu.train.config import from_preset
from flashvtg_tpu.train.loop import _dataset_cfg, train
from flashvtg_tpu.utils.synthetic import make_synthetic_qvh


def test_estimate_feed_bytes():
    # 10 rows, Lv=16 x 34, Lq=12 x 24 + masks, f32
    assert estimate_feed_bytes(10, 16, 34, 12, 24) == 10 * (
        16 * 34 + 12 * 24 + 16 + 12
    ) * 4


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("feed")
    ann, vdir, qdir = make_synthetic_qvh(
        str(root), n_queries=24, v_dim=32, t_dim=24, n_clips=16
    )
    cfg = from_preset(
        "qvhighlights_slowclip",
        v_feat_dim=32, t_feat_dim=24, max_v_l=16, max_q_l=12,
        hidden_dim=32, dim_feedforward=64, t2v_layers=1, enc_layers=1,
        dummy_layers=1, num_dummies=2, num_mlp_layers=2, num_conv_layers=1,
        bsz=8, eval_bsz=8, n_epoch=1, eval_epoch=5, nms_thd=-1.0,
        use_neg=True, train_precision="float32", eval_precision="float32",
        train_path=ann, eval_path="", v_feat_dirs=(vdir,), t_feat_dir=qdir,
        results_root=str(root / "results"), use_tensorboard=False,
    )
    return root, cfg


def test_feed_matches_per_sample_collate(env):
    root, cfg = env
    dataset = VTGDataset(_dataset_cfg(cfg, cfg.train_path))
    collator = Collator(
        max_q_l=cfg.max_q_l, v_buckets=cfg.v_buckets,
        dset_name=cfg.dset_name, fixed_v_len=cfg.max_v_l,
    )
    feed = build_device_feed(dataset, collator, chunk=7)  # odd chunk on purpose
    idx = [3, 11, 0]
    batch = collator([dataset[i] for i in idx])
    for k in ("src_vid", "src_vid_mask", "src_txt", "src_txt_mask"):
        np.testing.assert_array_equal(
            np.asarray(feed[k])[idx], batch[k], err_msg=k
        )


@pytest.mark.slow
def test_train_with_feed_matches_streamed(env):
    # scan_steps=0: this test isolates feed RESIDENCY (gathered features ==
    # streamed features) at tight tolerance; the scan fast path drifts by
    # compile-schedule ulps vs the per-step program and has its own
    # equivalence test (test_scan_epoch).
    root, cfg = env
    cfg = cfg.replace(scan_steps=0)
    p_on, _, _ = train(
        cfg.replace(device_feed="on"), results_dir=str(root / "run_on")
    )
    p_off, _, _ = train(
        cfg.replace(device_feed="off"), results_dir=str(root / "run_off")
    )
    for a, b in zip(jax.tree.leaves(p_on), jax.tree.leaves(p_off)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        )


def test_eval_with_feed_matches_streamed(env):
    import jax.numpy as jnp

    from flashvtg_tpu.train.infer import run_mr_inference

    root, cfg = env
    cfg = cfg.replace(eval_path=cfg.train_path)
    model = cfg.build_model()
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init, static_argnames="train")(
        {"params": rng},
        jnp.zeros((1, cfg.max_q_l, 24)), jnp.ones((1, cfg.max_q_l)),
        jnp.zeros((1, cfg.max_v_l, 34)), jnp.ones((1, cfg.max_v_l)),
        train=False,
    )
    # fresh dataset per run: labels are re-sampled on every access
    # (reference semantics), so an identical RNG stream needs a rebuild
    s_on, _, l_on = run_mr_inference(
        cfg.replace(device_feed="on"), model, params,
        VTGDataset(_dataset_cfg(cfg, cfg.eval_path)),
        loss_cfg=cfg.loss_config(),
    )
    s_off, _, l_off = run_mr_inference(
        cfg.replace(device_feed="off"), model, params,
        VTGDataset(_dataset_cfg(cfg, cfg.eval_path)),
        loss_cfg=cfg.loss_config(),
    )
    assert [s["qid"] for s in s_on] == [s["qid"] for s in s_off]
    for a, b in zip(s_on, s_off):
        np.testing.assert_allclose(
            np.asarray(a["pred_relevant_windows"], np.float32),
            np.asarray(b["pred_relevant_windows"], np.float32),
            rtol=1e-5, atol=1e-5,
        )
    for k in l_off:
        np.testing.assert_allclose(l_on[k], l_off[k], rtol=1e-5, atol=1e-6)


def test_labels_resampled_per_access_features_cached(env):
    """Reference semantics: saliency pos/neg pairs are re-drawn on every
    __getitem__ (start_end_dataset.py:239-250) while features are loaded
    once. features_only() must not consume the label RNG stream."""
    root, cfg = env
    dataset = VTGDataset(_dataset_cfg(cfg, cfg.train_path))
    _, a = dataset[0]
    state = dataset.rng.getstate()
    _, f = dataset.features_only(0)
    assert dataset.rng.getstate() == state  # no RNG consumed
    np.testing.assert_array_equal(a["video_feat"], f["video_feat"])
    draws = [tuple(dataset[0][1]["saliency_pos_labels"]) for _ in range(8)]
    assert len(set(draws)) > 1  # resampled across accesses
    feats = [dataset[0][1]["video_feat"] for _ in range(2)]
    np.testing.assert_array_equal(feats[0], feats[1])  # features stable
