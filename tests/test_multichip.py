"""Multi-device sharding: full sharded train step on the 8-device CPU mesh.

Mirrors what the driver validates via __graft_entry__.dryrun_multichip, and
additionally checks that the data-parallel step yields the same parameters
as a single-device step on the identical batch (XLA collectives correct).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from flashvtg_tpu.parallel.mesh import (
    make_mesh,
    replicate_params,
    shard_batch,
    shard_rows_for_host,
)
from flashvtg_tpu.models.flashvtg import FlashVTGModel, ModelConfig
from flashvtg_tpu.losses.criterion import LossConfig
from flashvtg_tpu.train.loop import make_optimizer, make_train_step
from flashvtg_tpu.train.config import ExperimentConfig


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = ModelConfig(
        vid_dim=18, txt_dim=12, hidden_dim=32, dim_feedforward=64,
        nheads=4, enc_layers=1, t2v_layers=1, dummy_layers=1, num_dummies=2,
        num_conv_layers=1, num_mlp_layers=2, strides=(1, 2), use_neg=True,
    )
    model = FlashVTGModel(cfg)
    lv, lq, b = 16, 8, 8
    rng = jax.random.PRNGKey(0)
    params = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, lq, cfg.txt_dim)), jnp.ones((1, lq)),
        jnp.zeros((1, lv, cfg.vid_dim)), jnp.ones((1, lv)),
        train=False,
    )
    host = np.random.default_rng(0)
    batch = {
        "src_txt": host.standard_normal((b, lq, cfg.txt_dim)).astype(np.float32),
        "src_txt_mask": np.ones((b, lq), np.float32),
        "src_vid": host.standard_normal((b, lv, cfg.vid_dim)).astype(np.float32),
        "src_vid_mask": np.ones((b, lv), np.float32),
        "saliency_all_labels": host.integers(0, 4, (b, lv)).astype(np.float32),
        "saliency_pos_labels": host.integers(0, lv, (b, 2)),
        "saliency_neg_labels": host.integers(0, lv, (b, 2)),
        "gt_windows": np.tile(np.asarray([[[2.0, 10.0]]], np.float32), (b, 1, 1)),
        "real_neg_mask": np.ones((b,), np.float32),
    }
    exp = ExperimentConfig(grad_clip=0.1, lr=1e-3, lr_drop=100)
    tx, _ = make_optimizer(exp, steps_per_epoch=10)
    loss_cfg = LossConfig(clip_length=2.0)
    step = make_train_step(model, loss_cfg, tx, "float32")
    return model, params, batch, tx, step


def test_sharded_step_matches_single_device(tiny_setup):
    model, params, batch, tx, step = tiny_setup
    assert len(jax.devices()) == 8, "conftest should give 8 virtual devices"

    # single device
    opt_state = tx.init(params)
    p1, _, losses1 = step(
        params, opt_state, {k: jnp.asarray(v) for k, v in batch.items()},
        jax.random.PRNGKey(1),
    )

    # 8-way data parallel
    mesh = make_mesh(data=8, model=1)
    params_r = replicate_params(mesh, params)
    opt_state = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P()))
        if hasattr(x, "shape") else x,
        tx.init(params_r),
    )
    device_batch = shard_batch(mesh, batch)
    p8, _, losses8 = step(params_r, opt_state, device_batch, jax.random.PRNGKey(1))

    np.testing.assert_allclose(
        float(losses1["weighted_loss_overall"]),
        float(losses8["weighted_loss_overall"]),
        rtol=1e-5,
    )
    # cross-device reduction order perturbs gradients at float epsilon, and
    # Adam's g/(sqrt(v)+eps) normalization amplifies (even sign-flips) that
    # noise on near-dead leaves whose true gradient is ~1e-9 — their one-step
    # updates are O(lr * |g|/(|g|+eps)), so the absolute floor must sit above
    # twice that; semantic divergence on live leaves shows at >=1e-3 relative
    # and stays covered by rtol
    flat1 = jax.tree.leaves(p1)
    flat8 = jax.tree.leaves(p8)
    for a, b_ in zip(flat1, flat8):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-3, atol=5e-5
        )


def test_shard_rows_for_host():
    rows = list(range(10))
    parts = [shard_rows_for_host(rows, i, 4) for i in range(4)]
    assert sorted(sum(parts, [])) == rows
    assert parts[0] == [0, 4, 8]


def _train_cfg(tmp, ann, vdir, qdir, results_root):
    from flashvtg_tpu.train.config import from_preset

    return from_preset(
        "qvhighlights_slowclip",
        v_feat_dim=32, t_feat_dim=24, max_v_l=16, max_q_l=12,
        hidden_dim=32, dim_feedforward=64, t2v_layers=1, enc_layers=1,
        dummy_layers=1, num_dummies=2, num_mlp_layers=2, num_conv_layers=1,
        bsz=16, eval_bsz=16, n_epoch=2, eval_epoch=1, nms_thd=-1.0,
        use_neg=True, train_precision="float32", eval_precision="float32",
        train_path=ann, eval_path=ann, v_feat_dirs=(vdir,), t_feat_dir=qdir,
        results_root=results_root, use_tensorboard=False,
        # scan_steps=0 keeps the PER-STEP feed path under sharded coverage
        # (the scan path's 1-dev and 8-dev-DP equivalence is pinned by
        # test_scan_epoch)
        scan_steps=0,
    )


@pytest.mark.slow
def test_production_train_sharded_matches_single_device(tmp_path):
    """Full train() (VERDICT round-1 item 1): the PRODUCTION loop on an
    8-device data mesh must reproduce the 1-device run (same seed, same
    data) up to cross-device reduction order."""
    from flashvtg_tpu.train.loop import train
    from flashvtg_tpu.utils.synthetic import make_synthetic_qvh

    ann, vdir, qdir = make_synthetic_qvh(
        str(tmp_path), n_queries=32, v_dim=32, t_dim=24, n_clips=16
    )
    cfg = _train_cfg(tmp_path, ann, vdir, qdir, str(tmp_path / "results"))

    mesh1 = make_mesh(jax.devices()[:1], data=1, model=1)
    p1, s1, _ = train(cfg, results_dir=str(tmp_path / "run1"), mesh=mesh1)

    mesh8 = make_mesh(jax.devices()[:8], data=8, model=1)
    p8, s8, _ = train(cfg, results_dir=str(tmp_path / "run8"), mesh=mesh8)

    np.testing.assert_allclose(s1, s8, rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=3e-5
        )


def test_train_auto_mesh_default(tmp_path):
    """train() with no explicit mesh builds a data-parallel mesh over the
    visible devices (the production default, not demo-ware)."""
    from flashvtg_tpu.train.loop import build_mesh_for

    mesh = build_mesh_for(16)
    assert mesh is not None and mesh.shape["data"] == 8
    # largest device count <= 8 dividing bsz (NOT gcd: bsz=12 -> 6, not 4)
    assert build_mesh_for(4).shape["data"] == 4
    assert build_mesh_for(3).shape["data"] == 3
    assert build_mesh_for(12).shape["data"] == 6
    # bsz=1: single device -> no mesh
    assert build_mesh_for(1) is None


@pytest.mark.slow
def test_sharded_eval_matches_single_device(tmp_path):
    """run_mr_inference over the 8-device data mesh must reproduce the
    single-device submission AND eval losses (data-parallel eval: batches
    sharded over "data", params/feed replicated)."""
    from flashvtg_tpu.parallel.mesh import replicate_params
    from flashvtg_tpu.train.infer import run_mr_inference
    from flashvtg_tpu.utils.synthetic import make_synthetic_qvh
    from flashvtg_tpu.train.loop import _dataset_cfg
    from flashvtg_tpu.data.dataset import VTGDataset

    ann, vdir, qdir = make_synthetic_qvh(
        str(tmp_path), n_queries=20, v_dim=32, t_dim=24, n_clips=16
    )
    cfg = _train_cfg(tmp_path, ann, vdir, qdir, str(tmp_path / "results"))
    model = cfg.build_model()
    dataset = VTGDataset(_dataset_cfg(cfg, ann, load_labels=True))
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init, static_argnames="train")(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, cfg.max_q_l, cfg.t_feat_dim)),
        jnp.ones((1, cfg.max_q_l)),
        jnp.zeros((1, cfg.max_v_l, cfg.total_v_feat_dim)),
        jnp.ones((1, cfg.max_v_l)),
        train=False,
    )
    loss_cfg = cfg.loss_config()

    # The dataset resamples saliency pos/neg labels on EVERY access through
    # one seeded stream (reference parity, data/dataset.py:6). Two
    # consecutive evals therefore see different sampled labels and their
    # margin-pair saliency losses legitimately differ — reset the stream so
    # both runs draw identically and the comparison isolates sharding.
    import random as _random

    def _fresh_rng():
        dataset.rng = _random.Random(dataset.cfg.seed)

    _fresh_rng()
    sub1, _, losses1 = run_mr_inference(
        cfg, model, params, dataset, loss_cfg=loss_cfg, mesh=None
    )
    dataset._device_feed_cache = None  # rebuild the feed under the mesh
    _fresh_rng()
    mesh = make_mesh(jax.devices(), data=8, model=1)
    sub8, _, losses8 = run_mr_inference(
        cfg, model, replicate_params(mesh, params), dataset,
        loss_cfg=loss_cfg, mesh=mesh,
    )
    assert [s["qid"] for s in sub1] == [s["qid"] for s in sub8]
    for a, b in zip(sub1, sub8):
        np.testing.assert_allclose(
            np.asarray(a["pred_relevant_windows"], np.float32),
            np.asarray(b["pred_relevant_windows"], np.float32),
            rtol=0, atol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(a["pred_saliency_scores"], np.float32),
            np.asarray(b["pred_saliency_scores"], np.float32),
            rtol=0, atol=1e-3,
        )
    assert set(losses1) == set(losses8)
    for k in losses1:  # cross-device reduction order perturbs f32 sums
        np.testing.assert_allclose(losses1[k], losses8[k], rtol=2e-3, atol=1e-5)

    # duration-bucketed eval under the same mesh must reproduce the
    # single-device BUCKETED run (sharding invariance). Bucketed output is
    # deliberately NOT compared against the fixed-padding run here: with
    # videos exactly max_v_l long, fixed padding keeps pyramid levels
    # adjacent in the concatenated point axis (the conf_head conv reads
    # across level boundaries like the reference's true-length concat),
    # while bucket padding inserts a zero gap — a documented divergence
    # (docs/BUCKETS.md).
    cfgb = cfg.replace(bucket_eval=True)
    dataset._device_feed_cache = None
    sub1b, _, _ = run_mr_inference(cfgb, model, params, dataset, mesh=None)
    sub8b, _, _ = run_mr_inference(
        cfgb, model, replicate_params(mesh, params), dataset, mesh=mesh
    )
    by_qid = {s["qid"]: s for s in sub8b}
    assert set(by_qid) == {s["qid"] for s in sub1b}
    for a in sub1b:
        w1 = np.asarray(a["pred_relevant_windows"], np.float32)
        w2 = np.asarray(by_qid[a["qid"]]["pred_relevant_windows"], np.float32)
        assert w1.shape == w2.shape
        np.testing.assert_allclose(w1, w2, rtol=0, atol=1e-3)


def test_global_real_neg_mask_across_host_blocks():
    """The negative-pair mask must follow the GLOBAL batch roll across
    host-contiguous blocks — a per-host roll would mislabel boundary rows."""
    from flashvtg_tpu.train.loop import global_real_neg_mask

    # 8 dataset rows; vids such that some neighbors repeat
    vids = ["a", "a", "b", "c", "c", "d", "e", "e"]
    rows = np.arange(8)  # unshuffled for clarity
    pc, local_bsz, step = 2, 4, 0
    # host 0 rows: 0,2,4,6  host 1 rows: 1,3,5,7
    # global order: [0,2,4,6, 1,3,5,7] -> vids [a,b,c,e, a,c,d,e]
    g_vids = ["a", "b", "c", "e", "a", "c", "d", "e"]
    rolled = g_vids[1:] + g_vids[:1]
    expect = np.asarray(
        [x != y for x, y in zip(g_vids, rolled)], np.float32
    )
    m0 = global_real_neg_mask(vids, rows, step, local_bsz, pc, 0)
    m1 = global_real_neg_mask(vids, rows, step, local_bsz, pc, 1)
    np.testing.assert_array_equal(np.concatenate([m0, m1]), expect)
    # boundary rows: global row 3 (vid e) vs row 4 (vid a) -> 1;
    # global last row (vid e) wraps to first (vid a) -> 1
    assert m0[-1] == 1.0 and m1[-1] == 1.0
    # same-vid neighbor inside host 1's block: rows 3->5 are c,c? order is
    # [1,3,5,7] = a,c,d,e — verify a boundary same-vid case explicitly:
    vids2 = ["a", "z", "b", "c", "c", "d", "z", "e"]
    # host0 block [0,2,4,6]=a,b,c,z ; host1 block [1,3,5,7]=z,c,d,e
    # boundary: host0 last (z) vs host1 first (z) -> NOT a real negative
    m0b = global_real_neg_mask(vids2, rows, step, local_bsz, pc, 0)
    assert m0b[-1] == 0.0
