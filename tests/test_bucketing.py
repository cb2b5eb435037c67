"""Variable-length (TACoS-style) inference: bucketed static shapes must not
change per-video results — a video batched next to a much longer one (padded
to a larger bucket) yields the same windows as when evaluated alone."""

import numpy as np
import pytest

import jax

from flashvtg_tpu.data.collate import Collator
from flashvtg_tpu.data.dataset import DataConfig, VTGDataset
from flashvtg_tpu.models.flashvtg import FlashVTGModel
from flashvtg_tpu.ops.pad import bucket_length
from flashvtg_tpu.train.config import from_preset
from flashvtg_tpu.train.infer import run_mr_inference
from flashvtg_tpu.utils.io import save_jsonl

V_DIM, T_DIM = 24, 16


def _make_env(root, lengths):
    (root / "vid").mkdir()
    (root / "txt").mkdir()
    rng = np.random.default_rng(0)
    rows = []
    for i, lv in enumerate(lengths):
        rows.append(
            {
                "qid": 1000 + i,
                "query": f"query {i}",
                "vid": f"v{i}",
                "duration": lv * 2.0,
                "relevant_windows": [[0.0, 8.0]],
            }
        )
        np.savez(root / "vid" / f"v{i}.npz",
                 features=rng.standard_normal((lv, V_DIM), dtype=np.float32))
        np.savez(root / "txt" / f"qid{1000 + i}.npz",
                 last_hidden_state=rng.standard_normal((9, T_DIM), dtype=np.float32))
    save_jsonl(rows, root / "val.jsonl")
    return rows


def test_bucket_length():
    assert bucket_length(30, (75, 256)) == 75
    assert bucket_length(75, (75, 256)) == 75
    assert bucket_length(76, (75, 256)) == 256
    assert bucket_length(9999, (75, 256)) == 256  # clamps to last


@pytest.mark.parametrize("pair_lengths", [[30, 200]])
def test_bucket_invariance(tmp_path, pair_lengths):
    rows = _make_env(tmp_path, pair_lengths)
    cfg = from_preset(
        "tacos",
        v_feat_dim=V_DIM,
        t_feat_dim=T_DIM,
        v_feat_dirs=(str(tmp_path / "vid"),),
        t_feat_dir=str(tmp_path / "txt"),
        eval_path=str(tmp_path / "val.jsonl"),
        max_v_l=-1,  # unbounded: bucketed static shapes
        max_q_l=12,
        v_buckets=(64, 256),
        num_dummies=3, t2v_layers=1, enc_layers=1, dummy_layers=1,
        num_conv_layers=1, num_mlp_layers=2,
        eval_bsz=2, nms_thd=-1.0, eval_precision="float32",
    )
    model = FlashVTGModel(cfg.model_config())
    import jax.numpy as jnp

    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init, static_argnames="train")(
        {"params": rng},
        jnp.zeros((1, 12, T_DIM)), jnp.ones((1, 12)),
        jnp.zeros((1, 64, V_DIM + 2)), jnp.ones((1, 64)),
        train=False,
    )

    def dataset_for(path):
        return VTGDataset(
            DataConfig(
                dset_name="tacos", data_path=str(path),
                v_feat_dirs=(str(tmp_path / "vid"),),
                q_feat_dir=str(tmp_path / "txt"),
                max_q_l=12, max_v_l=100_000_000, clip_len=2.0,
            )
        )

    # batched together: short video padded into the 256 bucket
    sub_both, _, _ = run_mr_inference(cfg, model, params, dataset_for(tmp_path / "val.jsonl"))

    # short video alone: lands in the 64 bucket
    save_jsonl(rows[:1], tmp_path / "short.jsonl")
    sub_short, _, _ = run_mr_inference(
        cfg.replace(eval_bsz=1), model, params, dataset_for(tmp_path / "short.jsonl")
    )

    both = {s["qid"]: s for s in sub_both}
    alone = sub_short[0]
    a = np.asarray(alone["pred_relevant_windows"])
    b = np.asarray(both[alone["qid"]]["pred_relevant_windows"])
    assert a.shape == b.shape
    np.testing.assert_allclose(a[:, 2], b[:, 2], atol=5e-4)
    np.testing.assert_allclose(np.sort(a[:, 0]), np.sort(b[:, 0]), atol=1e-5)
    # both videos hit the max_num_moment cap; windows stay within duration
    assert len(np.asarray(both[1001]["pred_relevant_windows"])) == 50
    long_rows = np.asarray(both[1001]["pred_relevant_windows"])
    assert long_rows[:, 1].max() <= 400.0  # 200 clips * 2s


def test_full_batch_strict_fast_path():
    """For a batch with no padded rows the strict pyramid masks are all-ones
    and the eval step must be BIT-identical with point_valid=None — the fast
    path _strict_or_none takes to skip the conf head's compact/scatter."""
    import jax.numpy as jnp

    from flashvtg_tpu.models.points import pyramid_masks_strict
    from flashvtg_tpu.train.infer import _strict_or_none, make_eval_step

    cfg = from_preset(
        "tacos",
        v_feat_dim=V_DIM, t_feat_dim=T_DIM,
        max_v_l=64, max_q_l=12,
        num_dummies=3, t2v_layers=1, enc_layers=1, dummy_layers=1,
        num_conv_layers=2, num_mlp_layers=2,
        eval_precision="float32",
    )
    model = FlashVTGModel(cfg.model_config())
    rng = np.random.default_rng(3)
    b, lv, lq = 4, 64, 12
    src_txt = jnp.asarray(rng.standard_normal((b, lq, T_DIM)), jnp.float32)
    src_vid = jnp.asarray(rng.standard_normal((b, lv, V_DIM + 2)), jnp.float32)
    ones_t, ones_v = jnp.ones((b, lq)), jnp.ones((b, lv))
    params = jax.jit(model.init, static_argnames="train")(
        {"params": jax.random.PRNGKey(0)},
        src_txt, ones_t, src_vid, ones_v, train=False,
    )
    batch = {
        "src_txt": src_txt, "src_txt_mask": ones_t,
        "src_vid": src_vid, "src_vid_mask": ones_v,
    }
    lens = np.full(b, lv)
    strict, _ = pyramid_masks_strict(lens, lv, cfg.strides)
    assert (strict == 1).all()
    assert _strict_or_none(strict, lens, lv) is None
    # one short row -> strict masks must be kept
    assert _strict_or_none(strict, np.array([lv, lv - 1, lv, lv]), lv) is not None

    step = make_eval_step(model, cfg.max_num_moment, "float32")
    spans_m, scores_m, sal_m, _ = step(params, batch, jnp.asarray(strict))
    spans_n, scores_n, sal_n, _ = step(params, batch, None)
    np.testing.assert_array_equal(np.asarray(spans_m), np.asarray(spans_n))
    np.testing.assert_array_equal(np.asarray(scores_m), np.asarray(scores_n))
    np.testing.assert_array_equal(np.asarray(sal_m), np.asarray(sal_n))


def test_bucket_eval_matches_fixed(tmp_path):
    """cfg.bucket_eval=True (duration-sorted, per-batch buckets) produces
    the same per-qid submission as fixed max-length padding."""
    import jax.numpy as jnp

    rows = _make_env(tmp_path, [30, 200, 60, 150])
    base = from_preset(
        "tacos",
        v_feat_dim=V_DIM, t_feat_dim=T_DIM,
        v_feat_dirs=(str(tmp_path / "vid"),),
        t_feat_dir=str(tmp_path / "txt"),
        eval_path=str(tmp_path / "val.jsonl"),
        max_v_l=256, max_q_l=12, v_buckets=(64, 256),
        num_dummies=3, t2v_layers=1, enc_layers=1, dummy_layers=1,
        num_conv_layers=1, num_mlp_layers=2,
        eval_bsz=2, nms_thd=-1.0, eval_precision="float32",
    )
    model = FlashVTGModel(base.model_config())
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init, static_argnames="train")(
        {"params": rng},
        jnp.zeros((1, 12, T_DIM)), jnp.ones((1, 12)),
        jnp.zeros((1, 64, V_DIM + 2)), jnp.ones((1, 64)),
        train=False,
    )
    dataset = VTGDataset(
        DataConfig(
            dset_name="tacos", data_path=str(tmp_path / "val.jsonl"),
            v_feat_dirs=(str(tmp_path / "vid"),),
            q_feat_dir=str(tmp_path / "txt"),
            max_q_l=12, max_v_l=100_000_000, clip_len=2.0,
        )
    )
    sub_fixed, _, _ = run_mr_inference(base, model, params, dataset)
    sub_bucket, _, _ = run_mr_inference(
        base.replace(bucket_eval=True), model, params, dataset
    )
    assert sorted(s["qid"] for s in sub_bucket) == sorted(
        s["qid"] for s in sub_fixed
    )
    fixed = {s["qid"]: s for s in sub_fixed}
    for s in sub_bucket:
        a = np.asarray(s["pred_relevant_windows"])
        b = np.asarray(fixed[s["qid"]]["pred_relevant_windows"])
        assert a.shape == b.shape
        np.testing.assert_allclose(a[:, 2], b[:, 2], atol=5e-4)
