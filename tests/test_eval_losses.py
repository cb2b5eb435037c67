"""Eval-time criterion losses (reference inference.py:300-306) and the
tail-batch bucketing of the batched eval path."""

import numpy as np
import pytest

import jax

from flashvtg_tpu.data.dataset import VTGDataset
from flashvtg_tpu.train.infer import _tail_bucket, run_mr_inference
from flashvtg_tpu.train.loop import _dataset_cfg
from flashvtg_tpu.utils.synthetic import make_synthetic_qvh


def test_tail_bucket_sizes():
    # largest power of two FITTING the remainder: tails decompose into
    # their binary representation, so no batch ever pads with duplicates
    assert _tail_bucket(1, 32) == 1
    assert _tail_bucket(3, 32) == 2  # 3 -> batches of 2 + 1
    assert _tail_bucket(14, 32) == 8  # 14 -> 8 + 4 + 2
    assert _tail_bucket(32, 32) == 32
    assert _tail_bucket(20, 24) == 16  # capped at bsz even off a power of 2


def test_batched_exact_binary_tails():
    from flashvtg_tpu.train.infer import _batched

    class _FakeDs:
        def __len__(self):
            return 13

        def __getitem__(self, i):
            return i

    takes = [idx for _, idx, _ in _batched(_FakeDs(), list, 8)]
    assert [len(t) for t in takes] == [8, 4, 1]  # 13 = 8 + 4 + 1
    flat = [i for t in takes for i in t]
    assert flat == list(range(13))  # every row exactly once, in order


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    import jax.numpy as jnp

    from flashvtg_tpu.train.config import from_preset

    root = tmp_path_factory.mktemp("evloss")
    ann, vdir, qdir = make_synthetic_qvh(
        str(root), n_queries=13, v_dim=16, t_dim=12, n_clips=16
    )
    cfg = from_preset(
        "qvhighlights_slowclip",
        v_feat_dim=16, t_feat_dim=12, max_v_l=16, max_q_l=12,
        hidden_dim=16, dim_feedforward=32, t2v_layers=1, enc_layers=1,
        dummy_layers=1, num_dummies=2, num_mlp_layers=2, num_conv_layers=1,
        eval_bsz=8, nms_thd=-1.0, use_neg=True,
        train_path=ann, eval_path=ann, v_feat_dirs=(vdir,), t_feat_dir=qdir,
        eval_precision="float32",
    )
    model = cfg.build_model()
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init, static_argnames="train")(
        {"params": rng},
        jnp.zeros((1, cfg.max_q_l, 12)), jnp.ones((1, cfg.max_q_l)),
        jnp.zeros((1, cfg.max_v_l, 18)), jnp.ones((1, cfg.max_v_l)),
        train=False,
    )
    dataset = VTGDataset(_dataset_cfg(cfg, cfg.eval_path))
    return cfg, model, params, dataset


def test_packed_step_matches_tuple_step(env):
    """make_eval_step(packed=True) must carry exactly the tuple step's
    outputs: spans/scores/saliency bit-identical and the loss vector laid
    out in the declared .loss_keys order."""
    import jax.numpy as jnp

    from flashvtg_tpu.data.collate import Collator, device_arrays
    from flashvtg_tpu.models.points import pyramid_masks_strict
    from flashvtg_tpu.train.infer import make_eval_step

    cfg, model, params, dataset = env
    loss_cfg = cfg.loss_config()
    collator = Collator(
        max_q_l=cfg.max_q_l, v_buckets=cfg.v_buckets,
        max_windows=cfg.max_windows, dset_name=cfg.dset_name,
        fixed_v_len=cfg.max_v_l,
    )
    batch = collator([dataset[i] for i in range(8)])
    strict, _ = pyramid_masks_strict(
        batch["valid_v_lens"], cfg.max_v_l, cfg.strides
    )
    dev_batch = {k: jnp.asarray(v) for k, v in device_arrays(batch).items()}

    plain = make_eval_step(
        model, cfg.max_num_moment, "float32", loss_cfg=loss_cfg
    )
    packed = make_eval_step(
        model, cfg.max_num_moment, "float32", loss_cfg=loss_cfg, packed=True
    )
    spans, scores, sal, losses = plain(params, dev_batch, jnp.asarray(strict))
    arr = np.asarray(packed(params, dev_batch, jnp.asarray(strict)))
    u_spans, u_scores, u_sal, u_losses = packed.unpack(arr, cfg.max_v_l)

    np.testing.assert_array_equal(np.asarray(spans), u_spans)
    np.testing.assert_array_equal(np.asarray(scores), u_scores)
    np.testing.assert_array_equal(np.asarray(sal), u_sal)
    assert set(u_losses) == set(losses)
    for k, v in losses.items():
        np.testing.assert_allclose(float(v), u_losses[k], rtol=1e-6)


def test_eval_losses_returned(env):
    cfg, model, params, dataset = env
    sub, _, losses = run_mr_inference(
        cfg, model, params, dataset, loss_cfg=cfg.loss_config()
    )
    # 13 rows at eval_bsz=8 -> exact batches of 8 + 4 + 1 (binary tail)
    assert len(sub) == 13
    assert "weighted_loss_overall" in losses and "loss_saliency" in losses
    assert all(np.isfinite(v) for v in losses.values())
    # without loss_cfg the loss dict is empty and the submission identical
    sub2, _, empty = run_mr_inference(cfg, model, params, dataset)
    assert empty == {}
    assert [s["qid"] for s in sub2] == [s["qid"] for s in sub]
    for a, b in zip(sub, sub2):
        np.testing.assert_allclose(
            np.asarray(a["pred_relevant_windows"], np.float32),
            np.asarray(b["pred_relevant_windows"], np.float32),
            rtol=1e-5, atol=1e-6,
        )
