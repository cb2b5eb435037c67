"""FlashVTG_ms variant through the HL inference pipeline and a train step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flashvtg_tpu.data.collate import Collator
from flashvtg_tpu.data.dataset import DataConfig, VTGDataset
from flashvtg_tpu.train.config import from_preset
from flashvtg_tpu.train.infer import run_hl_inference
from flashvtg_tpu.train.loop import make_optimizer, make_train_step
from flashvtg_tpu.utils.io import save_jsonl

V_DIM, T_DIM = 24, 16


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("tvsum_ms")
    rng = np.random.default_rng(2)
    rows = []
    for v in ["WxtbjNsCQ8A", "Se3oxnaPsz0"]:
        n = int(rng.integers(24, 40))
        rows.append(
            {
                "qid": v, "query": "title", "duration": n * 2.0, "vid": v,
                "relevant_clip_ids": None, "relevant_windows": None,
                "label": rng.integers(1, 6, (n, 20)).tolist(), "domain": "BK",
            }
        )
        (root / "vid").mkdir(exist_ok=True)
        (root / "txt").mkdir(exist_ok=True)
        np.save(root / "vid" / f"{v}_rgb.npy",
                rng.standard_normal((n, V_DIM // 2), dtype=np.float32))
        np.save(root / "vid" / f"{v}_opt.npy",
                rng.standard_normal((n, V_DIM // 2), dtype=np.float32))
        np.savez(root / "txt" / f"{v}.npz",
                 last_hidden_state=rng.standard_normal((6, T_DIM), dtype=np.float32))
    save_jsonl(rows, root / "val.jsonl")
    return root


def _cfg(root):
    return from_preset(
        "tvsum_ms",
        v_feat_dim=V_DIM,
        t_feat_dim=T_DIM,
        v_feat_dirs=(str(root / "vid"),),
        t_feat_dir=str(root / "txt"),
        train_path=str(root / "val.jsonl"),
        eval_path=str(root / "val.jsonl"),
        dset_domain="BK",
        max_v_l=48, max_q_l=8, bsz=2, eval_bsz=2,
        num_dummies=2, t2v_layers=1, enc_layers=1, dummy_layers=1,
        num_conv_layers=1, num_mlp_layers=2,
        num_phrase=2, phrase_layers=1, context_layers=1, rank=2, t_sa=1,
        eval_precision="float32", train_precision="float32",
    )


def test_ms_hl_inference(env):
    cfg = _cfg(env)
    assert cfg.variant == "ms"
    model = cfg.build_model()
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init, static_argnames="train")(
        {"params": rng},
        jnp.zeros((1, 8, T_DIM)), jnp.ones((1, 8)),
        jnp.zeros((1, 48, V_DIM + 2)), jnp.ones((1, 48)),
        train=False,
    )
    dataset = VTGDataset(
        DataConfig(
            dset_name="tvsum", data_path=str(env / "val.jsonl"),
            v_feat_dirs=(str(env / "vid"),), q_feat_dir=str(env / "txt"),
            max_q_l=8, max_v_l=48, dset_domain="BK",
        )
    )
    metrics = run_hl_inference(cfg, model, params, dataset)
    assert 0.0 <= metrics["brief"]["mAP"] <= 1.0


def test_ms_train_step(env):
    cfg = _cfg(env)
    model = cfg.build_model()
    loss_cfg = cfg.ms_loss_config()
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init, static_argnames="train")(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 8, T_DIM)), jnp.ones((1, 8)),
        jnp.zeros((1, 48, V_DIM + 2)), jnp.ones((1, 48)),
        train=False,
    )
    dataset = VTGDataset(
        DataConfig(
            dset_name="tvsum", data_path=str(env / "val.jsonl"),
            v_feat_dirs=(str(env / "vid"),), q_feat_dir=str(env / "txt"),
            max_q_l=8, max_v_l=48, dset_domain="BK",
        )
    )
    collator = Collator(max_q_l=8, v_buckets=(48,), dset_name="tvsum",
                        fixed_v_len=48)
    batch = collator([dataset[0], dataset[1]])
    device_batch = {
        k: jnp.asarray(v) for k, v in batch.items()
        if k not in ("vid", "qid", "meta", "valid_v_lens")
    }
    tx, _ = make_optimizer(cfg, steps_per_epoch=2)
    opt_state = tx.init(params)
    step = make_train_step(model, loss_cfg, tx, "float32")
    p0 = None
    for i in range(4):
        params, opt_state, losses = step(
            params, opt_state, device_batch, jax.random.PRNGKey(i)
        )
        assert all(np.isfinite(v) for v in losses.values()), losses
        if p0 is None:
            p0 = losses["weighted_loss_overall"]
    assert losses["weighted_loss_overall"] < p0


@pytest.mark.slow
def test_ms_full_train_loop(env, tmp_path):
    """The PRODUCTION train() handles the _ms variant end-to-end on the HD
    task (feed + donated buffered steps + HL eval + checkpoints)."""
    from flashvtg_tpu.train.loop import train

    root = env
    cfg = from_preset(
        "tvsum_ms",
        v_feat_dim=V_DIM, t_feat_dim=T_DIM, max_v_l=48, max_q_l=8,
        dset_domain="BK", hidden_dim=16, dim_feedforward=32, t2v_layers=1,
        enc_layers=1, dummy_layers=1, num_dummies=2, num_mlp_layers=2,
        num_conv_layers=1, num_phrase=2, phrase_layers=1, context_layers=1,
        t_sa=1, rank=4, bsz=2, eval_bsz=2, n_epoch=2, eval_epoch=1,
        train_precision="float32", eval_precision="float32",
        v_feat_dirs=(str(root / "vid"),), t_feat_dir=str(root / "txt"),
        train_path=str(root / "val.jsonl"), eval_path=str(root / "val.jsonl"),
        results_root=str(tmp_path / "results"), use_tensorboard=False,
    )
    params, score, run_dir = train(
        cfg, results_dir=str(tmp_path / "run_ms")
    )
    assert np.isfinite(score)
    for leaf in jax.tree.leaves(params):
        assert np.all(np.isfinite(np.asarray(leaf)))
    import os

    assert os.path.exists(os.path.join(run_dir, "model_latest"))
