"""End-to-end learnability: with a synthetic localizable signal (a feature
bump inside each GT window), the full loss stack + decode must learn to
place windows on the bump. Guards against silent sign/masking errors that
leave every loss finite but untrainable."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from flashvtg_tpu.losses.criterion import LossConfig
from flashvtg_tpu.models.flashvtg import (
    FlashVTGModel,
    ModelConfig,
    decode_boundaries,
)
from flashvtg_tpu.train.config import ExperimentConfig
from flashvtg_tpu.train.loop import make_optimizer, make_train_step

B, LV, LQ, V, T = 16, 32, 6, 12, 8
N_SAMPLES = 64


def _make_samples():
    rng_np = np.random.default_rng(0)
    samples = []
    for _ in range(N_SAMPLES):
        st = int(rng_np.integers(0, LV - 8))
        ed = st + int(rng_np.integers(3, 8))
        vid = rng_np.standard_normal((LV, V)).astype(np.float32) * 0.1
        vid[st:ed, :4] += 2.0
        txt = rng_np.standard_normal((LQ, T)).astype(np.float32) * 0.1
        sal = np.zeros(LV, np.float32)
        sal[st:ed] = 3
        pos = [st, min(ed - 1, LV - 1)]
        neg_pool = [j for j in range(LV) if j < st or j >= ed]
        neg = list(rng_np.choice(neg_pool, 2))
        gt = np.full((1, 2), np.inf, np.float32)
        gt[0] = [st * 2.0, ed * 2.0]
        samples.append((vid, txt, sal, pos, neg, gt, (st * 2.0, ed * 2.0)))
    return samples


def test_model_learns_localization():
    samples = _make_samples()
    cfg = ModelConfig(
        vid_dim=V, txt_dim=T, hidden_dim=32, dim_feedforward=64, nheads=4,
        enc_layers=1, t2v_layers=1, dummy_layers=1, num_dummies=2,
        num_conv_layers=1, num_mlp_layers=2, strides=(1, 2), use_neg=False,
        clip_length=2.0, dropout=0.0, input_dropout=0.0,
    )
    model = FlashVTGModel(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, LQ, T)), jnp.ones((1, LQ)),
        jnp.zeros((1, LV, V)), jnp.ones((1, LV)), train=False,
    )
    exp = ExperimentConfig(lr=3e-4, lr_drop=1000, grad_clip=0.1, wd=1e-4)
    tx, _ = make_optimizer(exp, 4)
    opt_state = tx.init(params)
    step = make_train_step(
        model, LossConfig(clip_length=2.0, lw_reg=1.0, lw_cls=5.0), tx, "float32"
    )

    def batch_of(idx):
        return {
            "src_txt": jnp.asarray(np.stack([samples[i][1] for i in idx])),
            "src_txt_mask": jnp.ones((len(idx), LQ)),
            "src_vid": jnp.asarray(np.stack([samples[i][0] for i in idx])),
            "src_vid_mask": jnp.ones((len(idx), LV)),
            "saliency_all_labels": jnp.asarray(
                np.stack([samples[i][2] for i in idx])
            ),
            "saliency_pos_labels": jnp.asarray(
                np.stack([samples[i][3] for i in idx])
            ),
            "saliency_neg_labels": jnp.asarray(
                np.stack([samples[i][4] for i in idx])
            ),
            "gt_windows": jnp.asarray(np.stack([samples[i][5] for i in idx])),
        }

    def r1_at_05(p):
        out = model.apply(
            p,
            *(batch_of(range(N_SAMPLES))[k] for k in
              ("src_txt", "src_txt_mask", "src_vid", "src_vid_mask")),
            train=False,
        )
        spans, _ = decode_boundaries(
            out["out_class"], out["out_coord"], out["point"], 2.0, top_k=1
        )
        spans = np.asarray(spans)[:, 0]
        hits = 0
        for i in range(N_SAMPLES):
            st, ed = samples[i][6]
            ps, pe = spans[i]
            inter = max(0.0, min(pe, ed) - max(ps, st))
            union = max(pe, ed) - min(ps, st)
            hits += union > 0 and inter / union >= 0.5
        return hits / N_SAMPLES

    before = r1_at_05(params)
    order = np.arange(N_SAMPLES)
    shuffler = np.random.default_rng(1)
    first_loss = last_loss = None
    for epoch in range(25):
        shuffler.shuffle(order)
        for i in range(0, N_SAMPLES, B):
            idx = order[i : i + B]
            rng, sub = jax.random.split(rng)
            params, opt_state, losses = step(params, opt_state, batch_of(idx), sub)
            if first_loss is None:
                first_loss = losses["weighted_loss_overall"]
            last_loss = losses["weighted_loss_overall"]
    after = r1_at_05(params)
    assert last_loss < 0.5 * first_loss, (first_loss, last_loss)
    assert after >= before and after >= 0.3, (before, after)
