"""The dropout PRNG backend (round-5 train-perf finding).

jax's default threefry mask generation measured HALF the flagship train
step on-chip (docs/KERNELS.md round-5 decomposition: 12.44 -> 6.24
ms/step with dropout off). The CONFIG default `dropout_rng_impl="auto"`
resolves to the TPU-native RngBitGenerator for short-video presets and
to threefry under chunked+remat attention (rbg masks are not
rematerializable — compile OOM); `make_train_step`'s own default is the
universally-safe threefry, with rbg passed explicitly by production
callers via cfg.resolved_dropout_rng_impl(). These tests pin the wiring:
rbg really changes the mask bits, touches NOTHING but dropout, and stays
deterministic per key. The scan-vs-per-step and 8-device-DP equalities
of the default path are already pinned by test_scan_epoch /
test_multichip (both sides share one impl)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flashvtg_tpu.train.config import from_preset
from flashvtg_tpu.train.loop import make_optimizer, make_train_step

B, LV, LQ = 4, 75, 8
V_DIM, T_DIM = 16, 12


@pytest.fixture(scope="module")
def env():
    cfg = from_preset(
        "qvhighlights_slowclip",
        bsz=B, v_feat_dim=V_DIM, t_feat_dim=T_DIM,
        t2v_layers=2, enc_layers=1, dummy_layers=1, num_mlp_layers=3,
        hidden_dim=32, dim_feedforward=64, num_dummies=3,
    )
    model = cfg.build_model()
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init, static_argnames="train")(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, LQ, T_DIM)), jnp.ones((1, LQ)),
        jnp.zeros((1, LV, V_DIM + 2)), jnp.ones((1, LV)),
        train=False,
    )
    host = np.random.default_rng(0)
    batch = {
        "src_txt": jnp.asarray(
            host.standard_normal((B, LQ, T_DIM)).astype(np.float32)
        ),
        "src_txt_mask": jnp.ones((B, LQ), jnp.float32),
        "src_vid": jnp.asarray(
            host.standard_normal((B, LV, V_DIM + 2)).astype(np.float32)
        ),
        "src_vid_mask": jnp.ones((B, LV), jnp.float32),
        "saliency_all_labels": jnp.asarray(
            host.integers(0, 4, (B, LV)).astype(np.float32)
        ),
        "saliency_pos_labels": jnp.asarray(host.integers(0, LV, (B, 2))),
        "saliency_neg_labels": jnp.asarray(host.integers(0, LV, (B, 2))),
        "gt_windows": jnp.tile(
            jnp.asarray([[[2.0, 10.0]]], jnp.float32), (B, 1, 1)
        ),
        "real_neg_mask": jnp.ones((B,), jnp.float32),
    }
    return cfg, model, params, batch


def _one_step(cfg, model, params, batch, impl, sub):
    tx, _ = make_optimizer(cfg, steps_per_epoch=10)
    opt_state = tx.init(params)
    step = make_train_step(
        model, cfg.loss_config(), tx, "float32", dropout_rng_impl=impl
    )
    new_params, _, losses = step(params, opt_state, batch, sub)
    for k, v in losses.items():
        assert np.isfinite(float(v)), f"{k} not finite under {impl}"
    return new_params, {k: float(v) for k, v in losses.items()}


def test_rbg_changes_the_mask_stream(env):
    """With live dropout rates (preset defaults: input 0.5, residual 0.1)
    the two backends must produce different masks, hence different losses
    — proving the impl flag actually reaches the mask generation."""
    cfg, model, params, batch = env
    sub = jax.random.PRNGKey(7)
    _, l_rbg = _one_step(cfg, model, params, batch, "rbg", sub)
    _, l_fry = _one_step(cfg, model, params, batch, "threefry", sub)
    assert (
        l_rbg["weighted_loss_overall"] != l_fry["weighted_loss_overall"]
    ), "identical losses: the impl flag never reached the dropout stream"


def test_rbg_touches_nothing_but_dropout(env):
    """With every dropout rate at 0 the generator is never sampled, so the
    two backends must produce BIT-IDENTICAL updates — the re-keying is
    dropout-local (no loss/optimizer/assignment randomness exists)."""
    import dataclasses

    from flashvtg_tpu.models.flashvtg import FlashVTGModel

    cfg, _, params, batch = env
    cfg0 = cfg.replace(dropout=0.0, input_dropout=0.0)
    # rates live in the model, not the step; dummy_dropout is the
    # reference-hardcoded third knob (models/flashvtg.py:75) — zero it too
    model0 = FlashVTGModel(
        dataclasses.replace(cfg0.model_config(), dummy_dropout=0.0)
    )
    sub = jax.random.PRNGKey(7)
    p_rbg, l_rbg = _one_step(cfg0, model0, params, batch, "rbg", sub)
    p_fry, l_fry = _one_step(cfg0, model0, params, batch, "threefry", sub)
    assert l_rbg == l_fry
    for a, b in zip(
        jax.tree_util.tree_leaves(p_rbg), jax.tree_util.tree_leaves(p_fry)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rbg_is_deterministic_per_key(env):
    """Same key -> same masks -> same losses (resume/replay safety)."""
    cfg, model, params, batch = env
    sub = jax.random.PRNGKey(11)
    _, a = _one_step(cfg, model, params, batch, "rbg", sub)
    _, b = _one_step(cfg, model, params, batch, "rbg", sub)
    assert a == b
    _, c = _one_step(cfg, model, params, batch, "rbg", jax.random.PRNGKey(12))
    assert a["weighted_loss_overall"] != c["weighted_loss_overall"]


def test_config_default_and_plumbing():
    """The production default is "auto" -> rbg at short-video shapes,
    threefry under chunked+remat attention (RngBitGenerator output is not
    rematerializable, so remat would store every mask: measured +8.6 GB
    compile OOM at TACoS Lv=2048); train() passes the RESOLVED value
    through (the field must never silently go inert)."""
    import inspect

    import pytest

    from flashvtg_tpu.train import loop

    cfg = from_preset("qvhighlights_slowclip")
    assert cfg.dropout_rng_impl == "auto"
    assert cfg.resolved_dropout_rng_impl() == "rbg"
    # long-sequence preset: remat path live -> threefry
    tacos = from_preset("tacos")
    assert tacos.max_v_l > tacos.attn_chunk > 0
    assert tacos.resolved_dropout_rng_impl() == "threefry"
    # explicit override always wins
    assert from_preset(
        "tacos", dropout_rng_impl="rbg"
    ).resolved_dropout_rng_impl() == "rbg"
    src = inspect.getsource(loop.train)
    assert "dropout_rng_impl=cfg.resolved_dropout_rng_impl()" in src
    # the literal "auto" must never reach the step builder
    with pytest.raises(ValueError):
        loop.make_train_step(None, None, None, dropout_rng_impl="auto")
    # typos fail loudly at both levels, not as a jax error at trace time
    with pytest.raises(ValueError, match="rgb"):
        loop.make_train_step(None, None, None, dropout_rng_impl="rgb")
    with pytest.raises(ValueError, match="rgb"):
        from_preset(
            "qvhighlights_slowclip", dropout_rng_impl="rgb"
        ).resolved_dropout_rng_impl()
    # the FUNCTION default is the universally-safe generator; rbg is
    # opt-in through the resolved config (review: an unaware caller at
    # long-video shapes must not silently compile the OOM program)
    sig = inspect.signature(loop.make_train_step)
    assert sig.parameters["dropout_rng_impl"].default == "threefry"