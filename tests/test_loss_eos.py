"""EOS InfoNCE loss: parity with FlashVTG_ms/loss.py:431-460 + model wiring.

The reference ships `SetCriterion.loss_eos` but its producer module
(`PhraseWeight_eos`) was deleted from the source (it survives only in
FlashVTG_ms/__pycache__/LGI.cpython-38.pyc), so the term is dead there. The
math itself is still the oracle: these tests drive the reference method with
synthetic eos_slot/eos_emb tensors and pin our implementation to it, and
check that the rebuilt producer (use_eos=True) makes the knob live."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from flashvtg_tpu.losses.criterion_ms import (
    MSLossConfig,
    loss_eos_ms,
    loss_keys_ms,
    weighted_total_ms,
)
from tests.reference_oracle import install_nncore_stub

B, LV, C = 5, 14, 16


@pytest.fixture(scope="module")
def ref_criterion():
    install_nncore_stub()
    from types import SimpleNamespace

    from FlashVTG_ms.loss import SetCriterion

    args = SimpleNamespace(
        device="cpu", dset_name="hl", lw_wattn=1.0, sample_radius=1.5,
        use_dfl=False, num_bins=8,
    )
    return SetCriterion(
        weight_dict={"loss_eos": 1.0}, eos_coef=0.1, losses=["eos"],
        saliency_margin=0.2, args=args,
    )


def test_loss_eos_matches_reference(ref_criterion):
    rng = np.random.default_rng(7)
    eos_slot = rng.standard_normal((B, 1, C)).astype(np.float32)
    eos_emb = rng.standard_normal((B, 1, C)).astype(np.float32)
    ctx = rng.standard_normal((B, LV, C)).astype(np.float32)
    pos = rng.integers(0, LV, (B, 2)).astype(np.int64)

    ref_out = ref_criterion.loss_eos(
        {
            "eos_slot": torch.from_numpy(eos_slot),
            "eos_emb": torch.from_numpy(eos_emb),
            "context_agg": torch.from_numpy(ctx),
        },
        {"saliency_pos_labels": torch.from_numpy(pos)},
    )
    ref = float(ref_out["loss_eos"])

    ours = float(
        loss_eos_ms(
            jnp.asarray(eos_slot), jnp.asarray(eos_emb), jnp.asarray(ctx),
            jnp.asarray(pos[:, 0]),
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_lw_eos_knob_changes_total():
    keys_off = loss_keys_ms(MSLossConfig())
    keys_on = loss_keys_ms(MSLossConfig(use_eos=True))
    assert "loss_eos" not in keys_off and "loss_eos" in keys_on

    losses = {k: jnp.asarray(1.0) for k in keys_on}
    t1 = float(weighted_total_ms(losses, MSLossConfig(use_eos=True, lw_eos=0.0)))
    t2 = float(weighted_total_ms(losses, MSLossConfig(use_eos=True, lw_eos=2.5)))
    np.testing.assert_allclose(t2 - t1, 2.5, rtol=1e-6)


def test_model_exports_eos_outputs():
    from flashvtg_tpu.models.flashvtg_ms import FlashVTGMSModel, MSModelConfig

    cfg = MSModelConfig(
        vid_dim=12, txt_dim=10, hidden_dim=16, nheads=2, enc_layers=1,
        t2v_layers=1, dummy_layers=1, num_dummies=2, dim_feedforward=32,
        num_conv_layers=1, num_mlp_layers=2, strides=(1,), max_q_l=6,
        num_phrase=2, phrase_layers=1, context_layers=1, t_sa_layers=1,
        rank=4, use_neg=False, use_eos=True,
    )
    model = FlashVTGMSModel(cfg)
    rng = jax.random.PRNGKey(0)
    txt = jnp.zeros((2, 6, 10))
    vid = jnp.zeros((2, 8, 12))
    params = jax.jit(model.init, static_argnames="train")(
        {"params": rng}, txt, jnp.ones((2, 6)), vid, jnp.ones((2, 8)),
        train=False,
    )
    out = jax.jit(model.apply, static_argnames="train")(
        params, txt, jnp.ones((2, 6)), vid, jnp.ones((2, 8)), train=False
    )
    assert out["eos_slot"].shape == (2, 1, 16)
    assert out["eos_emb"].shape == (2, 1, 16)
    assert np.all(np.isfinite(np.asarray(out["eos_slot"])))
