"""DynamicBCELoss reconstruction: pinned contract + gradient semantics.

nncore's `DynamicBCELoss` source is unavailable in this environment (no
wheel, zero egress), so `losses/basic.py:dynamic_bce_loss` is a
reconstruction derived from its call contract: the HD configs
(/root/reference/data/HD.py:12) select it as the classification loss, and
the BundleLoss calls it as `loss(src, cls_tgt, weight=msk,
avg_factor=msk.sum())` (/root/reference/blocks/loss.py:330-336) where
`cls_tgt` for TVSum is the RAW aggregate score array `(sum(label-1))/80*12`
— values up to 12, NOT probabilities — so a plain BCE would be invalid and
*some* normalization into [0,1] must happen inside ("Dynamic"). This test
pins the reconstruction's exact semantics so any future change is
deliberate, and docs/HD_SENSITIVITY.md bounds how much the normalization
choice matters for training outcomes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flashvtg_tpu.data.labels import saliency_tvsum
from flashvtg_tpu.losses.basic import bce_with_logits, dynamic_bce_loss


def _tvsum_scale_targets(rng, b, l):
    """Raw targets exactly as the TVSum pipeline produces them."""
    rows = []
    for _ in range(b):
        labels = rng.integers(1, 6, (l, 20))
        _, _, sal = saliency_tvsum(labels.tolist(), l)
        rows.append(sal)
    return np.stack(rows)


def test_targets_are_unbounded_and_loss_finite():
    rng = np.random.default_rng(0)
    tgt = _tvsum_scale_targets(rng, 4, 40)
    assert tgt.max() > 1.0  # the raw contract: NOT probabilities
    pred = jnp.asarray(rng.standard_normal((4, 40)), jnp.float32)
    w = jnp.ones((4, 40), jnp.float32)
    loss = dynamic_bce_loss(pred, jnp.asarray(tgt), weight=w, avg_factor=w.sum())
    assert np.isfinite(float(loss))


def test_per_sample_max_normalization():
    """Pinned choice: each row is scaled by ITS OWN max into [0,1]."""
    tgt = jnp.asarray([[0.0, 3.0, 6.0], [0.0, 6.0, 12.0]])
    pred = jnp.zeros((2, 3))
    # soft targets: row0 / 6, row1 / 12 -> both rows become [0, .5, 1]
    want = bce_with_logits(pred, jnp.asarray([[0.0, 0.5, 1.0]] * 2)).mean()
    got = dynamic_bce_loss(pred, tgt)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


def test_weight_avg_factor_semantics():
    """weight/avg_factor follow nncore's weight_reduce_loss
    (blocks/utils.py:26-52): sum(loss * weight) / avg_factor."""
    rng = np.random.default_rng(1)
    pred = jnp.asarray(rng.standard_normal((3, 8)), jnp.float32)
    tgt = jnp.asarray(np.abs(rng.standard_normal((3, 8))) * 5, jnp.float32)
    w = jnp.asarray((rng.random((3, 8)) > 0.4).astype(np.float32))

    got = dynamic_bce_loss(pred, tgt, weight=w, avg_factor=w.sum())
    soft = tgt / jnp.maximum(tgt.max(axis=-1, keepdims=True), 1e-6)
    want = (bce_with_logits(pred, soft) * w).sum() / w.sum()
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


def test_gradient_zero_at_normalized_target():
    """BCE-with-logits gradient wrt pred is sigmoid(pred) - soft_target: it
    vanishes exactly when sigmoid(pred) equals the NORMALIZED target — the
    optimum learns the per-sample-relative saliency profile."""
    tgt = jnp.asarray([[0.0, 4.0, 8.0, 12.0]])
    soft = tgt / 12.0
    pred_opt = jax.scipy.special.logit(jnp.clip(soft, 1e-6, 1 - 1e-6))
    g = jax.grad(lambda p: dynamic_bce_loss(p, tgt))(pred_opt)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-5)


def test_all_zero_row_is_safe():
    """A row with no saliency at all (or fully padded) must not NaN."""
    pred = jnp.zeros((2, 4))
    tgt = jnp.asarray([[0.0, 0.0, 0.0, 0.0], [0.0, 1.0, 2.0, 3.0]])
    loss = dynamic_bce_loss(pred, tgt)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: dynamic_bce_loss(p, tgt))(pred)
    assert np.isfinite(np.asarray(g)).all()
