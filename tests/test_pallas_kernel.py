"""Pallas ACA kernel correctness (interpret mode on the CPU test mesh;
compiled-mode parity on real TPU is exercised by bench/driver runs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flashvtg_tpu.ops.aca_pallas import aca_attention


def _reference(q, k, v, valid, nd):
    logits = np.einsum("bhqd,bhkd->bhqk", q, k)
    logits = np.where(valid[:, None, None, :] > 0, logits, -np.inf)
    w = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    out = np.einsum("bhqk,bhkd->bhqd", w[..., nd:], v[:, :, nd:])
    return out, w


@pytest.mark.parametrize("lv,tile", [(75, 32), (64, 64), (100, 256)])
def test_aca_kernel_interpret(lv, tile):
    b, h, lk, dh, nd = 2, 4, 24, 32, 5
    rng = np.random.default_rng(0)
    q = rng.standard_normal((b, h, lv, dh)).astype(np.float32)
    k = rng.standard_normal((b, h, lk, dh)).astype(np.float32)
    v = rng.standard_normal((b, h, lk, dh)).astype(np.float32)
    valid = np.ones((b, lk), np.float32)
    valid[1, 15:] = 0

    out, probs = aca_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(valid),
        nd, tile_lv=tile, interpret=True,
    )
    ref_out, ref_w = _reference(q, k, v, valid, nd)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-5)
    np.testing.assert_allclose(np.asarray(probs), ref_w, atol=1e-6)
    # probability rows sum to 1 over valid keys
    np.testing.assert_allclose(
        np.asarray(probs).sum(-1), np.ones((b, h, lv)), atol=1e-5
    )
