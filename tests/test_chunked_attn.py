"""Chunked self-attention == plain attention (fwd + grad), incl. inside the
encoder stack at a long-video shape (VERDICT round-1 item 4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flashvtg_tpu.ops.chunked_attn import chunked_attention

B, H, L, DH = 2, 4, 96, 8


def _inputs(seed=0, l=L):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((B, H, l, DH)).astype(np.float32)
    k = rng.standard_normal((B, H, l, DH)).astype(np.float32)
    v = rng.standard_normal((B, H, l, DH)).astype(np.float32)
    valid = np.ones((B, l), np.float32)
    valid[0, l - 7 :] = 0
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(valid)


def _plain(q, k, v, valid):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    logits = jnp.where(valid[:, None, None, :] > 0, logits, float("-inf"))
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


@pytest.mark.parametrize("chunk", [16, 32, 96, 128])
def test_forward_matches_plain(chunk):
    q, k, v, valid = _inputs()
    ref = np.asarray(jax.jit(_plain)(q, k, v, valid))
    got = np.asarray(
        jax.jit(lambda *a: chunked_attention(*a, chunk_size=chunk))(q, k, v, valid)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_grads_match_plain():
    q, k, v, valid = _inputs(1)

    def loss_plain(q, k, v):
        return (_plain(q, k, v, valid) ** 2).sum()

    def loss_chunked(q, k, v):
        return (chunked_attention(q, k, v, valid, chunk_size=32) ** 2).sum()

    g_ref = jax.jit(jax.grad(loss_plain, argnums=(0, 1, 2)))(q, k, v)
    g_got = jax.jit(jax.grad(loss_chunked, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(g_ref, g_got):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5
        )


def test_dropout_path_runs_and_masks():
    q, k, v, valid = _inputs(2)
    out = jax.jit(
        lambda *a: chunked_attention(
            *a, chunk_size=32, dropout=0.5, deterministic=False,
            rng=jax.random.PRNGKey(3),
        )
    )(q, k, v, valid)
    assert np.all(np.isfinite(np.asarray(out)))
    # expectation-preserving scaling: mean magnitude within a loose factor
    ref = np.asarray(_plain(q, k, v, valid))
    assert 0.3 < np.abs(np.asarray(out)).mean() / np.abs(ref).mean() < 3.0


def test_encoder_long_sequence_train_step_runs():
    """A TACoS-shaped (Lv=2048) encoder layer: chunked attention lets the
    fwd+bwd run without materializing (B, H, 2048, 2048) logits."""
    from flashvtg_tpu.models.transformer import Encoder

    lv, d = 2048, 32
    enc = Encoder(1, 4, 64, dropout=0.1, attn_chunk=256)
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, lv, d)), jnp.float32
    )
    valid = jnp.ones((2, lv))
    params = jax.jit(enc.init)(
        {"params": rng, "dropout": rng}, x, None, valid
    )

    def loss(p):
        out = enc.apply(
            p, x, None, valid, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        return (out**2).mean()

    val, grads = jax.jit(jax.value_and_grad(loss))(params)
    assert np.isfinite(float(val))
    for leaf in jax.tree.leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))
