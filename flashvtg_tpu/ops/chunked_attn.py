"""Query-chunked masked self-attention for long clip sequences.

The encoder stack's plain attention materializes (B, H, L, L) logits — at
the long-video presets (tacos / charades_vgg: max_v_l=2048, 3 encoder
layers) that is multi-GB of attention intermediates per train step. This
module computes the same math one query-chunk at a time: the peak live
intermediate shrinks to (B, H, chunk, L), and each chunk is wrapped in
`jax.checkpoint` so the backward pass recomputes its probabilities instead
of keeping them — the flash-attention memory recipe, expressed in jnp so it
compiles anywhere (XLA fuses the mask+softmax chain per chunk; a Pallas
kernel would only add value once this is the measured bottleneck).

No running-max streaming over keys is needed: the full key axis fits
comfortably (L <= 4096 keys x chunk 256 queries), only the quadratic
*query x key* product was the problem.

Numerics match the unchunked path exactly up to float associativity.
Attention dropout draws an independent mask per chunk (fold_in on the chunk
index) — same distribution as the unchunked path, different stream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


@functools.partial(jax.checkpoint, static_argnums=(5, 6))
def _attend_chunk(q_c, k, v, valid, rng, dropout: float, deterministic: bool):
    """One query chunk: (B,H,C,Dh) x (B,H,L,Dh) -> (B,H,C,Dh)."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q_c, k)
    logits = jnp.where(valid[:, None, None, :] > 0, logits, NEG_INF)
    w = jax.nn.softmax(logits, axis=-1)
    if not deterministic and dropout > 0.0:
        keep = jax.random.bernoulli(rng, 1.0 - dropout, w.shape)
        w = jnp.where(keep, w / (1.0 - dropout), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


def chunked_attention(
    q,
    k,
    v,
    valid,
    chunk_size: int,
    dropout: float = 0.0,
    deterministic: bool = True,
    rng=None,
):
    """Masked softmax(q k^T) v with query chunking + rematerialization.

    Args:
      q: (B, H, L, Dh) pre-scaled queries; k, v: (B, H, L, Dh);
      valid: (B, L) 1 = valid key (invalid keys are -inf'd before softmax,
        exactly like the unchunked path in models/transformer.py).
      chunk_size: query rows per chunk (the last chunk may be shorter).
      rng: required when dropout is active (deterministic=False, dropout>0).

    Returns (B, H, L, Dh).
    """
    l = q.shape[2]
    outs = []
    for i in range(0, l, chunk_size):
        c_rng = None
        if not deterministic and dropout > 0.0:
            if rng is None:
                raise ValueError("dropout requires an rng key")
            c_rng = jax.random.fold_in(rng, i)
        outs.append(
            _attend_chunk(
                q[:, :, i : i + chunk_size], k, v, valid, c_rng,
                dropout, deterministic,
            )
        )
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=2)
