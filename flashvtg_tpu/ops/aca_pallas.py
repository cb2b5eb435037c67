"""Fused Pallas TPU kernel for Adaptive Cross-Attention (ACA).

ACA (reference: FlashVTG/crossattention.py:363-396) is projection-less
text-to-video attention with a twist that rules out stock flash attention:
the softmax normalizes over ALL text keys *including* the learned dummy
tokens, but the value matmul then EXCLUDES the first `num_dummies` columns.
The head-averaged probability matrix is also a model output (it feeds the
`t2vattnvalues` saliency channel), so probabilities must be materialized —
given the text axis is short (<= ~80 keys), the fused kernel keeps the whole
key axis in VMEM and tiles the (long) video axis.

One grid step = (batch b, head h, video tile i):
  logits = q_tile @ k^T          (MXU)
  logits += -inf where key invalid
  p = softmax(logits)            (VPU, numerically-stable)
  out_tile = p[:, nd:] @ v[nd:]  (MXU)
  probs written for the host-side head mean.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _aca_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, probs_ref, *,
                num_dummies, precision):
    q = q_ref[0, 0]  # (TILE_LV, Dh)
    k = k_ref[0, 0]  # (Lk, Dh)
    v = v_ref[0, 0]  # (Lk, Dh)
    valid = mask_ref[0]  # (1, Lk)

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )  # (TILE_LV, Lk)
    logits = jnp.where(valid > 0, logits, NEG_INF)

    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    unnorm = jnp.exp(logits)
    probs = unnorm / jnp.sum(unnorm, axis=-1, keepdims=True)
    probs_ref[0, 0] = probs

    out_ref[0, 0] = jnp.dot(
        probs[:, num_dummies:], v[num_dummies:],
        preferred_element_type=jnp.float32, precision=precision,
    ).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_dummies", "tile_lv", "interpret", "precision"),
)
def aca_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_valid: jnp.ndarray,
    num_dummies: int,
    tile_lv: int = 256,
    interpret: bool = False,
    precision: str = "highest",
):
    """Fused ACA attention.

    Args:
      q: (B, H, Lv, Dh) pre-scaled queries (already / sqrt(Dh)).
      k, v: (B, H, Lk, Dh) keys/values (dummies occupy the first
        `num_dummies` rows of the Lk axis).
      key_valid: (B, Lk) 1 = valid key.

    Returns:
      out: (B, H, Lv, Dh); probs: (B, H, Lv, Lk) post-softmax probabilities
      (pre value-matmul, dummies included — the reference's attention map).
    """
    prec = {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[precision]
    b, h, lv, dh = q.shape
    lk = k.shape[2]
    # tiles must be sublane-aligned (multiples of 8 for f32)
    tile = min(tile_lv, -(-lv // 8) * 8)
    tile = max(8, (tile // 8) * 8)
    # pad the video axis to a tile multiple (static)
    pad = (-lv) % tile
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
    lv_p = lv + pad
    grid = (b, h, lv_p // tile)

    mask2d = key_valid.reshape(b, 1, lk).astype(jnp.float32)

    out, probs = pl.pallas_call(
        functools.partial(_aca_kernel, num_dummies=num_dummies, precision=prec),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, tile, dh), lambda i, j, t: (i, j, t, 0),
                memory_space=pltpu.ANY if interpret else pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, lk, dh), lambda i, j, t: (i, j, 0, 0),
                memory_space=pltpu.ANY if interpret else pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, lk, dh), lambda i, j, t: (i, j, 0, 0),
                memory_space=pltpu.ANY if interpret else pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, lk), lambda i, j, t: (i, 0, 0),
                memory_space=pltpu.ANY if interpret else pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, tile, dh), lambda i, j, t: (i, j, t, 0),
                memory_space=pltpu.ANY if interpret else pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, tile, lk), lambda i, j, t: (i, j, t, 0),
                memory_space=pltpu.ANY if interpret else pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, lv_p, dh), q.dtype),
            jax.ShapeDtypeStruct((b, h, lv_p, lk), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, mask2d)

    if pad:
        out = out[:, :, :lv]
        probs = probs[:, :, :lv]
    return out, probs
