"""FlashVTG transformer stack in flax.linen (channels-last, mask-driven).

Re-architecture of /root/reference/FlashVTG/transformer.py +
crossattention.py for TPU:

  * Adaptive Cross-Attention (ACA): projection-less text→video attention in
    which the softmax runs over *all* text keys including the learned dummy
    tokens, but the value matmul drops the first `num_dummies` columns
    (crossattention.py:381-391). Computed as one einsum chain that XLA fuses
    end-to-end — a hand-written Pallas kernel was measured 1.3-4x SLOWER
    than this path on the v5e and removed (see docs/KERNELS.md); the
    per-layer head-averaged attention maps are accumulated and averaged
    across layers (transformer.py:197-206).
  * Standard post-norm encoder layers with DropPath stochastic depth on both
    residual branches and PReLU feed-forwards (transformer.py:387-435).

All attention masks follow the "1 = valid" convention; conversions to the
reference's pad-mask convention happen at the boundary.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from flashvtg_tpu.models.components import DropPath, PReLU

NEG_INF = float("-inf")


def tiled_attn_donors(batch: int, num_heads: int) -> jnp.ndarray:
    """Donor-row table reproducing the reference's misaligned ACA attn_mask.

    transformer.py:345-347 builds a per-row (query_pad ⊗ key_pad) mask and
    tiles it with `.repeat(nhead, 1, 1)` — laid out head-major
    (h * bsz + b) — while torch MHA consumes 3D masks batch-major
    (b * nhead + h). Net effect: batch row b, head h is masked with row
    `(b * nhead + h) % bsz`'s padding pattern. At bsz=1 (reference eval)
    this degenerates to the row's own mask; in mixed-length train batches
    it leaks other rows' padding into valid positions. Reproduced (train
    only) for bit-level training parity; see docs/PARITY.md.
    """
    b = jnp.arange(batch)[:, None]
    h = jnp.arange(num_heads)[None, :]
    return (b * num_heads + h) % batch


def neg_pass_donors(real_neg_mask: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """Donor rows for the negative pass's misaligned attn_mask.

    The reference filters the neg batch to real-neg rows before the trunk
    (model.py:281-284), so the donor arithmetic of `tiled_attn_donors` runs
    over *filtered* indices. This maps it back to original rows: for each
    original row, its filtered index i feeds (i * nhead + h) % R, and the
    result indexes the ascending list of real-neg rows. Rows that are not
    real negatives receive an arbitrary valid donor — their neg outputs are
    excluded from every loss by `real_neg_mask`.
    """
    m = real_neg_mask > 0
    order = jnp.argsort(~m, stable=True)  # real-neg rows first, ascending
    r = jnp.maximum(m.sum(), 1)
    fidx = jnp.clip(jnp.cumsum(m) - 1, 0, None)
    h = jnp.arange(num_heads)[None, :]
    return order[(fidx[:, None] * num_heads + h) % r]


def _split_heads(x, num_heads):
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, l, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * hd)


class AdaptiveCrossAttention(nn.Module):
    """Projection-less multi-head cross attention with dummy-token dropping.

    q: (B, Lq, D) video queries (pos already added), k: (B, Lk, D) text keys
    (dummies first, pos added), v: (B, Lk, D) raw text values.
    key_valid: (B, Lk) 1 = valid. Returns (out, head_mean_weights).
    """

    num_heads: int
    num_dummies: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, q, k, v, key_valid, deterministic: bool = True,
                 drop_dummies: bool = True, query_valid=None,
                 donor_rows=None):
        d = q.shape[-1]
        head_dim = d // self.num_heads
        scaling = head_dim ** -0.5

        qh = _split_heads(q * scaling, self.num_heads)
        kh = _split_heads(k, self.num_heads)
        vh = _split_heads(v, self.num_heads)

        nd = self.num_dummies if drop_dummies else 0
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh)
        logits = jnp.where(key_valid[:, None, None, :] > 0, logits, NEG_INF)
        if donor_rows is not None and query_valid is not None:
            # reference-bug reproduction (train only): each (row, head) is
            # additionally masked with the (query_pad ⊗ key_pad) pattern of
            # `donor_rows[b, h]` — see tiled_attn_donors. Applied before
            # softmax like the reference's masked_fill_.
            qpad = (query_valid <= 0)[donor_rows]  # (B, H, Lq)
            kpad = (key_valid <= 0)[donor_rows]  # (B, H, Lk)
            logits = jnp.where(
                qpad[..., :, None] & kpad[..., None, :], NEG_INF, logits
            )
        weights = jax.nn.softmax(logits, axis=-1)  # softmax incl. dummies
        weights_d = nn.Dropout(self.dropout)(
            weights, deterministic=deterministic
        )
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", weights_d[..., nd:], vh[:, :, nd:]
        )
        out = _merge_heads(out)
        out = nn.Dense(d, name="out_proj")(out)

        head_mean = weights.sum(axis=1) / self.num_heads  # (B, Lq, Lk)
        return out, head_mean


class FeedForward(nn.Module):
    """linear1 -> PReLU -> dropout -> linear2 (post-norm layer FFN)."""

    dim_feedforward: int
    out_dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.dim_feedforward, name="linear1")(x)
        x = PReLU(name="act")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.out_dim, name="linear2")(x)
        return x


class T2VEncoderLayer(nn.Module):
    """One ACA layer (oracle: transformer.py:311-369 T2V_TransformerEncoderLayer).

    Residual wiring replicated exactly: the FFN reads LN1(x) but the residual
    accumulates on the un-normalized x, and LN2 closes the block.
    """

    num_heads: int
    num_dummies: int
    dim_feedforward: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, vid, txt, pos_vid, pos_txt, txt_valid,
                 deterministic: bool = True, drop_dummies: bool = True,
                 vid_valid=None, donor_rows=None):
        attn_out, attn_weights = AdaptiveCrossAttention(
            self.num_heads, self.num_dummies, self.dropout, name="attn"
        )(
            vid + pos_vid,
            txt + pos_txt,
            txt,
            txt_valid,
            deterministic=deterministic,
            drop_dummies=drop_dummies,
            query_valid=vid_valid,
            donor_rows=donor_rows,
        )
        x = vid + DropPath(self.dropout, name="drop1")(
            attn_out, deterministic=deterministic
        )
        ffn = FeedForward(
            self.dim_feedforward, x.shape[-1], self.dropout, name="ffn"
        )(nn.LayerNorm(epsilon=1e-5, name="norm1")(x), deterministic=deterministic)
        x = x + DropPath(self.dropout, name="drop2")(ffn, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        return x, attn_weights


class T2VEncoder(nn.Module):
    """Stack of ACA layers; text stream is read-only, video stream evolves.

    Returns the fused video features and the layer-averaged attention map
    (oracle: transformer.py:179-214 TransformerCATEEncoder).
    """

    num_layers: int
    num_heads: int
    num_dummies: int
    dim_feedforward: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, vid, txt, pos_vid, pos_txt, txt_valid,
                 deterministic: bool = True, drop_dummies: bool = True,
                 vid_valid=None, donor_rows=None):
        attn_sum = None
        for i in range(self.num_layers):
            vid, w = T2VEncoderLayer(
                self.num_heads,
                self.num_dummies,
                self.dim_feedforward,
                self.dropout,
                name=f"layer{i}",
            )(vid, txt, pos_vid, pos_txt, txt_valid,
              deterministic=deterministic, drop_dummies=drop_dummies,
              vid_valid=vid_valid, donor_rows=donor_rows)
            attn_sum = w if attn_sum is None else attn_sum + w
        return vid, attn_sum / self.num_layers


class SelfAttention(nn.Module):
    """Standard MHA with packed-equivalent q/k/v + out projections.

    q = k = x + pos, v = x (oracle: transformer.py:408-415 with torch MHA).

    When `attn_chunk > 0` and the sequence exceeds it, attention switches to
    the query-chunked + rematerialized path (ops/chunked_attn.py) so long
    videos (tacos / charades_vgg, Lv=2048) never materialize (B, H, L, L)
    logits; numerics are identical up to float associativity (attention
    dropout then draws per-chunk masks — same distribution, different
    stream).
    """

    num_heads: int
    dropout: float = 0.1
    attn_chunk: int = 0

    @nn.compact
    def __call__(self, x, pos, valid, deterministic: bool = True):
        d = x.shape[-1]
        head_dim = d // self.num_heads
        qk_in = x if pos is None else x + pos
        q = nn.Dense(d, name="q_proj")(qk_in)
        k = nn.Dense(d, name="k_proj")(qk_in)
        v = nn.Dense(d, name="v_proj")(x)
        qh = _split_heads(q * head_dim ** -0.5, self.num_heads)
        kh = _split_heads(k, self.num_heads)
        vh = _split_heads(v, self.num_heads)
        if self.attn_chunk and x.shape[1] > self.attn_chunk:
            from flashvtg_tpu.ops.chunked_attn import chunked_attention

            rng = None
            if not deterministic and self.dropout > 0.0:
                rng = self.make_rng("dropout")
            out = chunked_attention(
                qh, kh, vh, valid, self.attn_chunk, self.dropout,
                deterministic, rng,
            )
        else:
            logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh)
            logits = jnp.where(valid[:, None, None, :] > 0, logits, NEG_INF)
            weights = jax.nn.softmax(logits, axis=-1)
            weights = nn.Dropout(self.dropout)(
                weights, deterministic=deterministic
            )
            out = jnp.einsum("bhqk,bhkd->bhqd", weights, vh)
        return nn.Dense(d, name="out_proj")(_merge_heads(out))


class EncoderLayer(nn.Module):
    """Post-norm transformer encoder layer (oracle: transformer.py:387-421)."""

    num_heads: int
    dim_feedforward: int
    dropout: float = 0.1
    attn_chunk: int = 0

    @nn.compact
    def __call__(self, x, pos, valid, deterministic: bool = True):
        attn = SelfAttention(
            self.num_heads, self.dropout, self.attn_chunk, name="attn"
        )(x, pos, valid, deterministic=deterministic)
        x = x + DropPath(self.dropout, name="drop1")(attn, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        ffn = FeedForward(
            self.dim_feedforward, x.shape[-1], self.dropout, name="ffn"
        )(x, deterministic=deterministic)
        x = x + DropPath(self.dropout, name="drop2")(ffn, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        return x


class Encoder(nn.Module):
    num_layers: int
    num_heads: int
    dim_feedforward: int
    dropout: float = 0.1
    attn_chunk: int = 0

    @nn.compact
    def __call__(self, x, pos, valid, deterministic: bool = True):
        for i in range(self.num_layers):
            x = EncoderLayer(
                self.num_heads, self.dim_feedforward, self.dropout,
                self.attn_chunk, name=f"layer{i}",
            )(x, pos, valid, deterministic=deterministic)
        return x
