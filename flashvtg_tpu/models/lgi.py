"""Phrase-aware LGI modules for the FlashVTG_ms variant, in flax.linen.

Oracle: /root/reference/FlashVTG_ms/LGI.py. Live components only —
Phrase_Generate (entropy-gated word importance + learnable phrase slots,
LGI.py:137-244), Phrase_Context (Hadamard phrase-video maps + per-phrase
temporal self-attention + phrase-conditioned low-rank dynamic conv,
LGI.py:283-424), T_SA (temporal self-attention fusion, :605-642) and
Saliency_proj (:673-690). The reference file also carries dead code
(SequentialQueryAttention, SlotAttention, SelfAttention_Dynamicv2,
EntropyGating, a `natten` import) that is intentionally not reproduced.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from flashvtg_tpu.models.components import sine_position_embedding
from flashvtg_tpu.models.transformer import _merge_heads, _split_heads

NEG_INF = float("-inf")


class MHACore(nn.Module):
    """torch nn.MultiheadAttention equivalent (q/k/v in-proj + out-proj)."""

    num_heads: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, q_in, k_in, v_in, key_valid=None, deterministic=True):
        d = q_in.shape[-1]
        hd = d // self.num_heads
        q = _split_heads(nn.Dense(d, name="q")(q_in) * hd ** -0.5, self.num_heads)
        k = _split_heads(nn.Dense(d, name="k")(k_in), self.num_heads)
        v = _split_heads(nn.Dense(d, name="v")(v_in), self.num_heads)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)
        if key_valid is not None:
            logits = jnp.where(key_valid[:, None, None, :] > 0, logits, NEG_INF)
        w = jax.nn.softmax(logits, axis=-1)
        w_d = nn.Dropout(self.dropout)(w, deterministic=deterministic)
        out = _merge_heads(jnp.einsum("bhqk,bhkd->bhqd", w_d, v))
        out = nn.Dense(d, name="out")(out)
        return out, w.sum(axis=1) / self.num_heads  # head-averaged weights


class CrossAttentionBlock(nn.Module):
    """LGI CrossAttention (:536-572): extra q/kv projections around an MHA,
    residual + LN, then a ReLU linear block with residual + LN."""

    num_heads: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, y, key_valid=None, deterministic=True):
        d = x.shape[-1]
        q = nn.Dense(d, name="q_proj")(x)
        kv = nn.Dense(2 * d, name="kv_proj")(y)
        k, v = jnp.split(kv, 2, axis=-1)
        att, attn = MHACore(self.num_heads, self.dropout, name="att")(
            q, k, v, key_valid, deterministic
        )
        att = nn.Dropout(self.dropout)(att, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x + att)
        update = nn.relu(nn.Dense(d, name="linear")(x))
        update = nn.Dropout(self.dropout)(update, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + update)
        return x, attn


class SelfAttentionBlock(nn.Module):
    """LGI SelfAttention (:447-476): q/k/v pre-projections + MHA + LN."""

    num_heads: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, valid=None, deterministic=True):
        d = x.shape[-1]
        q = nn.Dense(d, name="q_proj")(x)
        k = nn.Dense(d, name="k_proj")(x)
        v = nn.Dense(d, name="v_proj")(x)
        update, attn = MHACore(self.num_heads, self.dropout, name="att")(
            q, k, v, valid, deterministic
        )
        update = nn.Dropout(self.dropout)(update, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x + update), attn


class PhraseGenerate(nn.Module):
    """Entropy-gated phrase slot extraction (LGI.py:137-244).

    Word importance = 1 - normalized entropy of the word→video attention;
    learnable slots cross-attend to gated words (layer 0) and plain words
    (later layers). Returns (slots, word_video_attn, gate, mean slot attn).
    """

    num_phrase: int
    num_heads: int
    dropout: float
    num_layers: int

    @nn.compact
    def __call__(self, txt_emb, txt_mask, video_feats, video_mask,
                 deterministic=True):
        b, l, c = txt_emb.shape
        word_emb = txt_emb[:, 1:]
        word_mask = txt_mask[:, 1:]

        word_pos = sine_position_embedding(word_mask, c, normalize=False)
        word_pe = word_emb + word_pos

        # entropy gate over word->video attention (:157-181)
        wf = nn.Dense(c, name="word_proj")(word_emb)
        vf = nn.Dense(c, name="video_proj")(video_feats)
        sim = jnp.einsum("blc,btc->blt", wf, vf)
        sim = jnp.where(video_mask[:, None, :] > 0, sim, NEG_INF)
        attn = jax.nn.softmax(sim, axis=2)
        entropy = -jnp.sum(attn * jnp.log(attn + 1e-6), axis=2)
        vid_len = video_mask.sum(axis=1)
        gate = 1.0 - entropy / jnp.log(vid_len + 1e-6)[:, None]
        gate = jnp.clip(gate, 0.0, 1.0)

        slots = self.param(
            "learnable_phrase", nn.initializers.normal(1.0),
            (1, self.num_phrase, c),
        )
        slots = jnp.tile(slots, (b, 1, 1))
        slot_attns = []
        word_gate = gate[..., None] * word_emb + word_pos
        slots, a = CrossAttentionBlock(
            self.num_heads, self.dropout, name="att0"
        )(slots, word_gate, word_mask, deterministic)
        slot_attns.append(a)
        for i in range(1, self.num_layers):
            slots, a = CrossAttentionBlock(
                self.num_heads, self.dropout, name=f"att{i}"
            )(slots, word_pe, word_mask, deterministic)
            slot_attns.append(a)
        slot_attn = jnp.stack(slot_attns, axis=1).mean(axis=1)
        return slots, attn, gate, slot_attn


class HadamardProduct(nn.Module):
    """Phrase x video bilinear maps (LGI.py:426-445) -> (B, N, T, C)."""

    @nn.compact
    def __call__(self, phrase, video):
        d = phrase.shape[-1]
        x1 = nn.relu(nn.Dense(d, name="fc_1")(phrase))[:, :, None, :]
        x2 = nn.relu(nn.Dense(d, name="fc_2")(video))[:, None, :, :]
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x1 * x2)
        x = nn.Dense(d, name="fc_3")(x)
        return nn.relu(nn.LayerNorm(epsilon=1e-5, name="norm1")(x))


class LowRankDynamicConv(nn.Module):
    """Phrase-conditioned dynamic temporal conv (LGI.py:283-359).

    Per kernel size k: a low-rank (rank r) phrase-specific kernel contracts
    the (k x N x C) local window of the per-phrase context maps into an
    output channel vector; kernels {1,3,5} concat -> linear -> LN/ReLU.
    """

    num_phrase: int
    rank: int = 32
    t_kernels: Tuple[int, ...] = (1, 3, 5)
    dropout: float = 0.1

    @nn.compact
    def __call__(self, context_emb, phrase_slot, deterministic=True):
        b, t, n, c = context_emb.shape
        pp = nn.Dense(4 * c, name="phrase_proj1")(phrase_slot)
        pp = nn.relu(pp)
        pp = nn.Dense(c * self.rank, name="phrase_proj2")(pp)
        pp = pp.reshape(b, n, c, self.rank)

        outs = []
        for k in self.t_kernels:
            kern = self.param(
                f"kernel_k{k}", nn.initializers.normal(1.0),
                (self.rank, c, k),
            )
            dyn = jnp.einsum("bncr,rdk->bnckd", pp, kern)  # (B,N,C,k,D)
            pad = k // 2
            xp = jnp.pad(context_emb, ((0, 0), (pad, pad), (0, 0), (0, 0)))
            window = jnp.stack(
                [xp[:, i : i + t] for i in range(k)], axis=2
            )  # (B, T, k, N, C)
            outs.append(jnp.einsum("btknc,bnckd->btd", window, dyn))
        feat = jnp.concatenate(outs, axis=-1)
        out = nn.Dense(c, name="linear_out")(feat)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return nn.relu(nn.LayerNorm(epsilon=1e-5, name="norm")(out))


class PhraseContextLayer(nn.Module):
    """Per-phrase temporal self-attention + FFN (LGI.py:363-384)."""

    num_heads: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, context_emb, vid_mask, deterministic=True):
        d = context_emb.shape[-1]
        context_emb, _ = SelfAttentionBlock(
            self.num_heads, self.dropout, name="t_att"
        )(context_emb, vid_mask, deterministic)
        upd = nn.relu(nn.Dense(d, name="fc_t")(context_emb))
        upd = nn.Dropout(self.dropout)(upd, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm_t")(context_emb + upd)


class PhraseContext(nn.Module):
    """Hadamard maps -> temporal SA per phrase -> dynamic conv aggregation
    (LGI.py:387-424). Returns (context_agg (B,T,C), raw context maps
    (B,N,T,C), refined per-phrase maps (B,N,T,C)) — the raw/refined pair
    matches the reference's context_emb_out / context_refine_out exports
    consumed by tools/visualize_phrase.py:194-195."""

    num_layers: int
    num_heads: int
    dropout: float
    num_phrase: int
    rank: int = 32
    t_kernels: Tuple[int, ...] = (1, 3, 5)

    @nn.compact
    def __call__(self, phrase_slot, vid_feat, vid_mask, deterministic=True):
        b, t, c = vid_feat.shape
        n = phrase_slot.shape[1]
        maps = HadamardProduct(name="product")(phrase_slot, vid_feat)
        context_out = maps  # (B, N, T, C)
        x = maps.reshape(b * n, t, c)
        mask_rep = jnp.repeat(vid_mask, n, axis=0)  # (B*N, T)
        x = x + sine_position_embedding(mask_rep, c, normalize=False)
        for i in range(self.num_layers):
            x = PhraseContextLayer(
                self.num_heads, self.dropout, name=f"layer{i}"
            )(x, mask_rep, deterministic)
        refined = x.reshape(b, n, t, c)  # (B, N, T, C)
        x = refined.transpose(0, 2, 1, 3)  # (B, T, N, C)
        agg = LowRankDynamicConv(
            self.num_phrase, self.rank, self.t_kernels, self.dropout,
            name="local_context",
        )(x, phrase_slot, deterministic)
        return agg, context_out, refined


class TSALayer(nn.Module):
    num_heads: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, valid=None, deterministic=True):
        d = x.shape[-1]
        x, _ = SelfAttentionBlock(self.num_heads, self.dropout, name="t_att")(
            x, valid, deterministic
        )
        upd = nn.relu(nn.Dense(d, name="linear")(x))
        upd = nn.Dropout(self.dropout)(upd, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x + upd)


class TSA(nn.Module):
    """Temporal self-attention fusion stack (LGI.py:625-642)."""

    num_heads: int
    dropout: float = 0.1
    num_layers: int = 2

    @nn.compact
    def __call__(self, x, valid=None, deterministic=True):
        for i in range(self.num_layers):
            x = TSALayer(self.num_heads, self.dropout, name=f"layer{i}")(
                x, valid, deterministic
            )
        return x


class SaliencyProj(nn.Module):
    """Clip-vs-global saliency head (LGI.py:673-690); masked global mean
    (same deliberate deviation as the core model)."""

    @nn.compact
    def __call__(self, x, valid=None):
        d = x.shape[-1]
        x1 = nn.Dense(d, name="proj1")(x)
        if valid is None:
            global_x = x.mean(axis=1)
        else:
            denom = jnp.maximum(valid.sum(axis=1, keepdims=True), 1.0)
            global_x = (x * valid[..., None]).sum(axis=1) / denom
        x2 = nn.Dense(d, name="proj2")(global_x)[:, None, :]
        return (x1 * x2).sum(-1) / d ** 0.5
