"""FlashVTG_ms: the phrase-aware multi-scale variant.

Oracle: /root/reference/FlashVTG_ms/model.py (FlashVTG_ms, :75-344). Deltas
vs the core model:
  * text splits into sentence (EOS, token 0) and word streams with separate
    projections;
  * the phrase pipeline (PhraseGenerate -> PhraseContext) produces a
    context aggregate that is summed with the transformer's video embedding
    and fused by a temporal self-attention stack (T_SA);
  * saliency comes from a dedicated SaliencyProj over the fused embedding;
  * only a class head (no conf head / blend parameter);
  * optional DFL boundary decode: per-anchor softmax over num_bins distance
    bins -> expectation (:268-292);
  * the dummy-token cross-attention uses ONLY the sentence token as text
    (dummies + EOS, masks all-ones, :183-195).

The reference's stray debug `print(gate[0])` (model.py:179) is — obviously —
not reproduced.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from flashvtg_tpu.models.components import (
    ConfidenceScorer,
    ConvHead,
    ConvPyramid,
    InputProj,
    sine_position_embedding,
)
from flashvtg_tpu.models.flashvtg import ModelConfig
from flashvtg_tpu.models.lgi import (
    PhraseContext,
    PhraseGenerate,
    SaliencyProj,
    TSA,
)
from flashvtg_tpu.models.points import generate_points, pyramid_masks_pool
from flashvtg_tpu.models.transformer import Encoder, T2VEncoder


@dataclasses.dataclass(frozen=True)
class MSModelConfig(ModelConfig):
    """ModelConfig + the _ms-only flags (FlashVTG_ms/config.py:135-153)."""

    num_phrase: int = 3
    phrase_layers: int = 2
    context_layers: int = 2
    use_dfl: bool = False
    num_bins: int = 16
    rank: int = 32
    t_sa_layers: int = 2
    sample_radius: float = 1.5
    # export eos_slot/eos_emb for the EOS InfoNCE loss (loss.py:431-460).
    # The reference's producer module (`PhraseWeight_eos`) was deleted from
    # its source (only FlashVTG_ms/__pycache__/LGI.cpython-38.pyc remembers
    # it); this re-build supplies the natural producer: a learned query
    # attention-pooling the phrase-context features into a video-side EOS
    # summary, aligned against the (pre-type-embedding) EOS sentence token.
    use_eos: bool = False


class FlashVTGMSModel(nn.Module):
    cfg: MSModelConfig

    @nn.compact
    def __call__(
        self,
        src_txt: jnp.ndarray,
        src_txt_mask: jnp.ndarray,
        src_vid: jnp.ndarray,
        src_vid_mask: jnp.ndarray,
        real_neg_mask: Optional[jnp.ndarray] = None,
        point_valid: Optional[jnp.ndarray] = None,
        train: bool = False,
        force_neg: bool = False,
    ) -> Dict[str, Any]:
        cfg = self.cfg
        det = not train
        b, lv = src_vid.shape[:2]
        lq = src_txt.shape[1]
        d = cfg.hidden_dim
        nd = cfg.num_dummies

        # --- split sentence / word streams + projections (:161-166) ---
        src_glob_raw, src_word_raw = src_txt[:, :1], src_txt[:, 1:]
        vid = InputProj(d, cfg.n_input_proj, cfg.input_dropout, name="vid_proj")(
            src_vid, deterministic=det
        )
        glob = InputProj(d, cfg.n_input_proj, cfg.input_dropout, name="txt_proj")(
            src_glob_raw, deterministic=det
        )
        word = InputProj(d, cfg.n_input_proj, cfg.input_dropout, name="word_proj")(
            src_word_raw, deterministic=det
        )
        txt = jnp.concatenate([glob, word], axis=1)

        type_emb = nn.Embed(2, d, name="token_type")
        vid = vid + type_emb(jnp.ones((b, lv), jnp.int32))
        txt = txt + type_emb(jnp.zeros((b, lq), jnp.int32))
        # reference quirk: the `src_glob` used by the dummy path and the
        # sim-score query is captured BEFORE the token-type embedding is
        # added (model.py:161-169 vs :184/:216) — `glob` stays pre-type.
        pos_vid = sine_position_embedding(src_vid_mask, d)

        # --- phrase pipeline (:177-180) ---
        phrase_emb, word_video_attn, gate, slot_attn = PhraseGenerate(
            cfg.num_phrase, cfg.nheads, cfg.dropout, cfg.phrase_layers,
            name="phrase_generate",
        )(txt, src_txt_mask, vid, src_vid_mask, deterministic=det)
        phrase_context = PhraseContext(
            cfg.context_layers, cfg.nheads, cfg.dropout, cfg.num_phrase,
            cfg.rank, name="phrase_context",
        )
        context_agg, context_emb_out, context_refine = phrase_context(
            phrase_emb, vid, src_vid_mask, deterministic=det
        )

        # --- dummy tokens over the sentence token only (:182-192) ---
        dummy_tok = self.param("dummy_token", nn.initializers.normal(1.0), (nd, d))
        dummy_pos = self.param("dummy_pos", nn.initializers.normal(1.0), (nd, d))
        txt_d = jnp.concatenate([jnp.tile(dummy_tok, (b, 1, 1)), glob], axis=1)
        pos_txt_d = jnp.concatenate(
            [jnp.tile(dummy_pos, (b, 1, 1)), jnp.zeros_like(glob)], axis=1
        )
        txt_d_valid = jnp.ones((b, nd + 1), src_txt_mask.dtype)
        refreshed = Encoder(
            cfg.dummy_layers, cfg.dummy_nheads, cfg.dim_feedforward,
            cfg.dummy_dropout,  # hardcoded 0.1/8 in the reference
            # (FlashVTG_ms/model.py:125), independent of --dropout/--nheads
            name="dummy_encoder",
        )(txt_d, pos_txt_d, txt_d_valid, deterministic=det)
        dummy_refreshed = refreshed[:, :nd]
        txt_d = jnp.concatenate([dummy_refreshed, glob], axis=1)

        # --- shared transformer trunk (:199) ---
        t2v = T2VEncoder(
            cfg.t2v_layers, cfg.nheads, nd, cfg.dim_feedforward, cfg.dropout,
            name="t2v_encoder",
        )
        encoder = Encoder(
            cfg.enc_layers, cfg.nheads, cfg.dim_feedforward, cfg.dropout,
            attn_chunk=cfg.attn_chunk, name="encoder",
        )
        t_sa = TSA(cfg.nheads, cfg.dropout, cfg.t_sa_layers, name="t_sa")
        sal_proj = SaliencyProj(name="saliency_proj")

        def trunk(txt_tokens, txt_valid):
            fused, attn = t2v(
                vid, txt_tokens, pos_vid, pos_txt_d, txt_valid,
                deterministic=det,
            )
            emb = encoder(fused, pos_vid, src_vid_mask, deterministic=det)
            return emb, attn

        vid_emb, attn_weights = trunk(txt_d, txt_d_valid)

        # --- phrase-context fusion + temporal consistency (:200-207) ---
        src_emb = context_agg + vid_emb
        src_emb = src_emb + pos_vid
        src_emb = t_sa(src_emb, src_vid_mask, deterministic=det)
        # train: the reference's Saliency_proj global pool is an UNMASKED
        # mean over the batch-padded length (LGI.py:686 x.mean(1)), and the
        # pyramid convolves the un-zeroed padded positions (model.py:210);
        # reproduce that bleed exactly (same resolution as the core model,
        # docs/PARITY.md "padded-bleed"; pinned by test_ms_grad_parity's
        # short-row case). eval: bsz=1 unpadded in the reference, where the
        # masked mean / zeroing are identical and saner under static padding.
        saliency = sal_proj(src_emb, None if train else src_vid_mask)

        # --- pyramid + heads on the fused embedding (:209-227) ---
        src_emb_h = src_emb * src_vid_mask[..., None] if det else src_emb
        pymid, _ = ConvPyramid(cfg.strides, name="pyramid")(src_emb_h)
        pymid_msk = pyramid_masks_pool(src_vid_mask, cfg.strides)
        points = jnp.asarray(generate_points(lv, cfg.strides))

        level_masks = [None] * len(pymid)
        if point_valid is not None:
            masked, level_masks, off = [], [], 0
            for e in pymid:
                n = e.shape[1]
                m = point_valid[:, off : off + n]
                masked.append(e * m[..., None])
                level_masks.append(m)
                off += n
            pymid = tuple(masked)

        class_head = ConfidenceScorer(
            d, cfg.kernel_size, cfg.num_conv_layers, cfg.num_mlp_layers,
            name="class_head",
        )
        out_class = jnp.concatenate(
            [class_head(e, m) for e, m in zip(pymid, level_masks)], axis=1
        )
        coef = self.param("coef", nn.initializers.ones, (len(cfg.strides),))
        out_dims = cfg.num_bins * 2 if cfg.use_dfl else 2
        coord_head = ConvHead(d, out_dims, cfg.coord_kernel_size, name="coord_head")
        # exp() * coef applies even in DFL mode — the reference runs the
        # softmax over exp(raw)*coef "logits" (model.py:220-225 + :276-277)
        out_coord = jnp.concatenate(
            [
                jnp.exp(coord_head(e, m)) * coef[i]
                for i, (e, m) in enumerate(zip(pymid, level_masks))
            ],
            axis=1,
        )

        # cosine similarity channel for the NCE loss (:217)
        vn = vid_emb / jnp.linalg.norm(vid_emb, axis=-1, keepdims=True).clip(1e-8)
        qn = glob / jnp.linalg.norm(glob, axis=-1, keepdims=True).clip(1e-8)
        sim_score = (vn * qn).sum(-1)

        t2vattn = jnp.clip(attn_weights[:, :, nd:][..., 0], 0.0, 1.0)

        out: Dict[str, Any] = {
            "saliency_scores": saliency,
            "t2vattnvalues": t2vattn,
            # full ACA map for visualization (XLA-DCE'd on train/eval paths)
            "attn_weights": attn_weights,
            "sim_score": sim_score,
            "video_msk": src_vid_mask,
            "pymid_msk": pymid_msk,
            "out_class": out_class,
            "out_coord": out_coord,
            "point": points,
            "word_video_attn": word_video_attn,
            "slot_att": slot_attn,
            "gate": gate,
            "context_agg": context_agg,
            # per-phrase context maps for tools/visualize --phrase (the
            # reference's context_emb_out / context_refine_out exports,
            # FlashVTG_ms/model.py via tools/visualize_phrase.py:194-195);
            # XLA-DCE'd on train/eval paths
            "context_emb": context_emb_out,
            "context_refine": context_refine,
            "vid_emb": vid_emb,
            "dummy_tokens": dummy_refreshed,
        }

        if cfg.use_eos:
            # video-side EOS summary: learned query attention-pooled over the
            # masked phrase-context features (producer for loss_eos)
            eos_q = self.param(
                "eos_query", nn.initializers.normal(1.0), (d,)
            )
            att = jnp.einsum("d,btd->bt", eos_q, context_agg) / jnp.sqrt(
                jnp.asarray(d, context_agg.dtype)
            )
            att = jnp.where(src_vid_mask > 0, att, -1e30)
            w = jax.nn.softmax(att, axis=-1)
            out["eos_slot"] = jnp.einsum("bt,btd->bd", w, context_agg)[:, None]
            out["eos_emb"] = glob  # pre-type-embedding EOS sentence token

        if (train or force_neg) and cfg.use_neg:
            # rolled phrase slots drive a negative context; rolled dummy+glob
            # drive a negative trunk pass (:294-332); static shapes + mask
            phrase_neg = jnp.roll(phrase_emb, -1, axis=0)
            context_agg_neg, _, _ = phrase_context(
                phrase_neg, vid, src_vid_mask, deterministic=det
            )
            txt_d_neg = jnp.roll(txt_d, -1, axis=0)
            memory_neg, attn_neg = trunk(txt_d_neg, txt_d_valid)
            fused_neg = context_agg_neg + memory_neg + pos_vid
            fused_neg = t_sa(fused_neg, src_vid_mask, deterministic=det)
            # unmasked global mean, as on the positive train path (the
            # reference's neg rows keep the same batch-padded length)
            out["saliency_scores_neg"] = sal_proj(fused_neg, None)
            out["t2vattnvalues_neg"] = jnp.clip(
                attn_neg[:, :, nd:][..., 0], 0.0, 1.0
            )
            out["real_neg_mask"] = (
                real_neg_mask
                if real_neg_mask is not None
                else jnp.ones((b,), jnp.float32)
            )
        return out


def decode_boundaries_dfl(
    out_class: jnp.ndarray,
    out_coord: jnp.ndarray,
    points: jnp.ndarray,
    clip_length: float,
    num_bins: int,
    sample_radius: float,
    point_valid: Optional[jnp.ndarray] = None,
    top_k: int = 50,
):
    """DFL boundary decode (FlashVTG_ms/model.py:268-292): softmax over the
    distance bins of each side, expectation over bin centers in
    [0, sample_radius], then the usual center/stride mapping."""
    centers_bins = jnp.linspace(0.0, sample_radius, num_bins)
    start_prob = jax.nn.softmax(out_coord[..., :num_bins], axis=-1)
    end_prob = jax.nn.softmax(out_coord[..., num_bins:], axis=-1)
    start_off = (start_prob * centers_bins).sum(-1)
    end_off = (end_prob * centers_bins).sum(-1)

    center = points[None, :, 0]
    stride = points[None, :, 3]
    start = (center - start_off * stride) * clip_length
    end = (center + end_off * stride) * clip_length
    scores = jax.nn.sigmoid(out_class[..., 0])
    if point_valid is not None:
        scores = jnp.where(point_valid > 0, scores, -1.0)
    k = min(top_k, scores.shape[1])
    top_scores, idx = jax.lax.top_k(scores, k)
    spans = jnp.take_along_axis(
        jnp.stack([start, end], axis=-1), idx[..., None], axis=1
    )
    return spans, top_scores
