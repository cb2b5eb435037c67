"""Reference-checkpoint importer: torch FlashVTG state_dict -> flax params.

Maps the reference's parameter naming (FlashVTG/model.py + transformer.py +
blocks/) onto the flashvtg_tpu module tree so released checkpoints
(README.md:93-103 Model Zoo) can be evaluated for accuracy parity, and so the
test suite can compare layer outputs against the torch oracle.

All arrays are plain numpy; no torch import is required if the caller already
has numpy weights (e.g. `{k: v.numpy() for k, v in sd.items()}`).
"""

from __future__ import annotations

import math
from typing import Dict, Sequence

import numpy as np


def _t(w):  # torch Linear weight -> flax Dense kernel
    return np.asarray(w).T


def _conv1d(w):  # torch Conv1d (out, in, k) -> flax Conv (k, in, out)
    return np.asarray(w).transpose(2, 1, 0)


def _conv2d_1xk(w):  # torch Conv2d (out, in, 1, k) -> flax Conv (k, in, out)
    return np.asarray(w)[:, :, 0, :].transpose(2, 1, 0)


def _dense(sd, prefix):
    return {"kernel": _t(sd[f"{prefix}.weight"]), "bias": np.asarray(sd[f"{prefix}.bias"])}


def _norm(sd, prefix):
    return {"scale": np.asarray(sd[f"{prefix}.weight"]), "bias": np.asarray(sd[f"{prefix}.bias"])}


def _ffn(sd, prefix):
    return {
        "linear1": _dense(sd, f"{prefix}.linear1"),
        "linear2": _dense(sd, f"{prefix}.linear2"),
        "act": {"alpha": np.asarray(sd[f"{prefix}.activation.weight"]).reshape(())},
    }


def convert_self_attention(sd, prefix) -> Dict:
    """torch nn.MultiheadAttention (packed in_proj) -> q/k/v/out Dense."""
    w = np.asarray(sd[f"{prefix}.in_proj_weight"])
    b = np.asarray(sd[f"{prefix}.in_proj_bias"])
    d = w.shape[1]
    return {
        "q_proj": {"kernel": _t(w[:d]), "bias": b[:d]},
        "k_proj": {"kernel": _t(w[d : 2 * d]), "bias": b[d : 2 * d]},
        "v_proj": {"kernel": _t(w[2 * d :]), "bias": b[2 * d :]},
        "out_proj": _dense(sd, f"{prefix}.out_proj"),
    }


def convert_encoder_layer(sd, prefix) -> Dict:
    """Reference TransformerEncoderLayer -> flashvtg_tpu EncoderLayer."""
    return {
        "attn": convert_self_attention(sd, f"{prefix}.self_attn"),
        "ffn": _ffn(sd, prefix),
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "norm2": _norm(sd, f"{prefix}.norm2"),
    }


def convert_t2v_layer(sd, prefix) -> Dict:
    """Reference T2V_TransformerEncoderLayer -> flashvtg_tpu T2VEncoderLayer.

    The ACA attention has no q/k/v projections — only out_proj
    (crossattention.py:87-112).
    """
    return {
        "attn": {"out_proj": _dense(sd, f"{prefix}.self_attn.out_proj")},
        "ffn": _ffn(sd, prefix),
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "norm2": _norm(sd, f"{prefix}.norm2"),
    }


def convert_encoder(sd, prefix, num_layers) -> Dict:
    return {
        f"layer{i}": convert_encoder_layer(sd, f"{prefix}.layers.{i}")
        for i in range(num_layers)
    }


def convert_t2v_encoder(sd, prefix, num_layers) -> Dict:
    return {
        f"layer{i}": convert_t2v_layer(sd, f"{prefix}.layers.{i}")
        for i in range(num_layers)
    }


def convert_input_proj(sd, prefix, n_layers) -> Dict:
    out = {}
    for i in range(n_layers):
        out[f"layer{i}"] = {
            "norm": _norm(sd, f"{prefix}.{i}.LayerNorm"),
            # Sequential(Dropout, Linear): Linear is .net.1
            "dense": _dense(sd, f"{prefix}.{i}.net.1"),
        }
    return out


def convert_pyramid(sd, strides: Sequence[int]) -> Dict:
    """blocks/blocks.py ConvPyramid: blocks.{j} is the per-level Sequential of
    repeated [Permute, Conv1d, Permute, LayerNorm, ReLU] (5 modules per
    halving); stride-1 levels are a bare ReLU with no params."""
    out = {}
    for j, s in enumerate(strides):
        p = int(math.log2(s))
        if p == 0:
            continue
        level = {}
        for i in range(p):
            base = 5 * i
            conv_w = sd[f"pyramid.blocks.{j}.{base + 1}.weight"]
            level[f"conv{i}"] = {
                "kernel": _conv1d(conv_w),
                "bias": np.asarray(sd[f"pyramid.blocks.{j}.{base + 1}.bias"]),
            }
            level[f"norm{i}"] = _norm(sd, f"pyramid.blocks.{j}.{base + 3}")
        out[f"level{s}"] = level
    return out


def convert_confidence_scorer(sd, prefix, num_conv_layers, num_mlp_layers) -> Dict:
    out = {}
    for i in range(num_conv_layers):
        out[f"conv{i}"] = {
            "kernel": _conv2d_1xk(sd[f"{prefix}.convs.{i}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.convs.{i}.bias"]),
        }
    out["mlp"] = {
        f"layer{i}": _dense(sd, f"{prefix}.fc.layers.{i}")
        for i in range(num_mlp_layers)
    }
    return out


def convert_checkpoint(sd, cfg) -> Dict:
    """Full reference FlashVTG state_dict -> {'params': ...} flax tree.

    Args:
      sd: mapping of reference parameter name -> numpy array.
      cfg: flashvtg_tpu.models.ModelConfig matching the checkpoint.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = {
        "vid_proj": convert_input_proj(sd, "input_vid_proj", cfg.n_input_proj),
        "txt_proj": convert_input_proj(sd, "input_txt_proj", cfg.n_input_proj),
        "token_type": {"embedding": sd["token_type_embeddings.weight"]},
        "dummy_token": sd["dummy_rep_token"],
        "dummy_pos": sd["dummy_rep_pos"],
        "dummy_encoder": convert_encoder(sd, "txtproj_encoder", cfg.dummy_layers),
        "t2v_encoder": convert_t2v_encoder(
            sd, "transformer.t2v_encoder", cfg.t2v_layers
        ),
        "encoder": convert_encoder(sd, "transformer.encoder", cfg.enc_layers),
        "saliency_proj1": _dense(sd, "saliency_proj1"),
        "saliency_proj2": _dense(sd, "saliency_proj2"),
        "pyramid": convert_pyramid(sd, cfg.strides),
        "pooling": {
            "att": {"kernel": _t(sd["pooling.att.weight"])}
        },
        "class_head": convert_confidence_scorer(
            sd, "class_head", cfg.num_conv_layers, cfg.num_mlp_layers
        ),
        "conf_head": convert_confidence_scorer(
            sd, "conf_head", cfg.num_conv_layers, cfg.num_mlp_layers
        ),
        "coord_head": {
            "conv1": {
                "kernel": _conv1d(sd["coord_head.module.1.weight"]),
                "bias": sd["coord_head.module.1.bias"],
            },
            "conv2": {
                "kernel": _conv1d(sd["coord_head.module.3.weight"]),
                "bias": sd["coord_head.module.3.bias"],
            },
        },
        "coef": sd["coef"],
        "blend": sd["x"].reshape(()),
    }
    if cfg.use_txt_pos and "txt_position_embed.position_embeddings.weight" in sd:
        params["txt_pos"] = {
            "positions": {
                "embedding": sd["txt_position_embed.position_embeddings.weight"]
            },
            "norm": _norm(sd, "txt_position_embed.LayerNorm"),
        }
    return {"params": params}


def load_torch_checkpoint(path, cfg):
    """Load a reference .ckpt file (torch.save dict with 'model') on CPU.

    Detects the FlashVTG_ms variant by its phrase-pipeline keys.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt.get("state_dict", ckpt))
    sd = {k.removeprefix("module."): v.detach().numpy() for k, v in sd.items()}
    if any(k.startswith("phrase_generate.") for k in sd):
        return convert_checkpoint_ms(sd, cfg)
    return convert_checkpoint(sd, cfg)


# ---------------------------------------------------------------------------
# FlashVTG_ms variant (FlashVTG_ms/model.py + LGI.py)
# ---------------------------------------------------------------------------

def _mha(sd, prefix):
    """torch nn.MultiheadAttention -> lgi.MHACore {q,k,v,out}."""
    w = np.asarray(sd[f"{prefix}.in_proj_weight"])
    b = np.asarray(sd[f"{prefix}.in_proj_bias"])
    d = w.shape[1]
    return {
        "q": {"kernel": _t(w[:d]), "bias": b[:d]},
        "k": {"kernel": _t(w[d : 2 * d]), "bias": b[d : 2 * d]},
        "v": {"kernel": _t(w[2 * d :]), "bias": b[2 * d :]},
        "out": _dense(sd, f"{prefix}.out_proj"),
    }


def _cross_attention_block(sd, prefix):
    """LGI CrossAttention -> lgi.CrossAttentionBlock."""
    return {
        "q_proj": _dense(sd, f"{prefix}.q_proj"),
        "kv_proj": _dense(sd, f"{prefix}.kv_proj"),
        "att": _mha(sd, f"{prefix}.att"),
        "norm": _norm(sd, f"{prefix}.norm"),
        "linear": _dense(sd, f"{prefix}.linear"),
        "norm1": _norm(sd, f"{prefix}.norm1"),
    }


def _self_attention_block(sd, prefix):
    """LGI SelfAttention -> lgi.SelfAttentionBlock."""
    return {
        "q_proj": _dense(sd, f"{prefix}.q_proj"),
        "k_proj": _dense(sd, f"{prefix}.k_proj"),
        "v_proj": _dense(sd, f"{prefix}.v_proj"),
        "att": _mha(sd, f"{prefix}.att"),
        "norm": _norm(sd, f"{prefix}.norm"),
    }


def convert_checkpoint_ms(sd, cfg) -> Dict:
    """Full reference FlashVTG_ms state_dict -> {'params': ...} flax tree."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = {
        "vid_proj": convert_input_proj(sd, "input_vid_proj", cfg.n_input_proj),
        "txt_proj": convert_input_proj(sd, "input_txt_proj", cfg.n_input_proj),
        "word_proj": convert_input_proj(sd, "input_word_proj", cfg.n_input_proj),
        "token_type": {"embedding": sd["token_type_embeddings.weight"]},
        "dummy_token": sd["dummy_rep_token"],
        "dummy_pos": sd["dummy_rep_pos"],
        "dummy_encoder": convert_encoder(sd, "txtproj_encoder", cfg.dummy_layers),
        "t2v_encoder": convert_t2v_encoder(
            sd, "transformer.t2v_encoder", cfg.t2v_layers
        ),
        "encoder": convert_encoder(sd, "transformer.encoder", cfg.enc_layers),
        "pyramid": convert_pyramid(sd, cfg.strides),
        "class_head": convert_confidence_scorer(
            sd, "class_head", cfg.num_conv_layers, cfg.num_mlp_layers
        ),
        "coord_head": {
            "conv1": {
                "kernel": _conv1d(sd["coord_head.module.1.weight"]),
                "bias": sd["coord_head.module.1.bias"],
            },
            "conv2": {
                "kernel": _conv1d(sd["coord_head.module.3.weight"]),
                "bias": sd["coord_head.module.3.bias"],
            },
        },
        "coef": sd["coef"],
        "saliency_proj": {
            "proj1": _dense(sd, "saliency_proj.proj1"),
            "proj2": _dense(sd, "saliency_proj.proj2"),
        },
        "phrase_generate": {
            "word_proj": _dense(sd, "phrase_generate.word_proj"),
            "video_proj": _dense(sd, "phrase_generate.video_proj"),
            "learnable_phrase": sd["phrase_generate.learnable_phrase"],
            **{
                f"att{i}": _cross_attention_block(
                    sd, f"phrase_generate.phrase_att.{i}"
                )
                for i in range(cfg.phrase_layers)
            },
        },
        "phrase_context": {
            "product": {
                "fc_1": _dense(sd, "phrase_context.product.fc_1"),
                "fc_2": _dense(sd, "phrase_context.product.fc_2"),
                "fc_3": _dense(sd, "phrase_context.product.fc_3"),
                "norm": _norm(sd, "phrase_context.product.norm"),
                "norm1": _norm(sd, "phrase_context.product.norm1"),
            },
            **{
                f"layer{i}": {
                    "t_att": _self_attention_block(
                        sd, f"phrase_context.layers.{i}.t_att"
                    ),
                    "fc_t": _dense(sd, f"phrase_context.layers.{i}.fc_t.0"),
                    "norm_t": _norm(sd, f"phrase_context.layers.{i}.norm_t"),
                }
                for i in range(cfg.context_layers)
            },
            "local_context": {
                "phrase_proj1": _dense(sd, "phrase_context.local_context.phrase_proj.0"),
                "phrase_proj2": _dense(sd, "phrase_context.local_context.phrase_proj.2"),
                **{
                    f"kernel_k{k}": sd[
                        f"phrase_context.local_context.kernel_params.k{k}"
                    ]
                    for k in (1, 3, 5)
                },
                "linear_out": _dense(sd, "phrase_context.local_context.linear_out"),
                "norm": _norm(sd, "phrase_context.local_context.norm"),
            },
        },
        "t_sa": {
            f"layer{i}": {
                "t_att": _self_attention_block(sd, f"t_sa.layers.{i}.t_att"),
                "linear": _dense(sd, f"t_sa.layers.{i}.linear"),
                "norm": _norm(sd, f"t_sa.layers.{i}.norm"),
                # t_sa.layers.{i}.norm1 is a dead parameter in the reference
            }
            for i in range(cfg.t_sa_layers)
        },
    }
    return {"params": params}
