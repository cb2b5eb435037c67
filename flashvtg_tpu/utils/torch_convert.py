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
    return {"params": params}


def load_torch_checkpoint(path, cfg):
    """Load a reference .ckpt file (torch.save dict with 'model') on CPU."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt.get("state_dict", ckpt))
    sd = {k.removeprefix("module."): v.detach().numpy() for k, v in sd.items()}
    return convert_checkpoint(sd, cfg)
