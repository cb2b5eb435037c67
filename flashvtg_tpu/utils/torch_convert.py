"""Reference-checkpoint importer/exporter: torch state_dict <-> flax params.

Import: maps the reference's parameter naming (FlashVTG/model.py +
transformer.py + blocks/) onto the flashvtg_tpu module tree so released
checkpoints (README.md:93-103 Model Zoo) can be evaluated for accuracy
parity, and so the test suite can compare layer outputs against the torch
oracle.

Export (`export_state_dict[_ms]` / `save_torch_checkpoint`): the exact
inverse — a model trained here can be handed back to reference-repo users
as a `.ckpt` their `inference.py --resume` loads with strict=True. Dead
reference parameters that our module tree has no counterpart for (the
always-constructed-but-unreachable `txt_position_embed` when use_txt_pos is
off, the `_ms` `transformer.fuse_proj` and `t_sa.*.norm1`) are synthesized
at their torch init values; they influence nothing (verified dead, see
docs/PARITY.md).

All arrays are plain numpy; no torch import is required except in the
file-level load/save helpers.
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


def _lenient_torch_load(path):
    """torch.load that tolerates unimportable classes in checkpoint extras.

    The reference trainer pickles its ENTIRE opt Namespace into every
    checkpoint (train.py:225-233 saves {"model", "optimizer",
    "lr_scheduler", "epoch", "opt"}), and opt.cfg is an nncore Config —
    so loading a reference-trained .ckpt without nncore installed raises
    ModuleNotFoundError from the unpickler even though only the 'model'
    tensors matter. Fall back to an unpickler that substitutes a dummy
    dict subclass for any class it cannot import."""
    import pickle
    import types

    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=False)
    except (ModuleNotFoundError, AttributeError):
        pass

    class _LenientUnpickler(pickle.Unpickler):
        def find_class(self, mod_name, name):
            try:
                return super().find_class(mod_name, name)
            except (ModuleNotFoundError, AttributeError):
                # dict base: survives BUILD/SETITEMS for dict-like classes
                return type(name, (dict,), {"__setstate__": lambda s, st: None})

    shim = types.ModuleType("flashvtg_tpu_lenient_pickle")
    shim.Unpickler = _LenientUnpickler
    shim.load = pickle.load
    shim.dump = pickle.dump
    shim.dumps = pickle.dumps
    shim.HIGHEST_PROTOCOL = pickle.HIGHEST_PROTOCOL
    return torch.load(
        path, map_location="cpu", weights_only=False, pickle_module=shim
    )


def load_torch_checkpoint(path, cfg):
    """Load a reference .ckpt file (torch.save dict with 'model') on CPU.

    Detects the FlashVTG_ms variant by its phrase-pipeline keys.
    """
    ckpt = _lenient_torch_load(path)
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


# ---------------------------------------------------------------------------
# Reverse direction: flax params -> reference-format torch state_dict
# ---------------------------------------------------------------------------

def _f32(a):
    return np.asarray(a, dtype=np.float32)


def _inv_dense(out, prefix, p):
    out[f"{prefix}.weight"] = _f32(p["kernel"]).T
    out[f"{prefix}.bias"] = _f32(p["bias"])


def _inv_norm(out, prefix, p):
    out[f"{prefix}.weight"] = _f32(p["scale"])
    out[f"{prefix}.bias"] = _f32(p["bias"])


def _inv_ffn(out, prefix, p):
    _inv_dense(out, f"{prefix}.linear1", p["linear1"])
    _inv_dense(out, f"{prefix}.linear2", p["linear2"])
    # torch PReLU holds a (1,)-shaped weight
    out[f"{prefix}.activation.weight"] = _f32(p["act"]["alpha"]).reshape(1)


def _inv_self_attention(out, prefix, p):
    """q/k/v/out Dense -> torch nn.MultiheadAttention packed in_proj."""
    out[f"{prefix}.in_proj_weight"] = np.concatenate(
        [_f32(p[x]["kernel"]).T for x in ("q_proj", "k_proj", "v_proj")], 0
    )
    out[f"{prefix}.in_proj_bias"] = np.concatenate(
        [_f32(p[x]["bias"]) for x in ("q_proj", "k_proj", "v_proj")]
    )
    _inv_dense(out, f"{prefix}.out_proj", p["out_proj"])


def _inv_encoder_layer(out, prefix, p):
    _inv_self_attention(out, f"{prefix}.self_attn", p["attn"])
    _inv_ffn(out, prefix, p["ffn"])
    _inv_norm(out, f"{prefix}.norm1", p["norm1"])
    _inv_norm(out, f"{prefix}.norm2", p["norm2"])


def _inv_t2v_layer(out, prefix, p):
    # ACA attention has only an out projection (crossattention.py:87-112)
    _inv_dense(out, f"{prefix}.self_attn.out_proj", p["attn"]["out_proj"])
    _inv_ffn(out, prefix, p["ffn"])
    _inv_norm(out, f"{prefix}.norm1", p["norm1"])
    _inv_norm(out, f"{prefix}.norm2", p["norm2"])


def _inv_encoder(out, prefix, p, num_layers, layer_fn=_inv_encoder_layer):
    for i in range(num_layers):
        layer_fn(out, f"{prefix}.layers.{i}", p[f"layer{i}"])


def _inv_input_proj(out, prefix, p, n_layers):
    for i in range(n_layers):
        _inv_norm(out, f"{prefix}.{i}.LayerNorm", p[f"layer{i}"]["norm"])
        _inv_dense(out, f"{prefix}.{i}.net.1", p[f"layer{i}"]["dense"])


def _inv_pyramid(out, p, strides):
    for j, s in enumerate(strides):
        pw = int(math.log2(s))
        if pw == 0:
            continue  # stride-1 level is a bare parameterless ReLU
        level = p[f"level{s}"]
        for i in range(pw):
            base = 5 * i
            out[f"pyramid.blocks.{j}.{base + 1}.weight"] = _f32(
                level[f"conv{i}"]["kernel"]
            ).transpose(2, 1, 0)
            out[f"pyramid.blocks.{j}.{base + 1}.bias"] = _f32(
                level[f"conv{i}"]["bias"]
            )
            _inv_norm(out, f"pyramid.blocks.{j}.{base + 3}", level[f"norm{i}"])


def _inv_confidence_scorer(out, prefix, p, num_conv_layers, num_mlp_layers):
    for i in range(num_conv_layers):
        # flax Conv (k, in, out) -> torch Conv2d (out, in, 1, k)
        out[f"{prefix}.convs.{i}.weight"] = _f32(
            p[f"conv{i}"]["kernel"]
        ).transpose(2, 1, 0)[:, :, None, :]
        out[f"{prefix}.convs.{i}.bias"] = _f32(p[f"conv{i}"]["bias"])
    for i in range(num_mlp_layers):
        _inv_dense(out, f"{prefix}.fc.layers.{i}", p["mlp"][f"layer{i}"])


def _inv_coord_head(out, p):
    for src, dst in (("conv1", "module.1"), ("conv2", "module.3")):
        out[f"coord_head.{dst}.weight"] = _f32(
            p[src]["kernel"]
        ).transpose(2, 1, 0)
        out[f"coord_head.{dst}.bias"] = _f32(p[src]["bias"])


def _inv_txt_position_embed(out, p, cfg):
    """Always present in the reference state_dict: the module is constructed
    unconditionally (model.py) even though the standard build path never
    routes --use_txt_pos to it. Synthesize torch-init values (dead weights)
    when our tree has no txt_pos params."""
    if p is not None and "txt_pos" in p:
        out["txt_position_embed.position_embeddings.weight"] = _f32(
            p["txt_pos"]["positions"]["embedding"]
        )
        _inv_norm(out, "txt_position_embed.LayerNorm", p["txt_pos"]["norm"])
    else:
        d = cfg.hidden_dim
        out["txt_position_embed.position_embeddings.weight"] = np.zeros(
            (cfg.max_q_l, d), np.float32
        )
        out["txt_position_embed.LayerNorm.weight"] = np.ones(d, np.float32)
        out["txt_position_embed.LayerNorm.bias"] = np.zeros(d, np.float32)


def export_state_dict(params, cfg) -> Dict[str, np.ndarray]:
    """flax FlashVTG params -> reference state_dict (inverse of
    convert_checkpoint; loads into the reference model with strict=True)."""
    p = params.get("params", params)
    out: Dict[str, np.ndarray] = {}
    out["dummy_rep_token"] = _f32(p["dummy_token"])
    out["dummy_rep_pos"] = _f32(p["dummy_pos"])
    out["coef"] = _f32(p["coef"])
    out["x"] = _f32(p["blend"]).reshape(())
    _inv_input_proj(out, "input_vid_proj", p["vid_proj"], cfg.n_input_proj)
    _inv_input_proj(out, "input_txt_proj", p["txt_proj"], cfg.n_input_proj)
    out["token_type_embeddings.weight"] = _f32(p["token_type"]["embedding"])
    _inv_encoder(out, "txtproj_encoder", p["dummy_encoder"], cfg.dummy_layers)
    _inv_encoder(
        out, "transformer.t2v_encoder", p["t2v_encoder"], cfg.t2v_layers,
        layer_fn=_inv_t2v_layer,
    )
    _inv_encoder(out, "transformer.encoder", p["encoder"], cfg.enc_layers)
    _inv_dense(out, "saliency_proj1", p["saliency_proj1"])
    _inv_dense(out, "saliency_proj2", p["saliency_proj2"])
    # HD-shaped models (strides=(1,)) have a parameterless pyramid (bare
    # ReLU level) and no "pyramid" key in the flax tree at all
    _inv_pyramid(out, p.get("pyramid", {}), cfg.strides)
    out["pooling.att.weight"] = _f32(p["pooling"]["att"]["kernel"]).T
    _inv_confidence_scorer(
        out, "class_head", p["class_head"], cfg.num_conv_layers,
        cfg.num_mlp_layers,
    )
    _inv_confidence_scorer(
        out, "conf_head", p["conf_head"], cfg.num_conv_layers,
        cfg.num_mlp_layers,
    )
    _inv_coord_head(out, p["coord_head"])
    _inv_txt_position_embed(out, p, cfg)
    return out


def export_state_dict_ms(params, cfg) -> Dict[str, np.ndarray]:
    """flax FlashVTG_ms params -> reference state_dict (inverse of
    convert_checkpoint_ms; strict=True loadable)."""
    p = params.get("params", params)
    out: Dict[str, np.ndarray] = {}
    out["dummy_rep_token"] = _f32(p["dummy_token"])
    out["dummy_rep_pos"] = _f32(p["dummy_pos"])
    out["coef"] = _f32(p["coef"])
    _inv_input_proj(out, "input_vid_proj", p["vid_proj"], cfg.n_input_proj)
    _inv_input_proj(out, "input_txt_proj", p["txt_proj"], cfg.n_input_proj)
    _inv_input_proj(out, "input_word_proj", p["word_proj"], cfg.n_input_proj)
    out["token_type_embeddings.weight"] = _f32(p["token_type"]["embedding"])
    _inv_encoder(out, "txtproj_encoder", p["dummy_encoder"], cfg.dummy_layers)
    _inv_encoder(
        out, "transformer.t2v_encoder", p["t2v_encoder"], cfg.t2v_layers,
        layer_fn=_inv_t2v_layer,
    )
    _inv_encoder(out, "transformer.encoder", p["encoder"], cfg.enc_layers)
    # HD-shaped models (strides=(1,)) have a parameterless pyramid (bare
    # ReLU level) and no "pyramid" key in the flax tree at all
    _inv_pyramid(out, p.get("pyramid", {}), cfg.strides)
    # AdaPooling is constructed by the _ms reference but dead on its forward
    # path (the query comes from src_glob instead); synthesize its Linear
    out["pooling.att.weight"] = np.zeros((1, cfg.hidden_dim), np.float32)
    _inv_confidence_scorer(
        out, "class_head", p["class_head"], cfg.num_conv_layers,
        cfg.num_mlp_layers,
    )
    _inv_coord_head(out, p["coord_head"])
    _inv_dense(out, "saliency_proj.proj1", p["saliency_proj"]["proj1"])
    _inv_dense(out, "saliency_proj.proj2", p["saliency_proj"]["proj2"])

    pg = p["phrase_generate"]
    _inv_dense(out, "phrase_generate.word_proj", pg["word_proj"])
    _inv_dense(out, "phrase_generate.video_proj", pg["video_proj"])
    out["phrase_generate.learnable_phrase"] = _f32(pg["learnable_phrase"])
    for i in range(cfg.phrase_layers):
        a, pre = pg[f"att{i}"], f"phrase_generate.phrase_att.{i}"
        _inv_dense(out, f"{pre}.q_proj", a["q_proj"])
        _inv_dense(out, f"{pre}.kv_proj", a["kv_proj"])
        _inv_mha(out, f"{pre}.att", a["att"])
        _inv_norm(out, f"{pre}.norm", a["norm"])
        _inv_dense(out, f"{pre}.linear", a["linear"])
        _inv_norm(out, f"{pre}.norm1", a["norm1"])

    pc = p["phrase_context"]
    for name in ("fc_1", "fc_2", "fc_3"):
        _inv_dense(out, f"phrase_context.product.{name}", pc["product"][name])
    _inv_norm(out, "phrase_context.product.norm", pc["product"]["norm"])
    _inv_norm(out, "phrase_context.product.norm1", pc["product"]["norm1"])
    for i in range(cfg.context_layers):
        lay, pre = pc[f"layer{i}"], f"phrase_context.layers.{i}"
        _inv_self_attention_block(out, f"{pre}.t_att", lay["t_att"])
        _inv_dense(out, f"{pre}.fc_t.0", lay["fc_t"])
        _inv_norm(out, f"{pre}.norm_t", lay["norm_t"])
    lc = pc["local_context"]
    _inv_dense(
        out, "phrase_context.local_context.phrase_proj.0", lc["phrase_proj1"]
    )
    _inv_dense(
        out, "phrase_context.local_context.phrase_proj.2", lc["phrase_proj2"]
    )
    for k in (1, 3, 5):
        out[f"phrase_context.local_context.kernel_params.k{k}"] = _f32(
            lc[f"kernel_k{k}"]
        )
    _inv_dense(out, "phrase_context.local_context.linear_out", lc["linear_out"])
    _inv_norm(out, "phrase_context.local_context.norm", lc["norm"])

    d = cfg.hidden_dim
    for i in range(cfg.t_sa_layers):
        lay, pre = p["t_sa"][f"layer{i}"], f"t_sa.layers.{i}"
        _inv_self_attention_block(out, f"{pre}.t_att", lay["t_att"])
        _inv_dense(out, f"{pre}.linear", lay["linear"])
        _inv_norm(out, f"{pre}.norm", lay["norm"])
        # t_sa.layers.{i}.norm1 exists in the reference but is dead
        # (never applied in T_SA.forward) -> synthesize LayerNorm init
        out[f"{pre}.norm1.weight"] = np.ones(d, np.float32)
        out[f"{pre}.norm1.bias"] = np.zeros(d, np.float32)

    # transformer.fuse_proj: constructed by the _ms Transformer but never
    # called on any build path (verified dead; importer skips it). Linear
    # (d, 2d) + LayerNorm at init values.
    out["transformer.fuse_proj.0.weight"] = np.zeros((d, 2 * d), np.float32)
    out["transformer.fuse_proj.0.bias"] = np.zeros(d, np.float32)
    out["transformer.fuse_proj.1.weight"] = np.ones(d, np.float32)
    out["transformer.fuse_proj.1.bias"] = np.zeros(d, np.float32)
    _inv_txt_position_embed(out, p, cfg)
    return out


def _inv_mha(out, prefix, p):
    """lgi.MHACore {q,k,v,out} -> torch nn.MultiheadAttention."""
    out[f"{prefix}.in_proj_weight"] = np.concatenate(
        [_f32(p[x]["kernel"]).T for x in ("q", "k", "v")], 0
    )
    out[f"{prefix}.in_proj_bias"] = np.concatenate(
        [_f32(p[x]["bias"]) for x in ("q", "k", "v")]
    )
    _inv_dense(out, f"{prefix}.out_proj", p["out"])


def _inv_self_attention_block(out, prefix, p):
    """lgi.SelfAttentionBlock -> LGI SelfAttention."""
    _inv_dense(out, f"{prefix}.q_proj", p["q_proj"])
    _inv_dense(out, f"{prefix}.k_proj", p["k_proj"])
    _inv_dense(out, f"{prefix}.v_proj", p["v_proj"])
    _inv_mha(out, f"{prefix}.att", p["att"])
    _inv_norm(out, f"{prefix}.norm", p["norm"])


def save_torch_checkpoint(path, params, cfg, variant="core", epoch=-1):
    """Write a reference-format .ckpt that FlashVTG/inference.py setup_model
    loads on EITHER of its branches.

    The reference picks its load path by substring sniffing
    (inference.py:460: `if "pt" in opt.resume[:-4]`): paths containing
    "pt" anywhere before the extension — e.g. anything under a
    checkpoints/ directory — are treated as pretrain-style files read from
    `checkpoint["state_dict"]` with a `module.` prefix; everything else
    reads `checkpoint["model"]` strict. Both keys are therefore written
    (same tensors), so the export loads wherever the user puts it.
    (`--resume_all` additionally expects optimizer/lr_scheduler states,
    which have no torch counterpart here — export is weights-only.)"""
    import torch

    sd = (
        export_state_dict_ms(params, cfg) if variant == "ms"
        else export_state_dict(params, cfg)
    )
    tensors = {
        k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()
    }
    torch.save(
        {
            "model": tensors,
            "state_dict": {f"module.{k}": v for k, v in tensors.items()},
            "epoch": epoch,
        },
        path,
    )
    return sd
