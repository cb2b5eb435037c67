"""Helpers to run the reference implementation as a parity oracle in tests.

The reference depends on the external `nncore` package (registry/config lib)
which is not installed here; `install_nncore_stub()` provides the minimal
registry surface so that the reference model modules import and run. This is
for ORACLE USE IN TESTS ONLY — the framework itself never imports reference
code.
"""

from __future__ import annotations

import sys
import types
from types import SimpleNamespace


def install_nncore_stub():
    if "nncore" in sys.modules:
        return
    import torch

    nncore = types.ModuleType("nncore")
    nn_mod = types.ModuleType("nncore.nn")
    ops_mod = types.ModuleType("nncore.ops")

    class Registry:
        def __init__(self):
            self.map = {}

        def register(self):
            def deco(cls):
                self.map[cls.__name__] = cls
                return cls

            return deco

    MODELS, LOSSES = Registry(), Registry()

    def build_model(cfg, *args, **kwargs):
        cfg = dict(cfg)
        cls = MODELS.map[cfg.pop("type")]
        return cls(*args, **cfg, **kwargs)

    def build_loss(cfg):
        if cfg is None:
            return None
        cfg = dict(cfg)
        name = cfg.pop("type")
        if name in LOSSES.map:
            return LOSSES.map[name](**cfg)
        raise KeyError(f"nncore stub: loss {name} not registered")

    nn_mod.MODELS = MODELS
    nn_mod.LOSSES = LOSSES
    nn_mod.build_model = build_model
    nn_mod.build_loss = build_loss
    nn_mod.Parameter = torch.nn.Parameter
    nncore.nn = nn_mod
    nncore.ops = ops_mod
    sys.modules["nncore"] = nncore
    sys.modules["nncore.nn"] = nn_mod
    sys.modules["nncore.ops"] = ops_mod

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    if "/root/reference/utils" not in sys.path:
        sys.path.insert(0, "/root/reference/utils")  # LGI.py imports net_utils

    # natten is a dead import in FlashVTG_ms/LGI.py:10 — stub it
    if "natten" not in sys.modules:
        natten = types.ModuleType("natten")
        nf = types.ModuleType("natten.functional")
        nf.natten2dqkrpb = lambda *a, **k: None
        nf.natten2dav = lambda *a, **k: None
        natten.functional = nf
        sys.modules["natten"] = natten
        sys.modules["natten.functional"] = nf


def make_args(**overrides):
    """A reference `opt` namespace with the defaults the model reads."""
    base = dict(
        num_dummies=4,
        dummy_layers=1,
        t2v_layers=2,
        enc_layers=2,
        nheads=8,
        hidden_dim=256,
        dim_feedforward=1024,
        dropout=0.1,
        input_dropout=0.5,
        n_input_proj=2,
        kernel_size=5,
        num_conv_layers=1,
        num_mlp_layers=3,
        dset_name="hl",
        clip_length=2.0,
        use_neg=False,
        max_v_l=75,
        max_q_l=32,
        position_embedding="sine",
        pre_norm=False,
        use_txt_pos=False,
    )
    base.update(overrides)
    return SimpleNamespace(**base)


def build_reference_model(args, strides=(1, 2, 4, 8), buffer_size=1024,
                          max_num_moment=50):
    """Instantiate the reference FlashVTG nn.Module (eval-ready)."""
    install_nncore_stub()
    from FlashVTG.model import FlashVTG as RefFlashVTG
    from FlashVTG.position_encoding import build_position_encoding
    from FlashVTG.transformer import build_transformer

    transformer = build_transformer(args)
    pos_embed, txt_pos_embed = build_position_encoding(args)
    model = RefFlashVTG(
        transformer,
        pos_embed,
        txt_pos_embed,
        n_input_proj=args.n_input_proj,
        input_dropout=args.input_dropout,
        txt_dim=args.t_feat_dim,
        vid_dim=args.v_feat_dim,
        # note: the reference's build_model1 never forwards use_txt_pos —
        # the --use_txt_pos flag is dead on its standard build path; pass it
        # here to exercise the learned-PE architecture as an oracle
        use_txt_pos=getattr(args, "use_txt_pos", False),
        strides=strides,
        buffer_size=buffer_size,
        max_num_moment=max_num_moment,
        pyramid_cfg=dict(type="ConvPyramid"),
        pooling_cfg=dict(type="AdaPooling"),
        coord_head_cfg=dict(type="ConvHead", kernal_size=3),
        args=args,
    )
    model.eval()
    return model
