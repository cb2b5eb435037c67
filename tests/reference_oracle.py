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


def write_subprocess_shims(shim_dir: str) -> str:
    """Materialize importable stand-ins for the external packages the
    reference's literal entry points need (`python FlashVTG/inference.py`
    run as a subprocess): nncore (registries + Config.from_file +
    ops.temporal_iou/swap_element + the built-in Focal/L1 losses the
    shipped configs name), torchtext (only imported; the vocab path is
    charadesSTA+vgg-only, start_end_dataset.py:130-139) and wandb (only
    imported, inference.py:12). Returns shim_dir for PYTHONPATH use.

    The Focal/L1 torch re-implementations match the ones value+grad
    validated in tests/test_criterion_parity.py.
    """
    import os

    nc = os.path.join(shim_dir, "nncore")
    os.makedirs(nc, exist_ok=True)
    with open(os.path.join(nc, "nn.py"), "w") as f:
        f.write('''\
import torch
import torch.nn.functional as F

Parameter = torch.nn.Parameter


class _Registry:
    def __init__(self):
        self.map = {}

    def register(self):
        def deco(cls):
            self.map[cls.__name__] = cls
            return cls

        return deco


MODELS, LOSSES = _Registry(), _Registry()


def build_model(cfg, *args, **kwargs):
    cfg = dict(cfg)
    cls = MODELS.map[cfg.pop("type")]
    return cls(*args, **cfg, **kwargs)


def build_loss(cfg):
    if cfg is None:
        return None
    cfg = dict(cfg)
    return LOSSES.map[cfg.pop("type")](**cfg)


class FocalLoss(torch.nn.Module):
    def __init__(self, alpha=0.25, gamma=2.0, loss_weight=1.0):
        super().__init__()
        self.alpha, self.gamma, self.w = alpha, gamma, loss_weight

    def forward(self, pred, target, weight=None, avg_factor=None):
        p = pred.sigmoid()
        pt = (1 - p) * target + p * (1 - target)
        fw = (self.alpha * target + (1 - self.alpha) * (1 - target)) * pt.pow(self.gamma)
        loss = F.binary_cross_entropy_with_logits(pred, target, reduction="none") * fw
        if weight is not None:
            loss = loss * weight
        return self.w * loss.sum() / avg_factor


class L1Loss(torch.nn.Module):
    def __init__(self, loss_weight=1.0):
        super().__init__()
        self.w = loss_weight

    def forward(self, pred, target, weight=None, avg_factor=None):
        loss = (pred - target).abs()
        if weight is not None:
            loss = loss * weight
        return self.w * loss.sum() / avg_factor


class DynamicBCELoss(torch.nn.Module):
    # RECONSTRUCTION (PARITY.md section 8): nncore source unavailable; BCE
    # against per-sample max-normalized soft targets, matching the pinned
    # contract in tests/test_dynamic_bce.py. In the inference oracle this
    # only feeds eval loss meters, never the saliency outputs under test.
    def __init__(self, loss_weight=1.0):
        super().__init__()
        self.w = loss_weight

    def forward(self, pred, target, weight=None, avg_factor=None):
        soft = (target / target.max(dim=-1, keepdim=True).values.clamp(min=1e-6)).clamp(0.0, 1.0)
        loss = F.binary_cross_entropy_with_logits(pred, soft, reduction="none")
        if weight is not None:
            loss = loss * weight
        if avg_factor is None:
            return self.w * loss.mean()
        return self.w * loss.sum() / avg_factor


LOSSES.map["FocalLoss"] = FocalLoss
LOSSES.map["L1Loss"] = L1Loss
LOSSES.map["DynamicBCELoss"] = DynamicBCELoss
''')
    with open(os.path.join(nc, "ops.py"), "w") as f:
        f.write('''\
import torch


def temporal_iou(spans1, spans2):
    areas1 = spans1[:, 1] - spans1[:, 0]
    areas2 = spans2[:, 1] - spans2[:, 0]
    left = torch.max(spans1[:, None, 0], spans2[None, :, 0])
    right = torch.min(spans1[:, None, 1], spans2[None, :, 1])
    inter = (right - left).clamp(min=0)
    union = areas1[:, None] + areas2[None, :] - inter
    return inter / union
''')
    with open(os.path.join(nc, "__init__.py"), "w") as f:
        f.write('''\
import importlib

from . import nn, ops
from .nn import LOSSES, MODELS, Parameter, build_loss, build_model


class _AttrDict(dict):
    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return _AttrDict(v) if isinstance(v, dict) else v


class Config:
    @staticmethod
    def from_file(path):
        ns = {}
        with open(path) as f:
            exec(compile(f.read(), path, "exec"), {}, ns)
        for base in ns.get("_base_", ()):
            try:
                importlib.import_module(base)  # registry side-effects
            except ImportError:
                pass
        return _AttrDict({k: v for k, v in ns.items() if not k.startswith("_")})


def swap_element(x, i, j):
    x = x.clone()
    tmp = x[i].clone()
    x[i] = x[j]
    x[j] = tmp
    return x
''')

    tt = os.path.join(shim_dir, "torchtext")
    os.makedirs(tt, exist_ok=True)
    with open(os.path.join(tt, "vocab.py"), "w") as f:
        f.write("pretrained_aliases = {}\n")
    with open(os.path.join(tt, "__init__.py"), "w") as f:
        f.write("from . import vocab\n")

    nt = os.path.join(shim_dir, "natten")
    os.makedirs(nt, exist_ok=True)
    with open(os.path.join(nt, "functional.py"), "w") as f:
        f.write(
            "def natten2dqkrpb(*a, **k):\n    return None\n\n\n"
            "def natten2dav(*a, **k):\n    return None\n"
        )
    with open(os.path.join(nt, "__init__.py"), "w") as f:
        f.write("from . import functional\n")

    wb = os.path.join(shim_dir, "wandb")
    os.makedirs(wb, exist_ok=True)
    with open(os.path.join(wb, "__init__.py"), "w") as f:
        # FlashVTG_ms/train.py:124-125 does wandb.init(...) then reads
        # wandb.run.dir as the SummaryWriter log dir — the stub must carry
        # a run object with a real directory
        f.write('''\
import tempfile


class _Run:
    def __init__(self):
        self.dir = tempfile.mkdtemp(prefix="wandb_shim_")


run = _Run()


def init(*a, **k):
    return run


def log(*a, **k):
    return None


def finish(*a, **k):
    return None
''')

    # the reference targets pre-2.6 torch whose torch.load defaulted to
    # weights_only=False; its trainers re-load their own checkpoints that
    # pickle the full opt Namespace (FlashVTG_ms/train.py:245, :229-233),
    # which modern torch's safe unpickler rejects. Restore the
    # reference-era default inside the subprocess only (the shim dir heads
    # PYTHONPATH, so site.py imports this sitecustomize).
    with open(os.path.join(shim_dir, "sitecustomize.py"), "w") as f:
        f.write('''\
import torch

_orig_load = torch.load


def _load(*a, **k):
    k.setdefault("weights_only", False)
    return _orig_load(*a, **k)


torch.load = _load
''')
    return shim_dir
