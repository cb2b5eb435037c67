"""Reference .ckpt file import: torch.save round-trip, module. prefix strip,
and _ms auto-detection."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

from flashvtg_tpu.models.flashvtg import FlashVTGModel, ModelConfig
from flashvtg_tpu.utils.torch_convert import load_torch_checkpoint
from tests.reference_oracle import build_reference_model, make_args


def test_load_torch_checkpoint_roundtrip(tmp_path):
    torch.manual_seed(0)
    args = make_args(v_feat_dim=30, t_feat_dim=20)
    ref = build_reference_model(args)
    ckpt_path = tmp_path / "model_best.ckpt"
    # reference checkpoints sometimes carry a DataParallel 'module.' prefix
    sd = {"module." + k: v for k, v in ref.state_dict().items()}
    torch.save({"model": sd, "epoch": 3}, ckpt_path)

    cfg = ModelConfig(
        vid_dim=30, txt_dim=20,
        num_dummies=args.num_dummies, dummy_layers=args.dummy_layers,
        t2v_layers=args.t2v_layers, enc_layers=args.enc_layers,
        kernel_size=args.kernel_size, num_conv_layers=args.num_conv_layers,
        num_mlp_layers=args.num_mlp_layers, use_neg=False,
    )
    params = load_torch_checkpoint(str(ckpt_path), cfg)
    model = FlashVTGModel(cfg)

    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    st = rng.standard_normal((1, 6, 20), dtype=np.float32)
    sv = rng.standard_normal((1, 24, 30), dtype=np.float32)
    out = model.apply(
        params, jnp.asarray(st), jnp.ones((1, 6)), jnp.asarray(sv),
        jnp.ones((1, 24)), train=False,
    )
    with torch.no_grad():
        out_ref = ref(
            torch.from_numpy(st), torch.ones(1, 6), torch.from_numpy(sv),
            torch.ones(1, 24), ["v_1.0_2.0"], [0], targets={},
        )
    np.testing.assert_allclose(
        np.asarray(out["saliency_scores"])[0],
        out_ref["saliency_scores"].numpy()[0],
        atol=3e-4,
    )


def test_lenient_load_tolerates_unimportable_extras(tmp_path):
    """Reference-trained .ckpts pickle the full opt Namespace incl. nncore
    Config objects (train.py:225-233); loading must not require nncore —
    the lenient fallback substitutes dummies for unimportable classes."""
    import sys
    import types

    import torch

    from flashvtg_tpu.utils.torch_convert import _lenient_torch_load

    mod = types.ModuleType("nncore_fake_gone")
    class Cfg(dict):
        pass
    Cfg.__module__ = "nncore_fake_gone"
    Cfg.__qualname__ = "Cfg"
    mod.Cfg = Cfg
    sys.modules["nncore_fake_gone"] = mod
    try:
        path = tmp_path / "ref.ckpt"
        torch.save(
            {"model": {"w": torch.arange(3.0)}, "opt": Cfg(a=1), "epoch": 4},
            path,
        )
    finally:
        del sys.modules["nncore_fake_gone"]

    ckpt = _lenient_torch_load(str(path))
    assert torch.equal(ckpt["model"]["w"], torch.arange(3.0))
    assert ckpt["epoch"] == 4
