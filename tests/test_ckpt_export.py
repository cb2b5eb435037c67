"""Reverse checkpoint export: flax params -> reference-format .ckpt.

Contract (both variants):
  1. export produces EXACTLY the reference model's state_dict key set,
     loadable with load_state_dict(strict=True);
  2. import -> export is the identity on every live parameter (dead
     reference params — txt_position_embed when use_txt_pos is off, the
     `_ms` transformer.fuse_proj / pooling / t_sa.*.norm1 — are
     synthesized at init values and only shape-checked);
  3. a reference model loaded from our export produces the same forward
     outputs as our model on the exported params;
  4. the .ckpt file round-trips through our own importer bit-for-bit.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from flashvtg_tpu.models.flashvtg import FlashVTGModel, ModelConfig
from flashvtg_tpu.models.flashvtg_ms import FlashVTGMSModel, MSModelConfig
from flashvtg_tpu.models.points import pyramid_masks_strict
from flashvtg_tpu.utils.torch_convert import (
    convert_checkpoint,
    convert_checkpoint_ms,
    export_state_dict,
    export_state_dict_ms,
    load_torch_checkpoint,
    save_torch_checkpoint,
)
from tests.reference_oracle import build_reference_model, make_args
from tests.test_ms_model_parity import build_reference_ms

V_DIM, T_DIM, LV, LQ = 30, 20, 24, 6


def _dead_core(key):
    return key.startswith("txt_position_embed.")


def _dead_ms(key):
    return (
        key.startswith("txt_position_embed.")
        or key.startswith("transformer.fuse_proj.")
        or key.startswith("pooling.")
        or (key.startswith("t_sa.") and ".norm1." in key)
    )


def _check_export(sd_ref, sd_out, dead):
    assert set(sd_out) == set(sd_ref)
    for k, v in sd_ref.items():
        assert sd_out[k].shape == tuple(v.shape), k
        if not dead(k):
            np.testing.assert_array_equal(sd_out[k], v.numpy(), err_msg=k)


def test_export_core_strict_load_and_forward(tmp_path):
    torch.manual_seed(0)
    args = make_args(v_feat_dim=V_DIM, t_feat_dim=T_DIM)
    ref = build_reference_model(args)
    cfg = ModelConfig(
        vid_dim=V_DIM, txt_dim=T_DIM,
        num_dummies=args.num_dummies, dummy_layers=args.dummy_layers,
        t2v_layers=args.t2v_layers, enc_layers=args.enc_layers,
        kernel_size=args.kernel_size, num_conv_layers=args.num_conv_layers,
        num_mlp_layers=args.num_mlp_layers, use_neg=False,
        max_q_l=args.max_q_l,
    )
    params = convert_checkpoint(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()}, cfg
    )
    sd_out = export_state_dict(params, cfg)
    _check_export(ref.state_dict(), sd_out, _dead_core)

    # a FRESH reference model accepts the export with strict=True...
    torch.manual_seed(123)
    ref2 = build_reference_model(args)
    ref2.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd_out.items()},
        strict=True,
    )
    # ...and computes the same forward as our model on those params
    rng = np.random.default_rng(0)
    st = rng.standard_normal((1, LQ, T_DIM), dtype=np.float32)
    sv = rng.standard_normal((1, LV, V_DIM), dtype=np.float32)
    with torch.no_grad():
        out_ref = ref2(
            torch.from_numpy(st), torch.ones(1, LQ), torch.from_numpy(sv),
            torch.ones(1, LV), ["v_1.0_2.0"], [0], targets={},
        )
    out = FlashVTGModel(cfg).apply(
        params, jnp.asarray(st), jnp.ones((1, LQ)), jnp.asarray(sv),
        jnp.ones((1, LV)), train=False,
    )
    np.testing.assert_allclose(
        np.asarray(out["saliency_scores"])[0],
        out_ref["saliency_scores"].numpy()[0], atol=3e-4,
    )

    # file-level roundtrip through our own importer is bit-exact
    path = str(tmp_path / "exported.ckpt")
    save_torch_checkpoint(path, params, cfg, variant="core", epoch=7)
    reimported = load_torch_checkpoint(path, cfg)
    for (pa, la), (pb, lb) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(reimported)[0],
    ):
        assert pa == pb
        np.testing.assert_array_equal(
            np.asarray(la), np.asarray(lb),
            err_msg=jax.tree_util.keystr(pa),
        )
    ck = torch.load(path, map_location="cpu", weights_only=False)
    assert ck["epoch"] == 7
    # both reference load branches are served: plain "model" (strict path)
    # and module.-prefixed "state_dict" (the `"pt" in resume[:-4]` path,
    # inference.py:460-468 — triggered by e.g. a checkpoints/ directory)
    assert set(ck["state_dict"]) == {f"module.{k}" for k in ck["model"]}


def test_export_ms_strict_load_and_forward(tmp_path):
    torch.manual_seed(0)
    strides = (1, 2)
    args = make_args(
        v_feat_dim=V_DIM, t_feat_dim=T_DIM, num_dummies=3, dummy_layers=1,
        t2v_layers=2, enc_layers=1, num_conv_layers=2, num_mlp_layers=3,
        kernel_size=5, num_phrase=3, phrase_layers=2, context_layers=2,
        use_dfl=False, num_bins=8, rank=4, t_sa=2, sample_radius=1.5,
        use_neg=False, dset_name="tvsum", clip_length=2.0,
    )
    ref = build_reference_ms(args, strides=strides)
    cfg = MSModelConfig(
        vid_dim=V_DIM, txt_dim=T_DIM, num_dummies=3, dummy_layers=1,
        t2v_layers=2, enc_layers=1, kernel_size=5, num_conv_layers=2,
        num_mlp_layers=3, clip_length=2.0, strides=strides, use_neg=False,
        num_phrase=3, phrase_layers=2, context_layers=2, use_dfl=False,
        num_bins=8, rank=4, t_sa_layers=2, sample_radius=1.5,
        max_q_l=args.max_q_l,
    )
    params = convert_checkpoint_ms(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()}, cfg
    )
    sd_out = export_state_dict_ms(params, cfg)
    _check_export(ref.state_dict(), sd_out, _dead_ms)

    torch.manual_seed(99)
    ref2 = build_reference_ms(args, strides=strides)
    ref2.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd_out.items()},
        strict=True,
    )
    rng = np.random.default_rng(3)
    st = rng.standard_normal((1, LQ, T_DIM), dtype=np.float32)
    sv = rng.standard_normal((1, LV, V_DIM), dtype=np.float32)
    with torch.no_grad():
        out_ref = ref2(
            torch.from_numpy(st), torch.ones(1, LQ), torch.from_numpy(sv),
            torch.ones(1, LV), ["vid_x"], [0], targets={},
        )
    strict, _ = pyramid_masks_strict(np.asarray([LV]), LV, strides)
    out = FlashVTGMSModel(cfg).apply(
        params, jnp.asarray(st), jnp.ones((1, LQ)), jnp.asarray(sv),
        jnp.ones((1, LV)), point_valid=jnp.asarray(strict), train=False,
    )
    np.testing.assert_allclose(
        np.asarray(out["saliency_scores"])[0],
        out_ref["saliency_scores"].numpy()[0], atol=3e-4,
    )

    # the saved .ckpt auto-detects as _ms on reimport (phrase keys present)
    path = str(tmp_path / "exported_ms.ckpt")
    save_torch_checkpoint(path, params, cfg, variant="ms")
    reimported = load_torch_checkpoint(path, cfg)
    for (pa, la), (pb, lb) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(reimported)[0],
    ):
        assert pa == pb
        np.testing.assert_array_equal(
            np.asarray(la), np.asarray(lb),
            err_msg=jax.tree_util.keystr(pa),
        )


def test_export_hd_shape_no_pyramid_params():
    """HD-shaped models (strides=(1,)) have a parameterless pyramid — no
    'pyramid' key in the flax tree at all; export must not KeyError
    (regression: both export_state_dict variants indexed p['pyramid'])."""
    import jax
    import jax.numpy as jnp

    from flashvtg_tpu.train.config import ExperimentConfig
    from flashvtg_tpu.utils.torch_convert import export_state_dict

    cfg = ExperimentConfig(
        v_feat_dim=16, t_feat_dim=12, hidden_dim=16, dim_feedforward=32,
        nheads=2, num_dummies=2, t2v_layers=1, enc_layers=1, dummy_layers=1,
        num_mlp_layers=2, num_conv_layers=1, max_v_l=8, max_q_l=6,
        strides=(1,), buffer_size=2048, loss_cls="dynamic_bce",
        loss_reg=None, nce_direction=("row",),
    )
    model = cfg.build_model()
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 6, 12)), jnp.ones((1, 6)),
        jnp.zeros((1, 8, 18)), jnp.ones((1, 8)),
        train=False,
    )
    sd = export_state_dict(params["params"], cfg.model_config())
    assert not any(k.startswith("pyramid") for k in sd)
    assert any(k.startswith("class_head") for k in sd)


def test_export_creates_target_dir(tmp_path):
    """Round-4 verify finding: `cli export --export_path a/b/out.ckpt` into
    a directory that does not exist yet must create it (the sidecar write
    used to fail with FileNotFoundError before any artifact landed)."""
    import jax

    from flashvtg_tpu.cli import main as cli_main, parse_config

    flags = [
        "qvhighlights_slowclip", "--v_feat_dim", "16", "--t_feat_dim", "12",
        "--hidden_dim", "16", "--dim_feedforward", "32", "--nheads", "2",
        "--num_dummies", "2", "--t2v_layers", "1", "--enc_layers", "1",
        "--dummy_layers", "1", "--num_mlp_layers", "2",
        "--num_conv_layers", "1", "--max_v_l", "8", "--max_q_l", "6",
    ]
    cfg, _ = parse_config(flags)
    mc = cfg.model_config()
    model = cfg.build_model()
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 6, 12)), jnp.ones((1, 6)),
        jnp.zeros((1, 8, mc.vid_dim)), jnp.ones((1, 8)),
        train=False,
    )["params"]
    src = str(tmp_path / "src.ckpt")
    save_torch_checkpoint(src, params, mc, variant="core", epoch=1)

    out = tmp_path / "not" / "yet" / "there" / "out.ckpt"
    rc = cli_main(
        ["export", *flags, "--resume", src, "--export_path", str(out)]
    )
    assert rc == 0
    assert out.exists()
    assert (out.parent / "opt.json").exists()
    assert (out.parent / "model_cfg.py").exists()


def test_export_refuses_mismatched_target_dir(tmp_path):
    """Round-4 review: exporting into a directory whose opt.json records a
    different architecture must refuse BEFORE writing anything (no partial
    clobber of a training run's sidecars)."""
    import json

    import pytest

    from flashvtg_tpu.cli import main as cli_main

    target = tmp_path / "run"
    target.mkdir()
    (target / "opt.json").write_text(json.dumps({"hidden_dim": 128}))
    (target / "model_cfg.py").write_text("# original\n")
    resume = tmp_path / "model.ckpt"  # never loaded: refusal comes first
    resume.write_bytes(b"\0")

    with pytest.raises(SystemExit, match="different architecture"):
        cli_main(
            ["export", "qvhighlights_slowclip", "--hidden_dim", "256",
             "--resume", str(resume),
             "--export_path", str(target / "out.ckpt")]
        )
    assert (target / "model_cfg.py").read_text() == "# original\n"
    assert not (target / "out.ckpt").exists()
