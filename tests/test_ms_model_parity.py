"""FlashVTG_ms forward parity vs the reference torch implementation."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from flashvtg_tpu.models.flashvtg_ms import (
    FlashVTGMSModel,
    MSModelConfig,
    decode_boundaries_dfl,
)
from flashvtg_tpu.models.flashvtg import decode_boundaries
from flashvtg_tpu.models.points import pyramid_masks_strict
from flashvtg_tpu.utils.torch_convert import convert_checkpoint_ms
from tests.reference_oracle import install_nncore_stub, make_args

V_DIM, T_DIM = 64, 48
LV, LQ = 40, 12


def build_reference_ms(args, strides=(1,), buffer_size=2048):
    install_nncore_stub()
    from FlashVTG_ms.model import FlashVTG_ms as RefMS
    from FlashVTG_ms.position_encoding import build_position_encoding
    from FlashVTG_ms.transformer import build_transformer

    transformer = build_transformer(args)
    pos_embed, txt_pos_embed = build_position_encoding(args)
    model = RefMS(
        transformer,
        pos_embed,
        txt_pos_embed,
        n_input_proj=args.n_input_proj,
        input_dropout=args.input_dropout,
        txt_dim=args.t_feat_dim,
        vid_dim=args.v_feat_dim,
        strides=strides,
        buffer_size=buffer_size,
        max_num_moment=50,
        pyramid_cfg=dict(type="ConvPyramid"),
        pooling_cfg=dict(type="AdaPooling"),
        coord_head_cfg=dict(type="ConvHead", kernal_size=3),
        args=args,
    )
    model.eval()
    return model


@pytest.mark.parametrize("use_dfl", [False, True])
def test_ms_eval_forward_parity(use_dfl):
    torch.manual_seed(0)
    strides = (1, 2)
    args = make_args(
        v_feat_dim=V_DIM,
        t_feat_dim=T_DIM,
        num_dummies=3,
        dummy_layers=1,
        t2v_layers=2,
        enc_layers=1,
        num_conv_layers=2,
        num_mlp_layers=3,
        kernel_size=5,
        num_phrase=3,
        phrase_layers=2,
        context_layers=2,
        use_dfl=use_dfl,
        num_bins=8,
        rank=4,
        t_sa=2,
        sample_radius=1.5,
        use_neg=False,
        dset_name="tvsum",
        clip_length=2.0,
    )
    ref = build_reference_ms(args, strides=strides)

    cfg = MSModelConfig(
        vid_dim=V_DIM,
        txt_dim=T_DIM,
        num_dummies=args.num_dummies,
        dummy_layers=args.dummy_layers,
        t2v_layers=args.t2v_layers,
        enc_layers=args.enc_layers,
        kernel_size=args.kernel_size,
        num_conv_layers=args.num_conv_layers,
        num_mlp_layers=args.num_mlp_layers,
        clip_length=args.clip_length,
        strides=strides,
        use_neg=False,
        num_phrase=args.num_phrase,
        phrase_layers=args.phrase_layers,
        context_layers=args.context_layers,
        use_dfl=use_dfl,
        num_bins=args.num_bins,
        rank=args.rank,
        t_sa_layers=args.t_sa,
        sample_radius=args.sample_radius,
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_checkpoint_ms(sd, cfg)
    model = FlashVTGMSModel(cfg)

    rng = np.random.default_rng(3)
    src_txt = rng.standard_normal((1, LQ, T_DIM), dtype=np.float32)
    src_vid = rng.standard_normal((1, LV, V_DIM), dtype=np.float32)
    with torch.no_grad():
        out_ref = ref(
            torch.from_numpy(src_txt),
            torch.ones(1, LQ),
            torch.from_numpy(src_vid),
            torch.ones(1, LV),
            ["vid_x"],
            [0],
            targets={},
        )

    strict, counts = pyramid_masks_strict(np.asarray([LV]), LV, strides)
    out = model.apply(
        params,
        jnp.asarray(src_txt),
        jnp.ones((1, LQ)),
        jnp.asarray(src_vid),
        jnp.ones((1, LV)),
        point_valid=jnp.asarray(strict),
        train=False,
    )

    np.testing.assert_allclose(
        np.asarray(out["saliency_scores"])[0],
        out_ref["saliency_scores"].numpy()[0],
        atol=3e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["t2vattnvalues"])[0],
        out_ref["t2vattnvalues"].numpy()[0],
        atol=3e-4,
    )

    if use_dfl:
        spans, scores = decode_boundaries_dfl(
            out["out_class"], out["out_coord"], out["point"],
            cfg.clip_length, cfg.num_bins, cfg.sample_radius,
            point_valid=jnp.asarray(strict), top_k=50,
        )
    else:
        spans, scores = decode_boundaries(
            out["out_class"], out["out_coord"], out["point"],
            cfg.clip_length, point_valid=jnp.asarray(strict), top_k=50,
        )
    n = min(50, int(counts[0]))
    boundary_ref = out_ref["_out"]["boundary"].numpy()
    assert boundary_ref.shape[0] == n
    np.testing.assert_allclose(
        np.asarray(scores)[0, :n], boundary_ref[:, 2], atol=3e-4
    )
    np.testing.assert_allclose(
        np.sort(np.asarray(spans)[0, :n, 0]),
        np.sort(boundary_ref[:, 0]),
        atol=3e-3,
    )


def test_ms_train_outputs(tmp_path):
    cfg = MSModelConfig(
        vid_dim=V_DIM, txt_dim=T_DIM, num_dummies=2, dummy_layers=1,
        t2v_layers=1, enc_layers=1, num_conv_layers=1, num_mlp_layers=2,
        strides=(1,), use_neg=True, num_phrase=2, phrase_layers=1,
        context_layers=1, rank=2, t_sa_layers=1,
    )
    model = FlashVTGMSModel(cfg)
    rng = jax.random.PRNGKey(0)
    b = 4
    st = jax.random.normal(rng, (b, LQ, T_DIM))
    sv = jax.random.normal(rng, (b, LV, V_DIM))
    params = model.init(
        {"params": rng, "dropout": rng},
        st, jnp.ones((b, LQ)), sv, jnp.ones((b, LV)), train=False,
    )
    out = model.apply(
        params, st, jnp.ones((b, LQ)), sv, jnp.ones((b, LV)),
        jnp.ones((b,)), train=True, rngs={"dropout": rng},
    )
    for k in ("saliency_scores", "saliency_scores_neg", "sim_score",
              "slot_att", "out_class", "out_coord"):
        assert np.isfinite(np.asarray(out[k])).all(), k
