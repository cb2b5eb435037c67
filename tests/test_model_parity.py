"""Full-model forward parity vs the reference torch implementation.

Builds the reference FlashVTG (via the nncore stub), converts its random-init
weights with the checkpoint importer, and compares every eval-path output of
our jitted forward + decode against the torch model at float32 tolerance.
This is the strongest available stand-in for released-checkpoint parity.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from flashvtg_tpu.models import FlashVTGModel, ModelConfig
from flashvtg_tpu.models.flashvtg import decode_boundaries
from flashvtg_tpu.models.points import pyramid_masks_strict
from flashvtg_tpu.utils.torch_convert import convert_checkpoint
from tests.reference_oracle import build_reference_model, make_args

V_DIM, T_DIM = 100, 64  # small feature dims keep the test fast
LV, LQ = 75, 20


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    args = make_args(v_feat_dim=V_DIM, t_feat_dim=T_DIM)
    ref = build_reference_model(args)

    cfg = ModelConfig(
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
        use_neg=False,
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_checkpoint(sd, cfg)
    model = FlashVTGModel(cfg)
    return ref, model, params, args


def _inputs(rng, lv_valid=LV, lq_valid=LQ):
    src_txt = rng.standard_normal((1, LQ, T_DIM), dtype=np.float32)
    src_vid = rng.standard_normal((1, LV, V_DIM), dtype=np.float32)
    txt_mask = np.zeros((1, LQ), np.float32)
    txt_mask[:, :lq_valid] = 1
    vid_mask = np.zeros((1, LV), np.float32)
    vid_mask[:, :lv_valid] = 1
    return src_txt, txt_mask, src_vid, vid_mask


@pytest.mark.parametrize("lv_valid,lq_valid", [(LV, LQ), (60, 13)])
def test_eval_forward_parity(pair, lv_valid, lq_valid):
    ref, model, params, args = pair
    rng = np.random.default_rng(42)
    src_txt, txt_mask, src_vid, vid_mask = _inputs(rng, lv_valid, lq_valid)

    # capture per-point head outputs from the reference
    cap = {"class": [], "coord": []}
    handles = [
        ref.class_head.register_forward_hook(
            lambda m, i, o: cap["class"].append(o.detach())
        ),
        ref.conf_head.register_forward_hook(
            lambda m, i, o: cap.__setitem__("conf", o.detach())
        ),
        ref.coord_head.register_forward_hook(
            lambda m, i, o: cap["coord"].append(o.detach())
        ),
    ]
    # reference runs on the *unpadded* lengths (bsz=1 eval semantics)
    t_txt = torch.from_numpy(src_txt[:, :lq_valid])
    t_vid = torch.from_numpy(src_vid[:, :lv_valid])
    t_tm = torch.ones(1, lq_valid)
    t_vm = torch.ones(1, lv_valid)
    with torch.no_grad():
        out_ref = ref(t_txt, t_tm, t_vid, t_vm, ["vid_a_1.0_2.0"], [1], targets={})
    for h in handles:
        h.remove()

    strict_mask, counts = pyramid_masks_strict(
        np.asarray([lv_valid]), LV, model.cfg.strides
    )
    out = model.apply(
        params,
        jnp.asarray(src_txt),
        jnp.asarray(txt_mask),
        jnp.asarray(src_vid),
        jnp.asarray(vid_mask),
        point_valid=jnp.asarray(strict_mask),
        train=False,
    )

    # saliency over valid clips
    np.testing.assert_allclose(
        np.asarray(out["saliency_scores"])[0, :lv_valid],
        out_ref["saliency_scores"].numpy()[0],
        atol=2e-4,
    )
    # t2v attention channel
    np.testing.assert_allclose(
        np.asarray(out["t2vattnvalues"])[0, :lv_valid],
        out_ref["t2vattnvalues"].numpy()[0],
        atol=2e-4,
    )

    # per-point blended logits and coords, mapped level-by-level between the
    # reference's compact concat and our padded concat. conf_head's conv
    # windows cross level boundaries; the model compacts valid rows before
    # that conv (models/flashvtg.py), so every strictly-valid position —
    # including the kernel//2 level-boundary rows round 2 excluded — must
    # now match the reference bit-tight.
    from flashvtg_tpu.models.points import pyramid_level_sizes

    static_sizes = pyramid_level_sizes(LV, model.cfg.strides)
    valid_sizes = pyramid_level_sizes(lv_valid, model.cfg.strides)
    x = float(ref.x.detach())
    ref_class = torch.cat(cap["class"], dim=1)
    ref_logits = (x * ref_class + (1 - x) * cap["conf"]).numpy()[0, :, 0]
    ref_coords = np.concatenate(
        [
            np.exp(c.numpy()) * ref.coef[i].detach().numpy()
            for i, c in enumerate(cap["coord"])
        ],
        axis=1,
    )[0]
    my_logits = np.asarray(out["out_class"])[0, :, 0]
    my_coords = np.asarray(out["out_coord"])[0]

    aligned = lv_valid == LV
    ref_off = my_off = 0
    for vs, ss in zip(valid_sizes, static_sizes):
        sl_ref = slice(ref_off, ref_off + vs)
        sl_my = slice(my_off, my_off + vs)
        np.testing.assert_allclose(
            my_logits[sl_my], ref_logits[sl_ref], atol=3e-4
        )
        np.testing.assert_allclose(
            my_coords[my_off : my_off + vs],
            ref_coords[ref_off : ref_off + vs],
            atol=3e-4,
        )
        ref_off += vs
        my_off += ss

    if aligned:
        # exact candidate set + ranking parity of the decoded boundaries
        spans, scores = decode_boundaries(
            out["out_class"],
            out["out_coord"],
            out["point"],
            model.cfg.clip_length,
            point_valid=jnp.asarray(strict_mask),
            top_k=50,
        )
        n = min(50, int(counts[0]))
        boundary_ref = out_ref["_out"]["boundary"].numpy()  # (<=50, 3)
        assert boundary_ref.shape[0] == n
        got = np.concatenate(
            [np.asarray(spans)[0, :n], np.asarray(scores)[0, :n, None]], axis=-1
        )
        np.testing.assert_allclose(got[:, 2], boundary_ref[:, 2], atol=2e-4)
        np.testing.assert_allclose(
            np.sort(got[:, 0]), np.sort(boundary_ref[:, 0]), atol=2e-3
        )
        np.testing.assert_allclose(
            np.sort(got[:, 1]), np.sort(boundary_ref[:, 1]), atol=2e-3
        )


def test_train_outputs_finite(pair):
    _, model, params, _ = pair
    rng = np.random.default_rng(7)
    src_txt, txt_mask, src_vid, vid_mask = _inputs(rng)
    cfg = model.cfg
    model_neg = FlashVTGModel(
        ModelConfig(**{**cfg.__dict__, "use_neg": True})
    )
    out = model_neg.apply(
        params,
        jnp.asarray(np.tile(src_txt, (4, 1, 1))),
        jnp.asarray(np.tile(txt_mask, (4, 1))),
        jnp.asarray(np.tile(src_vid, (4, 1, 1))),
        jnp.asarray(np.tile(vid_mask, (4, 1))),
        jnp.ones((4,)),
        train=True,
        rngs={"dropout": jax.random.PRNGKey(0)},
    )
    for key in ("saliency_scores", "out_class", "out_coord", "saliency_scores_neg"):
        assert np.isfinite(np.asarray(out[key])).all(), key


def test_use_txt_pos_parity():
    """Learned text-PE path (--use_txt_pos, model.py:155)."""
    torch.manual_seed(1)
    args = make_args(
        v_feat_dim=V_DIM, t_feat_dim=T_DIM, use_txt_pos=True, max_q_l=LQ
    )
    ref = build_reference_model(args)
    cfg = ModelConfig(
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
        use_neg=False,
        use_txt_pos=True,
        max_q_l=LQ,
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_checkpoint(sd, cfg)
    model = FlashVTGModel(cfg)

    rng = np.random.default_rng(11)
    src_txt, txt_mask, src_vid, vid_mask = _inputs(rng)
    with torch.no_grad():
        out_ref = ref(
            torch.from_numpy(src_txt), torch.ones(1, LQ),
            torch.from_numpy(src_vid), torch.ones(1, LV),
            ["vid_a_1.0_2.0"], [1], targets={},
        )
    out = model.apply(
        params,
        jnp.asarray(src_txt), jnp.asarray(txt_mask),
        jnp.asarray(src_vid), jnp.asarray(vid_mask),
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(out["saliency_scores"])[0],
        out_ref["saliency_scores"].numpy()[0],
        atol=3e-4,
    )


def test_eval_forward_parity_length_fuzz(pair):
    """Compaction fuzz: the cumsum-built valid-first permutation in front of
    the conf head (models/flashvtg.py) must reproduce the reference's
    compact pyramid concat for ANY valid length, including lengths that
    skip pyramid levels entirely (reference blocks.py:56-57) and lengths
    around conv kernel//2 level boundaries. Same oracle machinery as
    test_eval_forward_parity, logits/coords only, many (lv, lq) combos on
    one compiled program (masks change, shapes don't)."""
    ref, model, params, args = pair
    from flashvtg_tpu.models.points import pyramid_level_sizes

    static_sizes = pyramid_level_sizes(LV, model.cfg.strides)
    x = float(ref.x.detach())
    rng = np.random.default_rng(7)
    for lv_valid, lq_valid in [
        (1, 1), (2, 3), (3, LQ), (5, 5), (8, 2), (13, 9), (21, LQ),
        (47, 4), (74, 11),
    ]:
        cap = {"class": [], "coord": []}
        handles = [
            ref.class_head.register_forward_hook(
                lambda m, i, o: cap["class"].append(o.detach())
            ),
            ref.conf_head.register_forward_hook(
                lambda m, i, o: cap.__setitem__("conf", o.detach())
            ),
            ref.coord_head.register_forward_hook(
                lambda m, i, o: cap["coord"].append(o.detach())
            ),
        ]
        src_txt, txt_mask, src_vid, vid_mask = _inputs(rng, lv_valid, lq_valid)
        with torch.no_grad():
            out_ref = ref(
                torch.from_numpy(src_txt[:, :lq_valid]),
                torch.ones(1, lq_valid),
                torch.from_numpy(src_vid[:, :lv_valid]),
                torch.ones(1, lv_valid),
                ["vid_a_1.0_2.0"], [1], targets={},
            )
        for h in handles:
            h.remove()

        strict_mask, _ = pyramid_masks_strict(
            np.asarray([lv_valid]), LV, model.cfg.strides
        )
        out = model.apply(
            params, jnp.asarray(src_txt), jnp.asarray(txt_mask),
            jnp.asarray(src_vid), jnp.asarray(vid_mask),
            point_valid=jnp.asarray(strict_mask), train=False,
        )
        valid_sizes = pyramid_level_sizes(lv_valid, model.cfg.strides)
        ref_class = torch.cat(cap["class"], dim=1)
        ref_logits = (x * ref_class + (1 - x) * cap["conf"]).numpy()[0, :, 0]
        ref_coords = np.concatenate(
            [
                np.exp(c.numpy()) * ref.coef[i].detach().numpy()
                for i, c in enumerate(cap["coord"])
            ],
            axis=1,
        )[0]
        my_logits = np.asarray(out["out_class"])[0, :, 0]
        my_coords = np.asarray(out["out_coord"])[0]
        ref_off = my_off = 0
        for vs, ss in zip(valid_sizes, static_sizes):
            np.testing.assert_allclose(
                my_logits[my_off : my_off + vs],
                ref_logits[ref_off : ref_off + vs],
                atol=3e-4, err_msg=f"lv={lv_valid} lq={lq_valid}",
            )
            np.testing.assert_allclose(
                my_coords[my_off : my_off + vs],
                ref_coords[ref_off : ref_off + vs],
                atol=3e-4, err_msg=f"lv={lv_valid} lq={lq_valid}",
            )
            ref_off += vs
            my_off += ss
