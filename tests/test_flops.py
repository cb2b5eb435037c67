"""Pin utils/flops.py analytic FLOP counts against XLA's cost analysis.

The analytic counter covers matmul/conv FLOPs only; XLA's
`compiled.cost_analysis()["flops"]` additionally counts elementwise,
softmax and norm work, so the XLA number must sit slightly ABOVE the
analytic one — a bounded-band assertion catches drift in either direction
(a forgotten matmul makes analytic too low by >x1.5; counting a dead branch
makes it exceed XLA).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flashvtg_tpu.models.flashvtg import FlashVTGModel, ModelConfig
from flashvtg_tpu.utils.flops import (
    MEASURED_SKELETON_TFLOPS,
    MXU_PASSES,
    V5E_PEAK_BF16_TFLOPS,
    mfu,
    model_flops,
    pyramid_lengths,
)

B, LQ, LV = 4, 12, 40
CFG = ModelConfig(
    vid_dim=66,
    txt_dim=48,
    hidden_dim=128,
    nheads=4,
    enc_layers=2,
    t2v_layers=2,
    dummy_layers=1,
    num_dummies=6,
    dim_feedforward=256,
    num_conv_layers=2,
    num_mlp_layers=3,
)


def _xla_flops(fn, *args, **kwargs):
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):  # older jax returns [dict]
        cost = cost[0]
    return float(cost["flops"])


def _inputs():
    r = np.random.default_rng(0)
    return (
        jnp.asarray(r.standard_normal((B, LQ, CFG.txt_dim), np.float32)),
        jnp.ones((B, LQ), jnp.float32),
        jnp.asarray(r.standard_normal((B, LV, CFG.vid_dim), np.float32)),
        jnp.ones((B, LV), jnp.float32),
    )


@pytest.fixture(scope="module")
def params():
    model = FlashVTGModel(CFG)
    txt, tm, vid, vm = _inputs()
    return model, jax.jit(model.init, static_argnames="train")(
        {"params": jax.random.PRNGKey(0)}, txt, tm, vid, vm, train=False
    ), (txt, tm, vid, vm)


def test_pyramid_lengths_match_model():
    # floor halving per stride octave, levels beyond Lv dropped
    assert pyramid_lengths(40, (1, 2, 4, 8)) == [40, 20, 10, 5]
    assert pyramid_lengths(3, (1, 2, 4, 8)) == [3, 1]


def test_eval_forward_flops_vs_xla(params):
    model, p, (txt, tm, vid, vm) = params

    def fwd(p, txt, tm, vid, vm):
        out = model.apply(p, txt, tm, vid, vm, train=False)
        return out["out_class"], out["out_coord"], out["saliency_scores"]

    xla = _xla_flops(fwd, p, txt, tm, vid, vm)
    analytic = model_flops(CFG, B, LQ, LV, train=False)["fwd"]
    # XLA counts the extra elementwise work: analytic <= xla <= 1.5x
    assert analytic <= xla <= 1.5 * analytic, (analytic, xla)
    # and the bulk of the program is matmuls: analytic covers >=75%
    assert analytic / xla >= 0.75, (analytic, xla)


def test_train_fwd_bwd_flops_vs_xla(params):
    model, p, (txt, tm, vid, vm) = params
    rngs = {"dropout": jax.random.PRNGKey(1)}

    def loss(p, txt, tm, vid, vm):
        out = model.apply(p, txt, tm, vid, vm, train=True, rngs=rngs)
        return (
            out["out_class"].sum()
            + out["out_coord"].sum()
            + out["saliency_scores"].sum()
            + out["saliency_scores_neg"].sum()
        )

    xla = _xla_flops(jax.grad(loss), p, txt, tm, vid, vm)
    est = model_flops(CFG, B, LQ, LV, train=True)
    analytic = est["fwd_bwd"]
    assert analytic is not None
    # backward's rematerialization/elementwise overhead widens the band a bit
    assert 0.70 * analytic <= xla <= 1.6 * analytic, (analytic, xla)
    # train fwd includes the negative trunk pass
    assert est["fwd"] > model_flops(CFG, B, LQ, LV, train=False)["fwd"] * 1.4


def test_mfu_arithmetic():
    out = mfu(flops=197e12, seconds=1.0, precision="float32")
    assert out["achieved_tflops"] == pytest.approx(197.0)
    assert out["mfu"] == pytest.approx(1.0)
    # mfu_effective divides by the MEASURED matmul-skeleton ceiling of the
    # mode (scripts/bench_matmul_ceiling.py, docs/KERNELS.md roofline)
    assert out["mfu_effective"] == pytest.approx(
        197.0 / MEASURED_SKELETON_TFLOPS["float32"]
    )
    assert V5E_PEAK_BF16_TFLOPS == 197.0
    # the measured ceilings must stay physical: above the per-pass floor
    # the MXU guarantees for big square matmuls would be nonsense to beat,
    # below the hardware peak; and monotone in precision
    for prec in MXU_PASSES:
        assert 0 < MEASURED_SKELETON_TFLOPS[prec] <= V5E_PEAK_BF16_TFLOPS
    assert (
        MEASURED_SKELETON_TFLOPS["float32"]
        < MEASURED_SKELETON_TFLOPS["tensorfloat32"]
        < MEASURED_SKELETON_TFLOPS["bfloat16"]
    )


def test_bench_shapes_headline_flops():
    """The flagship bench config's per-query FLOPs — the number KERNELS.md's
    roofline section quotes; pinned so doc and code cannot drift apart."""
    from flashvtg_tpu.train.config import from_preset

    cfg = from_preset("qvhighlights_slowclip").model_config()
    est = model_flops(cfg, batch=1, lq=32, lv=75, train=False)
    # ~0.9 GFLOP/query forward at Lv=75, Lq=32 (see docs/KERNELS.md roofline)
    assert 0.3e9 < est["fwd"] < 3e9, est["fwd"]
