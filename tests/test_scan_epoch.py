"""Scan-epoch fast path: K train steps fused into ONE dispatch.

train/loop.py epoch_scan_feed runs scan_steps train steps per device
dispatch (lax.scan over stacked labels / feed indices / dropout keys) to
amortize the host<->TPU dispatch+transfer latency that dominates wall clock
at short-video shapes (docs/KERNELS.md train-step profile: 21.5 ms device
vs ~46 ms wall per step at the flagship config). These tests pin that the
fused path is the SAME training run as the per-step feed path: identical
dropout-key chain, and matching parameters/score through the production
train(), single-device and data-parallel.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flashvtg_tpu.parallel.mesh import make_mesh
from flashvtg_tpu.train.loop import _key_chain, train
from flashvtg_tpu.utils.synthetic import make_synthetic_qvh


def test_key_chain_matches_host_split_loop():
    """_key_chain(rng, k) == k sequential host-side jax.random.split calls
    (same unpack order), so the scan path consumes the exact dropout-key
    stream the per-step loop would."""
    rng = jax.random.PRNGKey(7)
    r, subs = _key_chain(rng, 5)
    r2 = jax.random.PRNGKey(7)
    expect = []
    for _ in range(5):
        r2, sub = jax.random.split(r2)
        expect.append(sub)
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(r)),
        np.asarray(jax.random.key_data(r2)),
    )
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(subs)),
        np.asarray(jax.random.key_data(jnp.stack(expect))),
    )


def _cfg(ann, vdir, qdir, results_root, **over):
    from flashvtg_tpu.train.config import from_preset

    return from_preset(
        "qvhighlights_slowclip",
        v_feat_dim=32, t_feat_dim=24, max_v_l=16, max_q_l=12,
        hidden_dim=32, dim_feedforward=64, t2v_layers=1, enc_layers=1,
        dummy_layers=1, num_dummies=2, num_mlp_layers=2, num_conv_layers=1,
        bsz=8, eval_bsz=16, n_epoch=2, eval_epoch=1, nms_thd=-1.0,
        use_neg=True, train_precision="float32", eval_precision="float32",
        train_path=ann, eval_path=ann, v_feat_dirs=(vdir,), t_feat_dir=qdir,
        results_root=results_root, use_tensorboard=False, device_feed="on",
        **over,
    )


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("scan_epoch")
    ann, vdir, qdir = make_synthetic_qvh(
        str(tmp), n_queries=64, v_dim=32, t_dim=24, n_clips=16
    )
    return tmp, ann, vdir, qdir


@pytest.mark.slow
def test_scan_epoch_matches_per_step(synth):
    """train() with scan_steps=3 (8 steps/epoch -> chunks of 3+3+2, so the
    tail-chunk compile path runs too) reproduces scan_steps=0 up to
    compilation-schedule noise (measured: step losses bit-exact or 1 ulp —
    3.8e-6 on ~35-valued losses — compounding to ~1.6e-5 in params after
    2 epochs; a data/key-stream mismatch would already diverge at step 0)."""
    tmp, ann, vdir, qdir = synth
    cfg0 = _cfg(ann, vdir, qdir, str(tmp / "r0"), scan_steps=0)
    cfg3 = _cfg(ann, vdir, qdir, str(tmp / "r3"), scan_steps=3)
    mesh1 = make_mesh(jax.devices()[:1], data=1, model=1)
    p0, s0, _ = train(cfg0, results_dir=str(tmp / "run0"), mesh=mesh1)
    p3, s3, _ = train(cfg3, results_dir=str(tmp / "run3"), mesh=mesh1)
    np.testing.assert_allclose(s0, s3, rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p3)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-5
        )


@pytest.mark.slow
def test_scan_epoch_data_parallel(synth):
    """The scan path composes with the data mesh: stacked (K, B, ...)
    chunks sharded on axis 1 over 8 devices reproduce the 1-device
    per-step run within the cross-device reduction tolerances that
    test_multichip uses for the per-step path."""
    tmp, ann, vdir, qdir = synth
    assert len(jax.devices()) == 8, "conftest should give 8 virtual devices"
    cfg0 = _cfg(ann, vdir, qdir, str(tmp / "d0"), scan_steps=0)
    cfg3 = _cfg(ann, vdir, qdir, str(tmp / "d3"), scan_steps=3)
    mesh1 = make_mesh(jax.devices()[:1], data=1, model=1)
    mesh8 = make_mesh(jax.devices()[:8], data=8, model=1)
    p0, s0, _ = train(cfg0, results_dir=str(tmp / "dp_run0"), mesh=mesh1)
    p3, s3, _ = train(cfg3, results_dir=str(tmp / "dp_run3"), mesh=mesh8)
    np.testing.assert_allclose(s0, s3, rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p3)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )
