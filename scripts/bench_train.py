"""Train-step throughput on the TPU chip.

Measures steps/sec of the production donated+buffered train step with
synthetic features at reference-scale batch shapes.

    python scripts/bench_train.py            # QVHighlights flagship (B=64)
    python scripts/bench_train.py tacos      # real-shape TACoS: B=32, Lv=2048,
                                             # t2v_layers=8, chunked self-attn
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from flashvtg_tpu.utils.runtime import enable_compilation_cache, setup

setup()
enable_compilation_cache()

import jax
import jax.numpy as jnp

PRESET = sys.argv[1] if len(sys.argv) > 1 else "qvhighlights_slowclip"
if PRESET == "tacos":
    BSZ, LV, LQ = 32, 2048, 40
    V_DIM, T_DIM = 768, 4096
    STEPS = 10
else:
    BSZ, LV, LQ = 64, 75, 32
    V_DIM, T_DIM = 2816, 512
    STEPS = 30
if len(sys.argv) > 2:  # optional batch override: scaling sweeps
    BSZ = int(sys.argv[2])
# scan-chunk sweeps: BENCH_SCAN_K=32 overrides cfg.scan_steps (STEPS grows
# to fit so the chunk is never clamped)
SCAN_K = int(os.environ.get("BENCH_SCAN_K", 0))
if SCAN_K:
    STEPS = max(STEPS, 2 * SCAN_K)
# skip the streamed-features measurement (wire-bound: minutes at large B)
FEED_ONLY = os.environ.get("BENCH_FEED_ONLY", "0") == "1"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from flashvtg_tpu.train.config import from_preset
    from flashvtg_tpu.utils.scanbench import ScanHarness

    cfg = from_preset(PRESET, bsz=BSZ)
    # the fixture + scan accounting are shared with bench.py's driver
    # record (utils/scanbench.py) so the sweep methodology and the record
    # can never de-synchronize
    harness = ScanHarness(cfg, LV, LQ, T_DIM, n_label_batches=4, log=log)
    step, keys = harness.step, harness.keys
    params, opt_state = harness.params, harness.opt_state

    host = np.random.default_rng(0)
    batches = []
    for j in range(4):  # rotate a few host batches like a real epoch
        batches.append({
            "src_txt": host.standard_normal((BSZ, LQ, T_DIM)).astype(np.float32),
            "src_txt_mask": np.ones((BSZ, LQ), np.float32),
            "src_vid": host.standard_normal((BSZ, LV, V_DIM + 2)).astype(np.float32),
            "src_vid_mask": np.ones((BSZ, LV), np.float32),
            **harness.label_batches[j],
        })

    log(f"devices: {jax.devices()}")
    loss_buf = jnp.asarray(np.zeros((STEPS, len(keys)), np.float32))
    r = jax.random.PRNGKey(1)
    # warmup (compile)
    t0 = time.perf_counter()
    params, opt_state, loss_buf = step.epoch_step(
        params, opt_state, loss_buf, jnp.asarray(0, jnp.int32),
        {k: jnp.asarray(v) for k, v in batches[0].items()}, r,
    )
    np.asarray(loss_buf[0])  # fence
    log(f"warmup (incl. compile): {time.perf_counter() - t0:.1f}s")

    sps = None
    if not FEED_ONLY:
        loss_buf = jnp.asarray(np.zeros((STEPS, len(keys)), np.float32))
        t0 = time.perf_counter()
        for i in range(STEPS):
            b = batches[i % len(batches)]
            device_batch = {k: jnp.asarray(v) for k, v in b.items()}
            r, sub = jax.random.split(r)
            params, opt_state, loss_buf = step.epoch_step(
                params, opt_state, loss_buf, jnp.asarray(i, jnp.int32),
                device_batch, sub,
            )
        host_losses = np.asarray(loss_buf)  # the one fetch per "epoch"
        dt = time.perf_counter() - t0
        assert np.isfinite(host_losses).all()
        sps = STEPS / dt
        log(f"streamed: {STEPS} steps in {dt:.3f}s -> {sps:.2f} steps/s "
            f"({sps * BSZ:.0f} samples/s)")

    # --- HBM-resident feed: features live on device, host ships labels
    # (the resident store is the harness's, shared with the scan row) ---
    n_rows, feed = harness.n_rows, harness.feed
    small_keys = ("saliency_all_labels", "saliency_pos_labels",
                  "saliency_neg_labels", "gt_windows", "real_neg_mask")
    loss_buf = jnp.asarray(np.zeros((STEPS, len(keys)), np.float32))
    idx0 = jnp.asarray(np.arange(BSZ, dtype=np.int32))
    small0 = {k: jnp.asarray(batches[0][k]) for k in small_keys}
    t0 = time.perf_counter()
    params, opt_state, loss_buf = step.epoch_step_feed(
        params, opt_state, loss_buf, jnp.asarray(0, jnp.int32),
        small0, idx0, feed, r,
    )
    np.asarray(loss_buf[0])
    log(f"feed warmup (incl. compile): {time.perf_counter() - t0:.1f}s")

    loss_buf = jnp.asarray(np.zeros((STEPS, len(keys)), np.float32))
    t0 = time.perf_counter()
    for i in range(STEPS):
        b = batches[i % len(batches)]
        small = {k: jnp.asarray(b[k]) for k in small_keys}
        idx = jnp.asarray(
            ((np.arange(BSZ) + i * BSZ) % n_rows).astype(np.int32)
        )
        r, sub = jax.random.split(r)
        params, opt_state, loss_buf = step.epoch_step_feed(
            params, opt_state, loss_buf, jnp.asarray(i, jnp.int32),
            small, idx, feed, sub,
        )
    host_losses = np.asarray(loss_buf)
    dtf = time.perf_counter() - t0
    assert np.isfinite(host_losses).all()
    spsf = STEPS / dtf
    log(f"device-feed: {STEPS} steps in {dtf:.3f}s -> {spsf:.2f} steps/s "
        f"({spsf * BSZ:.0f} samples/s)")

    # --- scan epoch (production default, train/loop.py epoch_scan_feed):
    # K steps fused into ONE dispatch, amortizing the per-step dispatch +
    # transfer latency of the host<->TPU link. Measurement = the shared
    # utils/scanbench harness (identical accounting to bench.py's driver
    # record) ---
    K = max(2, min(SCAN_K or cfg.scan_steps, STEPS))
    harness.params, harness.opt_state = params, opt_state
    spss, _ = harness.time_scan(K, STEPS)

    # model-FLOPs utilization of the best path (scan epoch): analytic
    # fwd+bwd FLOPs per step vs the v5e MXU peak and the MEASURED train
    # skeleton ceiling (utils/flops.py; scripts/bench_matmul_ceiling.py)
    from flashvtg_tpu.utils.flops import (
        MEASURED_TRAIN_SKELETON_TFLOPS,
        mfu as mfu_of,
        model_flops,
    )

    step_flops = model_flops(
        cfg.model_config(), BSZ, LQ, LV, train=True
    )["fwd_bwd"]
    util = mfu_of(
        step_flops * spss, 1.0, cfg.train_precision,
        ceilings=MEASURED_TRAIN_SKELETON_TFLOPS,
    )
    log(f"scan epoch utilization: {step_flops / 1e9:.1f} GF/step -> "
        f"{util['achieved_tflops']:.1f} TF/s, MFU {util['mfu']:.3f} vs bf16 "
        f"peak, {util['mfu_effective']:.3f} vs the {cfg.train_precision} "
        f"measured train-skeleton ceiling")

    out = {
        "preset": PRESET,
        "batch": BSZ,
        "step_gflops_fwd_bwd": round(step_flops / 1e9, 1),
        "achieved_tflops_scan": round(util["achieved_tflops"], 2),
        "mfu_scan": round(util["mfu"], 4),
        "mfu_effective_scan": round(util["mfu_effective"], 4),
        "train_steps_per_sec_feed": round(spsf, 2),
        "samples_per_sec_feed": round(spsf * BSZ, 1),
        "train_steps_per_sec_scan": round(spss, 2),
        "samples_per_sec_scan": round(spss * BSZ, 1),
        "scan_speedup_vs_per_step_feed": round(spss / spsf, 2),
    }
    if sps is not None:
        out["train_steps_per_sec_streamed"] = round(sps, 2)
        out["feed_speedup"] = round(spsf / sps, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
