"""Shared synthetic scan-epoch measurement harness.

`bench.py` (the driver record's `train_steps_per_sec`) and
`scripts/bench_train.py` (the K-sweep / KERNELS.md methodology) must
measure the SAME thing — the production `epoch_scan_feed` with
HBM-resident features and in-loop label+index-stack uploads. This module
is that single accounting (round-5 review: two hand-kept copies of the
harness would silently de-synchronize the driver record from the
documented sweep).

The harness builds the production train step via
`cfg.resolved_dropout_rng_impl()` (train/config.py), an HBM feed of
synthetic features at the given shapes, and per-batch label dicts;
`time_scan` runs one warmup dispatch then fused K-step dispatches,
fenced by the single per-epoch loss fetch, and returns steps/s.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional

import numpy as np


def _noop(*a):  # pragma: no cover - default sink
    pass


class ScanHarness:
    """Production scan-epoch fixture at synthetic shapes (see module doc).

    Attributes exposed for callers that also measure the per-step paths
    with the same objects: step, params, opt_state, keys, feed, n_rows,
    label_batches, cfg, and the shape tuple (bsz, lv, lq).
    """

    def __init__(
        self,
        cfg,
        lv: int,
        lq: int,
        t_dim: int,
        *,
        n_feed_batches: int = 4,
        n_label_batches: int = 1,
        seed: int = 0,
        log: Optional[Callable] = None,
    ):
        import jax
        import jax.numpy as jnp

        from flashvtg_tpu.train.loop import make_optimizer, make_train_step

        self.log = log or _noop
        self.cfg = cfg
        self.bsz, self.lv, self.lq = cfg.bsz, lv, lq
        v_total = cfg.total_v_feat_dim
        model = cfg.build_model()
        rng = jax.random.PRNGKey(0)
        self.params = jax.jit(model.init, static_argnames="train")(
            {"params": rng, "dropout": rng},
            jnp.zeros((1, lq, t_dim)), jnp.ones((1, lq)),
            jnp.zeros((1, lv, v_total)), jnp.ones((1, lv)),
            train=False,
        )
        tx, _ = make_optimizer(cfg, steps_per_epoch=100)
        self.opt_state = tx.init(self.params)
        self.step = make_train_step(
            model, cfg.loss_config(), tx, cfg.train_precision,
            dropout_rng_impl=cfg.resolved_dropout_rng_impl(),
        )
        self.keys = self.step.loss_keys

        host = np.random.default_rng(seed)
        bsz = self.bsz
        self.n_rows = n_feed_batches * bsz
        self._t_dim, self._v_total = t_dim, v_total
        self._feed_rng = np.random.default_rng(seed)
        self._feed = None  # lazy: see the `feed` property
        self.label_batches: List[Dict[str, np.ndarray]] = [
            {
                "saliency_all_labels": host.integers(0, 4, (bsz, lv)).astype(
                    np.float32
                ),
                "saliency_pos_labels": host.integers(0, lv, (bsz, 2)),
                "saliency_neg_labels": host.integers(0, lv, (bsz, 2)),
                "gt_windows": np.tile(
                    np.asarray([[[2.0, 10.0]]], np.float32), (bsz, 1, 1)
                ),
                "real_neg_mask": np.ones((bsz,), np.float32),
            }
            for _ in range(n_label_batches)
        ]

    @property
    def feed(self) -> Dict[str, object]:
        """HBM-resident synthetic feature feed (n_rows rows), allocated on
        FIRST ACCESS rather than at construction: callers that run other
        measurements before the feed path (scripts/bench_train.py's
        streamed section) must not carry ~0.9 GB of extra HBM residency
        through them on memory-tight presets (TACoS, round-5 review)."""
        if self._feed is None:
            import jax

            host, lv, lq = self._feed_rng, self.lv, self.lq
            self._feed = {
                "src_txt": jax.device_put(
                    host.standard_normal((self.n_rows, lq, self._t_dim))
                    .astype(np.float32)
                ),
                "src_txt_mask": jax.device_put(
                    np.ones((self.n_rows, lq), np.float32)
                ),
                "src_vid": jax.device_put(
                    host.standard_normal((self.n_rows, lv, self._v_total))
                    .astype(np.float32)
                ),
                "src_vid_mask": jax.device_put(
                    np.ones((self.n_rows, lv), np.float32)
                ),
            }
        return self._feed

    def stacks(self, k: int):
        """Host-side label/index stacks for one K-step dispatch (the
        per-dispatch device UPLOAD of these happens inside time_scan's
        timed loop — that ~200 KB H2D transfer is part of the cost)."""
        lb = self.label_batches
        host_stack = {
            key: np.stack([lb[j % len(lb)][key] for j in range(k)])
            for key in lb[0]
        }
        idx_stack = (
            np.arange(k * self.bsz).reshape(k, self.bsz) % self.n_rows
        ).astype(np.int32)
        return host_stack, idx_stack

    def time_scan(self, k: int, steps: int):
        """One warmup dispatch (compile), then fused K-step dispatches
        until `steps` are done; the single loss-buffer fetch per epoch is
        the fence. Returns (steps_per_sec, warmup_s)."""
        import jax
        import jax.numpy as jnp

        from flashvtg_tpu.train.loop import _key_chain

        host_stack, idx_stack = self.stacks(k)
        r = jax.random.PRNGKey(1)
        params, opt_state = self.params, self.opt_state
        loss_buf = jnp.asarray(np.zeros((steps, len(self.keys)), np.float32))
        r, subs = _key_chain(r, k)
        t0 = time.perf_counter()
        params, opt_state, loss_buf = self.step.epoch_scan_feed(
            params, opt_state, loss_buf, jnp.asarray(0, jnp.int32),
            {k_: jnp.asarray(v) for k_, v in host_stack.items()},
            jnp.asarray(idx_stack), self.feed, subs,
        )
        np.asarray(loss_buf[0])  # fence
        warm = time.perf_counter() - t0
        self.log(f"scan warmup (incl. compile): {warm:.1f}s")

        # the numpy stacks are built once (host prep is the collation
        # worker's job in production); the per-dispatch jnp.asarray upload
        # stays inside the timed loop — that H2D transfer IS part of the
        # production put_chunk cost
        loss_buf = jnp.asarray(np.zeros((steps, len(self.keys)), np.float32))
        t0 = time.perf_counter()
        done = 0
        while done + k <= steps:
            r, subs = _key_chain(r, k)
            params, opt_state, loss_buf = self.step.epoch_scan_feed(
                params, opt_state, loss_buf, jnp.asarray(done, jnp.int32),
                {k_: jnp.asarray(v) for k_, v in host_stack.items()},
                jnp.asarray(idx_stack), self.feed, subs,
            )
            done += k
        host_losses = np.asarray(loss_buf)[:done]
        dt = time.perf_counter() - t0
        assert np.isfinite(host_losses).all(), "non-finite train losses"
        # donated buffers: keep the advanced state so repeated time_scan
        # calls keep training the same params rather than reusing donated
        # (now invalid) originals
        self.params, self.opt_state = params, opt_state
        sps = done / dt
        self.log(
            f"scan epoch (B={self.bsz}, K={k}): {done} steps in {dt:.3f}s "
            f"-> {sps:.2f} steps/s ({sps * self.bsz:.0f} samples/s)"
        )
        return sps, warm
