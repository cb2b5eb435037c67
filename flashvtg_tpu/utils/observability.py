"""Observability: scalar logging, profiling traces, numerics guards.

Reference counterparts (SURVEY.md §5): tensorboard SummaryWriter per-step
scalars (train.py:84-91), timestamped text logs, permanent
`torch.autograd.set_detect_anomaly` + per-step NaN prints (train.py:66-67,
:389). TPU-native equivalents here:

  * ScalarWriter — append-only scalars.jsonl (always) + TensorBoard events
    when the `tensorboard` package is importable + an optional wandb run
    (the reference's `_ms` trainer always calls wandb.init with
    sync_tensorboard, FlashVTG_ms/train.py:124-125; here it is opt-in via
    --use_wandb and degrades to a warning when wandb is not installed);
  * profile_steps — context manager around jax.profiler for device traces;
  * debug_nans / check_finite_tree — opt-in NaN detection (the reference
    pays the anomaly-detect tax on every run; here it's a flag).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional

import numpy as np


class ScalarWriter:
    """Per-step scalar sink: jsonl always, TensorBoard when available."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True,
                 enabled: bool = True, wandb_run: Optional[Dict] = None):
        """`enabled=False` makes every method a no-op — non-0 processes of a
        multi-controller run pass this so only one host owns the files.

        `wandb_run`, when set, is the kwargs dict for wandb.init (project,
        name, config, ...) — oracle: the reference `_ms` trainer's
        unconditional wandb.init (FlashVTG_ms/train.py:124-125). Missing
        wandb package degrades to a warning, never an error."""
        self._enabled = enabled
        self._f = None
        self._tb = None
        self._wb = None
        if not enabled:
            return
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None
        if wandb_run:
            # broad catch on purpose: wandb must never take training down —
            # missing package, missing API key, offline host, server errors
            # all degrade to the jsonl+TB sinks with one warning
            try:
                import wandb

                self._wb = wandb.init(**wandb_run)
            except Exception as e:
                import logging

                logging.getLogger(__name__).warning(
                    "--use_wandb set but wandb is unavailable (%r); scalars "
                    "still go to scalars.jsonl%s",
                    e, " + TensorBoard" if self._tb is not None else "",
                )

    def write(self, step: int, scalars: Dict[str, float], prefix: str = ""):
        if not self._enabled:
            return
        row = {"step": step, "time": time.time()}
        for k, v in scalars.items():
            name = f"{prefix}{k}" if prefix else k
            row[name] = float(v)
            if self._tb is not None:
                self._tb.add_scalar(name, float(v), step)
        self._f.write(json.dumps(row) + "\n")
        self._f.flush()
        if self._wb is not None:
            try:
                self._wb.log(
                    {k: v for k, v in row.items() if k not in ("step", "time")},
                    step=step,
                )
            except Exception as e:  # a mid-run wandb failure must not kill
                import logging       # training; drop the mirror and go on

                logging.getLogger(__name__).warning(
                    "wandb.log failed (%r); disabling the wandb mirror", e
                )
                self._wb = None

    def write_text(self, tag: str, text: str):
        """One-off text record (reference: tb_writer.add_text of the
        markdown-dumped opt namespace, train.py:113)."""
        if not self._enabled:
            return
        if self._tb is not None:
            self._tb.add_text(tag, text)

    def close(self):
        if self._f is not None:
            self._f.close()
        if self._tb is not None:
            self._tb.close()
        if self._wb is not None:
            self._wb.finish()


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace around a block (view with TensorBoard/XProf)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_debug_nans(enable: bool = True):
    """Global NaN tripwire (jax re-runs offending ops un-jitted to locate)."""
    import jax

    jax.config.update("jax_debug_nans", enable)


def check_finite_tree(tree, name: str = "tree") -> bool:
    """Host-side finite check over a pytree (post-step guard)."""
    import jax

    ok = True
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            keys = "/".join(str(p) for p in path)
            print(f"[numerics] non-finite values in {name}:{keys}")
            ok = False
    return ok
