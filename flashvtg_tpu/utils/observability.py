"""Observability: scalar logging, profiling traces, numerics guards.

Reference counterparts (SURVEY.md §5): tensorboard SummaryWriter per-step
scalars (train.py:84-91), timestamped text logs, permanent
`torch.autograd.set_detect_anomaly` + per-step NaN prints (train.py:66-67,
:389). TPU-native equivalents here:

  * ScalarWriter — append-only scalars.jsonl (always) + TensorBoard events
    when the `tensorboard` package is importable;
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
                 enabled: bool = True):
        """`enabled=False` makes every method a no-op — non-0 processes of a
        multi-controller run pass this so only one host owns the files."""
        self._enabled = enabled
        self._f = None
        self._tb = None
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

    def close(self):
        if self._f is not None:
            self._f.close()
        if self._tb is not None:
            self._tb.close()


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
