"""Smoke-test scripts/trajectory_study.py (the statistical co-training
study behind docs/TRAJECTORY.md) at reduced scale: 2 epochs x 2 seeds per
side. Pins that the harness runs end-to-end — torch train-branch loss with
dropout live, the zero-dropout held-out loss on both sides, each side's own
R1 decode — and that the Welch statistics come out finite. The full-scale
result (20 epochs x 6 seeds, max |z| = 2.0) is recorded in
docs/TRAJECTORY.md / docs/trajectory_study.json."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

pytest.importorskip("torch")


def test_trajectory_study_smoke(tmp_path):
    from scripts import trajectory_study as ts

    res = ts.run_study(epochs=2, seeds=(0, 1))
    assert len(res["mu_torch"]) == 2 and len(res["mu_jax"]) == 2
    for key in ("mu_torch", "mu_jax", "sd_torch", "sd_jax", "z",
                "torch_eval", "jax_eval", "torch_r1", "jax_r1"):
        assert np.all(np.isfinite(res[key])), key
    # same init + same data: the epoch-1 means must be in the same ballpark
    # (a structural loss mismatch shows up as an O(1) gap, dropout noise at
    # this scale is ~0.1)
    assert abs(res["mu_torch"][0] - res["mu_jax"][0]) < 0.5
    ts.write_report(res, tmp_path / "TRAJECTORY.md")
    text = (tmp_path / "TRAJECTORY.md").read_text()
    assert "Welch z" in text and "R1@0.5" in text
