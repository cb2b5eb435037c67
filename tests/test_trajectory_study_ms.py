"""Smoke-test scripts/trajectory_study_ms.py (the _ms statistical
co-training study behind docs/TRAJECTORY_MS.md) at reduced scale:
2 epochs x 2 seeds per side. Pins that the harness runs end-to-end on the
full _ms stack — torch train-branch loss with dropout live (criterion
called with epoch_i per FlashVTG_ms/train.py:58), the zero-dropout
held-out loss on both sides, each side's own R1 decode — and that the
Welch statistics come out finite. The full-scale result is recorded in
docs/TRAJECTORY_MS.md / docs/trajectory_study_ms.json."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

pytest.importorskip("torch")


def test_trajectory_study_ms_smoke(tmp_path):
    from scripts import trajectory_study_ms as ts

    res = ts.run_study(epochs=2, seeds=(0, 1))
    assert len(res["mu_torch"]) == 2 and len(res["mu_jax"]) == 2
    for key in ("mu_torch", "mu_jax", "sd_torch", "sd_jax", "z",
                "torch_eval", "jax_eval", "torch_r1", "jax_r1"):
        assert np.all(np.isfinite(res[key])), key
    # same init + same data: epoch-1 means must be in the same ballpark (a
    # structural loss mismatch is an O(1) gap; dropout noise here is ~0.1)
    assert abs(res["mu_torch"][0] - res["mu_jax"][0]) < 0.5
    ts.write_report(res, tmp_path / "TRAJECTORY_MS.md")
    text = (tmp_path / "TRAJECTORY_MS.md").read_text()
    assert "Welch z" in text and "R1@0.5" in text
