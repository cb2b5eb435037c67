"""Executable rehearsal of the accuracy-gate runbook (scripts/parity_eval.sh).

BASELINE.md designates parity_eval.sh as the gate that compares a
checkpoint's QVHighlights metrics against expected values at the +-0.1
tolerance once real features and a Model Zoo checkpoint exist (blocked:
zero egress, /root/reference/README.md:93-103). This test keeps the
runbook from rotting until then: it drives the script end-to-end on a
trained tiny checkpoint + synthetic features and asserts BOTH verdicts —
exit 0 when the expected metrics match what the checkpoint actually
scores, exit 1 when they are deliberately wrong, and exit 2 on usage
errors — so the day real artifacts appear, the gate is known-runnable.
"""

import json
import os
import subprocess
import sys

import pytest

from tests.test_testoptions_flags import _tiny_train_cfg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNBOOK = os.path.join(REPO, "scripts", "parity_eval.sh")


def _run_runbook(args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        ["bash", RUNBOOK, *args],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=1200,
    )


@pytest.mark.slow
def test_parity_eval_runbook_pass_and_fail_verdicts(tmp_path):
    from flashvtg_tpu.train.loop import train

    cfg = _tiny_train_cfg(tmp_path)
    run_dir = str(tmp_path / "run")
    train(cfg, results_dir=run_dir)
    ckpt = os.path.join(run_dir, "model_latest")

    # ground truth for "expected": what this checkpoint actually scores on
    # the synthetic val split (the train run's own final metrics artifact)
    metric_files = [
        f for f in os.listdir(run_dir) if f.endswith("_preds_metrics.json")
    ]
    assert metric_files, f"train() left no metrics json in {run_dir}"
    brief = json.load(
        open(os.path.join(run_dir, sorted(metric_files)[-1]))
    )["brief"]
    r105, r107, mmap = (
        brief["MR-full-R1@0.5"], brief["MR-full-R1@0.7"], brief["MR-full-mAP"]
    )

    common = [
        "qvhighlights_slowclip", ckpt, cfg.eval_path,
        cfg.v_feat_dirs[0], cfg.t_feat_dir,
    ]

    # PASS: expected == actual -> exit 0, per-metric PASS rows
    res = _run_runbook(common + [f"{r105}", f"{r107}", f"{mmap}"])
    assert res.returncode == 0, (
        f"expected gate PASS, rc={res.returncode}\nstdout: {res.stdout}\n"
        f"stderr tail: {res.stderr[-2000:]}"
    )
    assert "overall: PASS" in res.stdout

    # FAIL: expected shifted by +5.0 (far past the 0.1 gate) -> exit 1
    res = _run_runbook(
        common + [f"{r105 + 5.0}", f"{r107 + 5.0}", f"{mmap + 5.0}"]
    )
    assert res.returncode == 1, (
        f"expected gate FAIL, rc={res.returncode}\nstdout: {res.stdout}\n"
        f"stderr tail: {res.stderr[-2000:]}"
    )
    assert "overall: FAIL" in res.stdout
    assert res.stdout.count("FAIL") >= 4  # 3 metric rows + overall


def test_parity_eval_runbook_usage_error():
    """Wrong arity prints the usage header and exits 2 (fast, no model)."""
    res = _run_runbook(["just", "three", "args"])
    assert res.returncode == 2
    assert "Usage" in res.stdout or "Usage" in res.stderr
