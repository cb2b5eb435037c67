"""Device NMS at dataset scale: applying our jitted batched NMS to the
reference's committed 1550-query prediction fixture must yield the same
post-NMS evaluation metrics as the reference's Python suppression loop."""

import pathlib

import numpy as np
import pytest

from flashvtg_tpu.eval.metrics import eval_submission
from flashvtg_tpu.train.infer import apply_nms
from flashvtg_tpu.utils.io import load_jsonl

REF = pathlib.Path("/root/reference")
SUBMISSION = REF / "standalone_eval/sample_val_preds.jsonl"
GT = REF / "data/highlight_val_release.jsonl"


def _reference_nms_rows(rows, nms_thd):
    """Reference suppression loop semantics (inference.py:36-57), numpy."""
    bnd = np.asarray(rows, dtype=np.float64)
    for i in range(len(bnd)):
        j = i + int(np.argmax(bnd[i:, -1]))
        bnd[[i, j]] = bnd[[j, i]]
        rest = bnd[i + 1 :, :2]
        if len(rest) == 0:
            break
        left = np.maximum(bnd[i, 0], rest[:, 0])
        right = np.minimum(bnd[i, 1], rest[:, 1])
        inter = np.clip(right - left, 0, None)
        union = (bnd[i, 1] - bnd[i, 0]) + (rest[:, 1] - rest[:, 0]) - inter
        iou = inter / union
        bnd[i + 1 :, -1][iou >= nms_thd] = 0
    return bnd[np.argsort(-bnd[:, -1], kind="stable")]


@pytest.mark.skipif(not SUBMISSION.exists(), reason="reference fixtures absent")
def test_device_nms_matches_reference_metrics():
    submission = load_jsonl(SUBMISSION)
    gt = load_jsonl(GT)

    device_nms = apply_nms([dict(s) for s in submission], 0.7, "normal")

    ref_nms = []
    for s in submission:
        rows = _reference_nms_rows(s["pred_relevant_windows"], 0.7)
        rows = [[a, b, float(f"{c:.4f}")] for a, b, c in rows.tolist()]
        ref_nms.append({**s, "pred_relevant_windows": rows})

    m_dev = eval_submission(device_nms, gt, verbose=False)["brief"]
    m_ref = eval_submission(ref_nms, gt, verbose=False)["brief"]
    assert dict(m_dev) == dict(m_ref)
