"""NMS parity vs the reference post_processing_mr_nms loop."""

import numpy as np
import pytest

from flashvtg_tpu.ops.nms import suppress_overlaps, temporal_nms_keep


def _reference_nms(windows_and_scores, nms_thd, nms_type):
    """Direct numpy re-execution of inference.py:36-57 semantics (oracle)."""
    bnd = np.array(windows_and_scores, dtype=np.float64)

    def iou_row(a, B):
        if len(B) == 0:
            return np.zeros(0)
        left = np.maximum(a[0], B[:, 0])
        right = np.minimum(a[1], B[:, 1])
        inter = np.clip(right - left, 0, None)
        union = (a[1] - a[0]) + (B[:, 1] - B[:, 0]) - inter
        return inter / union

    for i in range(len(bnd)):
        max_idx = int(np.argmax(bnd[i:, -1]))
        tmp = bnd[i].copy()
        bnd[i] = bnd[i + max_idx]
        bnd[i + max_idx] = tmp
        iou = iou_row(bnd[i, :2], bnd[i + 1 :, :2])
        if nms_type == "normal":
            bnd[i + 1 :, -1][iou >= nms_thd] = 0
        else:
            bnd[i + 1 :, -1] *= 1 - iou
    order = np.argsort(-bnd[:, -1], kind="stable")
    return bnd[order]


@pytest.mark.parametrize("nms_type", ["normal", "linear"])
def test_nms_matches_reference(nms_type):
    rng = np.random.default_rng(3)
    for _ in range(5):
        n = 20
        st = rng.uniform(0, 100, n)
        w = rng.uniform(2, 40, n)
        scores = rng.uniform(0, 1, n)
        rows = np.stack([st, st + w, scores], axis=-1)
        rows = rows[np.argsort(-scores)]  # decode emits sorted candidates

        ref = _reference_nms(rows, 0.5, nms_type)
        spans, out_scores = suppress_overlaps(
            rows[None, :, :2], rows[None, :, 2], 0.5, nms_type
        )
        got = np.concatenate(
            [np.asarray(spans)[0], np.asarray(out_scores)[0, :, None]], axis=-1
        )
        # compare as score-sorted sets (tie order among zeroed rows may differ)
        np.testing.assert_allclose(
            np.sort(got[:, 2]), np.sort(ref[:, 2]), atol=1e-5
        )
        nonzero = ref[:, 2] > 1e-9
        np.testing.assert_allclose(got[nonzero], ref[nonzero], atol=1e-4)


def test_keep_list_nms():
    spans = np.array([[0, 10], [1, 11], [20, 30], [21, 31], [50, 60]], float)
    scores = np.array([0.9, 0.8, 0.7, 0.95, 0.5])
    kept = temporal_nms_keep(spans, scores, nms_thd=0.5, max_after_nms=10)
    assert list(kept) == [3, 0, 4]
