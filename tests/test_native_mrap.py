"""Native batched detection-AP kernel (runtime/mr_ap.cpp) vs the Python
bit-for-bit contract holder (eval/metrics.py detection_ap).

The kernel must be BIT-identical on every query it handles, including the
numpy quirks it replicates: stable descending score sort, insertion-sort
tie order of np.argsort(iou)[::-1] (G <= 15), and numpy's 8-accumulator
pairwise summation in the VOC integral. The fuzz quantizes window edges to
0.5 s and scores to one decimal so exact IoU / score ties are common."""

import numpy as np
import pytest

from flashvtg_tpu.eval.metrics import MR_AP_THDS, detection_ap
from flashvtg_tpu.runtime import mr_ap_batch, mr_ap_native_available

pytestmark = pytest.mark.skipif(
    not mr_ap_native_available(), reason="native mr_ap kernel unavailable"
)


def _random_case(rng, n_queries, max_p=12, max_g=18):
    preds, gts = [], []
    for _ in range(n_queries):
        p = int(rng.integers(0, max_p + 1))
        g = int(rng.integers(0, max_g + 1))
        starts = rng.integers(0, 280, p) * 0.5
        lens = rng.integers(1, 80, p) * 0.5
        scores = np.round(rng.random(p), 1)  # heavy score ties
        preds.append(
            np.stack([starts, starts + lens, scores], 1).astype(np.float64)
            if p else np.zeros((0, 3))
        )
        gs = rng.integers(0, 280, g) * 0.5
        gl = rng.integers(1, 80, g) * 0.5
        gt = np.stack([gs, gs + gl], 1).astype(np.float64) if g else np.zeros((0, 2))
        if g >= 2 and rng.random() < 0.5:
            gt[int(rng.integers(0, g))] = gt[int(rng.integers(0, g))]  # dup GT
        gts.append(gt)
    return preds, gts


def _random_case_continuous(rng, n_queries, max_p=12, max_g=15):
    """Unquantized float windows + injected degenerate zero-length spans:
    exercises the exact iou_cross arithmetic (union = a1 + a2 - inter, IEEE
    0/0 = NaN for zero-length pairs -> greedy TP) that 0.5-quantized edges
    cannot distinguish from hull-denominator variants."""
    preds, gts = [], []
    for _ in range(n_queries):
        p = int(rng.integers(1, max_p + 1))
        g = int(rng.integers(1, max_g + 1))
        starts = rng.random(p) * 140.0
        lens = rng.random(p) * 40.0
        if rng.random() < 0.5:  # degenerate zero-length prediction(s)
            lens[rng.integers(0, p)] = 0.0
        scores = rng.random(p)
        preds.append(np.stack([starts, starts + lens, scores], 1))
        gs = rng.random(g) * 140.0
        gl = rng.random(g) * 40.0
        if rng.random() < 0.5:  # degenerate zero-length GT(s)
            gl[rng.integers(0, g)] = 0.0
        if rng.random() < 0.2:  # zero-length pred exactly on zero-length GT
            z = rng.random() * 140.0
            starts[0] = z
            preds[-1][0] = [z, z, scores[0]]
            gs[0], gl[0] = z, 0.0
        gts.append(np.stack([gs, gs + gl], 1))
    return preds, gts


def test_fuzz_continuous_and_degenerate_bit_identical():
    rng = np.random.default_rng(11)
    total = 0
    for _ in range(40):
        preds, gts = _random_case_continuous(rng, n_queries=25)
        ap, handled = mr_ap_batch(preds, gts, MR_AP_THDS)
        for i, (p, g) in enumerate(zip(preds, gts)):
            assert handled[i]
            want = detection_ap(g, p[:, :2], p[:, 2])
            np.testing.assert_array_equal(ap[i], want, err_msg=f"query {i}")
            total += 1
    assert total == 1000


def test_zero_length_pair_nan_semantics():
    """0/0 IoU is NaN, which fails `iou < thd` and greedily matches — the
    numpy contract gives AP=1.0; the kernel must reproduce it (not 0.0)."""
    preds = [np.asarray([[5.0, 5.0, 0.9]])]
    gts = [np.asarray([[7.0, 7.0]])]
    ap, handled = mr_ap_batch(preds, gts, MR_AP_THDS)
    want = detection_ap(gts[0], preds[0][:, :2], preds[0][:, 2])
    assert handled[0]
    np.testing.assert_array_equal(ap[0], want)
    assert np.all(want == 1.0)


def test_fuzz_bit_identical_to_python():
    rng = np.random.default_rng(3)
    total_handled = 0
    for _ in range(40):
        preds, gts = _random_case(rng, n_queries=25)
        ap, handled = mr_ap_batch(preds, gts, MR_AP_THDS)
        for i, (p, g) in enumerate(zip(preds, gts)):
            if len(p) == 0:
                assert handled[i] and np.all(ap[i] == 0.0)
                continue
            if len(g) == 0 or len(g) > 15:
                assert not handled[i]  # python-fallback territory
                continue
            assert handled[i]
            want = detection_ap(g, p[:, :2], p[:, 2])
            np.testing.assert_array_equal(ap[i], want, err_msg=f"query {i}")
            total_handled += 1
    assert total_handled > 500  # the fuzz actually exercised the kernel


def test_tie_heavy_exact():
    """Adversarial IoU ties at/above threshold: two GTs each at exactly
    IoU 0.5 with the top prediction — locking order must match numpy's."""
    gt = np.asarray([[10.0, 15.0], [15.0, 20.0], [10.0, 20.0]])
    preds = np.asarray([
        [10.0, 20.0, 0.9],  # IoU 0.5 with both halves, 1.0 with the full
        [10.0, 15.0, 0.9],  # tied score with pred 0
        [12.0, 18.0, 0.5],
        [15.0, 20.0, 0.5],
    ])
    ap, handled = mr_ap_batch([preds], [gt], MR_AP_THDS)
    assert handled[0]
    want = detection_ap(gt, preds[:, :2], preds[:, 2])
    np.testing.assert_array_equal(ap[0], want)


def test_hl_fuzz_bit_identical_to_python():
    """hl_ap_batch vs per-column binary_ap — fuzzed over query sizes up to
    TVSum-scale clip counts (pairwise-sum recursion territory), heavy score
    ties, single-valued columns, and n=1 queries."""
    from flashvtg_tpu.eval.metrics import binary_ap
    from flashvtg_tpu.runtime import hl_ap_batch

    rng = np.random.default_rng(9)
    for _ in range(20):
        nq = int(rng.integers(1, 12))
        scores_list, labels_list = [], []
        for _ in range(nq):
            n = int(rng.integers(1, 400))
            s = np.round(rng.standard_normal(n), int(rng.integers(0, 3)))
            mat = rng.integers(0, 2, (9, n)).astype(float)
            if rng.random() < 0.4:
                mat[int(rng.integers(0, 9))] = float(rng.integers(0, 2))
            scores_list.append(s.astype(np.float64))
            labels_list.append(mat)
        got = hl_ap_batch(scores_list, labels_list)
        assert got is not None
        for q in range(nq):
            want = [
                binary_ap(labels_list[q][k], scores_list[q]) for k in range(9)
            ]
            np.testing.assert_array_equal(got[q], np.asarray(want, np.float64),
                                          err_msg=f"query {q}")


def test_hl_nan_scores_match_python():
    """NaN saliency scores must sort last (numpy mergesort semantics) and
    not trip UB in std::stable_sort (ADVICE r2: strict-weak-ordering)."""
    from flashvtg_tpu.eval.metrics import binary_ap
    from flashvtg_tpu.runtime import hl_ap_batch

    rng = np.random.default_rng(31)
    scores_list, labels_list = [], []
    for _ in range(6):
        n = int(rng.integers(4, 60))
        s = np.round(rng.standard_normal(n), 1)
        s[rng.random(n) < 0.3] = np.nan
        scores_list.append(s.astype(np.float64))
        labels_list.append(rng.integers(0, 2, (9, n)).astype(float))
    got = hl_ap_batch(scores_list, labels_list)
    assert got is not None
    for q in range(len(scores_list)):
        want = [
            binary_ap(labels_list[q][k], scores_list[q]) for k in range(9)
        ]
        np.testing.assert_array_equal(got[q], np.asarray(want, np.float64),
                                      err_msg=f"query {q}")


def test_mr_ap_rejects_malformed_windows():
    """Rows with <3 columns must raise a clear error, not silently
    reinterpret offsets (ADVICE r2: reshape-based corruption)."""
    import pytest

    from flashvtg_tpu.runtime import mr_ap_batch, mr_ap_native_available

    if not mr_ap_native_available():
        pytest.skip("native mrap unavailable")
    bad = [np.array([[0.0, 1.0], [1.0, 2.0], [2.0, 3.0]])]  # (3, 2): 2*3%3==0
    gts = [np.array([[0.0, 1.0]])]
    with pytest.raises(ValueError, match="3 columns"):
        mr_ap_batch(bad, gts, [0.5])


def test_full_suite_unchanged_by_native_path(monkeypatch):
    """compute_mr_ap with the kernel force-disabled equals the default
    (native) path on a random submission-style batch."""
    import flashvtg_tpu.eval.metrics as M
    import flashvtg_tpu.runtime as R

    rng = np.random.default_rng(5)
    preds, gts = _random_case(rng, n_queries=60, max_g=8)
    submission = [
        {"qid": i, "pred_relevant_windows": p.tolist()}
        for i, p in enumerate(preds)
    ]
    ground_truth = [
        {"qid": i, "relevant_windows": g.tolist() or [[0.0, 1.0]]}
        for i, g in enumerate(gts)
    ]
    native = M.compute_mr_ap(submission, ground_truth)
    monkeypatch.setattr(R, "mr_ap_batch", lambda *a, **k: None)
    python = M.compute_mr_ap(submission, ground_truth)
    assert native == python
