"""Label-generation parity vs the reference StartEndDataset methods.

Randomness parity: both sides draw through the same `random` algorithm — the
reference via the seeded global module, ours via an equally-seeded
random.Random — so sampled pos/neg clip indices must match exactly.
"""

import random
import sys
import types

import numpy as np
import pytest

from flashvtg_tpu.data import labels as L


@pytest.fixture(scope="module")
def ref_dataset_cls():
    pytest.importorskip("torch")
    if "torchtext" not in sys.modules:  # dead dependency for these paths
        tt = types.ModuleType("torchtext")
        tt.vocab = types.SimpleNamespace(pretrained_aliases={})
        sys.modules["torchtext"] = tt
    sys.path.insert(0, "/root/reference")
    from FlashVTG.start_end_dataset import StartEndDataset

    return StartEndDataset


def test_saliency_all_parity(ref_dataset_cls):
    ds = ref_dataset_cls.__new__(ref_dataset_cls)
    rng_master = np.random.default_rng(0)
    for trial in range(10):
        ctx_l = int(rng_master.integers(10, 80))
        n_rel = int(rng_master.integers(1, min(ctx_l, 20)))
        rel_ids = sorted(
            rng_master.choice(ctx_l, size=n_rel, replace=False).tolist()
        )
        scores = rng_master.integers(0, 5, (n_rel, 3)).tolist()

        random.seed(100 + trial)
        pos_r, neg_r, arr_r = ds.get_saliency_labels_all(rel_ids, scores, ctx_l)
        pos_m, neg_m, arr_m = L.saliency_all(
            rel_ids, scores, ctx_l, random.Random(100 + trial)
        )
        assert pos_r == pos_m and neg_r == neg_m
        np.testing.assert_array_equal(arr_r, arr_m)


def test_sub_as_query_parity(ref_dataset_cls):
    ds = ref_dataset_cls.__new__(ref_dataset_cls)
    ds.dset_name = "charadesSTA"
    rng_master = np.random.default_rng(1)
    for trial in range(10):
        duration = float(rng_master.integers(10, 200))
        ctx_l = int(rng_master.integers(5, 100))
        st = float(rng_master.uniform(0, duration * 0.8))
        ed = float(rng_master.uniform(st, duration))

        random.seed(200 + trial)
        pos_r, neg_r, arr_r = ds.get_saliency_labels_sub_as_query(
            [st, ed], duration, ctx_l
        )
        pos_m, neg_m, arr_m = L.saliency_sub_as_query(
            [st, ed], duration, ctx_l, random.Random(200 + trial)
        )
        assert pos_r == pos_m and neg_r == neg_m
        np.testing.assert_array_equal(arr_r, arr_m)


def test_tvsum_youtube_parity(ref_dataset_cls):
    ds = ref_dataset_cls.__new__(ref_dataset_cls)
    rng = np.random.default_rng(2)
    labels_tvsum = rng.integers(1, 6, (30, 20))
    pos_r, neg_r, arr_r = ds.get_saliency_labels_all_tvsum(labels_tvsum, 30)
    pos_m, neg_m, arr_m = L.saliency_tvsum(labels_tvsum, 30)
    assert list(pos_r) == list(pos_m) and list(neg_r) == list(neg_m)
    np.testing.assert_allclose(arr_r, arr_m, atol=1e-6)

    labels_yt = rng.integers(0, 2, (25, 1))
    pos_r, neg_r, arr_r = ds.get_saliency_labels_all_youtube(labels_yt, 25)
    pos_m, neg_m, arr_m = L.saliency_youtube(labels_yt, 25)
    assert list(pos_r) == list(pos_m) and list(neg_r) == list(neg_m)
    np.testing.assert_allclose(arr_r, arr_m, atol=1e-6)


def test_span_window_subsampling():
    rng = random.Random(0)
    windows = [[float(i), float(i + 2)] for i in range(10)]
    out = L.span_windows(windows, ctx_l=75, clip_len=2.0, max_windows=5, rng=rng)
    assert out.shape == (5, 2)
    assert all(list(w) in windows for w in out.tolist())
    # untouched when below the cap
    out2 = L.span_windows(windows[:3], 75, 2.0, 5, random.Random(0))
    np.testing.assert_array_equal(out2, np.asarray(windows[:3], np.float32))
