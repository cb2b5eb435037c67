"""Span post-processing parity vs the reference PostProcessorDETR."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

from flashvtg_tpu.eval.postprocess import PostProcessor, build_post_processor


@pytest.fixture(scope="module")
def ref_cls():
    from FlashVTG.postprocessing import PostProcessorDETR

    return PostProcessorDETR


def _lines(rng, n_queries=6, n_wins=12, span=200.0):
    lines = []
    for q in range(n_queries):
        st = rng.uniform(-10, span, n_wins)
        w = rng.uniform(0, 80, n_wins)
        score = rng.uniform(0, 1, n_wins)
        lines.append(
            {
                "qid": q,
                "pred_relevant_windows": np.stack(
                    [st, st + w, score], axis=-1
                ).tolist(),
            }
        )
    return lines


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(clip_length=2, min_ts_val=0, max_ts_val=150, min_w_l=2,
             max_w_l=150, move_window_method="left",
             process_func_names=("clip_ts", "round_multiple")),
        dict(clip_length=1, min_ts_val=0, max_ts_val=360, min_w_l=12,
             max_w_l=360, move_window_method="left",
             process_func_names=("clip_ts", "round_multiple")),
        dict(clip_length=2, min_ts_val=0, max_ts_val=50000, min_w_l=0,
             max_w_l=50000, move_window_method="left",
             process_func_names=("round_multiple",)),
        dict(clip_length=2, min_ts_val=0, max_ts_val=150, min_w_l=4,
             max_w_l=40, move_window_method="center",
             process_func_names=("clip_ts", "clip_window_l", "round_multiple")),
    ],
)
def test_postprocessor_parity(ref_cls, kwargs):
    rng = np.random.default_rng(0)
    lines = _lines(rng)
    import copy

    ref = ref_cls(**kwargs)(copy.deepcopy(lines))
    got = PostProcessor(**kwargs)(copy.deepcopy(lines))
    for r, g in zip(ref, got):
        np.testing.assert_allclose(
            np.asarray(g["pred_relevant_windows"]),
            np.asarray(r["pred_relevant_windows"]),
            atol=1e-9,
        )


def test_build_post_processor_selection():
    p = build_post_processor("hl", 2.0)
    assert p.max_ts_val == 150 and "clip_ts" in p.process_func_names
    p = build_post_processor("charadesSTA", 0.166666, v_feat_dim=4096)
    assert p.max_ts_val == 360 and p.min_w_l == 12
    p = build_post_processor("tacos", 2.0)
    assert p.process_func_names == ("round_multiple",)
