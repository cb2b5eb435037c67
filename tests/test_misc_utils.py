"""Window converters, precision@k, dataset prep, config-file loading."""

import numpy as np

from flashvtg_tpu.data.prep import TVSUM_SPLITS, build_rows
from flashvtg_tpu.ops.windows import (
    accuracy_at_k,
    clip_ids_to_windows,
    clip_window_to_seconds,
    windows_to_clip_ids,
)
from flashvtg_tpu.train.config import apply_model_cfg, ExperimentConfig, load_model_cfg_file


def test_clip_windows_roundtrip():
    ids = [56, 57, 58, 59, 60, 61, 62, 64, 67, 68, 69, 70, 71]
    wins = clip_ids_to_windows(ids)
    assert wins == [[56, 62], [64, 64], [67, 71]]
    assert windows_to_clip_ids(wins) == ids
    assert clip_window_to_seconds([10, 19], 2) == [20, 40]


def test_accuracy_at_k():
    scores = np.asarray([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    acc1, acc2 = accuracy_at_k(scores, [1, 1], topk=(1, 2))
    assert acc1 == 50.0 and acc2 == 100.0


def test_prep_build_rows_tvsum():
    anno = {
        "WxtbjNsCQ8A": {
            "title": "bike stunt",
            "frames": 3000,
            "fps": 30,
            "anno": np.random.default_rng(0).integers(1, 6, (50, 20)).tolist(),
            "domain": "BK",
        },
        "Se3oxnaPsz0": {
            "title": "val video",
            "frames": 1500,
            "fps": 30,
            "anno": np.random.default_rng(1).integers(1, 6, (25, 20)).tolist(),
            "domain": "BK",
        },
    }
    # default: the SHIPPED tvsum_train.jsonl format — raw (L, 20)
    # per-annotator columns, what the 'tvsum' preset's label pipeline and
    # 20-annotator eval AP consume
    train, val = build_rows(anno, TVSUM_SPLITS, "tvsum")
    assert len(train) == 1 and len(val) == 1
    row = train[0]
    assert row["vid"] == "WxtbjNsCQ8A"
    assert row["duration"] == 100.0
    assert len(row["label"]) == 50 and len(row["label"][0]) == 20
    assert row["label"] == [
        list(map(float, r)) for r in anno["WxtbjNsCQ8A"]["anno"]
    ]

    # --sfc: the reference preprocess_json.py's summed single column
    # (that script targets the *_sfc.jsonl variant filenames)
    train_sfc, _ = build_rows(anno, TVSUM_SPLITS, "tvsum", sfc=True)
    lab = train_sfc[0]["label"]
    assert len(lab) == 50 and len(lab[0]) == 1
    assert lab == [
        [sum(r)] for r in anno["WxtbjNsCQ8A"]["anno"]
    ]


def test_prep_build_rows_youtube():
    """youtube rows need no --splits_json: vendored YOUTUBE_SPLITS routes
    by domain, query is the domain, saliency binarizes `match`, and the
    UniVTG extras (frames/fps/clip/match) ride along."""
    from flashvtg_tpu.data.prep import YOUTUBE_SPLITS

    anno = {
        "BsjTtq337mM": {  # dog/train in the vendored splits
            "frames": 900,
            "fps": 30,
            "domain": "dog",
            "match": [0, 2, 0, 1],
            "clip": [[0, 1], [1, 2], [2, 3], [3, 4]],
        },
        "a2nj7XCo2Rk": {  # dog/val
            "frames": 600,
            "fps": 30,
            "domain": "dog",
            "match": [1, 0],
            "clip": [[0, 1], [1, 2]],
        },
    }
    train, val = build_rows(anno, YOUTUBE_SPLITS, "youtube")
    assert len(train) == 1 and len(val) == 1
    row = train[0]
    assert row["vid"] == "BsjTtq337mM"
    assert row["query"] == "dog"
    assert row["duration"] == 30.0
    assert row["label"] == [[0], [1], [0], [1]]
    assert row["match"] == [0, 2, 0, 1] and row["fps"] == 30.0


def test_youtube_splits_match_reference():
    """The vendored splits are a dataset ground-truth asset; pin them
    bit-for-bit against the reference's youtube_splits.py."""
    import importlib.util

    from flashvtg_tpu.data.youtube_splits import YOUTUBE_SPLITS

    ref_path = "/root/reference/data/youtube_uni/youtube_splits.py"
    spec = importlib.util.spec_from_file_location("ref_yt_splits", ref_path)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    assert YOUTUBE_SPLITS == ref.YOUTUBE_SPLITS


def test_model_cfg_files():
    for name, strides, cls in [
        ("configs/MR.py", (1, 2, 4, 8), "focal"),
        ("configs/MR_16.py", (1, 2, 4, 8, 16), "focal"),
        ("configs/HD.py", (1,), "dynamic_bce"),
    ]:
        cfg = apply_model_cfg(ExperimentConfig(), load_model_cfg_file(name))
        assert tuple(cfg.strides) == strides
        assert cfg.loss_cls == cls
    gfl = apply_model_cfg(ExperimentConfig(), load_model_cfg_file("configs/MR_GFL.py"))
    assert gfl.loss_qfl and gfl.loss_cls is None
    hd = apply_model_cfg(ExperimentConfig(), load_model_cfg_file("configs/HD.py"))
    assert hd.loss_reg is None and hd.nce_direction == ("row",)


def test_emit_model_cfg_roundtrip(tmp_path):
    """emit_model_cfg is the inverse of apply_model_cfg: emitted files
    re-parse to the same model-structure fields, for every shipped shape
    (MR focal, HD dynamic_bce row-only NCE, GFL qfl-no-cls)."""
    from flashvtg_tpu.train.config import emit_model_cfg

    cases = [
        ExperimentConfig(),
        ExperimentConfig(strides=(1,), buffer_size=2048,
                         loss_cls="dynamic_bce", loss_reg=None,
                         nce_direction=("row",)),
        ExperimentConfig(loss_qfl=True, loss_cls=None, sample_radius=0.0),
    ]
    for i, cfg in enumerate(cases):
        p = tmp_path / f"cfg{i}.py"
        p.write_text(emit_model_cfg(cfg))
        back = apply_model_cfg(ExperimentConfig(), load_model_cfg_file(str(p)))
        for f in ("strides", "buffer_size", "max_num_moment", "loss_cls",
                  "loss_reg", "loss_sal", "nce_direction", "loss_qfl",
                  "sample_radius"):
            assert getattr(back, f) == getattr(cfg, f), (i, f)


def test_tvsum_missing_domain_clear_error(tmp_path):
    """tvsum/youtube datasets require --dset_domain; the error must name
    the flag and the valid domains (was a bare AssertionError)."""
    import json

    import pytest

    from flashvtg_tpu.data.dataset import DataConfig, VTGDataset

    p = tmp_path / "x.jsonl"
    p.write_text(json.dumps({"qid": "v", "vid": "v", "domain": "BK"}) + "\n")
    with pytest.raises(ValueError, match="dset_domain"):
        VTGDataset(DataConfig(dset_name="tvsum", data_path=str(p)))
    with pytest.raises(ValueError, match="dset_domain"):
        VTGDataset(DataConfig(dset_name="youtube_uni", data_path=str(p)))


def test_strip_vid_suffix_matches_reference_find_nth():
    """The 'hl' neg-pair vid identity vs the LIVE reference implementation
    (model.py:25-33 find_nth + :140-145), including the single-underscore
    edge where find_nth(v, '_', 0) behaves like n=1 and cuts at the first
    underscore (round-4 review finding)."""
    import importlib.util

    from flashvtg_tpu.data.dataset import strip_vid_suffix

    spec = importlib.util.spec_from_file_location(
        "_ref_model_header", "/root/reference/FlashVTG/model.py"
    )
    src = open("/root/reference/FlashVTG/model.py").read()
    ns = {}
    # execute only the dependency-free find_nth definition
    start = src.index("def find_nth")
    end = src.index("\ndef ", start + 1)
    exec(src[start:end], ns)  # noqa: S102 - reference oracle, test-only
    find_nth = ns["find_nth"]

    def ref_strip(vid):
        count = vid.count("_")
        pos = find_nth(vid, "_", count - 1)
        return vid[:pos]

    for vid in (
        "j7rJstJMghA_360.0_510.0",   # the real QVH shape (count=2)
        "video_1",                    # count=1: cut at the only underscore
        "a_b_1.0_2.0",                # count=3: cut at the 2nd underscore
        "a_b_c_d_9_9",                # count=5
        "noline",                     # count=0: unchanged (find_nth -> len)
        "_leading",                   # underscore first
        "trailing_",                  # underscore last
    ):
        assert strip_vid_suffix(vid) == ref_strip(vid), vid
