"""Input pipeline: jsonl annotations + pre-extracted feature files.

Oracle: FlashVTG/start_end_dataset.py (StartEndDataset). Differences by
design:
  * RAM preloading is optional (`preload`) — the reference always preloads.
  * All sampling randomness flows through a seeded `random.Random`.
  * No torch: features load as numpy (npz/npy, and .pt via a torch import
    only when such files are actually present).
"""

from __future__ import annotations

import dataclasses
import os
import random
import threading
from os.path import join
from typing import List, Optional, Sequence

import numpy as np

from flashvtg_tpu.data import labels as L
from flashvtg_tpu.utils.io import l2_normalize, load_jsonl

TVSUM_DOMAINS = ("BK", "BT", "DS", "FM", "GA", "MS", "PK", "PR", "VT", "VU")
YOUTUBE_DOMAINS = ("dog", "gymnastics", "parkour", "skating", "skiing", "surfing")


@dataclasses.dataclass
class DataConfig:
    dset_name: str = "hl"
    data_path: str = ""
    v_feat_dirs: Sequence[str] = ()
    q_feat_dir: str = ""
    q_feat_type: str = "last_hidden_state"
    max_q_l: int = 32
    max_v_l: int = 75
    data_ratio: float = 1.0
    ctx_mode: str = "video_tef"
    normalize_v: bool = True
    normalize_t: bool = True
    load_labels: bool = True
    clip_len: float = 2.0
    max_windows: int = 5
    txt_drop_ratio: float = 0.0
    dset_domain: Optional[str] = None
    seed: int = 2024
    preload: bool = True
    # FlashVTG_ms delta (FlashVTG_ms/start_end_dataset.py:442): InternVideo2
    # .npy text features get reordered so the [EOS] token comes first and the
    # first 4 tokens are dropped
    eos_first: bool = False


def strip_vid_suffix(vid: str) -> str:
    """Drop the trailing `_<start>_<end>` segments of a QVHighlights vid
    (oracle: model.py:25-33 find_nth + :140-145) so that clips cut from the
    same source video count as false negatives."""
    count = vid.count("_")
    if count == 0:
        return vid
    # find_nth walks `while n > 1`, so n=0 (a single-underscore vid) and
    # n=1 both land on the FIRST underscore — the reference cuts there
    n = max(1, count - 1)
    pos, seen = -1, 0
    for i, ch in enumerate(vid):
        if ch == "_":
            seen += 1
            if seen == n:
                pos = i
                break
    return vid[:pos] if pos >= 0 else vid


def _load_array(path: str, key: str = "features") -> np.ndarray:
    if path.endswith(".npz"):
        return np.load(path)[key]
    if path.endswith(".npy"):
        return np.load(path)
    if path.endswith(".pt"):
        import torch

        return torch.load(path, map_location="cpu").float().numpy()
    raise ValueError(f"unsupported feature file: {path}")


def _try_paths(paths_and_keys, max_rows: int = 0, l2norm: bool = False):
    """Load the first existing candidate feature file.

    Prefers the native C++ loader (flashvtg_tpu.runtime — fused truncation +
    row l2-norm, no Python zip/npy machinery) and falls back to numpy for
    anything it declines (.pt files, exotic dtypes, missing toolchain).
    """
    from flashvtg_tpu import runtime

    last_err = None
    for path, key in paths_and_keys:
        if not os.path.exists(path):
            last_err = FileNotFoundError(path)
            continue
        native = runtime.load_features(
            path, key or "features", max_rows=max_rows, l2norm=l2norm
        )
        if native is not None:
            return native
        try:
            arr = _load_array(path, key)
        except (FileNotFoundError, KeyError, ValueError) as e:
            last_err = e
            continue
        arr = np.asarray(arr, np.float32)
        if max_rows > 0:
            arr = arr[:max_rows]
        if l2norm:
            arr = l2_normalize(arr)
        return arr
    raise FileNotFoundError(f"no feature file found: {last_err}")


class VTGDataset:
    """One (query, video) pair per row; returns (meta, model_inputs)."""

    def __init__(self, cfg: DataConfig):
        self.cfg = cfg
        self.rng = random.Random(cfg.seed)
        if cfg.max_v_l == -1:
            cfg.max_v_l = 100_000_000
        if cfg.max_q_l == -1:
            cfg.max_q_l = 100
        self.use_tef = "tef" in cfg.ctx_mode
        self.use_video = "video" in cfg.ctx_mode
        self.use_glove = bool(cfg.v_feat_dirs) and "vgg" in cfg.v_feat_dirs[0]
        self._glove = None
        # guards the lazy embedder build: the feed builder warms the feature
        # cache from a thread pool (data/feed.py), so first-touch must not
        # load the multi-GB GloVe table once per worker
        self._glove_lock = threading.Lock()

        self.data = load_jsonl(cfg.data_path)
        if cfg.data_ratio != 1:
            self.data = self.data[: int(len(self.data) * cfg.data_ratio)]
        if cfg.dset_name in ("tvsum", "tvsum_sfc"):
            if cfg.dset_domain not in TVSUM_DOMAINS:
                raise ValueError(
                    f"tvsum trains per domain: pass --dset_domain, one of "
                    f"{sorted(TVSUM_DOMAINS)} (got {cfg.dset_domain!r})"
                )
            self.data = [d for d in self.data if d["domain"] == cfg.dset_domain]
        elif cfg.dset_name == "youtube_uni":
            if cfg.dset_domain not in YOUTUBE_DOMAINS:
                raise ValueError(
                    f"youtube_uni trains per domain: pass --dset_domain, one "
                    f"of {sorted(YOUTUBE_DOMAINS)} (got {cfg.dset_domain!r})"
                )
            self.data = [d for d in self.data if d["domain"] == cfg.dset_domain]

        self._cache = [None] * len(self.data)
        if cfg.preload:
            for i in range(len(self.data)):
                self._cache[i] = self._build(self.data[i])

    def __len__(self):
        return len(self.data)

    def __getitem__(self, index):
        """(meta, model_inputs). Features are loaded once and cached (the
        reference preloads everything into RAM, start_end_dataset.py:153-158);
        the STOCHASTIC parts — saliency pos/neg sampling, GT-window
        subsampling, txt_drop — are re-drawn on every access, exactly like
        the reference's per-__getitem__ `random.sample` calls
        (start_end_dataset.py:239-250)."""
        feats = self._cache[index]
        if feats is None:
            feats = self._build(self.data[index])
            self._cache[index] = feats
        out = dict(feats)
        if self.cfg.txt_drop_ratio > 0:
            out["query_feat"] = self._drop_rows(out["query_feat"])
        if self.cfg.load_labels:
            self._attach_labels(self.data[index], out)
        return self.data[index], out

    def features_only(self, index):
        """(meta, features) WITHOUT labels or txt_drop — no RNG is consumed,
        so bulk passes (e.g. the HBM feed build) leave the label-sampling
        stream untouched."""
        feats = self._cache[index]
        if feats is None:
            feats = self._build(self.data[index])
            self._cache[index] = feats
        return self.data[index], dict(feats)

    # -- feature loading ----------------------------------------------------

    def _query_feat(self, meta) -> np.ndarray:
        cfg = self.cfg
        if self.use_glove:
            return self._glove_embed(meta["query"])
        qid = meta["qid"]
        if cfg.dset_name in ("tvsum", "youtube_uni"):
            q = np.load(join(cfg.q_feat_dir, f"{qid}.npz"))["last_hidden_state"]
            return np.asarray(q, np.float32)
        candidates = [
            (join(cfg.q_feat_dir, f"qid{qid}.npz"), cfg.q_feat_type),
            (join(cfg.q_feat_dir, f"{qid}.npz"), cfg.q_feat_type),
            (join(cfg.q_feat_dir, f"{qid}.npy"), cfg.q_feat_type),
        ]
        trunc = cfg.max_q_l if cfg.q_feat_type == "last_hidden_state" else 0
        npy_path = join(cfg.q_feat_dir, f"{qid}.npy")
        if cfg.eos_first and os.path.exists(npy_path) and not any(
            os.path.exists(p) for p, _ in candidates[:2]
        ):
            # reorder BEFORE truncation/normalization, so no fused load
            q = _try_paths([(npy_path, None)])
            q = np.concatenate([q[-1:], q[4:-1]], axis=0)
            if trunc:
                q = q[:trunc]
            if cfg.normalize_t:
                q = l2_normalize(q)
        else:
            q = _try_paths(candidates, max_rows=trunc, l2norm=cfg.normalize_t)
        # NOTE: txt_drop is applied per-access in __getitem__, never here —
        # the cached copy must stay undropped
        return q

    def _video_feat(self, vid: str) -> np.ndarray:
        cfg = self.cfg
        feats = []
        for d in cfg.v_feat_dirs:
            if cfg.dset_name == "tvsum":
                rgb_path = join(d, f"{vid}_rgb.npy")
                if os.path.exists(rgb_path):
                    # l2-norm runs over the rgb+opt concat — not fusable
                    rgb = _try_paths([(rgb_path, None)], max_rows=cfg.max_v_l)
                    opt = _try_paths(
                        [(join(d, f"{vid}_opt.npy"), None)], max_rows=cfg.max_v_l
                    )
                    f = np.concatenate([rgb, opt], -1)
                    if cfg.normalize_v:
                        f = l2_normalize(f)
                else:
                    f = _try_paths(
                        [
                            (join(d, f"{vid}.npy"), None),
                            (join(d, f"{vid}.npz"), "features"),
                        ],
                        max_rows=cfg.max_v_l,
                        l2norm=cfg.normalize_v,
                    )
            else:
                f = _try_paths(
                    [
                        (join(d, f"{vid}.npz"), "features"),
                        (join(d, f"{vid}.pt"), None),
                        (join(d, f"{vid}.npy"), None),
                    ],
                    max_rows=cfg.max_v_l,
                    l2norm=cfg.normalize_v,
                )
            feats.append(f)
        n = min(len(f) for f in feats)
        return np.concatenate([f[:n] for f in feats], axis=1)

    def _drop_rows(self, emb):
        k = round(len(emb) * self.cfg.txt_drop_ratio)
        if k > 0:
            idx = self.rng.sample(range(len(emb)), k)
            emb = emb.copy()
            emb[idx] = 0
        return emb

    def _glove_embed(self, query: str) -> np.ndarray:
        from flashvtg_tpu.data.glove import GloveEmbedder

        if self._glove is None:
            with self._glove_lock:
                if self._glove is None:
                    self._glove = GloveEmbedder.default()
        return self._glove(query)

    # -- sample assembly ----------------------------------------------------

    def _build(self, meta) -> dict:
        """Deterministic per-sample features (cached across epochs)."""
        cfg = self.cfg
        out = {"vid": meta["vid"], "qid": meta["qid"]}
        out["query_feat"] = self._query_feat(meta)
        if self.use_video:
            out["video_feat"] = self._video_feat(meta["vid"])
            ctx_l = len(out["video_feat"])
        else:
            ctx_l = cfg.max_v_l
        if self.use_tef:
            tef_st = np.arange(0, ctx_l, dtype=np.float32) / ctx_l
            tef = np.stack([tef_st, tef_st + 1.0 / ctx_l], axis=1)
            out["video_feat"] = (
                np.concatenate([out["video_feat"], tef], axis=1)
                if self.use_video
                else tef
            )
        # TVSum clips beyond the annotated label rows are dropped — this is
        # deterministic (len of meta["label"]) and must live in the FEATURE
        # path so feed-resident features/masks match the streamed ones
        # (reference: label-length truncation after TEF concat). Applies to
        # the tef-only ctx_mode too: video_feat is then the TEF tensor.
        if cfg.dset_name == "tvsum" and "video_feat" in out and "label" in meta:
            n = min(len(meta["label"]), cfg.max_v_l, len(out["video_feat"]))
            out["video_feat"] = out["video_feat"][:n]
        return out

    def _attach_labels(self, meta, out: dict) -> None:
        """Per-access label generation (resampled every epoch, like the
        reference's random.sample inside __getitem__)."""
        cfg = self.cfg
        ctx_l = len(out["video_feat"]) if self.use_video else cfg.max_v_l

        if cfg.dset_name == "tvsum":
            out["gt_windows"] = np.zeros((1, 2), np.float32)
            pos, neg, sal = L.saliency_tvsum(meta["label"], ctx_l)
            if len(sal) != len(out["video_feat"]):
                out["video_feat"] = out["video_feat"][: len(sal)]
        elif cfg.dset_name == "youtube_uni":
            out["gt_windows"] = np.zeros((1, 2), np.float32)
            pos, neg, sal = L.saliency_youtube(meta["label"], ctx_l)
        elif "relevant_windows" in meta:
            out["gt_windows"] = L.span_windows(
                meta["relevant_windows"], ctx_l, cfg.clip_len, cfg.max_windows,
                self.rng,
            )
            if cfg.dset_name in ("charadesSTA", "tacos", "activitynet", "nlq",
                                 "charadesSTA_internvideo2"):
                pos, neg, sal = L.saliency_sub_as_query(
                    meta["relevant_windows"][0], meta["duration"], ctx_l, self.rng
                )
            else:
                pos, neg, sal = L.saliency_all(
                    meta["relevant_clip_ids"], meta["saliency_scores"], ctx_l,
                    self.rng,
                )
        else:  # test split without labels
            return
        out["saliency_pos_labels"] = np.asarray(pos, np.int64)
        out["saliency_neg_labels"] = np.asarray(neg, np.int64)
        out["saliency_all_labels"] = np.asarray(sal, np.float32)
