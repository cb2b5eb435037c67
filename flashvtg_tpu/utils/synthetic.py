"""Synthetic QVHighlights-format fixtures (features + jsonl annotations).

Used by the multichip dry-run (`__graft_entry__.dryrun_multichip`) and by
tests to drive the *production* data -> train -> eval path without real
feature dumps. Row schema follows the reference annotation format
(`/root/reference/data/README.md:1-24`, consumed by
FlashVTG/start_end_dataset.py:57-142).
"""

from __future__ import annotations

import os

import numpy as np

from flashvtg_tpu.utils.io import save_jsonl


def make_synthetic_qvh(
    root: str,
    n_queries: int = 16,
    v_dim: int = 32,
    t_dim: int = 24,
    n_clips: int = 16,
    clip_len: float = 2.0,
    seed: int = 0,
    deterministic_labels: bool = False,
):
    """Write a tiny QVH-style dataset under `root`.

    Returns (ann_path, vid_dir, txt_dir). Each query gets its own video so
    the negative-pair roll always finds a real negative.

    `deterministic_labels` forces every RNG-sampled label site to a
    singleton candidate pool (2-clip videos, one relevant clip, one GT
    window): labels.saliency_all's easy pos/neg draws and span_windows'
    subsample become value-deterministic, so label content no longer
    depends on the per-dataset RNG *stream* — required by tests that
    compare runs whose access orders differ (e.g. process-count
    invariance, where each host's dataset consumes its own stream).
    """
    rng = np.random.default_rng(seed)
    if deterministic_labels:
        n_clips = 2
    vdir = os.path.join(root, "vid_feats")
    qdir = os.path.join(root, "txt_feats")
    os.makedirs(vdir, exist_ok=True)
    os.makedirs(qdir, exist_ok=True)

    duration = n_clips * clip_len
    rows = []
    for i in range(n_queries):
        vid = f"synthvid_{i:04d}"
        if deterministic_labels:
            s, e = 0, 1
        else:
            s = int(rng.integers(0, n_clips - 2))
            e = int(rng.integers(s + 1, n_clips))
        rel_ids = list(range(s, e))
        rows.append(
            dict(
                qid=i,
                query=f"synthetic query {i}",
                duration=duration,
                vid=vid,
                relevant_clip_ids=rel_ids,
                saliency_scores=[
                    [int(x) for x in rng.integers(0, 5, 3)] for _ in rel_ids
                ],
                relevant_windows=[[s * clip_len, e * clip_len]],
            )
        )
        np.savez(
            os.path.join(vdir, f"{vid}.npz"),
            features=rng.standard_normal((n_clips, v_dim), dtype=np.float32),
        )
        lq = int(rng.integers(5, 12))
        np.savez(
            os.path.join(qdir, f"qid{i}.npz"),
            last_hidden_state=rng.standard_normal((lq, t_dim), dtype=np.float32),
        )
    ann = os.path.join(root, "synth.jsonl")
    save_jsonl(rows, ann)
    return ann, vdir, qdir
