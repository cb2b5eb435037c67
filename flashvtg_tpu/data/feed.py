"""HBM-resident feature store for training/eval feeds.

The reference preloads every feature file into host RAM at dataset init
(start_end_dataset.py:153-158) because its bottleneck was disk. On this
TPU the bottleneck is the host->device link: streaming a QVH train batch
(B=64: ~54 MB of features) per step measures ~0.6 steps/s — the wire, not
the chip, sets the pace. The TPU-native analogue of the reference's
preload is therefore HBM residency: collate every sample ONCE at the
static shapes, push the four big feature/mask tensors to device a single
time, and gather each batch on-device from int32 indices. Per-step host
traffic collapses to indices + label arrays (KBs).

Labels are NOT stored here: the reference resamples saliency pos/neg pairs
per access (start_end_dataset.py:239-250) and our dataset keeps that
semantics, so labels stream fresh every step (they are tiny).

Memory gate: `estimate_feed_bytes` lets the caller auto-disable residency
for sets that do not fit (e.g. charades_vgg/tacos at Lv=2048).
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)

FEED_KEYS = ("src_vid", "src_vid_mask", "src_txt", "src_txt_mask")

# feeds resident in HBM this process — train and eval feeds coexist during
# in-training eval, so the budget is SHARED: callers gate on
# `estimate <= budget - resident_feed_bytes()`. Tracked via weakrefs to one
# representative device array per feed, so a feed freed by GC (e.g. a
# finished train() in a sweep) releases its budget share automatically.
_LIVE_FEEDS: list = []  # (weakref to a feed array, total bytes)


def resident_feed_bytes() -> int:
    global _LIVE_FEEDS
    _LIVE_FEEDS = [(r, b) for r, b in _LIVE_FEEDS if r() is not None]
    return sum(b for _, b in _LIVE_FEEDS)


def estimate_feed_bytes(n: int, max_v_l: int, v_dim: int, max_q_l: int,
                        t_dim: int, dtype_bytes: int = 4) -> int:
    per_row = max_v_l * v_dim + max_q_l * t_dim  # features
    per_row += max_v_l + max_q_l  # masks (f32)
    return n * per_row * dtype_bytes


def build_device_feed(
    dataset,
    collator,
    sharding=None,
    dtype: Optional[str] = None,
    chunk: int = 256,
    workers: int = 8,
) -> Dict[str, object]:
    """Collate the whole dataset and place the feature tensors on device.

    Returns {key: device array of shape (N, ...)} for FEED_KEYS. `sharding`
    (usually replicated over the mesh) applies to every tensor; `dtype`
    optionally narrows the two feature tensors (e.g. "bfloat16" halves HBM
    and the one-time transfer). The per-sample feature loads (disk + parse +
    l2norm; the C++ loader releases the GIL) are warmed by a thread pool —
    each index is touched by exactly one worker, so the dataset's feature
    cache sees no write races.
    """
    import jax

    n = len(dataset)
    # features only: must NOT consume the dataset's label-sampling RNG
    # stream (labels are re-drawn per access, reference semantics)
    get = getattr(dataset, "features_only", dataset.__getitem__)
    if workers > 1 and n > workers:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=workers) as ex:
            # consume the iterator: warms the cache, results discarded
            for _ in ex.map(get, range(n)):
                pass
    host: Dict[str, np.ndarray] = {}
    for start in range(0, n, chunk):
        idx = range(start, min(start + chunk, n))
        batch = collator([get(i) for i in idx])
        for k in FEED_KEYS:
            v = batch[k]
            if dtype is not None and k in ("src_vid", "src_txt"):
                v = v.astype(dtype)
            if k not in host:
                host[k] = np.empty((n,) + v.shape[1:], v.dtype)
            host[k][start : start + len(v)] = v
    feed = {}
    total = 0
    for k, v in host.items():
        total += v.nbytes
        if sharding is not None:
            from flashvtg_tpu.parallel.mesh import put_replicated_global

            feed[k] = put_replicated_global(v, sharding)
        else:
            feed[k] = jax.device_put(v)
    import weakref

    _LIVE_FEEDS.append((weakref.ref(next(iter(feed.values()))), total))
    logger.info(
        "device feed: %d rows, %.2f GB resident in HBM (%.2f GB total)",
        n, total / 2**30, resident_feed_bytes() / 2**30,
    )
    return feed
