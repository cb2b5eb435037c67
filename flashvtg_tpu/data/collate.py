"""Static-shape batch assembly for the jitted train/eval steps.

Replaces the reference's dynamic batch-max padding (start_end_collate +
prepare_batch_inputs, start_end_dataset.py:534-588) with padding to fixed
(max_q_l, video-bucket) shapes so XLA compiles one program per bucket.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import numpy as np

from flashvtg_tpu.data.dataset import strip_vid_suffix
from flashvtg_tpu.ops.pad import bucket_length, pad_batch


def neg_pair_base(vids: Sequence[str], dset_name: str) -> List[str]:
    """Vid identities the negative-pair mask compares (model.py:268-272;
    'hl' strips the _start_end clip suffix so clips cut from one source
    video are not used as negatives). Single definition — the same rule
    feeds both the per-batch Collator mask and the multi-host global mask
    (train/loop.py)."""
    if dset_name in ("hl",):
        return [strip_vid_suffix(v) for v in vids]
    return list(vids)


def rolled_neg_mask(base: Sequence[str]) -> np.ndarray:
    """Rolled-by-one != own, the model's negative-pass pairing
    (models/flashvtg.py jnp.roll over axis 0)."""
    rolled = list(base[1:]) + list(base[:1])
    return np.asarray([a != b for a, b in zip(base, rolled)], np.float32)


@dataclasses.dataclass
class Collator:
    max_q_l: int
    v_buckets: Sequence[int]
    max_windows: int = 5
    dset_name: str = "hl"
    fixed_v_len: Optional[int] = None  # pin the video length (single-bucket)
    # skip padding the big feature/mask tensors — for feed-mode batches,
    # where features live HBM-resident (data/feed.py) and only labels and
    # bookkeeping cross the wire
    pad_features: bool = True

    def __call__(self, samples: List[tuple]) -> Dict[str, np.ndarray]:
        metas = [m for m, _ in samples]
        inputs = [x for _, x in samples]

        v_lens = [len(x["video_feat"]) for x in inputs]
        lv = self.fixed_v_len or bucket_length(max(v_lens), self.v_buckets)

        batch = {
            "valid_v_lens": np.asarray(
                [min(l, lv) for l in v_lens], np.int64
            ),
            "vid": [x["vid"] for x in inputs],
            "qid": [x["qid"] for x in inputs],
            "meta": metas,
        }
        if self.pad_features:
            src_vid, vid_mask = pad_batch([x["video_feat"] for x in inputs], lv)
            src_txt, txt_mask = pad_batch(
                [x["query_feat"] for x in inputs], self.max_q_l
            )
            batch.update(
                src_txt=src_txt,
                src_txt_mask=txt_mask,
                src_vid=src_vid,
                src_vid_mask=vid_mask,
            )

        if "saliency_all_labels" in inputs[0]:
            sal, _ = pad_batch(
                [x["saliency_all_labels"] for x in inputs], lv
            )
            batch["saliency_all_labels"] = sal
            batch["saliency_pos_labels"] = np.stack(
                [x["saliency_pos_labels"] for x in inputs]
            )
            batch["saliency_neg_labels"] = np.stack(
                [x["saliency_neg_labels"] for x in inputs]
            )
        if "gt_windows" in inputs[0]:
            m = self.max_windows
            gt = np.full((len(inputs), m, 2), np.inf, np.float32)
            for i, x in enumerate(inputs):
                w = x["gt_windows"][:m]
                gt[i, : len(w)] = w
            batch["gt_windows"] = gt

        # negative-pair indicator: rolled-by-one video differs from own
        batch["real_neg_mask"] = rolled_neg_mask(
            neg_pair_base(batch["vid"], self.dset_name)
        )
        return batch


def device_arrays(batch: Dict) -> Dict:
    """The jit-visible subset of a collated batch."""
    keys = (
        "src_txt",
        "src_txt_mask",
        "src_vid",
        "src_vid_mask",
        "saliency_all_labels",
        "saliency_pos_labels",
        "saliency_neg_labels",
        "gt_windows",
        "real_neg_mask",
    )
    return {k: batch[k] for k in keys if k in batch}
