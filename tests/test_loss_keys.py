"""loss_keys()/loss_keys_ms() must exactly predict compute_losses' key set
for every loss-bundle shape the presets can produce — the train step stacks
its loss vector in this declared order."""

import numpy as np
import pytest

import jax.numpy as jnp

from flashvtg_tpu.losses.criterion import LossConfig, compute_losses, loss_keys
from flashvtg_tpu.losses.criterion_ms import (
    MSLossConfig,
    compute_losses_ms,
    loss_keys_ms,
)
from flashvtg_tpu.models.points import generate_points

B, LV = 3, 12
STRIDES = (1, 2)


def _outputs(rng, with_neg=True, ms=False, coord_dim=2):
    points = generate_points(LV, STRIDES)
    n = len(points)
    valid = np.ones((B, LV), np.float32)
    out = {
        "saliency_scores": rng.standard_normal((B, LV)).astype(np.float32),
        "t2vattnvalues": rng.uniform(0.05, 0.95, (B, LV)).astype(np.float32),
        "video_msk": valid,
        "pymid_msk": [np.ones((B, LV), np.float32),
                      np.ones((B, LV // 2), np.float32)],
        "out_class": rng.standard_normal((B, n, 1)).astype(np.float32),
        "out_coord": np.abs(rng.standard_normal((B, n, coord_dim))).astype(
            np.float32
        ),
        "point": jnp.asarray(points),
        "video_emb": rng.standard_normal((B, LV, 8)).astype(np.float32),
        "query_emb": rng.standard_normal((B, 1, 8)).astype(np.float32),
    }
    if ms:
        out["sim_score"] = rng.standard_normal((B, LV)).astype(np.float32)
        out["slot_att"] = rng.uniform(0, 1, (B, 2, LV)).astype(np.float32)
        out["eos_slot"] = rng.standard_normal((B, 1, 8)).astype(np.float32)
        out["eos_emb"] = rng.standard_normal((B, 1, 8)).astype(np.float32)
        out["context_agg"] = rng.standard_normal((B, LV, 8)).astype(np.float32)
    if with_neg:
        out["saliency_scores_neg"] = rng.standard_normal((B, LV)).astype(
            np.float32
        )
        out["t2vattnvalues_neg"] = rng.uniform(0.05, 0.95, (B, LV)).astype(
            np.float32
        )
        out["real_neg_mask"] = np.ones((B,), np.float32)
    return out


def _targets(rng):
    return {
        "saliency_all_labels": rng.integers(0, 4, (B, LV)).astype(np.float32),
        "saliency_pos_labels": rng.integers(0, LV, (B, 2)),
        "saliency_neg_labels": rng.integers(0, LV, (B, 2)),
        "gt_windows": np.tile(np.asarray([[[2.0, 8.0]]], np.float32), (B, 1, 1)),
    }


@pytest.mark.parametrize(
    "cfg",
    [
        LossConfig(),  # MR default: focal + l1 + nce
        LossConfig(loss_cls="dynamic_bce", loss_reg=None,
                   nce_direction=("row",)),  # HD bundle
        LossConfig(loss_qfl=True),
        LossConfig(loss_sal=None, loss_cls=None, loss_reg=None),
    ],
    ids=["mr", "hd", "qfl", "bare"],
)
def test_core_keys_match(cfg):
    rng = np.random.default_rng(0)
    losses = compute_losses(_outputs(rng), _targets(rng), cfg)
    assert tuple(sorted(losses)) == loss_keys(cfg)


@pytest.mark.parametrize("use_eos", [False, True])
def test_ms_keys_match(use_eos):
    rng = np.random.default_rng(0)
    cfg = MSLossConfig(use_eos=use_eos)
    losses = compute_losses_ms(
        _outputs(rng, ms=True), _targets(rng), cfg
    )
    assert tuple(sorted(losses)) == loss_keys_ms(cfg)
