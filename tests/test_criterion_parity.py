"""Loss-stack parity vs the reference SetCriterion + BundleLoss.

The reference composes ~10 loss terms with per-sample Python loops and
dynamic gathers; our implementation is fully vectorized/masked. This test
feeds both with identical random tensors and asserts matching values.

FocalLoss / L1Loss live in the external nncore package; minimal torch
mirrors (mmdet formulation, matching flashvtg_tpu/losses/basic.py) are
registered into the stub registry — the parity assertion therefore checks
the *composition* (target assignment, masking, averaging, branch folding),
which is where vectorization bugs would hide.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from flashvtg_tpu.losses.criterion import LossConfig, compute_losses
from flashvtg_tpu.models.points import generate_points
from tests.reference_oracle import install_nncore_stub

B, LV, LQ, D, M = 4, 20, 7, 16, 3
STRIDES = (1, 2, 4, 8)
CLIP_LEN = 2.0


def _register_stub_losses():
    install_nncore_stub()
    import torch.nn.functional as F
    from nncore.nn import LOSSES

    if "FocalLoss" in LOSSES.map:
        return

    class FocalLoss(torch.nn.Module):
        def __init__(self, alpha=0.25, gamma=2.0, loss_weight=1.0):
            super().__init__()
            self.alpha, self.gamma, self.w = alpha, gamma, loss_weight

        def forward(self, pred, target, weight=None, avg_factor=None):
            p = pred.sigmoid()
            pt = (1 - p) * target + p * (1 - target)
            fw = (self.alpha * target + (1 - self.alpha) * (1 - target)) * pt.pow(
                self.gamma
            )
            loss = (
                F.binary_cross_entropy_with_logits(pred, target, reduction="none")
                * fw
            )
            if weight is not None:
                loss = loss * weight
            return self.w * loss.sum() / avg_factor

    class L1Loss(torch.nn.Module):
        def __init__(self, loss_weight=1.0):
            super().__init__()
            self.w = loss_weight

        def forward(self, pred, target, weight=None, avg_factor=None):
            loss = (pred - target).abs()
            if weight is not None:
                loss = loss * weight
            return self.w * loss.sum() / avg_factor

    LOSSES.map["FocalLoss"] = FocalLoss
    LOSSES.map["L1Loss"] = L1Loss


@pytest.fixture(scope="module")
def ref_criterion():
    _register_stub_losses()
    from types import SimpleNamespace

    from FlashVTG.model import SetCriterion

    loss_cfg = dict(
        type="BundleLoss",
        sample_radius=1.5,
        loss_cls=dict(type="FocalLoss"),
        loss_reg=dict(type="L1Loss"),
        loss_sal=dict(type="SampledNCELoss"),
    )
    args = SimpleNamespace(
        device="cpu",
        dset_name="hl",
        lw_wattn=1.0,
        cfg=SimpleNamespace(model=SimpleNamespace(loss_cfg=loss_cfg)),
    )
    weight_dict = {
        "loss_label": 4.0,
        "loss_saliency": 0.1,
        "loss_reg": 0.2,
        "loss_cls": 1.0,
        "loss_sal": 0.1,
    }
    return SetCriterion(
        weight_dict=weight_dict, eos_coef=0.1, losses=["saliency", "labels"],
        saliency_margin=0.2, args=args,
    )


def _random_case(rng, with_neg=True, short_rows=0, n_false_neg=1):
    points = generate_points(LV, STRIDES)
    n = len(points)
    valid = np.ones((B, LV), np.float32)
    for i in range(short_rows):
        valid[i, LV - 4 - i :] = 0

    outputs = {
        "saliency_scores": rng.standard_normal((B, LV)).astype(np.float32),
        "t2vattnvalues": rng.uniform(0.05, 0.95, (B, LV)).astype(np.float32),
        "video_msk": valid,
        "out_class": rng.standard_normal((B, n, 1)).astype(np.float32),
        "out_coord": rng.uniform(0.1, 3.0, (B, n, 2)).astype(np.float32),
        "video_emb": rng.standard_normal((B, LV, D)).astype(np.float32),
        "query_emb": rng.standard_normal((B, 1, D)).astype(np.float32),
        "point": points,
    }
    # pooled pyramid masks from the validity mask
    pymid_msk = []
    for s in STRIDES:
        if LV < s:
            continue
        out_len = (LV - s) // s + 1
        pymid_msk.append(
            valid[:, : out_len * s].reshape(B, out_len, s).max(2)
        )
    outputs["pymid_msk"] = pymid_msk

    labels = rng.integers(0, 5, (B, LV)).astype(np.float32) * valid
    gt = np.full((B, M, 2), np.inf, np.float32)
    metas = []
    for i in range(B):
        k = rng.integers(1, M + 1)
        windows = []
        for _ in range(k):
            st = float(rng.integers(0, LV - 4)) * CLIP_LEN
            ed = st + float(rng.integers(1, 5)) * CLIP_LEN
            windows.append([st, ed])
        gt[i, :k] = windows
        metas.append({"relevant_windows": windows})

    targets = {
        "saliency_all_labels": labels,
        "saliency_pos_labels": rng.integers(0, LV // 2, (B, 2)),
        "saliency_neg_labels": rng.integers(LV // 2, LV, (B, 2)),
        "gt_windows": gt,
    }
    if with_neg:
        real_neg = np.ones(B, np.float32)
        real_neg[1 : 1 + n_false_neg] = 0
        outputs["real_neg_mask"] = real_neg
        outputs["saliency_scores_neg"] = rng.standard_normal((B, LV)).astype(
            np.float32
        )
        outputs["t2vattnvalues_neg"] = rng.uniform(0.05, 0.95, (B, LV)).astype(
            np.float32
        )
    return outputs, targets, metas


def _ref_losses(criterion, outputs, targets, metas):
    t = {k: torch.from_numpy(np.asarray(v)) for k, v in targets.items()}
    t.pop("gt_windows")
    t["fps"] = torch.full((256,), 1.0 / CLIP_LEN)
    t["label"] = metas
    o = {}
    for k, v in outputs.items():
        if k == "pymid_msk":
            o[k] = [torch.from_numpy(m) for m in v]
        elif k == "real_neg_mask":
            o[k] = torch.from_numpy(v).bool()
        elif k == "saliency_scores_neg" and v is not None:
            # the reference model emits only the gathered real-neg rows
            o[k] = torch.from_numpy(v[outputs["real_neg_mask"] > 0])
        elif k == "t2vattnvalues_neg" and v is not None:
            o[k] = torch.from_numpy(v[outputs["real_neg_mask"] > 0])
        else:
            o[k] = torch.from_numpy(np.asarray(v))
    if "saliency_scores_neg" not in o:
        o["saliency_scores_neg"] = None
        o["t2vattnvalues_neg"] = None
        o["real_neg_mask"] = None
    batch = (metas, None)
    with torch.no_grad():
        losses = criterion(batch, o, t)
    # BundleLoss merges loss keys into the outputs dict; keep scalars only
    return {k: float(v) for k, v in losses.items() if "loss" in k}


def _my_losses(outputs, targets, with_neg):
    cfg = LossConfig(
        loss_cls="focal", loss_reg="l1", loss_sal="nce",
        clip_length=CLIP_LEN, dset_name="hl",
    )
    o = {k: jnp.asarray(np.asarray(v)) if not isinstance(v, list) else
         tuple(jnp.asarray(m) for m in v) for k, v in outputs.items()}
    t = {k: jnp.asarray(np.asarray(v)) for k, v in targets.items()}
    losses = compute_losses(o, t, cfg)
    return {k: float(v) for k, v in losses.items()}


@pytest.mark.parametrize(
    "with_neg,short_rows,n_false_neg",
    [(True, 0, 1), (True, 2, 1), (True, 0, 2), (False, 1, 0)],
)
def test_loss_parity(ref_criterion, with_neg, short_rows, n_false_neg):
    rng = np.random.default_rng(short_rows + (10 if with_neg else 0))
    outputs, targets, metas = _random_case(rng, with_neg, short_rows, n_false_neg)
    if not with_neg:
        outputs.pop("real_neg_mask", None)
    ref = _ref_losses(ref_criterion, outputs, targets, metas)
    mine = _my_losses(outputs, targets, with_neg)
    for key in ("loss_reg", "loss_cls", "loss_sal", "loss_label", "loss_saliency"):
        assert key in ref and key in mine
        np.testing.assert_allclose(
            mine[key], ref[key], rtol=2e-5, atol=1e-5, err_msg=key
        )
