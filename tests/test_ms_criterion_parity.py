"""_ms loss-stack parity vs the reference FlashVTG_ms SetCriterion."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from flashvtg_tpu.losses.criterion_ms import MSLossConfig, compute_losses_ms
from flashvtg_tpu.models.points import generate_points
from tests.reference_oracle import install_nncore_stub

B, LV, LQ, M, NPHRASE = 4, 20, 7, 2, 3
STRIDES = (1, 2)
CLIP_LEN = 2.0


@pytest.fixture(scope="module", params=[False, True], ids=["l1", "dfl"])
def ref_criterion(request):
    install_nncore_stub()
    from types import SimpleNamespace

    from FlashVTG_ms.loss import SetCriterion

    use_dfl = request.param
    args = SimpleNamespace(
        device="cpu",
        dset_name="hl",
        lw_wattn=1.0,
        sample_radius=1.5,
        use_dfl=use_dfl,
        num_bins=8,
    )
    weight_dict = {
        "loss_label": 4.0, "loss_saliency": 0.1, "loss_reg": 0.2,
        "loss_cls": 1.0, "loss_sal": 0.1, "loss_phrase_slot": 1.0,
        "loss_qfl": 0.0,
    }
    crit = SetCriterion(
        weight_dict=weight_dict, eos_coef=0.1,
        losses=["saliency", "labels", "phrase_slot", "sal", "reg", "cls", "qfl"],
        saliency_margin=0.2, args=args,
    )
    return crit, use_dfl


def _case(rng, use_dfl):
    points = generate_points(LV, STRIDES)
    n = len(points)
    valid = np.ones((B, LV), np.float32)
    valid[0, LV - 3 :] = 0
    coord_dim = 16 if use_dfl else 2
    outputs = {
        "saliency_scores": rng.standard_normal((B, LV)).astype(np.float32),
        "t2vattnvalues": rng.uniform(0.05, 0.95, (B, LV)).astype(np.float32),
        "video_msk": valid,
        "out_class": rng.standard_normal((B, n, 1)).astype(np.float32),
        "out_coord": (
            rng.standard_normal((B, n, coord_dim)).astype(np.float32)
            if use_dfl
            else rng.uniform(0.1, 3.0, (B, n, 2)).astype(np.float32)
        ),
        "sim_score": rng.uniform(-1, 1, (B, LV)).astype(np.float32),
        "slot_att": rng.uniform(0, 1, (B, NPHRASE, LQ - 1)).astype(np.float32),
        "point": points,
        "real_neg_mask": np.asarray([1, 1, 0, 1], np.float32),
        "saliency_scores_neg": rng.standard_normal((B, LV)).astype(np.float32),
        "t2vattnvalues_neg": rng.uniform(0.05, 0.95, (B, LV)).astype(np.float32),
    }
    pymid_msk = []
    for s in STRIDES:
        out_len = (LV - s) // s + 1
        pymid_msk.append(valid[:, : out_len * s].reshape(B, out_len, s).max(2))
    outputs["pymid_msk"] = pymid_msk

    labels = rng.integers(0, 5, (B, LV)).astype(np.float32) * valid
    gt = np.full((B, M, 2), np.inf, np.float32)
    metas = []
    for i in range(B):
        k = int(rng.integers(1, M + 1))
        wins = []
        for _ in range(k):
            st = float(rng.integers(0, LV - 4)) * CLIP_LEN
            wins.append([st, st + float(rng.integers(1, 5)) * CLIP_LEN])
        gt[i, :k] = wins
        metas.append({"relevant_windows": wins})
    targets = {
        "saliency_all_labels": labels,
        "saliency_pos_labels": rng.integers(0, LV // 2, (B, 2)),
        "saliency_neg_labels": rng.integers(LV // 2, LV, (B, 2)),
        "gt_windows": gt,
    }
    return outputs, targets, metas


def test_ms_loss_parity(ref_criterion):
    crit, use_dfl = ref_criterion
    rng = np.random.default_rng(5)
    outputs, targets, metas = _case(rng, use_dfl)

    # reference forward
    t = {k: torch.from_numpy(np.asarray(v)) for k, v in targets.items()}
    t.pop("gt_windows")
    t["fps"] = torch.full((256,), 1.0 / CLIP_LEN)
    o = {}
    for k, v in outputs.items():
        if k == "pymid_msk":
            o[k] = [torch.from_numpy(m) for m in v]
        elif k == "real_neg_mask":
            o[k] = torch.from_numpy(v).bool()
        elif k in ("saliency_scores_neg", "t2vattnvalues_neg"):
            o[k] = torch.from_numpy(v[outputs["real_neg_mask"] > 0])
        else:
            o[k] = torch.from_numpy(np.asarray(v))
    with torch.no_grad():
        ref = crit((metas, None), 0, o, t)
    ref = {k: float(v) for k, v in ref.items() if "loss" in k}

    cfg = MSLossConfig(
        clip_length=CLIP_LEN, dset_name="hl", use_dfl=use_dfl, num_bins=8,
    )
    jo = {
        k: (tuple(jnp.asarray(m) for m in v) if k == "pymid_msk"
            else jnp.asarray(np.asarray(v)))
        for k, v in outputs.items()
    }
    jt = {k: jnp.asarray(np.asarray(v)) for k, v in targets.items()}
    mine = {k: float(v) for k, v in compute_losses_ms(jo, jt, cfg).items()}

    for key in ("loss_saliency", "loss_label", "loss_phrase_slot", "loss_sal",
                "loss_reg", "loss_cls", "loss_qfl"):
        assert key in ref, (key, sorted(ref))
        np.testing.assert_allclose(
            mine[key], ref[key], rtol=3e-5, atol=2e-5, err_msg=key
        )
