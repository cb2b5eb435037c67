"""TVSum / YouTube-HL highlight pipeline: dataset -> inference -> top-5 mAP.

Also oracle-checks the per-video AP protocol against the reference
compute_hl_results arithmetic (inference.py:157-214) re-executed in numpy.
"""

import numpy as np
import pytest

import jax

from flashvtg_tpu.data.dataset import DataConfig, VTGDataset
from flashvtg_tpu.eval.hl import compute_hl_map, tvsum_video_ap, youtube_video_ap
from flashvtg_tpu.train.config import from_preset
from flashvtg_tpu.train.infer import run_hl_inference
from flashvtg_tpu.utils.io import save_jsonl


def _reference_tvsum_ap(pred, label, topk=5):
    """Direct numpy re-execution of the UMT/tvsum protocol (oracle)."""
    import torch

    pred = torch.from_numpy(np.asarray(pred, np.float64))
    label = np.asarray(label, np.float64)
    aps = []
    for i in range(label.shape[1]):
        cur_pred = pred[: len(label)]
        inds = torch.argsort(cur_pred, descending=True, dim=-1)
        cur_label = torch.Tensor(label)[:, i]
        cur_label = torch.where(cur_label > cur_label.median(), 1.0, 0.0)
        cur_label = cur_label[inds].tolist()[:topk]
        num_gt = sum(cur_label)
        if num_gt == 0:
            aps.append(0)
            continue
        hits = ap = rec = 0
        prc = 1
        for j, gt in enumerate(cur_label):
            hits += gt
            _rec = hits / num_gt
            _prc = hits / (j + 1)
            ap += (_rec - rec) * (prc + _prc) / 2
            rec, prc = _rec, _prc
        aps.append(ap)
    return aps


def test_tvsum_ap_protocol_parity():
    pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    for _ in range(5):
        n = int(rng.integers(20, 60))
        pred = rng.standard_normal(n)
        label = rng.integers(1, 6, (n, 20))
        ours = tvsum_video_ap(pred, label)
        ref = _reference_tvsum_ap(pred, label)
        np.testing.assert_allclose(ours, ref, atol=1e-9)


def test_youtube_ap_simple():
    pred = np.array([0.9, 0.1, 0.8, 0.2])
    labels = np.array([[1], [0], [1], [0]])
    (ap,) = youtube_video_ap(pred, labels)
    assert ap == pytest.approx(1.0)


@pytest.fixture(scope="module")
def tvsum_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("tvsum")
    rng = np.random.default_rng(1)
    rows = []
    vids = ["WxtbjNsCQ8A", "EE-bNr36nyA", "Se3oxnaPsz0"]
    (root / "vid").mkdir()
    (root / "txt").mkdir()
    for v in vids:
        n_clips = int(rng.integers(30, 60))
        rows.append(
            {
                "qid": v,
                "query": "news title",
                "duration": n_clips * 2.0,
                "vid": v,
                "relevant_clip_ids": None,
                "relevant_windows": None,
                "label": rng.integers(1, 6, (n_clips, 20)).tolist(),
                "domain": "BK",
            }
        )
        np.save(root / "vid" / f"{v}_rgb.npy",
                rng.standard_normal((n_clips, 16), dtype=np.float32))
        np.save(root / "vid" / f"{v}_opt.npy",
                rng.standard_normal((n_clips, 16), dtype=np.float32))
        np.savez(root / "txt" / f"{v}.npz",
                 last_hidden_state=rng.standard_normal((7, 24), dtype=np.float32))
    save_jsonl(rows, root / "val.jsonl")
    return root, rows


def test_tvsum_inference_pipeline(tvsum_env):
    root, rows = tvsum_env
    cfg = from_preset(
        "tvsum",
        v_feat_dim=32,
        t_feat_dim=24,
        v_feat_dirs=(str(root / "vid"),),
        t_feat_dir=str(root / "txt"),
        eval_path=str(root / "val.jsonl"),
        dset_domain="BK",
        max_v_l=64,
        eval_bsz=2,
        num_dummies=2,
        t2v_layers=1,
        enc_layers=1,
        dummy_layers=1,
        eval_precision="float32",
    )
    model = cfg.build_model()
    dataset = VTGDataset(
        DataConfig(
            dset_name="tvsum",
            data_path=str(root / "val.jsonl"),
            v_feat_dirs=(str(root / "vid"),),
            q_feat_dir=str(root / "txt"),
            max_v_l=64,
            dset_domain="BK",
        )
    )
    assert len(dataset) == 3
    rng = jax.random.PRNGKey(0)
    import jax.numpy as jnp

    params = jax.jit(model.init, static_argnames="train")(
        {"params": rng},
        jnp.zeros((1, cfg.max_q_l, 24)),
        jnp.ones((1, cfg.max_q_l)),
        jnp.zeros((1, 64, 34)),
        jnp.ones((1, 64)),
        train=False,
    )
    metrics = run_hl_inference(cfg, model, params, dataset)
    assert 0.0 <= metrics["brief"]["mAP"] <= 1.0


def test_tvsum_feed_matches_streamed_with_truncation(tmp_path):
    """TVSum videos with MORE clips than annotated label rows are truncated
    in the deterministic feature path, so the HBM-resident eval feed and the
    streamed path see identical features/masks (regression: the truncation
    used to live in the label path, which features_only() skipped)."""
    import json

    rng = np.random.default_rng(3)
    (tmp_path / "vid").mkdir()
    (tmp_path / "txt").mkdir()
    rows = []
    for i, (n_feat, n_label) in enumerate([(40, 30), (25, 25), (30, 40)]):
        vid = f"tv{i}"
        rows.append(dict(
            qid=vid, query=f"q{i}", duration=n_feat, vid=vid,
            relevant_clip_ids=None, relevant_windows=None,
            label=[[float(x) for x in rng.integers(1, 6, 20)]
                   for _ in range(n_label)],
            domain="VT",
        ))
        np.savez(tmp_path / "vid" / f"{vid}.npz",
                 features=rng.standard_normal((n_feat, 16), dtype=np.float32))
        np.savez(tmp_path / "txt" / f"{vid}.npz",
                 last_hidden_state=rng.standard_normal((6, 12),
                                                       dtype=np.float32))
    save_jsonl(rows, tmp_path / "val.jsonl")

    cfg = from_preset(
        "tvsum",
        v_feat_dim=16, t_feat_dim=12, max_v_l=48, max_q_l=8, eval_bsz=2,
        dset_domain="VT", hidden_dim=16, dim_feedforward=32, t2v_layers=1,
        enc_layers=1, dummy_layers=1, num_dummies=2, num_mlp_layers=2,
        num_conv_layers=1, eval_precision="float32",
        v_feat_dirs=(str(tmp_path / "vid"),), t_feat_dir=str(tmp_path / "txt"),
        eval_path=str(tmp_path / "val.jsonl"),
    )
    import jax.numpy as jnp

    model = cfg.build_model()
    rng_j = jax.random.PRNGKey(0)
    params = jax.jit(model.init, static_argnames="train")(
        {"params": rng_j},
        jnp.zeros((1, 8, 12)), jnp.ones((1, 8)),
        jnp.zeros((1, 48, 18)), jnp.ones((1, 48)),
        train=False,
    )

    def dataset():
        return VTGDataset(DataConfig(
            dset_name="tvsum", data_path=str(tmp_path / "val.jsonl"),
            v_feat_dirs=(str(tmp_path / "vid"),),
            q_feat_dir=str(tmp_path / "txt"), max_q_l=8, max_v_l=48,
            dset_domain="VT",
        ))

    # truncation happened in the feature path: video 0 is 30 rows, not 40
    ds = dataset()
    _, s0 = ds[0]
    assert len(s0["video_feat"]) == 30
    _, f0 = ds.features_only(0)
    assert len(f0["video_feat"]) == 30

    m_on = run_hl_inference(
        cfg.replace(device_feed="on"), model, params, dataset()
    )
    m_off = run_hl_inference(
        cfg.replace(device_feed="off"), model, params, dataset()
    )
    np.testing.assert_allclose(
        m_on["brief"]["mAP"], m_off["brief"]["mAP"], rtol=1e-6
    )
