"""Full inference-pipeline parity: our batched jitted path (dataset ->
forward -> decode -> clamp -> postprocess -> jsonl) against the reference's
per-query eval loop (inference.py:232-355 semantics re-executed in torch)
with identical converted weights and identical feature files."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

from flashvtg_tpu.data.dataset import DataConfig, VTGDataset
from flashvtg_tpu.models.flashvtg import FlashVTGModel, ModelConfig
from flashvtg_tpu.train.config import from_preset
from flashvtg_tpu.train.infer import run_mr_inference
from flashvtg_tpu.utils.io import load_jsonl, save_jsonl
from flashvtg_tpu.utils.torch_convert import convert_checkpoint
from tests.reference_oracle import build_reference_model, make_args

V_DIM, T_DIM = 40, 24
N_QUERIES = 8


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("par")
    rows = load_jsonl("/root/reference/data/highlight_val_release.jsonl")[:N_QUERIES]
    save_jsonl(rows, root / "val.jsonl")
    (root / "vid").mkdir()
    (root / "txt").mkdir()
    rng = np.random.default_rng(0)
    for r in rows:
        lv = int(r["duration"] / 2)
        np.savez(root / "vid" / f"{r['vid']}.npz",
                 features=rng.standard_normal((lv, V_DIM), dtype=np.float32))
        lq = int(rng.integers(5, 18))
        np.savez(root / "txt" / f"qid{r['qid']}.npz",
                 last_hidden_state=rng.standard_normal((lq, T_DIM), dtype=np.float32))
    return root, rows


def test_full_inference_parity(env):
    root, rows = env
    torch.manual_seed(0)
    args = make_args(v_feat_dim=V_DIM + 2, t_feat_dim=T_DIM, dset_name="hl",
                     clip_length=2.0)
    ref = build_reference_model(args)

    cfg = from_preset(
        "qvhighlights_slowclip",
        v_feat_dim=V_DIM,
        t_feat_dim=T_DIM,
        v_feat_dirs=(str(root / "vid"),),
        t_feat_dir=str(root / "txt"),
        eval_path=str(root / "val.jsonl"),
        eval_bsz=4,
        num_dummies=args.num_dummies,
        t2v_layers=args.t2v_layers,
        enc_layers=args.enc_layers,
        dummy_layers=args.dummy_layers,
        kernel_size=args.kernel_size,
        num_conv_layers=args.num_conv_layers,
        num_mlp_layers=args.num_mlp_layers,
        nms_thd=-1.0,
        eval_precision="float32",
    )
    model = FlashVTGModel(cfg.model_config())
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_checkpoint(sd, cfg.model_config())

    dataset = VTGDataset(
        DataConfig(
            dset_name="hl",
            data_path=str(root / "val.jsonl"),
            v_feat_dirs=(str(root / "vid"),),
            q_feat_dir=str(root / "txt"),
            max_q_l=cfg.max_q_l,
            max_v_l=cfg.max_v_l,
            clip_len=2.0,
        )
    )
    submission, _, _ = run_mr_inference(cfg, model, params, dataset)

    # reference per-query loop on the same (preprocessed) features
    import sys

    sys.path.insert(0, "/root/reference")
    from FlashVTG.postprocessing import PostProcessorDETR

    post = PostProcessorDETR(
        clip_length=2, min_ts_val=0, max_ts_val=150, min_w_l=2, max_w_l=150,
        move_window_method="left",
        process_func_names=("clip_ts", "round_multiple"),
    )
    by_qid = {s["qid"]: s for s in submission}
    for i in range(N_QUERIES):
        meta, inputs = dataset[i]
        vfeat = torch.from_numpy(inputs["video_feat"][None])
        qfeat = torch.from_numpy(inputs["query_feat"][None])
        with torch.no_grad():
            out_ref = ref(
                qfeat, torch.ones(1, qfeat.shape[1]),
                vfeat, torch.ones(1, vfeat.shape[1]),
                [meta["vid"]], [meta["qid"]], targets={},
            )
        boundary = out_ref["_out"]["boundary"]
        spans = torch.clamp(boundary[:, :2], 0, meta["duration"]).numpy()
        scores = boundary[:, 2].numpy()
        lines = post([
            {
                "qid": meta["qid"],
                "pred_relevant_windows": np.concatenate(
                    [spans, scores[:, None]], axis=1
                ).tolist(),
            }
        ])
        ref_rows = np.asarray(lines[0]["pred_relevant_windows"])
        got_rows = np.asarray(by_qid[meta["qid"]]["pred_relevant_windows"])
        assert got_rows.shape == ref_rows.shape
        np.testing.assert_allclose(got_rows[:, 2], ref_rows[:, 2], atol=3e-4)
        np.testing.assert_allclose(
            np.sort(got_rows[:, 0]), np.sort(ref_rows[:, 0]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.sort(got_rows[:, 1]), np.sort(ref_rows[:, 1]), atol=1e-6
        )
        # saliency channel
        ref_sal = out_ref["_out"]["saliency"].numpy()
        got_sal = np.asarray(by_qid[meta["qid"]]["pred_saliency_scores"])
        np.testing.assert_allclose(got_sal, ref_sal, atol=5e-4)
