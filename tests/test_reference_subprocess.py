"""The last integration seam: execute the reference's OWN entry point.

Every other parity test re-runs reference *modules* inside this harness.
Here the literal chain `TestOptions().parse -> setup_model -> eval_epoch ->
PostProcessorDETR -> eval_submission` (/root/reference/FlashVTG/
inference.py:484-546) runs as a subprocess — `python FlashVTG/inference.py`
with its exact 8-argv launch shape (inference.py:551-556 unpacks argv
positionally) — against a checkpoint produced by `cli export`, reading the
opt.json + model_cfg.py sidecars the export writes. Its submission jsonl
and metrics JSON are then byte-diffed against `cli.py infer` on the same
inputs. External packages the reference needs (nncore, torchtext, wandb)
are provided by tests/reference_oracle.write_subprocess_shims.

Byte-parity contract (measured): all four metrics/nms-metrics JSON files
byte-identical; every pred_relevant_windows scalar identical (post-NMS
rank order compared up to equal-score ties, whose order the reference
leaves to an unstable torch sort, inference.py:52); saliency
scores identical except a ~1% tail that flips the 4th decimal by exactly
one step — the raw f32 saliency differs at ulp level between the torch-CPU
and XLA-CPU stacks (different padded extents => different accumulation
order), which crosses the 1e-4 rounding boundary for values near a tie.
Window decode + NMS + both metric suites are exact end-to-end.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from flashvtg_tpu.utils.io import load_jsonl, save_jsonl

from tests.reference_oracle import write_subprocess_shims

REF_ROOT = "/root/reference"
REF_GT = os.path.join(REF_ROOT, "data/highlight_val_release.jsonl")
N_QUERIES = 16
V_DIM, T_DIM = 32, 24

pytestmark = pytest.mark.slow

MODEL_FLAGS = [
    "--v_feat_dim", str(V_DIM), "--t_feat_dim", str(T_DIM),
    "--num_dummies", "4", "--t2v_layers", "2", "--enc_layers", "2",
    "--dummy_layers", "1", "--num_mlp_layers", "3",
]


@pytest.fixture(scope="module")
def exported_run(tmp_path_factory):
    """Synthetic QVH subset -> cli train (1 epoch) -> cli export + sidecars."""
    from flashvtg_tpu.cli import main as cli_main

    root = tmp_path_factory.mktemp("refsub")
    rows = load_jsonl(REF_GT)[:N_QUERIES]
    ann = root / "val.jsonl"
    save_jsonl(rows, ann)
    vdir, qdir = root / "vid", root / "txt"
    vdir.mkdir()
    qdir.mkdir()
    rng = np.random.default_rng(7)
    for r in rows:
        lv = int(r["duration"] / 2)
        np.savez(vdir / f"{r['vid']}.npz",
                 features=rng.standard_normal((lv, V_DIM), dtype=np.float32))
        lq = int(rng.integers(5, 20))
        np.savez(qdir / f"qid{r['qid']}.npz",
                 last_hidden_state=rng.standard_normal((lq, T_DIM),
                                                       dtype=np.float32))

    data_flags = [
        "--v_feat_dirs", str(vdir), "--t_feat_dir", str(qdir),
        "--eval_path", str(ann),
    ]
    rc = cli_main(
        ["train", "qvhighlights_slowclip", *MODEL_FLAGS, *data_flags,
         "--train_path", str(ann), "--n_epoch", "1", "--bsz", "8",
         "--eval_bsz", "8", "--eval_epoch", "1",
         "--results_root", str(root / "results"), "--exp_id", "refsub",
         "--train_precision", "float32", "--eval_precision", "float32",
         # oracle weight-generators train with the pre-round-5
         # threefry mask stream pinned: the byte-parity goldens were
         # established under it, and a dropout-RNG default change
         # must not be able to move a metric onto a cross-stack
         # rounding boundary (dummy_dropout stays live even at
         # --dropout 0, so pinning the impl is the only full pin)
         "--dropout_rng_impl", "threefry"]
    )
    assert rc == 0
    run_dir = next((root / "results").glob("hl-*refsub*"))

    export_dir = root / "export"
    export_dir.mkdir()
    ckpt = export_dir / "model.ckpt"
    rc = cli_main(
        ["export", "qvhighlights_slowclip", *MODEL_FLAGS, *data_flags,
         "--resume", str(run_dir / "model_best"),
         "--export_path", str(ckpt)]
    )
    assert rc == 0
    assert (export_dir / "opt.json").exists(), "export must write opt.json"
    assert (export_dir / "model_cfg.py").exists()
    return root, ann, ckpt, data_flags


def test_reference_inference_byte_parity(exported_run):
    root, ann, ckpt, data_flags = exported_run
    export_dir = os.path.dirname(str(ckpt))

    shims = write_subprocess_shims(str(root / "shims"))
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join([shims, REF_ROOT])
    env.pop("JAX_PLATFORMS", None)  # pure-torch subprocess
    # exact launch shape of scripts/inference.sh: 8 argv entries, the
    # __main__ block unpacks argv[5]=split, argv[7]=splitfile
    proc = subprocess.run(
        [sys.executable, "FlashVTG/inference.py",
         os.path.join(export_dir, "model_cfg.py"),
         "--resume", str(ckpt),
         "--eval_split_name", "val",
         "--eval_path", str(ann)],
        cwd=REF_ROOT, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, (
        f"reference inference.py failed\nstdout:\n{proc.stdout[-3000:]}\n"
        f"stderr:\n{proc.stderr[-3000:]}"
    )
    ref_sub = os.path.join(export_dir, "hl_val_submission.jsonl")
    assert os.path.exists(ref_sub), proc.stderr[-2000:]

    # our CLI on the exported checkpoint and the same inputs
    from flashvtg_tpu.cli import main as cli_main

    rc = cli_main(
        ["infer", "qvhighlights_slowclip", *MODEL_FLAGS, *data_flags,
         "--resume", str(ckpt), "--eval_precision", "float32"]
    )
    assert rc == 0
    our_sub = os.path.join(export_dir, "infer_hl_val_preds.jsonl")
    assert os.path.exists(our_sub)
    _compare_mr_artifacts(ref_sub, our_sub, N_QUERIES)


def _compare_mr_artifacts(ref_sub, our_sub, n_queries):
    """The measured hl-branch byte-parity contract (module docstring):
    metrics byte-identical, windows exact (NMS ties as sets), saliency
    bounded to rare single 4th-decimal rounding flips."""
    # metrics: byte-for-byte, both plain and nms
    for suffix in ("_metrics.json", "_nms_thd_0.7_metrics.json"):
        ref_path = ref_sub.replace(".jsonl", suffix)
        our_path = our_sub.replace(".jsonl", suffix)
        assert os.path.exists(ref_path), ref_path
        assert os.path.exists(our_path), our_path
        with open(ref_path, "rb") as f:
            ref_bytes = f.read()
        with open(our_path, "rb") as f:
            our_bytes = f.read()
        assert ref_bytes == our_bytes, f"metrics byte diff in {suffix}"

    # submissions: windows exact, saliency bounded (see module docstring)
    for suffix in ("", "_nms_thd_0.7"):
        ref_rows = load_jsonl(ref_sub.replace(".jsonl", suffix + ".jsonl"))
        our_rows = load_jsonl(our_sub.replace(".jsonl", suffix + ".jsonl"))
        assert len(ref_rows) == len(our_rows) == n_queries
        total = flips = 0
        for r, o in zip(ref_rows, our_rows):
            for key in ("qid", "query", "vid"):
                assert r[key] == o[key]
            rw, ow = r["pred_relevant_windows"], o["pred_relevant_windows"]
            if suffix:
                # post-NMS rank order among EQUAL-score windows is
                # unspecified in the reference (an unstable torch sort over
                # swap-reordered rows, inference.py:52); compare the ranked
                # lists up to that tie order, and require both descending
                for rows in (rw, ow):
                    scores = [x[2] for x in rows]
                    assert scores == sorted(scores, reverse=True)
                rw = sorted(map(tuple, rw), key=lambda x: (-x[2], x[0], x[1]))
                ow = sorted(map(tuple, ow), key=lambda x: (-x[2], x[0], x[1]))
            assert rw == ow, f"window mismatch for qid {r['qid']}{suffix}"
            rs = r["pred_saliency_scores"]
            os_ = o["pred_saliency_scores"]
            assert len(rs) == len(os_)
            for a, b in zip(rs, os_):
                total += 1
                if a != b:
                    flips += 1
                    assert abs(a - b) <= 1.01e-4, (
                        f"saliency diff beyond one 4th-decimal step for "
                        f"qid {r['qid']}: {a} vs {b}"
                    )
        assert flips <= max(2, total // 50), (
            f"too many saliency rounding flips{suffix}: {flips}/{total}"
        )


@pytest.fixture(scope="module")
def exported_ms_run(tmp_path_factory):
    """Synthetic TVSum (domain BK) -> cli train tvsum_ms (1 epoch) ->
    cli export (+ sidecars) for the FlashVTG_ms subprocess oracle."""
    from flashvtg_tpu.cli import main as cli_main

    root = tmp_path_factory.mktemp("refsub_ms")
    rng = np.random.default_rng(11)
    vids_train = ["WxtbjNsCQ8A", "EE-bNr36nyA", "oDXZc0tZe04", "uGu_10sucQo"]
    vids_val = ["Se3oxnaPsz0"]
    (root / "vid").mkdir()
    (root / "txt").mkdir()
    rows_tr, rows_val = [], []
    for v in vids_train + vids_val:
        n_clips = int(rng.integers(30, 60))
        row = {
            "qid": v, "query": "news title", "duration": n_clips * 2.0,
            "vid": v, "relevant_clip_ids": None, "relevant_windows": None,
            "label": rng.integers(1, 6, (n_clips, 20)).tolist(),
            "domain": "BK",
        }
        (rows_tr if v in vids_train else rows_val).append(row)
        np.save(root / "vid" / f"{v}_rgb.npy",
                rng.standard_normal((n_clips, 16), dtype=np.float32))
        np.save(root / "vid" / f"{v}_opt.npy",
                rng.standard_normal((n_clips, 16), dtype=np.float32))
        np.savez(root / "txt" / f"{v}.npz",
                 last_hidden_state=rng.standard_normal((7, 24),
                                                       dtype=np.float32))
    save_jsonl(rows_tr, root / "train.jsonl")
    save_jsonl(rows_val, root / "val.jsonl")

    flags = [
        # hidden_dim stays at the preset's 256: the reference _ms model
        # HARDCODES its class head at 256 channels (FlashVTG_ms/
        # model.py:133 ConfidenceScorer(in_channels=256, ...)) and cannot
        # run at any other width; our rebuild parameterizes it by
        # hidden_dim, identical at the reference's only operating point
        "--v_feat_dim", "32", "--t_feat_dim", "24", "--max_v_l", "64",
        "--dim_feedforward", "64",
        "--num_dummies", "2", "--t2v_layers", "1", "--enc_layers", "1",
        "--dummy_layers", "1", "--num_mlp_layers", "2",
        "--num_conv_layers", "1", "--dset_domain", "BK",
        "--v_feat_dirs", str(root / "vid"), "--t_feat_dir", str(root / "txt"),
        "--eval_path", str(root / "val.jsonl"),
    ]
    rc = cli_main(
        ["train", "tvsum_ms", *flags, "--train_path", str(root / "train.jsonl"),
         "--n_epoch", "1", "--bsz", "4", "--eval_bsz", "4", "--eval_epoch", "1",
         "--results_root", str(root / "results"), "--exp_id", "refsubms",
         "--train_precision", "float32", "--eval_precision", "float32",
         # oracle weight-generators train with the pre-round-5
         # threefry mask stream pinned: the byte-parity goldens were
         # established under it, and a dropout-RNG default change
         # must not be able to move a metric onto a cross-stack
         # rounding boundary (dummy_dropout stays live even at
         # --dropout 0, so pinning the impl is the only full pin)
         "--dropout_rng_impl", "threefry"]
    )
    assert rc == 0
    run_dir = next((root / "results").glob("tvsum-*refsubms*"))

    export_dir = root / "export"
    export_dir.mkdir()
    ckpt = export_dir / "model.ckpt"
    rc = cli_main(
        ["export", "tvsum_ms", *flags,
         "--resume", str(run_dir / "model_best"),
         "--export_path", str(ckpt)]
    )
    assert rc == 0
    assert (export_dir / "opt.json").exists()
    return root, ckpt, flags


def test_reference_ms_inference_parity(exported_ms_run):
    """FlashVTG_ms/inference.py run literally (same 8-argv shape) on an
    exported `_ms` checkpoint: its latest_metric.jsonl (top-5 HL mAP over
    the predicted saliency, the tvsum protocol) must byte-match our
    `cli infer` output on the same inputs."""
    root, ckpt, flags = exported_ms_run
    export_dir = os.path.dirname(str(ckpt))

    shims = write_subprocess_shims(str(root / "shims"))
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join([shims, REF_ROOT])
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, "FlashVTG_ms/inference.py",
         os.path.join(export_dir, "model_cfg.py"),
         "--resume", str(ckpt),
         "--eval_split_name", "val",
         "--eval_path", str(root / "val.jsonl")],
        cwd=REF_ROOT, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, (
        f"FlashVTG_ms/inference.py failed\nstdout:\n{proc.stdout[-3000:]}\n"
        f"stderr:\n{proc.stderr[-3000:]}"
    )
    ref_metric = os.path.join(export_dir, "latest_metric.jsonl")
    assert os.path.exists(ref_metric), proc.stderr[-2000:]

    from flashvtg_tpu.cli import main as cli_main

    rc = cli_main(
        ["infer", "tvsum_ms", *flags, "--resume", str(ckpt),
         "--eval_precision", "float32"]
    )
    assert rc == 0
    our_metric = os.path.join(export_dir, "infer_metric.jsonl")
    assert os.path.exists(our_metric)
    with open(ref_metric, "rb") as f:
        ref_bytes = f.read()
    with open(our_metric, "rb") as f:
        our_bytes = f.read()
    assert ref_bytes == our_bytes, f"{ref_bytes!r} != {our_bytes!r}"


def test_reference_train_debug_and_import(exported_run, tmp_path):
    """The reference's OWN trainer runs literally: `python FlashVTG/train.py
    <cfg> --debug ...` (BaseOptions training parse -> StartEndDataset ->
    setup_model -> one debug epoch of real fwd/bwd/optimizer steps ->
    torch.save). Then the checkpoint the reference trainer produced (with
    its pickled opt Namespace and optimizer state) must load and evaluate
    in OUR framework via `cli infer --resume model_latest.ckpt` — the
    import direction against a literally-reference-produced artifact."""
    root, ann, ckpt, data_flags = exported_run

    shims = write_subprocess_shims(str(root / "shims"))
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join([shims, REF_ROOT])
    env.pop("JAX_PLATFORMS", None)
    results_root = tmp_path / "ref_train"
    results_root.mkdir()
    proc = subprocess.run(
        [sys.executable, "FlashVTG/train.py",
         os.path.join(os.path.dirname(str(ckpt)), "model_cfg.py"),
         "--debug",
         "--exp_id", "debugsmoke",
         "--dset_name", "hl",
         "--train_path", str(ann),
         "--eval_path", str(ann),
         *data_flags[:4],  # --v_feat_dirs <dir> --t_feat_dir <dir>
         "--v_feat_dim", str(V_DIM), "--t_feat_dim", str(T_DIM),
         "--num_dummies", "4", "--t2v_layers", "2", "--enc_layers", "2",
         "--dummy_layers", "1", "--num_mlp_layers", "3",
         # the reference parser defaults max_q_l/max_v_l to -1; its shipped
         # scripts always pass them (train_qv_slowclip.sh:33-34)
         "--max_q_l", "32", "--max_v_l", "75",
         "--bsz", "8", "--eval_bsz", "1", "--n_epoch", "1",
         "--device", "-1",  # training parse never reloads an opt.json
         "--results_root", str(results_root)],
        cwd=REF_ROOT, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, (
        f"reference train.py --debug failed\nstdout:\n{proc.stdout[-3000:]}\n"
        f"stderr:\n{proc.stderr[-3000:]}"
    )
    run_dirs = list(results_root.glob("hl-video_tef-debugsmoke-*"))
    assert len(run_dirs) == 1, proc.stderr[-1000:]
    ref_ckpt = run_dirs[0] / "model_latest.ckpt"
    assert ref_ckpt.exists(), sorted(os.listdir(run_dirs[0]))
    assert (run_dirs[0] / "opt.json").exists()

    # import direction: the reference-trained .ckpt evaluates in OUR stack
    from flashvtg_tpu.cli import main as cli_main

    rc = cli_main(
        ["infer", "qvhighlights_slowclip", *MODEL_FLAGS, *data_flags,
         "--resume", str(ref_ckpt), "--eval_precision", "float32",
         "--eval_results_dir", str(tmp_path / "ours")]
    )
    assert rc == 0
    ours = tmp_path / "ours" / "infer_hl_val_preds_metrics.json"
    assert ours.exists()
    import json

    brief = json.load(open(ours))["brief"]
    assert "MR-full-mAP" in brief and np.isfinite(brief["MR-full-mAP"])


def test_reference_youtube_hl_branch_parity(tmp_path):
    """The youtube_uni HL branch of the BASE variant through the literal
    entry point. Covers two seams no other oracle crosses: the base
    FlashVTG/inference.py has only ever been literally run on MR datasets
    (its compute_hl_results, inference.py:126-229, was exercised via the
    _ms twin on tvsum), and youtube_uni's distinct AP protocol (binary
    labels squeezed over ALL ranked clips, no top-5 cut and no 20-annotator
    loop, inference.py:189-214) has never been literally run at all. The
    subprocess's latest_metric.jsonl must byte-match `cli infer`'s."""
    from flashvtg_tpu.cli import main as cli_main

    root = tmp_path
    rng = np.random.default_rng(23)
    vids_train = ["yt_a", "yt_b", "yt_c", "yt_d"]
    vids_val = ["yt_e", "yt_f"]
    (root / "vid").mkdir()
    (root / "txt").mkdir()
    rows_tr, rows_val = [], []
    for v in vids_train + vids_val:
        n_clips = int(rng.integers(24, 48))
        # youtube-hl labels are binary, one annotator: (L, 1) lists
        # (reference get_saliency_labels_all_youtube takes labels[:, 0])
        lab = (rng.random(n_clips) < 0.25).astype(int)
        lab[int(rng.integers(n_clips))] = 1  # at least one positive
        row = {
            "qid": v, "query": "dog clip", "duration": n_clips * 1.0,
            "vid": v, "relevant_clip_ids": None, "relevant_windows": None,
            "label": lab.reshape(-1, 1).tolist(),
            "domain": "dog",
        }
        (rows_tr if v in vids_train else rows_val).append(row)
        # youtube video features: single {vid}.npz per dir (reference
        # _get_video_feat_by_vid youtube branch), queries {qid}.npz
        np.savez(root / "vid" / f"{v}.npz",
                 features=rng.standard_normal((n_clips, 32),
                                              dtype=np.float32))
        np.savez(root / "txt" / f"{v}.npz",
                 last_hidden_state=rng.standard_normal((6, 24),
                                                       dtype=np.float32))
    save_jsonl(rows_tr, root / "train.jsonl")
    save_jsonl(rows_val, root / "val.jsonl")

    flags = [
        # hidden_dim stays at the preset's 256 (reference hardcode, see
        # exported_ms_run note)
        "--v_feat_dim", "32", "--t_feat_dim", "24", "--max_v_l", "64",
        "--dim_feedforward", "64",
        "--num_dummies", "2", "--t2v_layers", "1", "--enc_layers", "1",
        "--dummy_layers", "1", "--num_mlp_layers", "2",
        "--num_conv_layers", "1", "--dset_domain", "dog",
        "--v_feat_dirs", str(root / "vid"), "--t_feat_dir", str(root / "txt"),
        "--eval_path", str(root / "val.jsonl"),
    ]
    rc = cli_main(
        ["train", "youtube_uni", *flags,
         "--train_path", str(root / "train.jsonl"),
         "--n_epoch", "1", "--bsz", "4", "--eval_bsz", "4",
         "--eval_epoch", "1",
         "--results_root", str(root / "results"), "--exp_id", "refsubyt",
         "--train_precision", "float32", "--eval_precision", "float32",
         # oracle weight-generators train with the pre-round-5
         # threefry mask stream pinned: the byte-parity goldens were
         # established under it, and a dropout-RNG default change
         # must not be able to move a metric onto a cross-stack
         # rounding boundary (dummy_dropout stays live even at
         # --dropout 0, so pinning the impl is the only full pin)
         "--dropout_rng_impl", "threefry"]
    )
    assert rc == 0
    run_dir = next((root / "results").glob("youtube_uni-*refsubyt*"))

    export_dir = root / "export"
    export_dir.mkdir()
    ckpt = export_dir / "model.ckpt"
    rc = cli_main(
        ["export", "youtube_uni", *flags,
         "--resume", str(run_dir / "model_best"),
         "--export_path", str(ckpt)]
    )
    assert rc == 0

    shims = write_subprocess_shims(str(root / "shims"))
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join([shims, REF_ROOT])
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, "FlashVTG/inference.py",
         os.path.join(str(export_dir), "model_cfg.py"),
         "--resume", str(ckpt),
         "--eval_split_name", "val",
         "--eval_path", str(root / "val.jsonl")],
        cwd=REF_ROOT, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, (
        f"youtube FlashVTG/inference.py failed\nstdout:\n"
        f"{proc.stdout[-3000:]}\nstderr:\n{proc.stderr[-3000:]}"
    )
    ref_metric = os.path.join(str(export_dir), "latest_metric.jsonl")
    assert os.path.exists(ref_metric), proc.stderr[-2000:]

    rc = cli_main(
        ["infer", "youtube_uni", *flags, "--resume", str(ckpt),
         "--eval_precision", "float32"]
    )
    assert rc == 0
    our_metric = os.path.join(str(export_dir), "infer_metric.jsonl")
    assert os.path.exists(our_metric)
    with open(ref_metric, "rb") as f:
        ref_bytes = f.read()
    with open(our_metric, "rb") as f:
        our_bytes = f.read()
    assert ref_bytes == our_bytes, f"{ref_bytes!r} != {our_bytes!r}"


def test_reference_full_train_then_import_byte_parity(tmp_path):
    """Import-direction byte-parity. The reference trains NON-debug for one
    epoch (`python FlashVTG/train.py data/MR.py ...`): its __main__ then
    chains into its own `start_inference(opt)` (train.py tail), which
    re-parses TestOptions, reloads the run's opt.json, and evaluates
    model_best.ckpt — all reference code, zero harness involvement. Our
    `cli infer --resume model_best.ckpt` on the same inputs must then
    reproduce its artifacts under the same contract as the export
    direction: metrics byte-identical, windows exact, saliency bounded.
    (The existing import test only asserts a finite mAP; this one pins the
    numbers.)"""
    root = tmp_path
    rows = load_jsonl(REF_GT)[:N_QUERIES]
    ann = root / "val.jsonl"
    save_jsonl(rows, ann)
    vdir, qdir = root / "vid", root / "txt"
    vdir.mkdir()
    qdir.mkdir()
    rng = np.random.default_rng(29)
    for r in rows:
        lv = int(r["duration"] / 2)
        np.savez(vdir / f"{r['vid']}.npz",
                 features=rng.standard_normal((lv, V_DIM), dtype=np.float32))
        np.savez(qdir / f"qid{r['qid']}.npz",
                 last_hidden_state=rng.standard_normal(
                     (int(rng.integers(5, 20)), T_DIM), dtype=np.float32))

    shims = write_subprocess_shims(str(root / "shims"))
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join([shims, REF_ROOT])
    env.pop("JAX_PLATFORMS", None)
    results_root = root / "ref_train"
    results_root.mkdir()
    proc = subprocess.run(
        [sys.executable, "FlashVTG/train.py",
         os.path.join(REF_ROOT, "data/MR.py"),
         "--exp_id", "fulltrain",
         "--dset_name", "hl",
         "--train_path", str(ann),
         "--eval_path", str(ann),
         "--v_feat_dirs", str(vdir),
         "--t_feat_dir", str(qdir),
         "--v_feat_dim", str(V_DIM), "--t_feat_dim", str(T_DIM),
         "--num_dummies", "4", "--t2v_layers", "2", "--enc_layers", "2",
         "--dummy_layers", "1", "--num_mlp_layers", "3",
         "--max_q_l", "32", "--max_v_l", "75",
         "--bsz", "8", "--eval_bsz", "1", "--n_epoch", "1",
         "--eval_epoch", "1",
         "--device", "-1",
         "--results_root", str(results_root)],
        cwd=REF_ROOT, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, (
        f"reference full train+infer failed\nstdout:\n{proc.stdout[-3000:]}\n"
        f"stderr:\n{proc.stderr[-3000:]}"
    )
    run_dirs = list(results_root.glob("hl-video_tef-fulltrain-*"))
    assert len(run_dirs) == 1, proc.stderr[-1000:]
    run_dir = run_dirs[0]
    ref_best = run_dir / "model_best.ckpt"
    assert ref_best.exists(), sorted(os.listdir(run_dir))
    # the chained start_inference wrote the submission artifacts
    ref_sub = run_dir / "hl_val_submission.jsonl"
    assert ref_sub.exists(), sorted(os.listdir(run_dir))

    from flashvtg_tpu.cli import main as cli_main

    ours_dir = root / "ours"
    rc = cli_main(
        ["infer", "qvhighlights_slowclip", *MODEL_FLAGS,
         "--v_feat_dirs", str(vdir), "--t_feat_dir", str(qdir),
         "--eval_path", str(ann), "--eval_bsz", "8",
         "--resume", str(ref_best), "--eval_precision", "float32",
         "--eval_results_dir", str(ours_dir)]
    )
    assert rc == 0
    our_sub = str(ours_dir / "infer_hl_val_preds.jsonl")
    assert os.path.exists(our_sub)
    _compare_mr_artifacts(str(ref_sub), our_sub, N_QUERIES)


def test_reference_ms_train_debug_and_import(tmp_path):
    """The `_ms` trainer runs literally: `python FlashVTG_ms/train.py
    data/MR.py --debug ...` (the reference's OWN config file) drives one
    real debug epoch on hl-shaped data — fwd incl. the neg-pair pass, the
    full `_ms` criterion, optimizer step, in-loop eval, best+latest
    torch.save, and the post-loop best/latest re-evals (which, unlike the
    base trainer, also hit the test split unconditionally — hence
    --test_path). Exercises the wandb.run.dir SummaryWriter quirk
    (train.py:124-125) through the shim. The checkpoint it produces
    (pickled opt Namespace + optimizer state) must then load and evaluate
    in OUR stack via `cli infer --variant ms`.

    NOT run on tvsum/youtube: the shipped `_ms` criterion hardcodes 'reg'
    (and 'cls') in its losses list (model.py losses=[...]) and takes
    boundaries from the jsonl's relevant_windows, which are null for the
    HD datasets -> get_target crashes on data['boundary'].size(0)
    (loss.py:323). The `_ms` tree ships no scripts; as committed it cannot
    execute a single training step on the HD datasets. See PARITY.md."""
    import json

    root = tmp_path
    rows = load_jsonl(REF_GT)[:N_QUERIES]
    ann = root / "val.jsonl"
    save_jsonl(rows, ann)
    vdir, qdir = root / "vid", root / "txt"
    vdir.mkdir()
    qdir.mkdir()
    rng = np.random.default_rng(13)
    for r in rows:
        lv = int(r["duration"] / 2)
        np.savez(vdir / f"{r['vid']}.npz",
                 features=rng.standard_normal((lv, V_DIM), dtype=np.float32))
        np.savez(qdir / f"qid{r['qid']}.npz",
                 last_hidden_state=rng.standard_normal(
                     (int(rng.integers(5, 20)), T_DIM), dtype=np.float32))

    ms_flags = [
        "--num_phrase", "2", "--phrase_layers", "1",
        "--context_layers", "1", "--rank", "8", "--t_sa", "1",
    ]
    shims = write_subprocess_shims(str(root / "shims"))
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join([shims, REF_ROOT])
    env.pop("JAX_PLATFORMS", None)
    results_root = root / "ref_train_ms"
    results_root.mkdir()
    proc = subprocess.run(
        [sys.executable, "FlashVTG_ms/train.py",
         os.path.join(REF_ROOT, "data/MR.py"),
         "--debug",
         "--exp_id", "debugms",
         "--dset_name", "hl",
         # --use_neg is mandatory in practice: without it the _ms criterion
         # crashes (loss.py:512 reads real_neg_mask that is only bound when
         # the neg pass ran — the use_neg=False upstream crash, PARITY.md)
         "--use_neg",
         "--train_path", str(ann),
         "--eval_path", str(ann),
         "--test_path", str(ann),
         "--v_feat_dirs", str(vdir),
         "--t_feat_dir", str(qdir),
         "--v_feat_dim", str(V_DIM), "--t_feat_dim", str(T_DIM),
         "--num_dummies", "4", "--t2v_layers", "2", "--enc_layers", "2",
         "--dummy_layers", "1", "--num_mlp_layers", "3",
         *ms_flags,
         "--max_q_l", "32", "--max_v_l", "75",
         "--bsz", "8", "--eval_bsz", "1", "--n_epoch", "1",
         "--eval_epoch", "1",
         "--device", "-1",
         "--results_root", str(results_root)],
        cwd=REF_ROOT, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, (
        f"FlashVTG_ms/train.py --debug failed\nstdout:\n"
        f"{proc.stdout[-3000:]}\nstderr:\n{proc.stderr[-3000:]}"
    )
    run_dirs = list(results_root.glob("hl-*debugms-*"))
    assert len(run_dirs) == 1, (sorted(os.listdir(results_root)),
                                proc.stderr[-1000:])
    ref_latest = next(run_dirs[0].glob("*_latest.ckpt"), None)
    assert ref_latest is not None, sorted(os.listdir(run_dirs[0]))

    from flashvtg_tpu.cli import main as cli_main

    rc = cli_main(
        # --variant ms is explicit: the reference encodes the variant in
        # the code tree (FlashVTG_ms/), not in its opt.json, so the reload
        # from a reference-trained run dir cannot recover it (MIGRATION.md)
        ["infer", "qvhighlights_slowclip", *MODEL_FLAGS, "--variant", "ms",
         *ms_flags,
         "--v_feat_dirs", str(vdir), "--t_feat_dir", str(qdir),
         "--eval_path", str(ann),
         "--resume", str(ref_latest),
         "--eval_precision", "float32",
         "--eval_results_dir", str(tmp_path / "ours_ms")]
    )
    assert rc == 0
    ours = tmp_path / "ours_ms" / "infer_hl_val_preds_metrics.json"
    assert ours.exists()
    brief = json.load(open(ours))["brief"]
    assert "MR-full-mAP" in brief and np.isfinite(brief["MR-full-mAP"])


TACOS_GT = os.path.join(REF_ROOT, "data/tacos/val.jsonl")


def test_reference_tacos_branch_parity(tmp_path):
    """The tacos branch through the literal entry point — the last dataset
    family not yet literally run. Pins two quirks: the fallback
    PostProcessorDETR params (max_ts 50000, round_multiple only,
    inference.py:344-352) and the SHUFFLED eval loader the reference uses
    only for tacos (inference.py:382-385), which is unseeded — so the run
    is executed at eval_bsz=1 (the export sidecar's opt.json value), where
    shuffling can only permute row order, and rows are compared keyed by
    qid. Metrics JSONs must still byte-match: the reference's
    eval_submission groups by qid, so they are order-invariant."""
    from flashvtg_tpu.cli import main as cli_main

    root = tmp_path
    rows = load_jsonl(TACOS_GT)[:10]
    ann = root / "val.jsonl"
    save_jsonl(rows, ann)
    vdir, qdir = root / "vid", root / "txt"
    vdir.mkdir()
    qdir.mkdir()
    rng = np.random.default_rng(5)
    for r in rows:
        vp = vdir / f"{r['vid']}.npz"
        if not vp.exists():
            np.savez(vp, features=rng.standard_normal((64, V_DIM),
                                                      dtype=np.float32))
        np.savez(qdir / f"{r['qid']}.npz",
                 last_hidden_state=rng.standard_normal(
                     (int(rng.integers(4, 12)), T_DIM), dtype=np.float32))

    flags = [
        *MODEL_FLAGS,
        "--v_feat_dirs", str(vdir), "--t_feat_dir", str(qdir),
        "--eval_path", str(ann), "--max_v_l", "64",
    ]
    rc = cli_main(
        ["train", "tacos", *flags, "--train_path", str(ann),
         "--n_epoch", "1", "--bsz", "4", "--eval_bsz", "1",
         "--eval_epoch", "1",
         "--results_root", str(root / "results"), "--exp_id", "refsubta",
         "--train_precision", "float32", "--eval_precision", "float32",
         # oracle weight-generators train with the pre-round-5
         # threefry mask stream pinned: the byte-parity goldens were
         # established under it, and a dropout-RNG default change
         # must not be able to move a metric onto a cross-stack
         # rounding boundary (dummy_dropout stays live even at
         # --dropout 0, so pinning the impl is the only full pin)
         "--dropout_rng_impl", "threefry"]
    )
    assert rc == 0
    run_dir = next((root / "results").glob("tacos-*refsubta*"))
    export_dir = root / "export"
    export_dir.mkdir()
    ckpt = export_dir / "model.ckpt"
    rc = cli_main(
        # model_latest, not model_best: a 1-epoch model on random features
        # can legitimately score 0.0, and model_best requires score > 0
        ["export", "tacos", *flags,
         "--resume", str(run_dir / "model_latest"),
         "--export_path", str(ckpt)]
    )
    assert rc == 0

    shims = write_subprocess_shims(str(root / "shims"))
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join([shims, REF_ROOT])
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, "FlashVTG/inference.py",
         os.path.join(str(export_dir), "model_cfg.py"),
         "--resume", str(ckpt),
         "--eval_split_name", "val",
         "--eval_path", str(ann)],
        cwd=REF_ROOT, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, (
        f"tacos inference.py failed\nstdout:\n{proc.stdout[-3000:]}\n"
        f"stderr:\n{proc.stderr[-3000:]}"
    )
    ref_sub = export_dir / "hl_val_submission.jsonl"
    assert ref_sub.exists()

    rc = cli_main(
        ["infer", "tacos", *flags, "--resume", str(ckpt),
         "--eval_bsz", "1", "--eval_precision", "float32"]
    )
    assert rc == 0
    our_sub = export_dir / "infer_tacos_val_preds.jsonl"
    assert our_sub.exists()

    ref_rows = load_jsonl(str(ref_sub))
    our_rows = load_jsonl(str(our_sub))
    assert len(ref_rows) == len(our_rows) == 10
    ref_by_qid = {r["qid"]: r for r in ref_rows}
    for o in our_rows:
        r = ref_by_qid[o["qid"]]
        assert "pred_saliency_scores" not in r  # popped for tacos
        assert "pred_saliency_scores" not in o
        assert r == o, f"row mismatch for qid {o['qid']}"

    for suffix in ("_metrics.json", "_nms_thd_0.7_metrics.json"):
        with open(str(ref_sub).replace(".jsonl", suffix), "rb") as f:
            ref_bytes = f.read()
        with open(str(our_sub).replace(".jsonl", suffix), "rb") as f:
            our_bytes = f.read()
        assert ref_bytes == our_bytes, f"metrics byte diff in {suffix}"


CHARADES_GT = os.path.join(REF_ROOT,
                           "data/charades_sta/charades_sta_test_tvr_format.jsonl")


def test_reference_charades_branch_parity(tmp_path):
    """The charadesSTA branch of the reference inference (its own
    PostProcessorDETR params, inference.py:323-341, and the saliency-less
    submission, inference.py:413-418) through the literal entry point:
    submission jsonl and metrics JSON vs `cli infer` on the same inputs."""
    from flashvtg_tpu.cli import main as cli_main

    root = tmp_path
    rows = load_jsonl(CHARADES_GT)[:12]
    ann = root / "test.jsonl"
    save_jsonl(rows, ann)
    vdir, qdir = root / "vid", root / "txt"
    vdir.mkdir()
    qdir.mkdir()
    rng = np.random.default_rng(3)
    for r in rows:
        vp = vdir / f"{r['vid']}.npz"
        if not vp.exists():
            lv = max(4, int(r["duration"]))  # clip_length 1.0
            np.savez(vp, features=rng.standard_normal((lv, V_DIM),
                                                      dtype=np.float32))
        np.savez(qdir / f"qid{r['qid']}.npz",
                 last_hidden_state=rng.standard_normal(
                     (int(rng.integers(4, 12)), T_DIM), dtype=np.float32))

    flags = [
        *MODEL_FLAGS,
        "--v_feat_dirs", str(vdir), "--t_feat_dir", str(qdir),
        "--eval_path", str(ann), "--max_v_l", "64",
    ]
    rc = cli_main(
        ["train", "charades", *flags, "--train_path", str(ann),
         "--n_epoch", "1", "--bsz", "4", "--eval_bsz", "4",
         "--eval_epoch", "1", "--num_dummies", "4",
         "--results_root", str(root / "results"), "--exp_id", "refsubch",
         "--train_precision", "float32", "--eval_precision", "float32",
         # oracle weight-generators train with the pre-round-5
         # threefry mask stream pinned: the byte-parity goldens were
         # established under it, and a dropout-RNG default change
         # must not be able to move a metric onto a cross-stack
         # rounding boundary (dummy_dropout stays live even at
         # --dropout 0, so pinning the impl is the only full pin)
         "--dropout_rng_impl", "threefry"]
    )
    assert rc == 0
    run_dir = next((root / "results").glob("charadesSTA-*refsubch*"))
    export_dir = root / "export"
    export_dir.mkdir()
    ckpt = export_dir / "model.ckpt"
    rc = cli_main(
        ["export", "charades", *flags,
         "--resume", str(run_dir / "model_best"),
         "--export_path", str(ckpt)]
    )
    assert rc == 0

    shims = write_subprocess_shims(str(root / "shims"))
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join([shims, REF_ROOT])
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, "FlashVTG/inference.py",
         os.path.join(str(export_dir), "model_cfg.py"),
         "--resume", str(ckpt),
         "--eval_split_name", "val",
         "--eval_path", str(ann)],
        cwd=REF_ROOT, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, (
        f"charades inference.py failed\nstdout:\n{proc.stdout[-3000:]}\n"
        f"stderr:\n{proc.stderr[-3000:]}"
    )
    ref_sub = export_dir / "hl_val_submission.jsonl"
    assert ref_sub.exists()

    rc = cli_main(
        ["infer", "charades", *flags, "--resume", str(ckpt),
         "--eval_precision", "float32"]
    )
    assert rc == 0
    our_sub = export_dir / "infer_charadesSTA_val_preds.jsonl"
    assert our_sub.exists()

    ref_rows = load_jsonl(str(ref_sub))
    our_rows = load_jsonl(str(our_sub))
    assert len(ref_rows) == len(our_rows) == 12
    for r, o in zip(ref_rows, our_rows):
        assert "pred_saliency_scores" not in r
        assert "pred_saliency_scores" not in o
        assert r == o, f"row mismatch for qid {r['qid']}"

    for suffix in ("_metrics.json", "_nms_thd_0.7_metrics.json"):
        with open(str(ref_sub).replace(".jsonl", suffix), "rb") as f:
            ref_bytes = f.read()
        with open(str(our_sub).replace(".jsonl", suffix), "rb") as f:
            our_bytes = f.read()
        assert ref_bytes == our_bytes, f"metrics byte diff in {suffix}"
