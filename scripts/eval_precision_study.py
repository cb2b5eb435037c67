"""Serving-precision study: metric deltas of tf32/bf16 eval vs float32.

bench.py records the throughput headroom (f32 -> tf32 -> bf16); this study
answers the accuracy side on real hardware: briefly train the
qvhighlights_slowclip config at REAL shapes (Lv=75, 2816+2-d video, 512-d
text) on synthetic features, then run the full eval at each
`eval_precision` and diff the brief metrics. Results -> docs/PRECISION.md.

Run ON the TPU (no JAX_PLATFORMS override): python scripts/eval_precision_study.py

`--epochs 60` (the docs/PRECISION.md tunnel-gated follow-up) answers the
bf16 HL rank-stability question on a CONVERGED model: alongside the metric
deltas it prints the median |top1 - top2| saliency margin per query — if
margins sit well above bf16's ~2^-8 relative resolution, the round-3
"Hit1 moved +7.8 under bf16" artifact was the briefly-trained worst case
it was claimed to be.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--n_train", type=int, default=192)
    args = ap.parse_args()
    N_TRAIN, EPOCHS = args.n_train, args.epochs
    from flashvtg_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    from flashvtg_tpu.data.dataset import VTGDataset
    from flashvtg_tpu.train.config import from_preset
    from flashvtg_tpu.train.infer import run_mr_inference
    from flashvtg_tpu.train.loop import _dataset_cfg, train
    from flashvtg_tpu.eval.metrics import eval_submission
    from flashvtg_tpu.utils.synthetic import make_synthetic_qvh

    root = tempfile.mkdtemp(prefix="prec_study_")
    ann, vdir, qdir = make_synthetic_qvh(
        root, n_queries=N_TRAIN, v_dim=2816, t_dim=512, n_clips=75,
    )
    cfg = from_preset(
        "qvhighlights_slowclip",
        train_path=ann, eval_path=ann, v_feat_dirs=(vdir,), t_feat_dir=qdir,
        bsz=64, eval_bsz=64, n_epoch=EPOCHS, eval_epoch=EPOCHS,
        results_root=os.path.join(root, "results"), use_tensorboard=False,
        nms_thd=-1.0,
    )
    t0 = time.time()
    params, score, _ = train(cfg, results_dir=os.path.join(root, "run"))
    log(f"trained {EPOCHS} epochs in {time.time() - t0:.0f}s, "
        f"f32 val score {score:.2f}")

    dataset = VTGDataset(_dataset_cfg(cfg, cfg.eval_path, load_labels=False))
    briefs = {}
    margins = None
    for prec in ("float32", "tensorfloat32", "bfloat16"):
        pcfg = cfg.replace(eval_precision=prec)
        t0 = time.time()
        submission, _, _ = run_mr_inference(pcfg, cfg.build_model(), params,
                                            dataset)
        dt = time.time() - t0
        briefs[prec] = dict(
            eval_submission(submission, dataset.data, verbose=False)["brief"]
        )
        log(f"{prec}: eval {dt:.2f}s")
        if prec == "float32":
            # HL rank-stability diagnostic: the gap the ranking has to
            # survive reduced precision. Hit1 flips when |top1 - top2|
            # saliency falls inside the precision's resolution. Submission
            # saliency is rounded to 4 decimals, so margins are quantized
            # at 1e-4 — fine for the bf16 question (its safety threshold
            # |score|*2^-8 ~ 2e-3 is 20x the quantum) but too coarse to
            # say anything about tf32 (whose measured deltas are ~0 anyway).
            m = []
            for row in submission:
                s = np.sort(np.asarray(row["pred_saliency_scores"]))[::-1]
                if len(s) >= 2:
                    m.append(float(s[0] - s[1]))
            margins = np.asarray(m)

    keys = ["MR-full-R1@0.5", "MR-full-R1@0.7", "MR-full-mAP",
            "MR-full-mIoU", "HL-min-VeryGood-mAP", "HL-min-VeryGood-Hit1"]
    print(f"{'metric':<22} {'f32':>8} {'tf32':>8} {'bf16':>8} "
          f"{'d_tf32':>8} {'d_bf16':>8}")
    for k in keys:
        f, t, b = (briefs[p][k] for p in
                   ("float32", "tensorfloat32", "bfloat16"))
        print(f"{k:<22} {f:>8.2f} {t:>8.2f} {b:>8.2f} "
              f"{t - f:>+8.2f} {b - f:>+8.2f}")
    if margins is not None and len(margins):
        # bf16 has ~3 decimal digits (8 significand bits): a ranking is
        # precision-safe when the margin dwarfs |score| * 2^-8
        q = np.percentile(margins, [5, 25, 50])
        print(f"saliency top1-top2 margin: p5={q[0]:.4f} p25={q[1]:.4f} "
              f"median={q[2]:.4f} (bf16 resolution ~ |score| * 2^-8)")
        briefs["saliency_margin_p5_p25_p50"] = [float(x) for x in q]
    with open(os.path.join(root, "precision_briefs.json"), "w") as fp:
        json.dump(briefs, fp, indent=1)
    log(f"briefs saved to {root}/precision_briefs.json")
    log(f"epochs={EPOCHS} n_train={N_TRAIN}")


if __name__ == "__main__":
    main()
