"""Offline visualization of predictions vs ground truth.

Re-design of the reference's tools/ scripts (tools/visualize.py,
visualize_keyword.py — which hard-code author paths and external models)
as a small reusable CLI over the framework's own artifacts: a prediction
jsonl + the GT jsonl are enough to plot per-query saliency curves, ranked
moment timelines and (optionally) a text->video attention heatmap exported
by the model.

Usage:
  python -m flashvtg_tpu.tools.visualize --preds preds.jsonl \
      --gt data/highlight_val_release.jsonl --qid 2579 --out fig.png
"""

from __future__ import annotations

import argparse

import numpy as np

from flashvtg_tpu.utils.io import load_jsonl


def plot_query(pred_row, gt_row, out_path, clip_length: float = 2.0,
               max_windows: int = 10):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    duration = gt_row.get("duration", 150)
    fig, axes = plt.subplots(
        2, 1, figsize=(12, 5), sharex=True,
        gridspec_kw={"height_ratios": [2, 1]},
    )

    # saliency curves
    ax = axes[0]
    sal = pred_row.get("pred_saliency_scores")
    if sal:
        t = np.arange(len(sal)) * clip_length
        ax.plot(t, sal, label="predicted saliency", lw=1.5)
    if gt_row.get("relevant_clip_ids") and gt_row.get("saliency_scores"):
        n_clips = int(duration / clip_length)
        gt_sal = np.zeros(n_clips)
        ids = np.asarray(gt_row["relevant_clip_ids"])
        gt_sal[ids] = np.asarray(gt_row["saliency_scores"]).mean(1)
        ax2 = ax.twinx()
        ax2.plot(
            np.arange(n_clips) * clip_length, gt_sal,
            color="tab:orange", alpha=0.6, label="GT saliency",
        )
        ax2.set_ylabel("GT saliency")
    ax.set_ylabel("pred saliency")
    ax.set_title(f"qid {pred_row['qid']}: {pred_row.get('query', '')[:90]}")
    ax.legend(loc="upper right")

    # moment timelines
    ax = axes[1]
    for w in gt_row.get("relevant_windows") or []:
        ax.axvspan(w[0], w[1], ymin=0.55, ymax=0.95, color="tab:green",
                   alpha=0.4)
    wins = pred_row.get("pred_relevant_windows", [])[:max_windows]
    for rank, (st, ed, score) in enumerate(wins):
        ax.axvspan(st, ed, ymin=0.05, ymax=0.45, color="tab:blue",
                   alpha=max(0.15, float(score)))
    ax.set_yticks([0.25, 0.75])
    ax.set_yticklabels(["pred", "GT"])
    ax.set_xlabel("time (s)")
    ax.set_xlim(0, duration)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def plot_attention(attn: np.ndarray, out_path, query_tokens=None):
    """Text->video attention heatmap (attn: (Lv, Lq))."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 4))
    im = ax.imshow(np.asarray(attn).T, aspect="auto", cmap="viridis")
    ax.set_xlabel("video clip")
    ax.set_ylabel("text token")
    if query_tokens:
        ax.set_yticks(range(len(query_tokens)))
        ax.set_yticklabels(query_tokens, fontsize=7)
    fig.colorbar(im, ax=ax, fraction=0.025)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--preds", required=True)
    parser.add_argument("--gt", required=True)
    parser.add_argument("--qid", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--clip_length", type=float, default=2.0)
    args = parser.parse_args(argv)

    preds = {str(r["qid"]): r for r in load_jsonl(args.preds)}
    gts = {str(r["qid"]): r for r in load_jsonl(args.gt)}
    qid = str(args.qid)
    if qid not in preds:
        raise SystemExit(f"qid {qid} not in predictions")
    plot_query(preds[qid], gts.get(qid, {}), args.out, args.clip_length)
    print(args.out)


if __name__ == "__main__":
    main()
