"""HD (TVSum) training-dynamics sensitivity to the DynamicBCELoss guess.

losses/basic.py:dynamic_bce_loss normalizes the raw TVSum-scale targets
(agg/80*12, up to 12) by each sample's max before the BCE — a
reconstruction, since nncore's source is unavailable here (PARITY.md §8,
tests/test_dynamic_bce.py). This study bounds the risk: train the tvsum
preset on synthetic-but-learnable HD data under each plausible
normalization and compare the top-5 mAP each reaches. Results land in
docs/HD_SENSITIVITY.md.

Run: env JAX_PLATFORMS=cpu python scripts/hd_sensitivity.py
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from flashvtg_tpu.losses.basic import bce_with_logits, weight_reduce
from flashvtg_tpu.train.config import from_preset
from flashvtg_tpu.utils.io import save_jsonl

N_VIDEOS = 20
V_DIM, T_DIM = 16, 24
EPOCHS = 30


def make_learnable_tvsum(root: str, seed: int = 3):
    """Synthetic TVSum-style set whose saliency is PREDICTABLE from the
    features (channel 0 carries the per-clip aggregate + noise), so the
    loss variants can actually separate by learning quality."""
    rng = np.random.default_rng(seed)
    os.makedirs(f"{root}/vid", exist_ok=True)
    os.makedirs(f"{root}/txt", exist_ok=True)
    rows = []
    for i in range(N_VIDEOS):
        vid = f"sens{i:03d}"
        n_clips = int(rng.integers(32, 48))
        # 20 annotator scores 1..5 with a smooth per-clip bias
        base = rng.random(n_clips)
        label = np.clip(
            np.round(1 + 4 * base[:, None] + rng.normal(0, 0.6, (n_clips, 20))),
            1, 5,
        ).astype(int)
        agg = (label - 1).sum(-1) / 80.0  # in [0,1]
        feat = rng.standard_normal((n_clips, V_DIM)).astype(np.float32) * 0.3
        feat[:, 0] = agg + rng.normal(0, 0.05, n_clips)  # learnable signal
        rows.append({
            "qid": vid, "query": "sensitivity", "duration": n_clips * 2.0,
            "vid": vid, "relevant_clip_ids": None, "relevant_windows": None,
            "label": label.tolist(), "domain": "BK",
        })
        np.save(f"{root}/vid/{vid}_rgb.npy", feat)
        np.save(
            f"{root}/vid/{vid}_opt.npy",
            rng.standard_normal((n_clips, V_DIM), dtype=np.float32) * 0.1,
        )
        np.savez(
            f"{root}/txt/{vid}.npz",
            last_hidden_state=rng.standard_normal((7, T_DIM), np.float32),
        )
    save_jsonl(rows, f"{root}/val.jsonl")
    return root


def variant_loss(norm: str):
    def loss(pred, target, weight=None, avg_factor=None):
        if norm == "per_sample_max":  # shipped reconstruction
            soft = jnp.clip(
                target / jnp.maximum(target.max(-1, keepdims=True), 1e-6),
                0.0, 1.0,
            )
        elif norm == "global_const_12":  # undo HD.py's *12 exactly
            soft = jnp.clip(target / 12.0, 0.0, 1.0)
        elif norm == "clip_at_1":  # saturating clamp
            soft = jnp.clip(target, 0.0, 1.0)
        elif norm == "sigmoid":  # squash (saturates >2 -> ~1)
            soft = jax.nn.sigmoid(target)
        else:
            raise ValueError(norm)
        return weight_reduce(bce_with_logits(pred, soft), weight, avg_factor)

    return loss


def run_variant(norm: str, root: str, results_root: str):
    import flashvtg_tpu.losses.criterion as crit
    from flashvtg_tpu.train.loop import train

    orig = crit.dynamic_bce_loss
    crit.dynamic_bce_loss = variant_loss(norm)
    try:
        cfg = from_preset(
            "tvsum",
            v_feat_dim=V_DIM, t_feat_dim=T_DIM, max_v_l=48, max_q_l=8,
            dset_domain="BK", hidden_dim=32, dim_feedforward=64,
            t2v_layers=1, enc_layers=1, dummy_layers=1, num_dummies=2,
            num_mlp_layers=2, num_conv_layers=1, bsz=4, eval_bsz=4,
            n_epoch=EPOCHS, eval_epoch=2, lr=2e-4,
            train_precision="float32", eval_precision="float32",
            v_feat_dirs=(f"{root}/vid",), t_feat_dir=f"{root}/txt",
            train_path=f"{root}/val.jsonl", eval_path=f"{root}/val.jsonl",
            results_root=results_root, use_tensorboard=False,
        )
        _, best, _ = train(
            cfg, results_dir=os.path.join(results_root, f"run_{norm}")
        )
        return float(best)
    finally:
        crit.dynamic_bce_loss = orig


def main():
    tmp = tempfile.mkdtemp(prefix="hd_sens_")
    root = make_learnable_tvsum(tmp)
    results = {}
    for norm in ("per_sample_max", "global_const_12", "clip_at_1", "sigmoid"):
        results[norm] = run_variant(norm, root, os.path.join(tmp, "results"))
        print(f"{norm}: best top-5 mAP {results[norm]:.4f}", flush=True)
    vals = list(results.values())
    print("\nsummary:")
    for k, v in results.items():
        print(f"  {k:18s} {v:.4f}")
    print(f"  spread: {max(vals) - min(vals):.4f}")


if __name__ == "__main__":
    main()
