"""Measure eval-time variable-length bucketing vs fixed max-length padding
on a TACoS-shaped synthetic set (video lengths vary ~40x), on the TPU.

Decides VERDICT round-1 item 8 with numbers; results land in
docs/BUCKETS.md. Run standalone: python scripts/bench_buckets.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from flashvtg_tpu.utils.runtime import enable_compilation_cache, setup

setup()
enable_compilation_cache()

import jax
import jax.numpy as jnp

N_QUERIES = 256
V_DIM, T_DIM = 768, 256


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_env(root):
    from flashvtg_tpu.utils.io import save_jsonl

    rng = np.random.default_rng(0)
    vdir, qdir = os.path.join(root, "vid"), os.path.join(root, "txt")
    os.makedirs(vdir, exist_ok=True)
    os.makedirs(qdir, exist_ok=True)
    # TACoS length profile: log-uniform 50..2000 clips (2 s clips)
    lens = np.exp(
        rng.uniform(np.log(50), np.log(2000), N_QUERIES)
    ).astype(int)
    rows = []
    for i, lv in enumerate(lens):
        vid = f"bv{i}"
        rows.append(
            dict(qid=i, query=f"q {i}", vid=vid, duration=float(lv * 2.0),
                 relevant_windows=[[0.0, 8.0]])
        )
        np.savez(os.path.join(vdir, f"{vid}.npz"),
                 features=rng.standard_normal((lv, V_DIM), dtype=np.float32))
        np.savez(os.path.join(qdir, f"qid{i}.npz"),
                 last_hidden_state=rng.standard_normal((12, T_DIM),
                                                       dtype=np.float32))
    ann = os.path.join(root, "val.jsonl")
    save_jsonl(rows, ann)
    return ann, vdir, qdir, lens


def main():
    import tempfile

    from flashvtg_tpu.data.dataset import VTGDataset
    from flashvtg_tpu.train.config import from_preset
    from flashvtg_tpu.train.infer import run_mr_inference
    from flashvtg_tpu.train.loop import _dataset_cfg

    log(f"devices: {jax.devices()}")
    with tempfile.TemporaryDirectory() as tmp:
        ann, vdir, qdir, lens = build_env(tmp)
        cfg = from_preset(
            "tacos",
            v_feat_dim=V_DIM, t_feat_dim=T_DIM, max_v_l=2048, eval_bsz=8,
            v_feat_dirs=(vdir,), t_feat_dir=qdir, eval_path=ann,
            nms_thd=-1.0, eval_precision="float32",
            v_buckets=(256, 512, 1024, 2048),
        )
        model = cfg.build_model()
        rng = jax.random.PRNGKey(0)
        params = jax.jit(model.init, static_argnames="train")(
            {"params": rng},
            jnp.zeros((1, cfg.max_q_l, T_DIM)), jnp.ones((1, cfg.max_q_l)),
            jnp.zeros((1, 256, V_DIM + 2)), jnp.ones((1, 256)),
            train=False,
        )
        dataset = VTGDataset(_dataset_cfg(cfg, ann, load_labels=False))
        log(f"lengths: min {lens.min()} max {lens.max()} "
            f"mean {lens.mean():.0f}")

        results = {}
        for name, c in (
            ("fixed_2048", cfg),
            ("bucketed", cfg.replace(bucket_eval=True)),
        ):
            t0 = time.perf_counter()
            sub, _, _ = run_mr_inference(c, model, params, dataset)
            warm = time.perf_counter() - t0  # includes every compile
            t0 = time.perf_counter()
            sub, _, _ = run_mr_inference(c, model, params, dataset)
            steady = time.perf_counter() - t0
            results[name] = {
                "warm_s": round(warm, 2),
                "steady_s": round(steady, 2),
                "steady_qps": round(len(sub) / steady, 1),
            }
            log(name, results[name])
        results["speedup_steady"] = round(
            results["fixed_2048"]["steady_s"] / results["bucketed"]["steady_s"], 2
        )
        print(json.dumps(results))


if __name__ == "__main__":
    main()
