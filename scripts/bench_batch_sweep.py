"""Sweep the serving batch size for the headline bench configuration.

Same math and pipelining as bench.py (all batches dispatched before the
first fetch; the fetch is the fence); prints q/s per batch size so the
headline BATCH choice is a measured decision.
"""

import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import jax
import jax.numpy as jnp

from flashvtg_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

from flashvtg_tpu.models.flashvtg import FlashVTGModel
from flashvtg_tpu.models.points import pyramid_masks_strict
from flashvtg_tpu.train.config import from_preset
from flashvtg_tpu.train.infer import make_eval_step

N_QUERIES = 4096
LV, LQ = 75, 32
V_DIM, T_DIM = 2816, 512


def main():
    sizes = [int(s) for s in (sys.argv[1:] or ["256", "512", "1024", "2048"])]
    cfg = from_preset("qvhighlights_slowclip")
    model = FlashVTGModel(cfg.model_config())
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init, static_argnames="train")(
        {"params": rng},
        jnp.zeros((1, LQ, T_DIM)), jnp.ones((1, LQ)),
        jnp.zeros((1, LV, V_DIM + 2)), jnp.ones((1, LV)),
        train=False,
    )
    host = np.random.default_rng(0)
    src_txt = host.standard_normal((N_QUERIES, LQ, T_DIM), dtype=np.float32)
    src_vid = host.standard_normal((N_QUERIES, LV, V_DIM + 2), dtype=np.float32)

    for batch in sizes:
        step = make_eval_step(model, cfg.max_num_moment, "float32")
        strict, _ = pyramid_masks_strict(np.full(batch, LV), LV, cfg.strides)
        strict_dev = jax.device_put(strict)
        batches = []
        # drop a ragged tail: every dispatched batch must be full-size
        # (masks/strict are built for `batch` rows)
        n_full = (N_QUERIES // batch) * batch
        if n_full == 0:
            print(f"B={batch}: skipped (exceeds N_QUERIES={N_QUERIES})",
                  flush=True)
            continue
        for i in range(0, n_full, batch):
            sl = slice(i, i + batch)
            batches.append({
                "src_txt": jax.device_put(src_txt[sl]),
                "src_txt_mask": jax.device_put(np.ones((batch, LQ), np.float32)),
                "src_vid": jax.device_put(src_vid[sl]),
                "src_vid_mask": jax.device_put(np.ones((batch, LV), np.float32)),
            })

        def run():
            inflight = [step(params, dev, strict_dev) for dev in batches]
            return [np.asarray(s) for _, s, _, _ in inflight]

        t0 = time.perf_counter()
        run()
        warm = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        print(f"B={batch:5d}: {n_full / best:8.1f} q/s "
              f"(warm incl compile {warm:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
