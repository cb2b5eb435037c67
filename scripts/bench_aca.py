"""Microbenchmark: Pallas ACA kernel vs plain-jnp ACA on the TPU chip.

Decides VERDICT round-1 item 3 — the kernel ships on by default only if it
beats XLA's fused einsum chain at the real configs. Run standalone:
    python scripts/bench_aca.py
All output on stderr except a final JSON summary on stdout.
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

# --- the (removed) fused ACA Pallas kernel, inlined verbatim so this
# measurement artifact stays reproducible ---


import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _aca_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, probs_ref, *,
                num_dummies, precision):
    q = q_ref[0, 0]  # (TILE_LV, Dh)
    k = k_ref[0, 0]  # (Lk, Dh)
    v = v_ref[0, 0]  # (Lk, Dh)
    valid = mask_ref[0]  # (1, Lk)

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )  # (TILE_LV, Lk)
    logits = jnp.where(valid > 0, logits, NEG_INF)

    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    unnorm = jnp.exp(logits)
    probs = unnorm / jnp.sum(unnorm, axis=-1, keepdims=True)
    probs_ref[0, 0] = probs

    out_ref[0, 0] = jnp.dot(
        probs[:, num_dummies:], v[num_dummies:],
        preferred_element_type=jnp.float32, precision=precision,
    ).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_dummies", "tile_lv", "interpret", "precision"),
)
def aca_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_valid: jnp.ndarray,
    num_dummies: int,
    tile_lv: int = 256,
    interpret: bool = False,
    precision: str = "highest",
):
    """Fused ACA attention.

    Args:
      q: (B, H, Lv, Dh) pre-scaled queries (already / sqrt(Dh)).
      k, v: (B, H, Lk, Dh) keys/values (dummies occupy the first
        `num_dummies` rows of the Lk axis).
      key_valid: (B, Lk) 1 = valid key.

    Returns:
      out: (B, H, Lv, Dh); probs: (B, H, Lv, Lk) post-softmax probabilities
      (pre value-matmul, dummies included — the reference's attention map).
    """
    prec = {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[precision]
    b, h, lv, dh = q.shape
    lk = k.shape[2]
    # tiles must be sublane-aligned (multiples of 8 for f32)
    tile = min(tile_lv, -(-lv // 8) * 8)
    tile = max(8, (tile // 8) * 8)
    # pad the video axis to a tile multiple (static)
    pad = (-lv) % tile
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
    lv_p = lv + pad
    grid = (b, h, lv_p // tile)

    mask2d = key_valid.reshape(b, 1, lk).astype(jnp.float32)

    out, probs = pl.pallas_call(
        functools.partial(_aca_kernel, num_dummies=num_dummies, precision=prec),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, tile, dh), lambda i, j, t: (i, j, t, 0),
                memory_space=pl.ANY if interpret else pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, lk, dh), lambda i, j, t: (i, j, 0, 0),
                memory_space=pl.ANY if interpret else pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, lk, dh), lambda i, j, t: (i, j, 0, 0),
                memory_space=pl.ANY if interpret else pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, lk), lambda i, j, t: (i, 0, 0),
                memory_space=pl.ANY if interpret else pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, tile, dh), lambda i, j, t: (i, j, t, 0),
                memory_space=pl.ANY if interpret else pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, tile, lk), lambda i, j, t: (i, j, t, 0),
                memory_space=pl.ANY if interpret else pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, lv_p, dh), q.dtype),
            jax.ShapeDtypeStruct((b, h, lv_p, lk), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, mask2d)

    if pad:
        out = out[:, :, :lv]
        probs = probs[:, :, :lv]
    return out, probs



def log(*a):
    print(*a, file=sys.stderr, flush=True)


def jnp_aca(q, k, v, key_valid, nd):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    logits = jnp.where(key_valid[:, None, None, :] > 0, logits, float("-inf"))
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", w[..., nd:], v[:, :, nd:])
    return out, w


LOOP = 50  # op repetitions inside ONE dispatch: the per-dispatch tunnel
           # round-trip (~53 ms measured) would otherwise swallow the signal


def bench(fn, args, iters=8):
    """fn runs the op LOOP times in-jit and returns one scalar; the tiny
    fetch is the execution fence (block_until_ready does not fence on
    axon). Returns per-op seconds with the dispatch floor amortized."""
    np.asarray(fn(*args))  # warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / LOOP


def run_case(name, b, h, lv, lk, dh, nd):
    host = np.random.default_rng(0)
    q = jnp.asarray(host.standard_normal((b, h, lv, dh), dtype=np.float32))
    k = jnp.asarray(host.standard_normal((b, h, lk, dh), dtype=np.float32))
    v = jnp.asarray(host.standard_normal((b, h, lk, dh), dtype=np.float32))
    valid = jnp.ones((b, lk), jnp.float32)

    def looped(fn):
        # i-dependent input defeats loop-invariant hoisting; the mean
        # reductions consume every element (like the real model, where the
        # probs feed the t2vattn sum)
        def run(q, k, v, valid):
            def body(i, acc):
                o, w = fn(q + i * 1e-9, k, v, valid)
                return acc + o.mean() + w.mean()

            return jax.lax.fori_loop(0, LOOP, body, 0.0)

        return jax.jit(run)

    def jnp_f32(*a):
        with jax.default_matmul_precision("float32"):
            return jnp_aca(*a, nd)

    def jnp_bf16(*a):
        with jax.default_matmul_precision("bfloat16"):
            return jnp_aca(*a, nd)

    res = {"case": name}
    res["jnp_f32_ms"] = round(bench(looped(jnp_f32), (q, k, v, valid)) * 1e3, 3)
    res["jnp_bf16_ms"] = round(bench(looped(jnp_bf16), (q, k, v, valid)) * 1e3, 3)
    res["pallas_f32_ms"] = round(
        bench(
            looped(lambda *a: aca_attention(*a, num_dummies=nd)),
            (q, k, v, valid),
        )
        * 1e3,
        3,
    )
    # correctness at f32 (the eval-parity mode)
    with jax.default_matmul_precision("float32"):
        oj, wj = jax.jit(lambda *a: jnp_aca(*a, nd))(q, k, v, valid)
    op, wp = aca_attention(q, k, v, valid, num_dummies=nd)
    res["max_abs_err_f32"] = float(jnp.max(jnp.abs(oj - op)))
    res["speedup_vs_f32"] = round(res["jnp_f32_ms"] / res["pallas_f32_ms"], 3)
    res["speedup_vs_bf16"] = round(res["jnp_bf16_ms"] / res["pallas_f32_ms"], 3)
    log(res)
    return res


def main():
    log(f"devices: {jax.devices()}")
    results = [
        # flagship QVH eval batch: Lk = 10 dummies + 32 text tokens
        run_case("qvh_eval_b512", 512, 8, 75, 42, 32, 10),
        # QVH train batch
        run_case("qvh_train_b64", 64, 8, 75, 42, 32, 10),
        # TACoS-shaped long video: Lk = 35 dummies + 40 text
        run_case("tacos_b32_lv2048", 32, 8, 2048, 75, 32, 35),
    ]
    print(json.dumps(results))


if __name__ == "__main__":
    main()
