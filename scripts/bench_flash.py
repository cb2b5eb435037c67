"""Long-sequence self-attention shootout on the TPU chip:

  plain jnp (materialized logits)  vs  chunked+remat jnp (ops/chunked_attn)
  vs  stock Pallas flash attention (jax.experimental.pallas.ops.tpu)

at the TACoS/charades_vgg encoder shape (B=32, H=8, L=2048, Dh=32),
forward and forward+backward, repeated in-jit to amortize the ~53 ms
dispatch floor. Decides whether a Pallas kernel earns the long-attention
slot (docs/KERNELS.md holds the verdict).
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

from flashvtg_tpu.ops.chunked_attn import chunked_attention

B, H, L, DH = 32, 8, 2048, 32
LOOP = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def plain(q, k, v, valid):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    logits = jnp.where(valid[:, None, None, :] > 0, logits, float("-inf"))
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


def chunked(q, k, v, valid):
    return chunked_attention(q, k, v, valid, chunk_size=256)


def make_flash(valid_np):
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    seg = jnp.asarray(1 - valid_np.astype(np.int32))  # pad tokens -> segment 1
    ids = fa.SegmentIds(q=seg, kv=seg)

    def f(q, k, v, valid):
        return fa.flash_attention(q, k, v, segment_ids=ids, sm_scale=1.0)

    return f


def bench(fn, args, grad=False, iters=6):
    if grad:
        def loss(q, k, v, valid):
            return (fn(q, k, v, valid) ** 2).mean()

        g = jax.grad(loss, argnums=(0, 1, 2))

        def run(q, k, v, valid):
            def body(i, acc):
                gs = g(q + i * 1e-9, k, v, valid)
                return acc + sum(x.mean() for x in gs)

            return jax.lax.fori_loop(0, LOOP, body, 0.0)
    else:
        def run(q, k, v, valid):
            def body(i, acc):
                return acc + fn(q + i * 1e-9, k, v, valid).mean()

            return jax.lax.fori_loop(0, LOOP, body, 0.0)

    jfn = jax.jit(run)
    np.asarray(jfn(*args))  # warm (compile)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(jfn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / LOOP


def main():
    log(f"devices: {jax.devices()}")
    host = np.random.default_rng(0)
    q = jnp.asarray(host.standard_normal((B, H, L, DH), dtype=np.float32))
    k = jnp.asarray(host.standard_normal((B, H, L, DH), dtype=np.float32))
    v = jnp.asarray(host.standard_normal((B, H, L, DH), dtype=np.float32))
    valid_np = np.ones((B, L), np.float32)
    valid_np[: B // 2, L - 300 :] = 0  # realistic ragged tail
    valid = jnp.asarray(valid_np)

    flash = None
    try:
        flash = make_flash(valid_np)
        of = flash(q, k, v, valid)
        oc = chunked(q, k, v, valid)
        err = float(jnp.max(jnp.abs(
            jnp.where(valid[:, None, :, None] > 0, of - oc, 0.0)
        )))
        log(f"flash vs chunked max|d| on valid rows: {err:.2e}")
    except Exception as e:
        log(f"stock flash attention unusable at this shape: {e!r}")

    res = {}
    for name, fn in (("plain", plain), ("chunked", chunked),
                     ("flash", flash)):
        if fn is None:
            continue
        try:
            res[f"{name}_fwd_ms"] = round(bench(fn, (q, k, v, valid)) * 1e3, 3)
            res[f"{name}_fwdbwd_ms"] = round(
                bench(fn, (q, k, v, valid), grad=True) * 1e3, 3
            )
            log(name, res[f"{name}_fwd_ms"], res[f"{name}_fwdbwd_ms"])
        except Exception as e:
            log(f"{name} failed: {e!r}")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
