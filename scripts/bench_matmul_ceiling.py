"""Measured roofline ceilings for the flagship eval step (VERDICT r4 item 3).

The round-4 MFU accounting divided by an ANALYTIC ceiling (v5e bf16 peak /
MXU passes). This script replaces that constant with measurements at the
model's actual shapes, per precision (float32 / tensorfloat32 / bfloat16):

  1. `square4k`   — a 4096^3 matmul: the chip's absolute measured MXU rate.
  2. `skeleton`   — the model's *matmul skeleton*: every matmul/conv that
     utils/flops.model_flops counts for the flagship eval forward (B=512,
     Lv=75, Lq=32, d=256), chained with nothing but reshapes/adds — no
     softmax, masking, layernorm, or layout glue. Its rate IS the measured
     speed-of-light for this architecture at this precision: a full eval
     step can never beat it, and the gap between the two is the measured
     (not estimated) non-matmul floor.
  3. named single-op rows (input proj, FFN pair, attention einsums, head
     conv) for the KERNELS.md table.

Methodology: in-jit repetition (LOOP iterations per dispatch, i-perturbed
inputs to defeat hoisting, scalar fetch as the fence) — per
docs/KERNELS.md's ~53 ms dispatch-floor note. All output on stderr except a
final JSON summary on stdout.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from flashvtg_tpu.utils.runtime import setup

setup()

import jax
import jax.numpy as jnp

from flashvtg_tpu.train.config import from_preset
from flashvtg_tpu.utils.flops import model_flops

LOOP = int(os.environ.get("CEIL_LOOP", 30))
# CEIL_B: smoke-test override only; the recorded ceilings use the bench's
# serving batch (512)
B = int(os.environ.get("CEIL_B", 512))
LV, LQ = 75, 32
PRECISIONS = ("float32", "tensorfloat32", "bfloat16")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_ms(fn, args, iters=6):
    np.asarray(fn(*args))  # warm (compile)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / LOOP * 1e3


def looped(op, *arrs):
    """Run `op` LOOP times in one jitted dispatch; i-perturbation of the
    first operand defeats loop-invariant hoisting; the mean fetch keeps
    every output live."""

    def run(*arrs):
        def body(i, acc):
            return acc + op(arrs[0] + i * 1e-9, *arrs[1:]).mean()

        return jax.lax.fori_loop(0, LOOP, body, 0.0)

    return jax.jit(run)


def rate_row(name, flops, op, *arrs):
    row = {"case": name, "gflops_per_call": round(flops / 1e9, 2)}
    for prec in PRECISIONS:
        def with_prec(*a, _p=prec):
            with jax.default_matmul_precision(_p):
                return op(*a)

        ms = bench_ms(looped(with_prec, *arrs), arrs)
        row[f"{prec}_ms"] = round(ms, 3)
        row[f"{prec}_tflops"] = round(flops / (ms * 1e-3) / 1e12, 2)
    log(row)
    return row


def _dense_w(rng, d_in, d_out):
    return jnp.asarray(
        rng.standard_normal((d_in, d_out), dtype=np.float32) / np.sqrt(d_in)
    )


def build_skeleton(cfg, weights_as_arg=False):
    """The flagship eval forward reduced to its counted matmuls/convs.

    Mirrors utils/flops.model_flops group by group (same op, same shape,
    same count) so `model_flops(...)["fwd"]` is this function's FLOP count
    (sole divergence: the 2·b·lq·d pooling dot, <0.01%, see the trailing
    note). Glue between ops is only reshape / transpose / add — measuring
    the matmul chain, not the model's softmax/norm/mask overhead.

    With `weights_as_arg` the returned callable is `skeleton(w, vid, txt)`
    (weights a pytree argument) so jax.grad can differentiate w.r.t. the
    weights — the train-ceiling row measures fwd + full backward (input
    AND weight gradients = 3x fwd matmul FLOPs, utils/flops.model_flops
    docstring)."""
    d, ff, h = cfg.hidden_dim, cfg.dim_feedforward, cfg.nheads
    nd, dh = cfg.num_dummies, cfg.hidden_dim // cfg.nheads
    rng = np.random.default_rng(0)
    mcfg = cfg.model_config()

    w = {
        "vp0": _dense_w(rng, mcfg.vid_dim, d), "vp1": _dense_w(rng, d, d),
        "tp0": _dense_w(rng, mcfg.txt_dim, d), "tp1": _dense_w(rng, d, d),
        # distinct q/k/v weights: one shared weight would let XLA CSE the
        # three projections of the same input into a single matmul
        "wq": _dense_w(rng, d, d), "wk": _dense_w(rng, d, d),
        "wv": _dense_w(rng, d, d), "out": _dense_w(rng, d, d),
        "ff1": _dense_w(rng, d, ff), "ff2": _dense_w(rng, ff, d),
        "sal1": _dense_w(rng, d, d), "sal2": _dense_w(rng, d, d),
        "pyr": jnp.asarray(rng.standard_normal((2, d, d), np.float32) / 16),
        # separate weights per head: identical weights would let XLA CSE
        # the class and conf scorer calls into one, halving the real work
        "cls_conv": jnp.asarray(
            rng.standard_normal((2, cfg.kernel_size, d, d), np.float32) / 36
        ),
        "mlp_in": jnp.asarray(
            rng.standard_normal((2, d, d // 2), np.float32) / 16
        ),
        "mlp_mid": jnp.asarray(
            rng.standard_normal((2, d // 2, d // 2), np.float32) / 11
        ),
        "mlp_out": jnp.asarray(
            rng.standard_normal((2, d // 2, 1), np.float32) / 11
        ),
        "crd_conv": jnp.asarray(
            rng.standard_normal((mcfg.coord_kernel_size, d, d), np.float32)
            / 27
        ),
        "crd_out": jnp.asarray(
            rng.standard_normal((mcfg.coord_kernel_size, d, 2), np.float32)
            / 27
        ),
        "pool": _dense_w(rng, d, 1),
    }

    def heads_split(x):  # (B, L, d) -> (B, h, L, dh)
        b, l, _ = x.shape
        return x.reshape(b, l, h, dh).transpose(0, 2, 1, 3)

    def heads_merge(x):  # (B, h, L, dh) -> (B, L, d)
        b, _, l, _ = x.shape
        return x.transpose(0, 2, 1, 3).reshape(b, l, d)

    def enc_layer(w, x):  # self-attn encoder layer: 4 proj + 2 einsum + FFN
        q, k, v = x @ w["wq"], x @ w["wk"], x @ w["wv"]
        qh, kh, vh = heads_split(q), heads_split(k), heads_split(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh)
        ctx = heads_merge(jnp.einsum("bhqk,bhkd->bhqd", logits * 1e-3, vh))
        x = x + ctx @ w["out"]
        return x + jax.nn.relu(x @ w["ff1"]) @ w["ff2"]

    def aca_layer(w, vid, txt):  # projless ACA: logits incl dummies, values not
        qh, kh = heads_split(vid), heads_split(txt)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh)
        vh = heads_split(txt[:, nd:])
        ctx = heads_merge(
            jnp.einsum("bhqk,bhkd->bhqd", logits[..., nd:] * 1e-3, vh)
        )
        vid = vid + ctx @ w["out"]
        return vid + jax.nn.relu(vid @ w["ff1"]) @ w["ff2"]

    def conv_pts(x, kern):  # NLC conv1d, SAME padding (head convs)
        return jax.lax.conv_general_dilated(
            x, kern, (1,), "SAME",
            dimension_numbers=("NLC", "LIO", "NLC"),
        )

    def skeleton_w(w, src_vid, src_txt):
        vid = jax.nn.relu(src_vid @ w["vp0"]) @ w["vp1"]          # input proj
        txt0 = jax.nn.relu(src_txt @ w["tp0"]) @ w["tp1"]
        txt = jnp.concatenate(
            [jnp.tile(txt0[:, :1], (1, nd, 1)), txt0], axis=1
        )  # (B, nd+lq, d) incl. dummy rows
        for _ in range(cfg.dummy_layers):                          # dummy enc
            txt = enc_layer(w, txt)
        for _ in range(cfg.t2v_layers):                            # ACA stack
            vid = aca_layer(w, vid, txt)
        for _ in range(cfg.enc_layers):                            # encoder
            vid = enc_layer(w, vid)
        glob = vid.mean(axis=1, keepdims=True)                     # saliency
        sal = ((vid @ w["sal1"]) * (glob @ w["sal2"])).sum(-1)
        # pyramid: each level re-chains k=2 s=2 VALID convs from full res
        levels = [vid]
        for s in (s for s in cfg.strides if LV >= s):
            if s <= 1:
                continue
            x = vid
            for _ in range(int(np.log2(s))):
                x = jax.lax.conv_general_dilated(
                    x, w["pyr"], (2,), "VALID",
                    dimension_numbers=("NLC", "LIO", "NLC"),
                )
            levels.append(x)
        cat = jnp.concatenate(levels, axis=1)                      # N points
        acc = sal.mean()

        def scorer(x, j):  # ConfidenceScorer: convs + MLP chain
            for _ in range(cfg.num_conv_layers):
                x = conv_pts(x, w["cls_conv"][j])
            y = jax.nn.relu(x @ w["mlp_in"][j])
            for _ in range(cfg.num_mlp_layers - 2):
                y = jax.nn.relu(y @ w["mlp_mid"][j])
            return y @ w["mlp_out"][j]

        acc += scorer(cat, 0).mean() + scorer(cat, 1).mean()  # class + conf
        crd = conv_pts(cat, w["crd_conv"])                         # coord
        acc += conv_pts(crd, w["crd_out"]).mean()
        acc += (txt0 @ w["pool"]).mean()                           # pooling*
        return acc + cat.mean()

    # *pooling's 2·b·lq·d weighted-sum term (~0.008 GF of ~780 GF) is
    # elementwise, not MXU work — counted by model_flops, omitted here.
    if weights_as_arg:
        return skeleton_w, w

    def skeleton(src_vid, src_txt):
        return skeleton_w(w, src_vid, src_txt)

    return skeleton


def main():
    log(f"devices: {jax.devices()}")
    cfg = from_preset("qvhighlights_slowclip", eval_bsz=B)
    fl = model_flops(cfg.model_config(), B, LQ, LV, train=False)
    fwd = fl["fwd"]
    log(f"analytic eval-forward FLOPs at B={B}: {fwd / 1e9:.1f} GF "
        f"(groups: { {k: round(v / 1e9, 1) for k, v in fl['groups'].items()} })")

    host = np.random.default_rng(0)
    results = {"flagship": {"batch": B, "lv": LV, "lq": LQ,
                            "fwd_gflops": round(fwd / 1e9, 2)}}

    # 1. absolute measured MXU rate
    n = 4096
    a = jnp.asarray(host.standard_normal((n, n), dtype=np.float32))
    bm = jnp.asarray(host.standard_normal((n, n), dtype=np.float32))
    results["square4k"] = rate_row(
        "square4k", 2.0 * n**3, lambda x, y: x @ y, a, bm
    )

    # 2. the model's matmul skeleton = measured per-mode ceiling
    skel = build_skeleton(cfg)
    src_vid = jnp.asarray(
        host.standard_normal((B, LV, cfg.total_v_feat_dim), dtype=np.float32)
    )
    src_txt = jnp.asarray(
        host.standard_normal((B, LQ, cfg.t_feat_dim), dtype=np.float32)
    )
    results["skeleton"] = rate_row("skeleton", fwd, skel, src_vid, src_txt)

    # 2b. TRAIN skeleton: fwd + full backward (input AND weight grads =
    # 3x fwd matmul FLOPs) at the production train batch B=32 — the
    # measured matmul ceiling for the scan-epoch train step. Single trunk
    # pass (the with_neg second pass runs the identical chain, so its
    # per-FLOP rate is the same regime); the loss itself is elementwise.
    tb = int(os.environ.get("CEIL_TRAIN_B", 32))
    skel_w, w0 = build_skeleton(cfg, weights_as_arg=True)
    t_fwd = model_flops(
        cfg.model_config(), tb, LQ, LV, train=False, with_neg=False
    )["fwd"]
    tvid = jnp.asarray(
        host.standard_normal((tb, LV, cfg.total_v_feat_dim), dtype=np.float32)
    )
    ttxt = jnp.asarray(
        host.standard_normal((tb, LQ, cfg.t_feat_dim), dtype=np.float32)
    )

    def train_step_skel(v, t):
        loss, grads = jax.value_and_grad(
            lambda wt: skel_w(wt, v, t)
        )(w0)
        # reduce the grad pytree to a scalar so every weight gradient
        # stays live in the accumulated output
        return loss + sum(
            jnp.mean(g) for g in jax.tree_util.tree_leaves(grads)
        )

    results["skeleton_train_b32"] = rate_row(
        f"skeleton fwd+bwd B={tb}", 3.0 * t_fwd, train_step_skel, tvid, ttxt
    )

    # 3. named single-op rows for the KERNELS.md table
    d, ff, h = cfg.hidden_dim, cfg.dim_feedforward, cfg.nheads
    dh, nd = d // h, cfg.num_dummies
    lk = nd + LQ
    xv = jnp.asarray(
        host.standard_normal((B * LV, cfg.total_v_feat_dim), dtype=np.float32)
    )
    wv = jnp.asarray(
        host.standard_normal((cfg.total_v_feat_dim, d), dtype=np.float32)
    )
    results["input_proj"] = rate_row(
        "input_proj (38400x2818x256)", 2.0 * B * LV * cfg.total_v_feat_dim * d,
        lambda x, y: x @ y, xv, wv,
    )
    xf = jnp.asarray(host.standard_normal((B * LV, d), dtype=np.float32))
    w1 = jnp.asarray(host.standard_normal((d, ff), dtype=np.float32))
    w2 = jnp.asarray(host.standard_normal((ff, d), dtype=np.float32))
    results["ffn_pair"] = rate_row(
        "ffn pair (38400, 256<->1024)", 2.0 * B * LV * d * ff * 2,
        lambda x, a_, b_: jax.nn.relu(x @ a_) @ b_, xf, w1, w2,
    )
    qh = jnp.asarray(host.standard_normal((B, h, LV, dh), dtype=np.float32))
    kh = jnp.asarray(host.standard_normal((B, h, lk, dh), dtype=np.float32))
    results["attn_qk_t2v"] = rate_row(
        f"attn qk t2v (4096x{LV}x{dh}x{lk})", 2.0 * B * h * LV * dh * lk,
        lambda x, y: jnp.einsum("bhqd,bhkd->bhqk", x, y), qh, kh,
    )
    pw = jnp.asarray(host.standard_normal((B, h, LV, lk), dtype=np.float32))
    results["attn_pv_t2v"] = rate_row(
        f"attn pv t2v (4096x{LV}x{lk - nd}x{dh})",
        2.0 * B * h * LV * (lk - nd) * dh,
        lambda x, y: jnp.einsum("bhqk,bhkd->bhqd", x[..., nd:], y[:, :, nd:]),
        pw, kh,
    )
    ks = jnp.asarray(host.standard_normal((B, h, LV, dh), dtype=np.float32))
    results["attn_qk_self"] = rate_row(
        f"attn qk self (4096x{LV}x{dh}x{LV})", 2.0 * B * h * LV * dh * LV,
        lambda x, y: jnp.einsum("bhqd,bhkd->bhqk", x, y), qh, ks,
    )
    npts = fl["n_points"]
    xc = jnp.asarray(host.standard_normal((B, npts, d), dtype=np.float32))
    kc = jnp.asarray(
        host.standard_normal((cfg.kernel_size, d, d), dtype=np.float32)
    )
    results["head_conv"] = rate_row(
        f"head conv k={cfg.kernel_size} ({B}x{npts}x{d})",
        2.0 * B * npts * cfg.kernel_size * d * d,
        lambda x, y: jax.lax.conv_general_dilated(
            x, y, (1,), "SAME", dimension_numbers=("NLC", "LIO", "NLC")
        ), xc, kc,
    )

    print(json.dumps(results))


if __name__ == "__main__":
    main()
