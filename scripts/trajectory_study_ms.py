"""Statistical co-training study for the _ms variant: torch vs flashvtg_tpu.

The _ms analogue of scripts/trajectory_study.py (which covers the core
model): tests/test_ms_train_trajectory.py pins the deterministic _ms
optimization path (f64, dropout zeroed, 5e-6/step); this study covers the
stochastic regime — both frameworks co-train the FlashVTG_ms stack
(phrase pipeline, T_SA, sim-score NCE, slot-orthogonality) for EPOCHS
epochs in float32 with dropout LIVE from identical converted initial
weights on the same synthetic dataset, K seeds per side, compared by
per-epoch Welch z plus final held-out loss and R1@0.5 bands.

Oracle: /root/reference/FlashVTG_ms/train.py:40-96 (criterion(batch,
epoch_i, outputs, targets), weighted sum, AdamW + StepLR).
Run:  python scripts/trajectory_study_ms.py
Writes docs/TRAJECTORY_MS.md + docs/trajectory_study_ms.json.
"""

import contextlib
import copy
import io
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# reuses the core study's dataset/batching/report helpers AND its
# JAX_PLATFORMS=cpu setup (applied at import)
from scripts import trajectory_study as core

import jax
import jax.numpy as jnp
import optax
import torch

from flashvtg_tpu.losses.criterion_ms import (
    MSLossConfig,
    compute_losses_ms,
    weighted_total_ms,
)
from flashvtg_tpu.models.flashvtg import decode_boundaries
from flashvtg_tpu.models.flashvtg_ms import FlashVTGMSModel, MSModelConfig
from flashvtg_tpu.utils.torch_convert import convert_checkpoint_ms
from tests.reference_oracle import install_nncore_stub, make_args
from tests.test_ms_grad_parity import NUM_BINS, WEIGHTS
from tests.test_ms_model_parity import build_reference_ms

B, LV, LQ = core.B, core.LV, core.LQ
V_DIM, T_DIM = core.V_DIM, core.T_DIM
CLIP_LEN = core.CLIP_LEN
N_TRAIN, N_VAL = core.N_TRAIN, core.N_VAL
LR, WD, GRAD_CLIP = core.LR, core.WD, core.GRAD_CLIP
LR_DROP, GAMMA = core.LR_DROP, core.GAMMA
DROPOUT, INPUT_DROPOUT = core.DROPOUT, core.INPUT_DROPOUT
EPOCHS = 20
SEEDS = (0, 1, 2, 3, 4, 5)
STRIDES = (1, 2)


def build_torch_ms():
    torch.manual_seed(11)
    args = make_args(
        v_feat_dim=V_DIM, t_feat_dim=T_DIM,
        dropout=DROPOUT, input_dropout=INPUT_DROPOUT,
        num_dummies=3, dummy_layers=1, t2v_layers=2, enc_layers=1,
        num_conv_layers=2, num_mlp_layers=3, kernel_size=5,
        num_phrase=3, phrase_layers=2, context_layers=2,
        use_dfl=False, num_bins=NUM_BINS, rank=4, t_sa=2,
        sample_radius=1.5, use_neg=True, dset_name="tvsum",
        clip_length=CLIP_LEN, max_v_l=LV, max_q_l=LQ,
    )
    return build_reference_ms(args, strides=STRIDES), args


def torch_criterion_ms():
    install_nncore_stub()
    from types import SimpleNamespace

    from FlashVTG_ms.loss import SetCriterion

    crit_args = SimpleNamespace(
        device="cpu", dset_name="hl", lw_wattn=1.0, sample_radius=1.5,
        use_dfl=False, num_bins=NUM_BINS,
    )
    return SetCriterion(
        weight_dict=dict(WEIGHTS), eos_coef=0.1,
        losses=["saliency", "labels", "phrase_slot", "sal", "reg", "cls",
                "qfl"],
        saliency_margin=0.2, args=crit_args,
    )


def torch_loss_ms(ref, criterion, batch, i0, epoch):
    src_txt, txt_mask, src_vid, vid_mask, targets, metas = batch
    t = core.torch_targets(targets, metas)
    vids = [f"v{i0 + j}" for j in range(len(metas))]
    # the _ms forward leaks a debug print(gate[0]) (model.py:179)
    with contextlib.redirect_stdout(io.StringIO()):
        outputs = ref(
            torch.from_numpy(src_txt), torch.from_numpy(txt_mask),
            torch.from_numpy(src_vid), torch.from_numpy(vid_mask),
            vids, list(range(len(metas))), targets=t,
        )
        loss_dict = criterion((metas, None), epoch, outputs, t)
    return sum(loss_dict[k] * w for k, w in WEIGHTS.items()
               if k in loss_dict)


def run_torch(init_sd, train_set, val_set, seed):
    ref, _ = build_torch_ms()
    ref.load_state_dict(init_sd)
    torch.manual_seed(10_000 + seed)
    criterion = torch_criterion_ms()
    optimizer = torch.optim.AdamW(
        [p for p in ref.parameters() if p.requires_grad],
        lr=LR, weight_decay=WD,
    )
    scheduler = torch.optim.lr_scheduler.StepLR(optimizer, LR_DROP, GAMMA)
    epoch_losses = []
    ref.train()
    for epoch in range(EPOCHS):
        losses = []
        for idxs in core.epoch_batches(N_TRAIN, epoch):
            total = torch_loss_ms(
                ref, criterion, core.batch_of(train_set, idxs),
                int(idxs[0]), epoch,
            )
            optimizer.zero_grad()
            total.backward()
            torch.nn.utils.clip_grad_norm_(
                ref.parameters(), GRAD_CLIP, error_if_nonfinite=False
            )
            optimizer.step()
            losses.append(float(total.detach()))
        scheduler.step()
        epoch_losses.append(float(np.mean(losses)))
    with torch.no_grad(), core.zero_dropout(ref):
        ev = float(torch_loss_ms(
            ref, criterion, core.batch_of(val_set, np.arange(B)), 0, EPOCHS
        ).detach())
    ref.eval()
    hits = 0
    with torch.no_grad():
        for s in val_set:
            with contextlib.redirect_stdout(io.StringIO()):
                out = ref(
                    torch.from_numpy(s["txt"][None]), torch.ones(1, LQ),
                    torch.from_numpy(s["vid"][None]), torch.ones(1, LV),
                    ["q"], [0], targets={},
                )
            boundary = out["_out"]["boundary"].numpy()
            top = boundary[np.argmax(boundary[:, 2])]
            hits += core.iou(top[:2], s["gt"][0]) >= 0.5
    return epoch_losses, ev, hits / len(val_set)


def jax_model_ms(init_sd):
    cfg = MSModelConfig(
        vid_dim=V_DIM, txt_dim=T_DIM,
        num_dummies=3, dummy_layers=1, t2v_layers=2, enc_layers=1,
        num_conv_layers=2, num_mlp_layers=3, kernel_size=5,
        clip_length=CLIP_LEN, strides=STRIDES,
        dropout=DROPOUT, input_dropout=INPUT_DROPOUT, dummy_dropout=0.1,
        use_neg=True, num_phrase=3, phrase_layers=2, context_layers=2,
        use_dfl=False, num_bins=NUM_BINS, rank=4, t_sa_layers=2,
        sample_radius=1.5,
    )
    params = convert_checkpoint_ms(
        {k: v.numpy() for k, v in init_sd.items()}, cfg
    )
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
    return FlashVTGMSModel(cfg), params, cfg


def run_jax(init_sd, train_set, val_set, seed):
    model, params, cfg = jax_model_ms(init_sd)
    loss_cfg = MSLossConfig(
        clip_length=CLIP_LEN, dset_name="hl", use_dfl=False,
        num_bins=NUM_BINS,
    )
    boundaries = {
        k * LR_DROP * len(core.epoch_batches(N_TRAIN, 0)): GAMMA
        for k in range(1, 10)
    }
    tx = optax.chain(
        optax.clip_by_global_norm(GRAD_CLIP),
        optax.adamw(
            optax.piecewise_constant_schedule(LR, boundaries),
            weight_decay=WD,
        ),
    )
    opt_state = tx.init(params)
    rnm = jnp.ones((B,), jnp.float32)  # all vids distinct

    def loss_fn(p, jb, key):
        src_txt, txt_mask, src_vid, vid_mask, targets = jb
        out = model.apply(
            p, src_txt, txt_mask, src_vid, vid_mask, rnm,
            train=True, rngs={"dropout": key},
        )
        return weighted_total_ms(
            compute_losses_ms(out, targets, loss_cfg), loss_cfg
        )

    @jax.jit
    def update(p, s, jb, key):
        total, grads = jax.value_and_grad(loss_fn)(p, jb, key)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, total

    key = jax.random.PRNGKey(20_000 + seed)
    epoch_losses, step = [], 0
    for epoch in range(EPOCHS):
        losses = []
        for idxs in core.epoch_batches(N_TRAIN, epoch):
            src_txt, txt_mask, src_vid, vid_mask, targets, _ = core.batch_of(
                train_set, idxs
            )
            jb = (
                jnp.asarray(src_txt), jnp.asarray(txt_mask),
                jnp.asarray(src_vid), jnp.asarray(vid_mask),
                {k: jnp.asarray(v) for k, v in targets.items()},
            )
            params, opt_state, total = update(
                params, opt_state, jb, jax.random.fold_in(key, step)
            )
            losses.append(float(total))
            step += 1
        epoch_losses.append(float(np.mean(losses)))

    import dataclasses

    model0 = FlashVTGMSModel(dataclasses.replace(
        cfg, dropout=0.0, input_dropout=0.0, dummy_dropout=0.0
    ))
    src_txt, txt_mask, src_vid, vid_mask, targets, _ = core.batch_of(
        val_set, np.arange(B)
    )
    jb = (
        jnp.asarray(src_txt), jnp.asarray(txt_mask),
        jnp.asarray(src_vid), jnp.asarray(vid_mask),
        {k: jnp.asarray(v) for k, v in targets.items()},
    )

    def eval_loss_fn(p, jb, key):
        src_txt, txt_mask, src_vid, vid_mask, tg = jb
        out = model0.apply(
            p, src_txt, txt_mask, src_vid, vid_mask, rnm,
            train=True, rngs={"dropout": key},
        )
        return weighted_total_ms(
            compute_losses_ms(out, tg, loss_cfg), loss_cfg
        )

    ev = float(jax.jit(eval_loss_fn)(params, jb, jax.random.PRNGKey(0)))

    # R1@0.5 via our eval path: batched eval forward + L1 decode
    vb = core.batch_of(val_set, np.arange(N_VAL))

    @jax.jit
    def eval_decode(p, src_txt, txt_mask, src_vid, vid_mask):
        out = model.apply(
            p, src_txt, txt_mask, src_vid, vid_mask, train=False
        )
        return decode_boundaries(
            out["out_class"], out["out_coord"], out["point"],
            cfg.clip_length, top_k=10,
        )

    spans, scores = eval_decode(
        params, jnp.asarray(vb[0]), jnp.asarray(vb[1]),
        jnp.asarray(vb[2]), jnp.asarray(vb[3]),
    )
    spans, scores = np.asarray(spans), np.asarray(scores)
    hits = sum(
        core.iou(spans[i, int(np.argmax(scores[i]))], val_set[i]["gt"][0])
        >= 0.5
        for i in range(N_VAL)
    )
    return epoch_losses, ev, hits / N_VAL


def run_study(epochs=EPOCHS, seeds=SEEDS):
    global EPOCHS
    EPOCHS = epochs
    rng = np.random.default_rng(7)
    train_set = core.make_dataset(rng, N_TRAIN)
    val_set = core.make_dataset(rng, N_VAL)
    ref, _ = build_torch_ms()
    init_sd = copy.deepcopy(ref.state_dict())

    tr_t, ev_t, r1_t = [], [], []
    for s in seeds:
        tl, ev, r1 = run_torch(init_sd, train_set, val_set, s)
        tr_t.append(tl); ev_t.append(ev); r1_t.append(r1)
        print(f"torch seed {s}: first {tl[0]:.4f} last {tl[-1]:.4f} "
              f"eval {ev:.4f} R1@0.5 {r1:.3f}", flush=True)
    tr_j, ev_j, r1_j = [], [], []
    for s in seeds:
        tl, ev, r1 = run_jax(init_sd, train_set, val_set, s)
        tr_j.append(tl); ev_j.append(ev); r1_j.append(r1)
        print(f"jax   seed {s}: first {tl[0]:.4f} last {tl[-1]:.4f} "
              f"eval {ev:.4f} R1@0.5 {r1:.3f}", flush=True)

    tr_t, tr_j = np.asarray(tr_t), np.asarray(tr_j)
    mu_t, sd_t = tr_t.mean(0), tr_t.std(0, ddof=1)
    mu_j, sd_j = tr_j.mean(0), tr_j.std(0, ddof=1)
    k = len(seeds)
    z = (mu_j - mu_t) / np.sqrt(sd_t**2 / k + sd_j**2 / k + 1e-12)
    return dict(
        epochs=epochs, seeds=list(seeds),
        torch_train=tr_t.tolist(), jax_train=tr_j.tolist(),
        torch_eval=ev_t, jax_eval=ev_j,
        torch_r1=r1_t, jax_r1=r1_j,
        mu_torch=mu_t.tolist(), sd_torch=sd_t.tolist(),
        mu_jax=mu_j.tolist(), sd_jax=sd_j.tolist(), z=z.tolist(),
    )


def write_report(res, path=REPO / "docs" / "TRAJECTORY_MS.md"):
    lines = [
        "# Statistical training-trajectory study: FlashVTG_ms, torch vs "
        "flashvtg_tpu",
        "",
        "Produced by `scripts/trajectory_study_ms.py` — the _ms analogue "
        "of docs/TRAJECTORY.md. Both frameworks co-trained the full _ms "
        f"stack for {res['epochs']} epochs x {len(res['seeds'])} dropout "
        "seeds from identical converted initial weights (float32, dropout "
        f"live, AdamW lr={LR} wd={WD} clip={GRAD_CLIP}, StepLR drop at "
        f"epoch {LR_DROP}). Deterministic-path parity is pinned by "
        "tests/test_ms_grad_parity.py + tests/test_ms_train_trajectory.py;"
        " this covers the stochastic regime.",
        "",
        "| epoch | torch loss (mean+/-sd) | jax loss (mean+/-sd) | Welch z |",
        "|---|---|---|---|",
    ]
    for e in range(res["epochs"]):
        lines.append(
            f"| {e + 1} | {res['mu_torch'][e]:.4f} +/- "
            f"{res['sd_torch'][e]:.4f} | {res['mu_jax'][e]:.4f} +/- "
            f"{res['sd_jax'][e]:.4f} | {res['z'][e]:+.2f} |"
        )
    zmax = float(np.abs(res["z"]).max())
    lines += [
        "",
        f"Max |z| across epochs: **{zmax:.2f}** "
        f"(k={len(res['seeds'])} seeds/side; |z|<~3 = indistinguishable "
        "at seed-noise scale).",
        "",
        "| final metric | torch | jax |",
        "|---|---|---|",
        f"| held-out eval loss (dropout off) | "
        f"{np.mean(res['torch_eval']):.4f} +/- "
        f"{np.std(res['torch_eval'], ddof=1):.4f} | "
        f"{np.mean(res['jax_eval']):.4f} +/- "
        f"{np.std(res['jax_eval'], ddof=1):.4f} |",
        f"| val R1@0.5 (own decode path) | "
        f"{np.mean(res['torch_r1']):.3f} +/- "
        f"{np.std(res['torch_r1'], ddof=1):.3f} | "
        f"{np.mean(res['jax_r1']):.3f} +/- "
        f"{np.std(res['jax_r1'], ddof=1):.3f} |",
        "",
        "Raw per-seed numbers: `docs/trajectory_study_ms.json`.",
        "",
    ]
    path.write_text("\n".join(lines))
    print(f"wrote {path} (max |z| = {zmax:.2f})")


if __name__ == "__main__":
    res = run_study()
    (REPO / "docs" / "trajectory_study_ms.json").write_text(json.dumps(res))
    write_report(res)
