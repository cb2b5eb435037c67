"""Statistical co-training study: torch reference vs flashvtg_tpu.

tests/test_train_trajectory.py pins the *deterministic* optimization path
(f64, every dropout zeroed, 15 steps, 5e-6 tolerance). This study answers
the remaining question — do the two frameworks have the same *training
dynamics under realistic stochastic settings*? Both sides co-train for 20
epochs in float32 with dropout LIVE (each side draws from its own RNG; the
streams cannot be aligned across frameworks), from identical converted
initial weights, on an identical synthetic dataset with learnable structure
(a feature-space bump marks the GT window, saliency labels peak inside it).

K seeds per side give a noise band; the comparison is statistical:
per-epoch mean train loss (Welch z of the seed means), final held-out eval
loss, and final R1@0.5 on the val split (each side decoding with its own
eval path). Equivalent dynamics = |z| small at every epoch and overlapping
final-metric bands.

Oracle: /root/reference/FlashVTG/train.py:40-96 (train loop),
inference.py:437-444 (AdamW + StepLR). Run:  python scripts/trajectory_study.py
Writes docs/TRAJECTORY.md + docs/trajectory_study.json.
"""

import copy
import json
import os
import sys
from pathlib import Path

import numpy as np

# torch runs on CPU; keep jax there too so the comparison is same-hardware
# f32 (and the study never contends with a TPU bench for the chip). The
# axon sitecustomize latches its platform before user code runs, so the env
# var alone is ignored — re-apply through the config API.
os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from flashvtg_tpu.utils.runtime import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp
import optax
import torch

from flashvtg_tpu.losses.criterion import (
    LossConfig,
    compute_losses,
    weighted_total,
)
from flashvtg_tpu.models import FlashVTGModel, ModelConfig
from flashvtg_tpu.utils.torch_convert import convert_checkpoint
from tests.reference_oracle import build_reference_model, make_args
from tests.test_grad_parity import WEIGHTS, _register_stub_losses

B, LV, LQ = 8, 20, 7
V_DIM, T_DIM = 32, 24
CLIP_LEN = 2.0
N_TRAIN, N_VAL = 32, 16
EPOCHS = 20
LR, WD, GRAD_CLIP = 1e-4, 1e-4, 0.1
LR_DROP, GAMMA = 10, 0.5  # trajectory crosses one StepLR boundary
DROPOUT, INPUT_DROPOUT, DUMMY_DROPOUT = 0.1, 0.1, 0.1
SEEDS = (0, 1, 2, 3, 4, 5)


# ---------------------------------------------------------------- dataset
def make_dataset(rng, n):
    """n samples with learnable structure: one GT window per sample; vid
    features inside the window carry a fixed bump direction scaled by a
    per-sample amplitude that the query feature encodes, so locating the
    window is learnable from (vid, txt) jointly."""
    u = rng.standard_normal(V_DIM)
    u /= np.linalg.norm(u)
    samples = []
    for i in range(n):
        st = int(rng.integers(0, LV - 6))
        w = int(rng.integers(2, 6))
        ed = st + w
        amp = float(rng.uniform(1.0, 2.0))
        vid = rng.standard_normal((LV, V_DIM))
        vid[st:ed] += amp * u
        txt = rng.standard_normal((LQ, T_DIM)) * 0.5
        txt[0, :8] = amp  # query encodes the bump amplitude
        labels = np.zeros(LV)
        labels[st:ed] = 4.0
        pos = rng.choice(np.arange(st, ed), 2, replace=True)
        negpool = np.flatnonzero(labels == 0)
        neg = rng.choice(negpool, 2, replace=True)
        gt = np.array([[st * CLIP_LEN, ed * CLIP_LEN]])
        samples.append(dict(
            vid=vid.astype(np.float32), txt=txt.astype(np.float32),
            labels=labels.astype(np.float32),
            pos=pos.astype(np.int64), neg=neg.astype(np.int64), gt=gt,
        ))
    return samples


def batch_of(samples, idxs):
    sel = [samples[i] for i in idxs]
    src_txt = np.stack([s["txt"] for s in sel])
    src_vid = np.stack([s["vid"] for s in sel])
    ones_t = np.ones((len(sel), LQ), np.float32)
    ones_v = np.ones((len(sel), LV), np.float32)
    gt = np.full((len(sel), 1, 2), np.inf)
    for i, s in enumerate(sel):
        gt[i] = s["gt"]
    targets = {
        "saliency_all_labels": np.stack([s["labels"] for s in sel]),
        "saliency_pos_labels": np.stack([s["pos"] for s in sel]),
        "saliency_neg_labels": np.stack([s["neg"] for s in sel]),
        "gt_windows": gt.astype(np.float32),
    }
    metas = [{"relevant_windows": s["gt"].tolist()} for s in sel]
    return src_txt, ones_t, src_vid, ones_v, targets, metas


def epoch_batches(n, epoch):
    """Same deterministic shuffle for both frameworks: data order is part of
    the recipe, not the per-seed noise (dropout is the stochastic factor)."""
    order = np.random.default_rng(1000 + epoch).permutation(n)
    return [order[i:i + B] for i in range(0, n, B)]


# ------------------------------------------------------------- torch side
def build_torch():
    torch.manual_seed(3)
    args = make_args(
        v_feat_dim=V_DIM, t_feat_dim=T_DIM,
        dropout=DROPOUT, input_dropout=INPUT_DROPOUT,
        use_neg=True, max_v_l=LV, max_q_l=LQ,
    )
    ref = build_reference_model(args)
    # the dummy encoder hardcodes 0.1 (model.py:119) == DUMMY_DROPOUT: keep
    return ref, args


def torch_criterion():
    from types import SimpleNamespace

    from FlashVTG.model import SetCriterion

    _register_stub_losses()
    loss_cfg = dict(
        type="BundleLoss", sample_radius=1.5,
        loss_cls=dict(type="FocalLoss"), loss_reg=dict(type="L1Loss"),
        loss_sal=dict(type="SampledNCELoss"),
    )
    crit_args = SimpleNamespace(
        device="cpu", dset_name="hl", lw_wattn=1.0,
        cfg=SimpleNamespace(model=SimpleNamespace(loss_cfg=loss_cfg)),
    )
    return SetCriterion(
        weight_dict=dict(WEIGHTS), eos_coef=0.1,
        losses=["saliency", "labels"], saliency_margin=0.2, args=crit_args,
    )


class zero_dropout:
    """Temporarily zero every dropout rate in the reference module tree.

    The reference's forward branches on self.training (model.py:248 asserts
    bs==1 in eval mode), so a batched dropout-off loss needs train-branch
    forward with all rates forced to 0: nn.Dropout/.p, the reference's
    custom attention dropouts (.drop_prob), and raw float .dropout attrs."""

    def __init__(self, ref):
        self.ref = ref

    def __enter__(self):
        self.saved = []
        for m in self.ref.modules():
            for attr in ("p", "drop_prob", "dropout"):
                v = getattr(m, attr, None)
                if isinstance(v, float):
                    self.saved.append((m, attr, v))
                    setattr(m, attr, 0.0)

    def __exit__(self, *exc):
        for m, attr, v in self.saved:
            setattr(m, attr, v)


def torch_targets(targets, metas):
    return {
        "saliency_all_labels": torch.from_numpy(
            targets["saliency_all_labels"]),
        "saliency_pos_labels": torch.from_numpy(targets["saliency_pos_labels"]),
        "saliency_neg_labels": torch.from_numpy(targets["saliency_neg_labels"]),
        "fps": torch.full((256,), 1.0 / CLIP_LEN),
        "label": metas,
    }


def torch_loss(ref, criterion, batch, i0):
    src_txt, txt_mask, src_vid, vid_mask, targets, metas = batch
    t = torch_targets(targets, metas)
    vids = [f"v{i0 + j}" for j in range(len(metas))]
    outputs = ref(
        torch.from_numpy(src_txt), torch.from_numpy(txt_mask),
        torch.from_numpy(src_vid), torch.from_numpy(vid_mask),
        vids, list(range(len(metas))), targets=t,
    )
    criterion((metas, None), outputs, t)
    loss_dict = {k: v for k, v in outputs.items() if "loss" in k}
    return sum(loss_dict[k] * w for k, w in WEIGHTS.items() if k in loss_dict)


def run_torch(init_sd, train_set, val_set, seed):
    ref, _ = build_torch()
    ref.load_state_dict(init_sd)
    torch.manual_seed(10_000 + seed)  # dropout stream for this run
    criterion = torch_criterion()
    optimizer = torch.optim.AdamW(
        [p for p in ref.parameters() if p.requires_grad],
        lr=LR, weight_decay=WD,
    )
    scheduler = torch.optim.lr_scheduler.StepLR(optimizer, LR_DROP, GAMMA)
    epoch_losses = []
    ref.train()
    for epoch in range(EPOCHS):
        losses = []
        for idxs in epoch_batches(N_TRAIN, epoch):
            total = torch_loss(
                ref, criterion, batch_of(train_set, idxs), int(idxs[0])
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
    # held-out eval loss: train-branch forward (the eval branch asserts
    # bs==1), every dropout rate forced to 0
    with torch.no_grad(), zero_dropout(ref):
        ev = float(torch_loss(
            ref, criterion, batch_of(val_set, np.arange(B)), 0
        ).detach())
    # R1@0.5 on val, each query decoded by the reference's own eval branch
    ref.eval()
    hits = 0
    with torch.no_grad():
        for s in val_set:
            out = ref(
                torch.from_numpy(s["txt"][None]), torch.ones(1, LQ),
                torch.from_numpy(s["vid"][None]), torch.ones(1, LV),
                ["q"], [0], targets={},
            )
            boundary = out["_out"]["boundary"].numpy()
            top = boundary[np.argmax(boundary[:, 2])]
            hits += iou(top[:2], s["gt"][0]) >= 0.5
    return epoch_losses, ev, hits / len(val_set)


# --------------------------------------------------------------- jax side
def jax_model(init_sd):
    cfg = ModelConfig(
        vid_dim=V_DIM, txt_dim=T_DIM,
        num_dummies=4, dummy_layers=1, t2v_layers=2, enc_layers=2,
        kernel_size=5, num_conv_layers=1, num_mlp_layers=3,
        clip_length=CLIP_LEN,
        dropout=DROPOUT, input_dropout=INPUT_DROPOUT,
        dummy_dropout=DUMMY_DROPOUT, use_neg=True,
    )
    params = convert_checkpoint(
        {k: v.numpy() for k, v in init_sd.items()}, cfg
    )
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
    return FlashVTGModel(cfg), params, cfg


def run_jax(init_sd, train_set, val_set, seed):
    model, params, cfg = jax_model(init_sd)
    loss_cfg = LossConfig(
        loss_cls="focal", loss_reg="l1", loss_sal="nce",
        clip_length=CLIP_LEN, dset_name="hl",
    )
    boundaries = {
        k * LR_DROP * len(epoch_batches(N_TRAIN, 0)): GAMMA
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

    def loss_fn(p, jb, key, train):
        src_txt, txt_mask, src_vid, vid_mask, targets = jb
        out = model.apply(
            p, src_txt, txt_mask, src_vid, vid_mask, rnm,
            train=train, rngs={"dropout": key},
        )
        return weighted_total(compute_losses(out, targets, loss_cfg),
                              loss_cfg)

    @jax.jit
    def update(p, s, jb, key):
        total, grads = jax.value_and_grad(loss_fn)(p, jb, key, True)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, total

    key = jax.random.PRNGKey(20_000 + seed)
    epoch_losses, step = [], 0
    for epoch in range(EPOCHS):
        losses = []
        for idxs in epoch_batches(N_TRAIN, epoch):
            src_txt, txt_mask, src_vid, vid_mask, targets, _ = batch_of(
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
    # held-out eval loss: train-branch loss semantics with every dropout
    # rate at 0 — the exact mirror of the torch side's zero_dropout forward
    # (train=False would skip the train-only exports the criterion reads)
    import dataclasses

    model0 = FlashVTGModel(dataclasses.replace(
        cfg, dropout=0.0, input_dropout=0.0, dummy_dropout=0.0
    ))
    src_txt, txt_mask, src_vid, vid_mask, targets, _ = batch_of(
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
        return weighted_total(compute_losses(out, tg, loss_cfg), loss_cfg)

    ev = float(jax.jit(eval_loss_fn)(params, jb, jax.random.PRNGKey(0)))
    # R1@0.5 via our eval path (jitted decode over the whole val split)
    from flashvtg_tpu.train.infer import make_eval_step

    estep = make_eval_step(model, 10, "float32")
    vb = batch_of(val_set, np.arange(N_VAL))
    batch = {
        "src_txt": jnp.asarray(vb[0]), "src_txt_mask": jnp.asarray(vb[1]),
        "src_vid": jnp.asarray(vb[2]), "src_vid_mask": jnp.asarray(vb[3]),
    }
    spans, scores, _, _ = estep(params, batch, None)
    spans, scores = np.asarray(spans), np.asarray(scores)
    hits = sum(
        iou(spans[i, int(np.argmax(scores[i]))], val_set[i]["gt"][0]) >= 0.5
        for i in range(N_VAL)
    )
    return epoch_losses, ev, hits / N_VAL


def iou(a, b):
    inter = max(0.0, min(a[1], b[1]) - max(a[0], b[0]))
    union = max(a[1], b[1]) - min(a[0], b[0])
    return inter / union if union > 0 else 0.0


# ------------------------------------------------------------------ main
def run_study(epochs=EPOCHS, seeds=SEEDS):
    global EPOCHS
    EPOCHS = epochs
    rng = np.random.default_rng(7)
    train_set = make_dataset(rng, N_TRAIN)
    val_set = make_dataset(rng, N_VAL)
    ref, _ = build_torch()
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


def write_report(res, path=REPO / "docs" / "TRAJECTORY.md"):
    lines = [
        "# Statistical training-trajectory study: torch reference vs "
        "flashvtg_tpu",
        "",
        "Produced by `scripts/trajectory_study.py`. Both frameworks "
        f"co-trained {res['epochs']} epochs x {len(res['seeds'])} dropout "
        "seeds from identical converted initial weights on the same "
        "synthetic learnable dataset (float32, dropout live, AdamW "
        f"lr={LR} wd={WD} clip={GRAD_CLIP}, StepLR drop at epoch "
        f"{LR_DROP}). Deterministic-path parity (f64, dropout off) is "
        "pinned separately by tests/test_train_trajectory.py; this study "
        "covers the stochastic regime where RNG streams cannot be aligned, "
        "so the comparison is distributional.",
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
        f"(k={len(res['seeds'])} seeds/side; |z|<~3 = the frameworks' "
        "mean trajectories are indistinguishable at seed-noise scale).",
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
        "Raw per-seed numbers: `docs/trajectory_study.json`.",
        "",
    ]
    path.write_text("\n".join(lines))
    print(f"wrote {path} (max |z| = {zmax:.2f})")


if __name__ == "__main__":
    res = run_study()
    (REPO / "docs" / "trajectory_study.json").write_text(json.dumps(res))
    write_report(res)
