"""Training-trajectory parity: co-train torch reference vs this repo.

test_grad_parity pins a single backward pass; this test pins the whole
*optimization* path — AdamW semantics (decoupled weight decay on every
parameter, betas/eps/bias-correction), global-norm gradient clipping, and
the epoch-stepped StepLR drop — by co-training the live torch reference and
our model from identical converted weights on an identical fixed batch
cycle and comparing the per-step loss trajectory plus the final parameters.

Oracle: /root/reference/FlashVTG/inference.py:437-444 (single param group
AdamW(lr, wd) + StepLR(lr_drop, gamma=0.5)) and train.py:62-76 (backward,
clip_grad_norm_ when grad_clip > 0, optimizer.step(); scheduler stepped
once per epoch).

Determinism: every dropout is zeroed on both sides (cross-framework RNG
cannot be aligned; stochastic-regularization equivalence is already implied
by gradient parity + identical expectation), and everything runs in
float64. The trajectory spans an lr_drop boundary so the StepLR alignment
(epoch-granular, applied from the *next* epoch's steps) is actually
exercised, and enough steps that AdamW's bias correction and second-moment
accumulation would expose any epsilon/ordering mismatch.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import optax

from flashvtg_tpu.losses.criterion import (
    LossConfig,
    compute_losses,
    weighted_total,
)
from flashvtg_tpu.utils.torch_convert import convert_checkpoint
from tests.test_grad_parity import (
    WEIGHTS,
    _build_pair,
    _make_batch,
    _register_stub_losses,
)

# reference-default LR (opt.lr=1e-4): larger rates saturate the margin loss
# on this tiny model until t2vattnvalues hit 1.0 pre-clamp, where the torch
# BCE-through-clamp backward yields inf*0=NaN (a genuine reference landmine,
# noted in docs/PARITY.md). wd is boosted over the 1e-4 default so a wrong
# decay mask would shift final params ~7e-5 relative — above the 1e-5 gate.
LR = 1e-4
WD = 5e-2
GRAD_CLIP = 0.1
LR_DROP = 2  # epochs; trajectory crosses one drop boundary
GAMMA = 0.5
EPOCHS = 5
STEPS_PER_EPOCH = 3


def _torch_criterion():
    from types import SimpleNamespace

    from FlashVTG.model import SetCriterion

    _register_stub_losses()
    loss_cfg = dict(
        type="BundleLoss",
        sample_radius=1.5,
        loss_cls=dict(type="FocalLoss"),
        loss_reg=dict(type="L1Loss"),
        loss_sal=dict(type="SampledNCELoss"),
    )
    crit_args = SimpleNamespace(
        device="cpu",
        dset_name="hl",
        lw_wattn=1.0,
        cfg=SimpleNamespace(model=SimpleNamespace(loss_cfg=loss_cfg)),
    )
    return SetCriterion(
        weight_dict=dict(WEIGHTS), eos_coef=0.1,
        losses=["saliency", "labels"], saliency_margin=0.2, args=crit_args,
    ).double()


def _make_batches(n):
    rng = np.random.default_rng(211)
    batches = []
    for i in range(n):
        src_txt, txt_mask, src_vid, vid_mask, targets, metas = _make_batch(
            rng, short_rows=i % 3, short_txt=i % 2
        )
        vids = [f"vid{i}_{j}_1.0_2.0" for j in range(len(metas))]
        batches.append((src_txt, txt_mask, src_vid, vid_mask, targets,
                        metas, vids))
    return batches


def _torch_trajectory(ref, batches):
    criterion = _torch_criterion()
    optimizer = torch.optim.AdamW(
        [{"params": [p for p in ref.parameters() if p.requires_grad],
          "lr": LR}],
        lr=LR, weight_decay=WD,
    )
    scheduler = torch.optim.lr_scheduler.StepLR(
        optimizer, LR_DROP, gamma=GAMMA
    )
    orig_float = torch.Tensor.float
    torch.Tensor.float = lambda self: self.to(torch.float64)
    losses_out = []
    try:
        step = 0
        for epoch in range(EPOCHS):
            for k in range(STEPS_PER_EPOCH):
                (src_txt, txt_mask, src_vid, vid_mask, targets, metas,
                 vids) = batches[step % len(batches)]
                t = {
                    "saliency_all_labels": torch.from_numpy(
                        targets["saliency_all_labels"]
                    ),
                    "saliency_pos_labels": torch.from_numpy(
                        np.asarray(targets["saliency_pos_labels"])
                    ),
                    "saliency_neg_labels": torch.from_numpy(
                        np.asarray(targets["saliency_neg_labels"])
                    ),
                    "fps": torch.full(
                        (256,), 0.5, dtype=torch.float64
                    ),
                    "label": metas,
                }
                outputs = ref(
                    torch.from_numpy(src_txt),
                    torch.from_numpy(txt_mask),
                    torch.from_numpy(src_vid),
                    torch.from_numpy(vid_mask),
                    vids,
                    list(range(len(metas))),
                    targets=t,
                )
                criterion((metas, None), outputs, t)
                loss_dict = {
                    k2: v for k2, v in outputs.items() if "loss" in k2
                }
                total = sum(
                    loss_dict[k2] * w
                    for k2, w in WEIGHTS.items()
                    if k2 in loss_dict
                )
                optimizer.zero_grad()
                total.backward()
                torch.nn.utils.clip_grad_norm_(
                    ref.parameters(), GRAD_CLIP, error_if_nonfinite=False
                )
                optimizer.step()
                losses_out.append(float(total.detach()))
                step += 1
            scheduler.step()
    finally:
        torch.Tensor.float = orig_float
    final_sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    return losses_out, final_sd


def _jax_trajectory(model, params, cfg, batches):
    loss_cfg = LossConfig(
        loss_cls="focal", loss_reg="l1", loss_sal="nce",
        clip_length=2.0, dset_name="hl",
    )
    # mirrors train.loop.make_optimizer with this test's hyperparameters
    boundaries = {
        k * LR_DROP * STEPS_PER_EPOCH: GAMMA for k in range(1, 50)
    }
    schedule = optax.piecewise_constant_schedule(LR, boundaries)
    tx = optax.chain(
        optax.clip_by_global_norm(GRAD_CLIP),
        optax.adamw(schedule, weight_decay=WD),
    )
    opt_state = tx.init(params)

    def loss_fn(p, batch, rnm):
        src_txt, txt_mask, src_vid, vid_mask, targets = batch
        out = model.apply(
            p, src_txt, txt_mask, src_vid, vid_mask, rnm,
            train=True, rngs={"dropout": jax.random.PRNGKey(0)},
        )
        losses = compute_losses(out, targets, loss_cfg)
        return weighted_total(losses, loss_cfg)

    @jax.jit
    def update(p, s, batch, rnm):
        total, grads = jax.value_and_grad(loss_fn)(p, batch, rnm)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, total

    losses_out = []
    for step in range(EPOCHS * STEPS_PER_EPOCH):
        (src_txt, txt_mask, src_vid, vid_mask, targets, metas,
         vids) = batches[step % len(batches)]
        # duplicate-vid rows are false negatives, same rule as the reference
        rnm = np.array(
            [float(v != vids[(i + 1) % len(vids)])
             for i, v in enumerate(vids)],
            np.float64,
        )
        jb = (
            jnp.asarray(src_txt), jnp.asarray(txt_mask),
            jnp.asarray(src_vid), jnp.asarray(vid_mask),
            {k: jnp.asarray(np.asarray(v)) for k, v in targets.items()},
        )
        params, opt_state, total = update(params, opt_state, jb,
                                          jnp.asarray(rnm))
        losses_out.append(float(total))
    return losses_out, params


def test_train_trajectory_parity():
    ref, model, params, cfg = _build_pair(use_neg=True)
    batches = _make_batches(4)

    torch_losses, torch_final = _torch_trajectory(ref, batches)
    with jax.enable_x64():
        params64 = jax.tree.map(lambda x: jnp.asarray(x, jnp.float64), params)
        jax_losses, jax_final = _jax_trajectory(model, params64, cfg, batches)

    # per-step trajectory: tolerance grows with accumulated f64 noise but
    # stays far below any semantic divergence (a wrong wd mask, clip, or a
    # one-epoch StepLR offset shifts losses at the 1e-3..1e-1 level)
    np.testing.assert_allclose(
        jax_losses, torch_losses, rtol=5e-6, atol=5e-6,
        err_msg="per-step total-loss trajectories diverged",
    )

    # final parameters after 15 AdamW updates across an LR drop
    final_tree = convert_checkpoint(torch_final, cfg)
    flat_j = jax.tree_util.tree_flatten_with_path(jax_final)[0]
    flat_t = jax.tree_util.tree_flatten_with_path(final_tree)[0]
    assert len(flat_j) == len(flat_t)
    worst = 0.0
    for (path_j, leaf_j), (path_t, leaf_t) in zip(flat_j, flat_t):
        assert path_j == path_t
        a, b = np.asarray(leaf_j, np.float64), np.asarray(leaf_t, np.float64)
        scale = max(np.abs(b).max(), 1e-6)
        err = np.abs(a - b).max() / scale
        worst = max(worst, err)
        assert err < 1e-5, (
            f"{jax.tree_util.keystr(path_j)}: rel err {err:.2e}"
        )
    print(f"trajectory parity: {len(jax_losses)} steps, "
          f"worst final-param rel err {worst:.2e}")
