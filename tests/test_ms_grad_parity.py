"""Gradient parity of the _ms training objective vs torch autograd.

Closes for the FlashVTG_ms variant what test_grad_parity closes for the
core model: forward parity (test_ms_model_parity) and loss-value parity
(test_ms_criterion_parity) say nothing about the backward pass. Here the
reference _ms train step (/root/reference/FlashVTG_ms/train.py:57-79:
criterion(batch, epoch_i, outputs, targets) -> weighted sum over
weight_dict -> backward) is reproduced in float64 with every dropout
zeroed, and jax.grad of weighted_total_ms over compute_losses_ms through
the converted weights is compared leaf-by-leaf at 1e-6 relative tolerance.

Torch gradients are mapped into the flax layout by running the gradient
state_dict through `convert_checkpoint_ms` — valid because the converter
applies only linear rearrangements (transpose / slice / reshape), which
commute with differentiation. Reference parameters the converter skips as
dead (e.g. t_sa.layers.*.norm1) drop out of the comparison on both sides.

Unlike the core model, the _ms tree hardcodes dropout rates at several
construction sites (LGI.py:99 CrossAttention dropout=0.1, :313/:582 bare
nn.Dropout(0.1), model.py:125 dummy-encoder dropout) — instead of chasing
each, every nn.Dropout / MultiheadAttention / DropPath in the module tree
is zeroed generically post-construction.
"""

import contextlib
import io

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from flashvtg_tpu.losses.criterion_ms import (
    MSLossConfig,
    compute_losses_ms,
    weighted_total_ms,
)
from flashvtg_tpu.models.flashvtg_ms import FlashVTGMSModel, MSModelConfig
from flashvtg_tpu.utils.torch_convert import convert_checkpoint_ms
from tests.reference_oracle import install_nncore_stub, make_args
from tests.test_grad_parity import (
    B,
    CLIP_LEN,
    LQ,
    LV,
    T_DIM,
    V_DIM,
    _compare_trees,
    _make_batch,
)
from tests.test_ms_model_parity import build_reference_ms

STRIDES = (1, 2)
NUM_BINS = 8
# the reference's default _ms weight_dict (FlashVTG_ms/model.py:415-433):
# loss_qfl is present with weight 0 — computed but inert
WEIGHTS = {
    "loss_label": 4.0,
    "loss_saliency": 0.1,
    "loss_reg": 0.2,
    "loss_cls": 1.0,
    "loss_sal": 0.1,
    "loss_phrase_slot": 1.0,
    "loss_qfl": 0.0,
}


def _zero_all_dropout(ref):
    for m in ref.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
        if isinstance(m, torch.nn.MultiheadAttention):
            m.dropout = 0.0
        if hasattr(m, "drop_prob"):  # DropPath
            m.drop_prob = 0.0
        # the projless crossattention fork stores its rate as a float attr
        if hasattr(m, "dropout") and isinstance(m.dropout, float):
            m.dropout = 0.0


def _build_pair(use_neg, use_dfl):
    torch.manual_seed(7)
    args = make_args(
        v_feat_dim=V_DIM,
        t_feat_dim=T_DIM,
        dropout=0.0,
        input_dropout=0.0,
        num_dummies=3,
        dummy_layers=1,
        t2v_layers=2,
        enc_layers=1,
        num_conv_layers=2,
        num_mlp_layers=3,
        kernel_size=5,
        num_phrase=3,
        phrase_layers=2,
        context_layers=2,
        use_dfl=use_dfl,
        num_bins=NUM_BINS,
        rank=4,
        t_sa=2,
        sample_radius=1.5,
        use_neg=use_neg,
        dset_name="tvsum",
        clip_length=CLIP_LEN,
        max_v_l=LV,
        max_q_l=LQ,
    )
    ref = build_reference_ms(args, strides=STRIDES)
    ref.train()
    _zero_all_dropout(ref)
    ref = ref.double()

    cfg = MSModelConfig(
        vid_dim=V_DIM,
        txt_dim=T_DIM,
        num_dummies=args.num_dummies,
        dummy_layers=args.dummy_layers,
        t2v_layers=args.t2v_layers,
        enc_layers=args.enc_layers,
        kernel_size=args.kernel_size,
        num_conv_layers=args.num_conv_layers,
        num_mlp_layers=args.num_mlp_layers,
        clip_length=CLIP_LEN,
        strides=STRIDES,
        dropout=0.0,
        input_dropout=0.0,
        dummy_dropout=0.0,
        use_neg=use_neg,
        num_phrase=args.num_phrase,
        phrase_layers=args.phrase_layers,
        context_layers=args.context_layers,
        use_dfl=use_dfl,
        num_bins=NUM_BINS,
        rank=args.rank,
        t_sa_layers=args.t_sa,
        sample_radius=args.sample_radius,
    )
    sd = {k: v.detach().numpy().copy() for k, v in ref.state_dict().items()}
    params = convert_checkpoint_ms(sd, cfg)
    model = FlashVTGMSModel(cfg)
    return ref, model, params, cfg


def _torch_grads_ms(ref, inputs, targets, metas, vids):
    install_nncore_stub()
    from types import SimpleNamespace

    from FlashVTG_ms.loss import SetCriterion

    src_txt, txt_mask, src_vid, vid_mask = inputs
    crit_args = SimpleNamespace(
        device="cpu",
        dset_name="hl",
        lw_wattn=1.0,
        sample_radius=1.5,
        use_dfl=ref.args.use_dfl,
        num_bins=NUM_BINS,
    )
    criterion = SetCriterion(
        weight_dict=dict(WEIGHTS),
        eos_coef=0.1,
        losses=["saliency", "labels", "phrase_slot", "sal", "reg", "cls", "qfl"],
        saliency_margin=0.2,
        args=crit_args,
    )

    ref.zero_grad(set_to_none=True)
    old_dtype = torch.get_default_dtype()
    orig_float = torch.Tensor.float
    # f64 throughout: the autocast-disabled block casts with .float()
    # (FlashVTG_ms/model.py:215-222), and both forward and criterion build
    # fresh tensors (ones/linspace/Tensor) at the default dtype
    torch.set_default_dtype(torch.float64)
    torch.Tensor.float = lambda self: self.to(torch.float64)
    try:
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
            "fps": torch.full((256,), 1.0 / CLIP_LEN, dtype=torch.float64),
            "label": metas,
        }
        # the _ms forward leaks a debug print(gate[0]) (model.py:179)
        with contextlib.redirect_stdout(io.StringIO()):
            outputs = ref(
                torch.from_numpy(src_txt),
                torch.from_numpy(txt_mask),
                torch.from_numpy(src_vid),
                torch.from_numpy(vid_mask),
                vids,
                list(range(B)),
                targets=t,
            )
            loss_dict = criterion((metas, None), 0, outputs, t)
        total = sum(
            loss_dict[k] * w for k, w in WEIGHTS.items() if k in loss_dict
        )
        total.backward()
    finally:
        torch.set_default_dtype(old_dtype)
        torch.Tensor.float = orig_float
    grad_sd = {}
    for name, p in ref.named_parameters():
        grad_sd[name] = (
            p.grad.detach().numpy()
            if p.grad is not None
            else np.zeros(p.shape, np.float64)
        )
    return float(total.detach()), grad_sd, outputs


def _jax_grads_ms(model, params, targets, inputs, real_neg_mask, use_neg, use_dfl):
    src_txt, txt_mask, src_vid, vid_mask = inputs
    loss_cfg = MSLossConfig(
        clip_length=CLIP_LEN, dset_name="hl", use_dfl=use_dfl,
        num_bins=NUM_BINS,
    )
    batch = {k: jnp.asarray(np.asarray(v)) for k, v in targets.items()}

    def loss_fn(p):
        out = model.apply(
            p,
            jnp.asarray(src_txt),
            jnp.asarray(txt_mask),
            jnp.asarray(src_vid),
            jnp.asarray(vid_mask),
            jnp.asarray(real_neg_mask) if use_neg else None,
            train=True,
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        losses = compute_losses_ms(out, batch, loss_cfg)
        return weighted_total_ms(losses, loss_cfg)

    total, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    return float(total), grads


@pytest.mark.parametrize(
    "use_dfl,use_neg,short_rows,short_txt,vids",
    [
        # use_neg=False is untestable against the oracle: the reference _ms
        # criterion unconditionally reads real_neg_mask in the t2v-attn
        # saliency block (loss.py:512) but only binds it when
        # saliency_scores_neg is not None — _ms training REQUIRES use_neg
        (False, True, 0, 0, None),
        # padded rows + a false negative (adjacent duplicate vid)
        (False, True, 2, 1, ["a", "a", "b", "c"]),
        (True, True, 0, 0, None),
    ],
    ids=["l1-neg", "l1-neg-padded", "dfl-neg"],
)
def test_ms_grad_parity(use_dfl, use_neg, short_rows, short_txt, vids):
    ref, model, params, cfg = _build_pair(use_neg, use_dfl)
    rng = np.random.default_rng(23 + short_rows)
    src_txt, txt_mask, src_vid, vid_mask, targets, metas = _make_batch(
        rng, short_rows, short_txt
    )
    if vids is None:
        vids = [f"vid{i}" for i in range(B)]
    inputs = (src_txt, txt_mask, src_vid, vid_mask)

    ref_total, grad_sd, ref_out = _torch_grads_ms(
        ref, inputs, targets, metas, vids
    )
    if use_neg:
        real_neg_mask = np.asarray(
            ref_out["real_neg_mask"].numpy(), np.float64
        )
    else:
        real_neg_mask = np.ones((B,), np.float64)
    with jax.enable_x64():
        params64 = jax.tree.map(lambda x: jnp.asarray(x, jnp.float64), params)
        my_total, grads = _jax_grads_ms(
            model, params64, targets, inputs, real_neg_mask, use_neg, use_dfl
        )

    np.testing.assert_allclose(my_total, ref_total, rtol=1e-8, atol=1e-8)

    grad_tree = convert_checkpoint_ms(grad_sd, cfg)
    # 3e-6 (vs the core's 1e-6): the only remaining noise source is the
    # f32 sine-PE's XLA-vs-libm sin/cos ulp difference (~5e-7 per value,
    # see components.sine_position_embedding), and the _ms phrase pipeline
    # stacks more layers between the PE and the smallest-scale grad leaves;
    # a semantic error (wrong mask, missing term) moves leaves by >=1e-3
    worst = _compare_trees(grads, grad_tree, rel_tol=3e-6)
    print(f"worst _ms grad leaf: {worst[0]} rel err {worst[1]:.2e}")
