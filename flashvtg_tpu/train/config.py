"""Experiment configuration: one dataclass + per-dataset presets.

Replaces the reference's two-tier config (argparse BaseOptions with ~70 flags,
FlashVTG/config.py:9-169, plus nncore python-file model dicts, data/MR*.py)
with a single typed dataclass. The shipped training scripts'
hyper-parameters are captured as PRESETS (cited per entry); `data/MR*.py` /
`data/HD.py`-style model-config files are still accepted for drop-in
compatibility via `load_model_cfg_file`.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from typing import Optional, Sequence, Tuple

from flashvtg_tpu.losses.criterion import LossConfig
from flashvtg_tpu.models.flashvtg import ModelConfig


@dataclasses.dataclass
class ExperimentConfig:
    # experiment / dataset
    dset_name: str = "hl"
    dset_domain: Optional[str] = None
    exp_id: str = "exp"
    seed: int = 2024
    results_root: str = "results"
    train_path: str = ""
    eval_path: str = ""
    # second eval split, evaluated for model_best AND model_latest after
    # training like FlashVTG_ms/train.py:243-286 (--test_path,
    # FlashVTG_ms/config.py:80); empty = off (the FlashVTG trainer's shape)
    test_path: str = ""
    eval_split_name: str = "val"
    v_feat_dirs: Sequence[str] = ()
    t_feat_dir: str = ""
    v_feat_dim: int = 0
    t_feat_dim: int = 0
    q_feat_type: str = "last_hidden_state"
    ctx_mode: str = "video_tef"
    data_ratio: float = 1.0
    no_norm_vfeat: bool = False
    no_norm_tfeat: bool = False
    txt_drop_ratio: float = 0.0
    eos_first: bool = False  # _ms InternVideo2 text reordering

    # lengths / batching
    max_q_l: int = 32
    max_v_l: int = 75
    clip_length: float = 2.0
    max_windows: int = 5
    bsz: int = 32
    eval_bsz: int = 32  # reference forces 1; our decode is batched
    v_buckets: Sequence[int] = (75, 128, 256, 512, 1024, 2048, 4096)
    # eval-time variable-length bucketing: sort queries by duration and pad
    # each batch to its own v_bucket instead of max_v_l. Pays a few extra
    # compiles to skip most padding compute — wins on TACoS, whose video
    # lengths vary ~40x (see docs/BUCKETS.md for the measured tradeoff).
    # Training stays fixed-length: one compiled step, stable donation.
    bucket_eval: bool = False

    # optimization (config.py:49-68)
    lr: float = 5e-4
    lr_drop: int = 400
    lr_gamma: float = 0.5
    wd: float = 1e-4
    n_epoch: int = 700
    max_es_cnt: int = 200
    grad_clip: float = 0.1
    eval_epoch: int = 2
    start_epoch: Optional[int] = None
    resume: Optional[str] = None
    resume_all: bool = False
    # partial (non-strict) parameter preload before training/inference —
    # only matching subtrees are taken (reference inference.py:447-451)
    resume_adapter: Optional[str] = None
    # fast loop: 2 steps/epoch, 1 epoch (reference config.py:32-33)
    debug: bool = False

    # model architecture (config.py:93-132)
    position_embedding: str = "sine"
    kernel_size: int = 3
    num_conv_layers: int = 3
    num_mlp_layers: int = 3
    enc_layers: int = 3
    t2v_layers: int = 2
    dummy_layers: int = 2
    dim_feedforward: int = 1024
    hidden_dim: int = 256
    input_dropout: float = 0.5
    dropout: float = 0.1
    use_txt_pos: bool = False
    nheads: int = 8
    num_dummies: int = 0
    pre_norm: bool = False
    n_input_proj: int = 2
    use_neg: bool = False

    # model-structure config (data/MR*.py dicts)
    strides: Tuple[int, ...] = (1, 2, 4, 8)
    buffer_size: int = 1024
    max_num_moment: int = 50
    loss_cls: Optional[str] = "focal"
    loss_reg: Optional[str] = "l1"
    loss_sal: Optional[str] = "nce"
    nce_direction: Tuple[str, ...] = ("row", "col")
    loss_qfl: bool = False

    # loss weights (config.py:133-156)
    saliency_margin: float = 0.2
    sample_radius: float = 1.5
    lw_reg: float = 0.2
    lw_cls: float = 1.0
    lw_sal: float = 0.1
    lw_saliency: float = 0.1
    lw_wattn: float = 1.0
    label_loss_coef: float = 4.0
    eos_coef: float = 0.1

    # post-processing (config.py:158-168)
    max_before_nms: int = 50
    max_after_nms: int = 10
    conf_thd: float = 0.0
    nms_thd: float = -1.0
    nms_type: str = "normal"

    # test-time flags (reference config.py TestOptions block)
    eval_untrained: bool = False  # evaluate before epoch 0 (train.py:129)
    eval_results_dir: Optional[str] = None  # redirect infer outputs
    # reference-compat accepted-but-inert flags (see _INERT_FLAGS below)
    temperature: float = 0.07
    span_loss_type: str = "l1"  # "ce" rejected: broken in the reference too
    # live reference DataLoader flag (train.py:259, default False); static
    # shapes here always drop the tail batch regardless (docs/PARITY.md
    # deviation 6: <=1 batch of len(train)/bsz per epoch)
    drop_last: bool = False
    no_sort_results: bool = False
    a_feat_dim: Optional[int] = None
    a_feat_dir: Optional[str] = None
    eval_id: Optional[str] = None
    model_dir: Optional[str] = None
    lw_ms_align: float = 1.0
    # DETR/moment-DETR leftovers + abandoned experiment knobs, all with
    # zero usage outside the reference's config.py (pinned by
    # test_live_reference_flag_surface_fully_covered)
    aux_loss: bool = True  # --no_aux_loss store_false pair (config.py:135)
    span_loss_coef: float = 10.0
    giou_loss_coef: float = 3.0
    use_SRM: bool = False  # keeps the reference's exact spelling
    total_prompts: int = 10
    num_prompts: int = 1

    # FlashVTG_ms variant (FlashVTG_ms/config.py:135-153)
    variant: str = "core"  # "core" | "ms"
    num_phrase: int = 3
    phrase_layers: int = 2
    context_layers: int = 2
    use_dfl: bool = False
    num_bins: int = 16
    rank: int = 32
    t_sa: int = 2
    lw_phrase: float = 1.0
    # EOS InfoNCE (loss.py:431-460). Outside the reference's default losses
    # list (model.py:433) AND its producer module (`PhraseWeight_eos`, seen
    # only in stale FlashVTG_ms/__pycache__/LGI.cpython-38.pyc) was deleted
    # from the reference source — enabling it there would KeyError. Our _ms
    # model exports eos_slot/eos_emb when use_eos=True so the term is live.
    use_eos: bool = False
    lw_eos: float = 1.0

    # runtime
    eval_precision: str = "float32"  # MXU passes at eval (parity-exact)
    # `cli infer --serving`: apply the measured serving profile from
    # docs/PRECISION.md (tensorfloat32 eval — ~16% over f32 on the MXU,
    # MR metric deltas <=0.05). f32 stays the default because parity
    # evaluation against reference checkpoints assumes it; an explicit
    # --eval_precision always wins over --serving.
    serving: bool = False
    train_precision: str = "bfloat16"  # MXU passes in the train step
    # PRNG backend for the per-step dropout masks. jax's default threefry
    # generator measured HALF the flagship train step on-chip (12.44 ->
    # 6.24 ms/step with dropout off, docs/KERNELS.md round-5 decomposition);
    # "rbg" keeps the exact same Bernoulli(rate) mask distribution but
    # generates the bits via the TPU's native RngBitGenerator (split/fold_in
    # stay threefry). "threefry" restores jax's default bit-stream (only
    # needed to reproduce pre-round-5 randomness bit-for-bit). "auto"
    # (default) resolves per config: rbg, EXCEPT when the chunked+remat
    # long-sequence attention is active — XLA cannot rematerialize
    # RngBitGenerator output (recomputed bits are not guaranteed stable),
    # so under remat every mask would be stored for backward: measured
    # +8.6 GB HBM (compile OOM) at TACoS shapes, where threefry masks
    # recompute for free. See resolved_dropout_rng_impl().
    dropout_rng_impl: str = "auto"  # auto | rbg | threefry
    # dtype for feature tensors on the host->device wire during training;
    # "bfloat16" halves transfer bytes (params/compute stay f32-promoted)
    transfer_dtype: str = "float32"
    # HBM-resident training feed (data/feed.py): collate once, keep the
    # feature tensors on device, gather batches by index. "auto" enables it
    # whenever the set fits the budget (and shapes are fixed + no
    # txt_drop_ratio randomness); measured ~23x steps/s on the tunneled v5e
    device_feed: str = "auto"  # auto | on | off
    device_feed_budget_gb: float = 8.0
    # feed mode only: fuse this many train steps into one dispatch via
    # lax.scan (same math + same dropout-key chain as the per-step path;
    # pinned by test_scan_epoch). Amortizes the per-dispatch host<->TPU
    # latency that otherwise dominates short-video train steps. 0/1 = off;
    # auto-disabled under --debug / --debug_nans for step granularity.
    # Default from the on-chip sweeps at the reference batch (B=32,
    # flagship shapes, docs/KERNELS.md). Round 4 (threefry dropout,
    # ~12.4 ms steps): 73.9/74.8/77.2/81.9/82.7 steps/s at K=8/16/32/64/128
    # — knee 64. Round 5 re-sweep after the rbg dropout change halved the
    # step (~6.8 ms), doubling the relative dispatch share:
    # 136.5/147.8/150.2 at K=32/64/128 — the knee moved to 128.
    scan_steps: int = 128
    # chunked+remat'd encoder self-attention beyond this Lv (0 = never) —
    # the long-video presets (max_v_l=2048) would otherwise materialize
    # (B, H, L, L) attention logits in every encoder layer
    attn_chunk: int = 512
    debug_nans: bool = False  # jax NaN tripwire (reference: detect_anomaly)
    profile_dir: Optional[str] = None  # jax.profiler trace output
    use_tensorboard: bool = True
    # Mirror of the reference _ms trainer's wandb logging
    # (FlashVTG_ms/train.py:124-125: wandb.init(project="FlashVTG",
    # name=run_name, sync_tensorboard=True)). Opt-in; requires the wandb
    # package — absent it, a warning is logged and jsonl+TB still cover the
    # same scalars.
    use_wandb: bool = False
    wandb_project: str = "FlashVTG"

    # ------------------------------------------------------------------
    @property
    def use_tef(self) -> bool:
        return "tef" in self.ctx_mode

    @property
    def total_v_feat_dim(self) -> int:
        return self.v_feat_dim + (2 if self.use_tef else 0)

    def model_config(self) -> ModelConfig:
        return ModelConfig(
            vid_dim=self.total_v_feat_dim,
            txt_dim=self.t_feat_dim,
            hidden_dim=self.hidden_dim,
            nheads=self.nheads,
            enc_layers=self.enc_layers,
            t2v_layers=self.t2v_layers,
            dummy_layers=self.dummy_layers,
            num_dummies=self.num_dummies,
            dim_feedforward=self.dim_feedforward,
            dropout=self.dropout,
            input_dropout=self.input_dropout,
            n_input_proj=self.n_input_proj,
            use_txt_pos=self.use_txt_pos,
            max_q_l=self.max_q_l if self.max_q_l > 0 else 100,
            strides=tuple(self.strides),
            kernel_size=self.kernel_size,
            num_conv_layers=self.num_conv_layers,
            num_mlp_layers=self.num_mlp_layers,
            max_num_moment=self.max_num_moment,
            clip_length=self.clip_length,
            use_neg=self.use_neg,
            attn_chunk=self.attn_chunk,
        )

    def ms_model_config(self):
        from flashvtg_tpu.models.flashvtg_ms import MSModelConfig

        base = self.model_config()
        return MSModelConfig(
            **dataclasses.asdict(base),
            num_phrase=self.num_phrase,
            phrase_layers=self.phrase_layers,
            context_layers=self.context_layers,
            use_dfl=self.use_dfl,
            num_bins=self.num_bins,
            rank=self.rank,
            t_sa_layers=self.t_sa,
            sample_radius=self.sample_radius,
            use_eos=self.use_eos,
        )

    def ms_loss_config(self):
        from flashvtg_tpu.losses.criterion_ms import MSLossConfig

        return MSLossConfig(
            label_loss_coef=self.label_loss_coef,
            lw_saliency=self.lw_saliency,
            lw_reg=self.lw_reg,
            lw_cls=self.lw_cls,
            lw_sal=self.lw_sal,
            lw_phrase=self.lw_phrase,
            lw_wattn=self.lw_wattn,
            saliency_margin=self.saliency_margin,
            sample_radius=self.sample_radius,
            use_dfl=self.use_dfl,
            num_bins=self.num_bins,
            clip_length=self.clip_length,
            dset_name=self.dset_name,
            use_eos=self.use_eos,
            lw_eos=self.lw_eos,
        )

    # flags that exist only for reference opt.json round-trip compatibility:
    # each is dead (or crashes) in the reference itself, so no behavior can
    # depend on them (docs/PARITY.md "dead reference knobs"). Warn when a
    # user sets one away from its default so the no-op is never silent.
    _INERT_FLAGS = {
        # --pre_norm crashes the reference: T2V forward_pre is `pass`
        # (transformer.py:371-375) and the CATE layer's forward_pre
        # references attributes that don't exist (:287-300)
        "pre_norm": False,
        "eos_coef": 0.1,  # builds an empty_weight buffer nothing reads
        "conf_thd": 0.0,  # flag defined, never read (config.py:162)
        "max_before_nms": 50,  # accepted by post_processing_mr_nms, ignored
        # --temperature is never forwarded: the reference constructs
        # SampledNCELoss() with its 0.07 default (model.py:331)
        "temperature": 0.07,
        "no_sort_results": False,  # in the TestOptions keep-list, never read
        "a_feat_dim": None,  # audio features: flags exist, no loader reads
        "a_feat_dir": None,  # them (moment-DETR leftover)
        "eval_id": None,  # defined, never read
        "model_dir": None,  # overwritten with dirname(resume) by the
        # reference TestOptions itself (config.py:191)
        "lw_ms_align": 1.0,  # loss weight with no loss: zero usage
        # DETR/moment-DETR fossils + abandoned knobs, zero usage:
        "aux_loss": True,
        "span_loss_coef": 10.0,
        "giou_loss_coef": 3.0,
        "use_SRM": False,
        "total_prompts": 10,
        "num_prompts": 1,
    }
    # Also inert but NOT warned here: buffer_size (caps the reference's
    # preallocated point buffer, generator.py:60 assert; our points are
    # generated exactly sized). HD presets legitimately set it to 2048 via
    # model cfg files, so a default-comparison warning would fire on every
    # preset run — documented in docs/PARITY.md instead.

    def warn_inert_flags(self):
        for name, default in self._INERT_FLAGS.items():
            current = getattr(self, name)
            set_away = (
                current is not None if default is None
                else current != default
            )
            if set_away:
                logging.getLogger(__name__).warning(
                    "--%s is accepted for reference opt.json compatibility "
                    "but is inert (dead or broken in the reference too — "
                    "see docs/PARITY.md)", name,
                )

    def resolved_dropout_rng_impl(self) -> str:
        """Resolve "auto" for this config: the TPU-native RBG mask
        generator (1.84x flagship train throughput, docs/KERNELS.md),
        EXCEPT when the chunked+remat attention path is live — XLA treats
        RngBitGenerator as non-rematerializable, so under jax.checkpoint
        every dropout mask would be stored for backward (measured compile
        OOM, +8.6 GB over the 16 GB HBM, at TACoS Lv=2048), while
        threefry masks recompute for free inside the remat."""
        if self.dropout_rng_impl not in ("auto", "rbg", "threefry"):
            # fail at config time, not deep inside a traced train step
            raise ValueError(
                f"unknown dropout_rng_impl {self.dropout_rng_impl!r}; "
                "expected auto | rbg | threefry"
            )
        if self.dropout_rng_impl != "auto":
            return self.dropout_rng_impl
        if self.attn_chunk and self.max_v_l > self.attn_chunk:
            return "threefry"
        return "rbg"

    def build_model(self):
        """Model module for the configured variant."""
        self.warn_inert_flags()
        if self.span_loss_type != "l1":
            raise ValueError(
                f"span_loss_type={self.span_loss_type!r} is not supported: "
                "the reference's 'ce' path is itself broken for FlashVTG "
                "(its decode reads train-branch pred_spans in a moment-DETR "
                "shape this model never produces, inference.py:268-281, and "
                "its criterion/head are l1-only); every shipped config uses "
                "'l1'."
            )
        if self.variant == "ms":
            from flashvtg_tpu.models.flashvtg_ms import FlashVTGMSModel

            return FlashVTGMSModel(self.ms_model_config())
        from flashvtg_tpu.models.flashvtg import FlashVTGModel

        return FlashVTGModel(self.model_config())

    def loss_config(self) -> LossConfig:
        return LossConfig(
            label_loss_coef=self.label_loss_coef,
            lw_saliency=self.lw_saliency,
            lw_reg=self.lw_reg,
            lw_cls=self.lw_cls,
            lw_sal=self.lw_sal,
            lw_wattn=self.lw_wattn,
            saliency_margin=self.saliency_margin,
            sample_radius=self.sample_radius,
            loss_cls=self.loss_cls,
            loss_reg=self.loss_reg,
            loss_sal=self.loss_sal,
            nce_direction=tuple(self.nce_direction),
            loss_qfl=self.loss_qfl,
            clip_length=self.clip_length,
            dset_name=self.dset_name,
        )

    # opt.json round-trip (reference saves/reloads all flags, config.py:171-203)
    def save(self, path, reference_sidecar: bool = True):
        """Write opt.json. With reference_sidecar (default), the json is
        enriched with the derived keys the reference's TestOptions reload
        consumes downstream (opt.results_dir / opt.device / opt.config,
        config.py:189-203 + inference.py:495) and a reference-style
        model-config file is emitted beside it — so a results (or export)
        dir is directly runnable by the reference's FlashVTG/inference.py
        on an exported checkpoint. Extra keys are harmless to our own
        reload (load() filters to dataclass fields)."""
        d = dataclasses.asdict(self)
        # invocation-time knobs never persist: a run trained with --serving
        # must not silently switch later plain `cli infer --resume` calls
        # to tensorfloat32 through the opt.json reload
        d.pop("serving", None)
        if reference_sidecar:
            run_dir = os.path.dirname(os.path.abspath(path))
            cfg_py = os.path.join(run_dir, "model_cfg.py")
            with open(cfg_py, "w") as f:
                f.write(emit_model_cfg(self))
            d.update(
                device=-1,  # reference: 0 = cuda, -1 = cpu (torch target)
                num_workers=0,
                results_dir=run_dir,
                config=cfg_py,
                # the reference model hard-asserts bs==1 in eval forward
                # (model.py:248) and its TestOptions unconditionally restores
                # eval_bsz from opt.json — persisting our batched value would
                # crash every reference inference run on this dir. Our own
                # reload keeps the invocation's eval_bsz (cli.py keep-list
                # extension, documented in PARITY.md conscious deviations).
                eval_bsz=1,
            )
        with open(path, "w") as f:
            json.dump(d, f, indent=2, default=list)

    @classmethod
    def load(cls, path) -> "ExperimentConfig":
        with open(path) as f:
            raw = json.load(f)
        raw.pop("serving", None)  # invocation-time knob, never restored
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in raw.items() if k in fields})

    def replace(self, **kw) -> "ExperimentConfig":
        return dataclasses.replace(self, **kw)


def load_model_cfg_file(path: str) -> dict:
    """Parse a reference-style python model-config file (data/MR*.py).

    Executes the file in an isolated namespace and returns its `model` dict;
    `_base_` entries are accepted and ignored (the shipped bases add nothing
    the dict does not already restate).
    """
    ns: dict = {}
    with open(path) as f:
        exec(compile(f.read(), path, "exec"), {}, ns)
    return ns.get("model", {})


# reference blocks-registry class name <-> our loss kind; emit_model_cfg
# uses the derived inverse so the two maps cannot drift
_LOSS_TYPE_MAP = {
    "FocalLoss": "focal",
    "DynamicBCELoss": "dynamic_bce",
    "L1Loss": "l1",
    "SampledNCELoss": "nce",
}


def apply_model_cfg(cfg: ExperimentConfig, model_dict: dict) -> ExperimentConfig:
    """Overlay a data/MR*.py-style dict onto an ExperimentConfig."""
    kw = {}
    if "strides" in model_dict:
        kw["strides"] = tuple(model_dict["strides"])
    if "buffer_size" in model_dict:
        kw["buffer_size"] = model_dict["buffer_size"]
    if "max_num_moment" in model_dict:
        kw["max_num_moment"] = model_dict["max_num_moment"]
    loss_cfg = model_dict.get("loss_cfg", {})
    type_map = _LOSS_TYPE_MAP
    if loss_cfg:
        cls = loss_cfg.get("loss_cls")
        kw["loss_cls"] = type_map.get(cls["type"]) if cls else None
        reg = loss_cfg.get("loss_reg")
        kw["loss_reg"] = type_map.get(reg["type"]) if reg else None
        sal = loss_cfg.get("loss_sal")
        kw["loss_sal"] = type_map.get(sal["type"]) if sal else None
        if sal and "direction" in sal:
            d = sal["direction"]
            kw["nce_direction"] = (d,) if isinstance(d, str) else tuple(d)
        kw["loss_qfl"] = "loss_qfl" in loss_cfg
        if "sample_radius" in loss_cfg:
            kw["sample_radius"] = loss_cfg["sample_radius"]
    return cfg.replace(**kw)


def emit_model_cfg(cfg: "ExperimentConfig") -> str:
    """Inverse of apply_model_cfg: render a reference-style data/MR*.py
    model-config file for this experiment.

    The reference's FlashVTG/inference.py builds its model from
    `opt.cfg = nncore.Config.from_file(opt.config)` (inference.py:495,
    model.py:806-811 and :333), so an exported checkpoint needs a matching
    config file for reference-repo users to evaluate it there. The emitted
    text mirrors the shipped data/{MR,MR_GFL,HD}.py shapes, including the
    `_base_ = ['blocks']` registry import."""
    type_map = {v: k for k, v in _LOSS_TYPE_MAP.items()}

    def entry(kind: Optional[str], extra: str = "") -> str:
        return f"dict(type='{type_map[kind]}'{extra})" if kind else "None"

    dirs = tuple(cfg.nce_direction)
    sal_extra = "" if dirs == ("row", "col") else (
        f", direction={dirs[0]!r}" if len(dirs) == 1 else f", direction={dirs!r}"
    )
    loss_lines = [
        "    loss_cfg=dict(",
        "        type='BundleLoss',",
        f"        sample_radius={cfg.sample_radius},",
    ]
    if cfg.loss_qfl:
        # data/MR_GFL.py omits loss_cls entirely in favour of loss_qfl
        loss_lines.append("        loss_qfl=dict(type='QualityFocalLoss'),")
    else:
        loss_lines.append(f"        loss_cls={entry(cfg.loss_cls)},")
    loss_lines += [
        f"        loss_reg={entry(cfg.loss_reg)},",
        f"        loss_sal={entry(cfg.loss_sal, sal_extra)},",
        "    ),",
    ]
    lines = [
        "_base_ = ['blocks']",
        "model = dict(",
        f"    strides={tuple(cfg.strides)!r},",
        f"    buffer_size={cfg.buffer_size},",
        f"    max_num_moment={cfg.max_num_moment},",
        "    pyramid_cfg=dict(type='ConvPyramid'),",
        "    pooling_cfg=dict(type='AdaPooling'),",
        "    class_head_cfg=dict(type='ConvHead', kernal_size=3),",
        "    coord_head_cfg=dict(type='ConvHead', kernal_size=3),",
        *loss_lines,
        ")",
    ]
    return "\n".join(lines) + "\n"


# ---------------------------------------------------------------------------
# Presets: the 7 shipped training scripts (FlashVTG/scripts/*)
# ---------------------------------------------------------------------------

_HD_LOSSES = dict(
    strides=(1,), buffer_size=2048, loss_cls="dynamic_bce", loss_reg=None,
    loss_sal="nce", nce_direction=("row",),
)

PRESETS = {
    # scripts/train_qv_slowclip.sh (QVHighlights, InternVideo2 video 768 +
    # InternVideo2 text 4096, data/MR.py)
    "qvhighlights": dict(
        dset_name="hl", v_feat_dim=768, t_feat_dim=4096, bsz=64,
        max_v_l=75, max_q_l=40, eval_epoch=1, wd=1e-4, eval_bsz=256,
        enc_layers=3, t2v_layers=6, dummy_layers=2, num_dummies=10,
        kernel_size=5, num_conv_layers=1, num_mlp_layers=5,
        lw_reg=1.0, lw_cls=5.0, lw_sal=0.1, lw_saliency=0.8,
        label_loss_coef=4.0, n_epoch=150, lr_drop=400, nms_thd=0.7,
        use_neg=True, clip_length=2.0,
        train_path="data/highlight_train_release.jsonl",
        eval_path="data/highlight_val_release.jsonl",
    ),
    # classic SlowFast+CLIP QVHighlights feature set (moment-detr lineage;
    # dims per README feature preparation): video 2304+512, text CLIP 512
    "qvhighlights_slowclip": dict(
        dset_name="hl", v_feat_dim=2816, t_feat_dim=512, bsz=64,
        max_v_l=75, max_q_l=32, eval_epoch=1, wd=1e-4, eval_bsz=256,
        enc_layers=3, t2v_layers=6, dummy_layers=2, num_dummies=10,
        kernel_size=5, num_conv_layers=1, num_mlp_layers=5,
        lw_reg=1.0, lw_cls=5.0, lw_sal=0.1, lw_saliency=0.8,
        label_loss_coef=4.0, n_epoch=150, lr_drop=400, nms_thd=0.7,
        use_neg=True, clip_length=2.0,
        train_path="data/highlight_train_release.jsonl",
        eval_path="data/highlight_val_release.jsonl",
    ),
    # scripts/qv_internvideo2/train.sh (data/MR_16.py: strides to 16)
    "qv_internvideo2": dict(
        dset_name="qv_internvideo2", v_feat_dim=768, t_feat_dim=4096,
        bsz=64, max_v_l=75, max_q_l=40, eval_epoch=1, wd=1e-4, eval_bsz=256,
        enc_layers=3, t2v_layers=6, dummy_layers=2, num_dummies=40,
        kernel_size=5, num_conv_layers=1, num_mlp_layers=5,
        strides=(1, 2, 4, 8, 16),
        lw_reg=1.0, lw_cls=5.0, lw_sal=0.1, lw_saliency=0.8,
        label_loss_coef=0.0, n_epoch=150, nms_thd=0.7, use_neg=True,
        clip_length=2.0,
        train_path="data/highlight_train_release_IV2.jsonl",
        eval_path="data/highlight_val_release.jsonl",
    ),
    # scripts/charades_sta/train.sh (InternVideo2-like features, clip 1s)
    "charades": dict(
        dset_name="charadesSTA", v_feat_dim=768, t_feat_dim=4096, bsz=128,
        max_v_l=256, max_q_l=32, eval_epoch=1, eval_bsz=128,
        enc_layers=3, t2v_layers=6, dummy_layers=2, num_dummies=40,
        kernel_size=5, num_conv_layers=1, num_mlp_layers=5,
        lw_reg=1.0, lw_cls=5.0, lw_sal=0.01, lw_saliency=0.8,
        label_loss_coef=0.1, n_epoch=50, nms_thd=0.7, use_neg=True,
        clip_length=1.0, lr=2.5e-4,
        train_path="data/charades_sta/charades_sta_train_tvr_format.jsonl",
        eval_path="data/charades_sta/charades_sta_test_tvr_format.jsonl",
    ),
    # scripts/charades_sta/train_vgg.sh (VGG 4096 + GloVe 300, clip 1/6 s)
    "charades_vgg": dict(
        dset_name="charadesSTA", v_feat_dim=4096, t_feat_dim=300, bsz=16,
        max_v_l=2048, max_q_l=32, eval_epoch=1, eval_bsz=16,
        enc_layers=3, t2v_layers=6, dummy_layers=2, num_dummies=40,
        kernel_size=3, num_conv_layers=2, num_mlp_layers=5,
        lw_reg=1.0, lw_cls=5.0, lw_sal=0.01, lw_saliency=0.8,
        label_loss_coef=0.1, n_epoch=100, nms_thd=0.7, use_neg=True,
        clip_length=0.166666, lr=1e-4, q_feat_type="features",
        train_path="data/charades_sta/charades_sta_train_tvr_format.jsonl",
        eval_path="data/charades_sta/charades_sta_test_tvr_format.jsonl",
    ),
    # scripts/charades_sta_internvideo2/train.sh
    "charades_internvideo2": dict(
        dset_name="charadesSTA_internvideo2", v_feat_dim=768, t_feat_dim=4096,
        bsz=32, max_v_l=256, max_q_l=23, eval_epoch=1, eval_bsz=128,
        enc_layers=3, t2v_layers=6, dummy_layers=2, num_dummies=40,
        kernel_size=7, num_conv_layers=2, num_mlp_layers=3,
        lw_reg=1.0, lw_cls=5.0, lw_sal=0.01, lw_saliency=0.8,
        label_loss_coef=0.1, n_epoch=50, lr_drop=50, nms_thd=0.7,
        use_neg=True, clip_length=1.0, lr=1.5e-4,
        train_path="data/charades_sta/charades_sta_train_tvr_format.jsonl",
        eval_path="data/charades_sta/charades_sta_test_tvr_format.jsonl",
    ),
    # scripts/tacos/train.sh
    "tacos": dict(
        dset_name="tacos", v_feat_dim=768, t_feat_dim=4096, bsz=32,
        max_v_l=2048, max_q_l=40, eval_epoch=3, eval_bsz=8,
        enc_layers=3, t2v_layers=8, dummy_layers=3, num_dummies=35,
        kernel_size=5, num_conv_layers=2, num_mlp_layers=5,
        lw_reg=1.0, lw_cls=5.0, lw_sal=0.05, lw_saliency=0.8,
        label_loss_coef=4.0, n_epoch=150, nms_thd=0.7, use_neg=True,
        clip_length=2.0, lr=2e-4,
        train_path="data/tacos/train.jsonl", eval_path="data/tacos/val.jsonl",
    ),
    # scripts/tvsum/train.sh (HD task, data/HD.py)
    "tvsum": dict(
        dset_name="tvsum", v_feat_dim=2816, t_feat_dim=512, bsz=4,
        max_v_l=1000, max_q_l=32, eval_epoch=1, eval_bsz=4,
        enc_layers=3, t2v_layers=2, dummy_layers=2, num_dummies=3,
        kernel_size=5, num_conv_layers=2, num_mlp_layers=3,
        lw_cls=5.0, lw_sal=0.1, lw_saliency=0.8, label_loss_coef=4.0,
        n_epoch=600, lr_drop=3000, max_es_cnt=-1, lr=1e-3, wd=0.05,
        dropout=0.1, use_neg=True, clip_length=2.0,
        train_path="data/tvsum/tvsum_train.jsonl",
        eval_path="data/tvsum/tvsum_val.jsonl",
        **_HD_LOSSES,
    ),
    # FlashVTG_ms multi-scale variant on the HD tasks (FlashVTG_ms/ has no
    # shipped scripts — defaults follow FlashVTG_ms/config.py:135-153)
    "tvsum_ms": dict(
        dset_name="tvsum", variant="ms", v_feat_dim=2816, t_feat_dim=512,
        bsz=4, max_v_l=1000, max_q_l=32, eval_epoch=1, eval_bsz=4,
        enc_layers=3, t2v_layers=2, dummy_layers=2, num_dummies=3,
        kernel_size=5, num_conv_layers=2, num_mlp_layers=3,
        lw_cls=5.0, lw_sal=0.1, lw_saliency=0.8, label_loss_coef=4.0,
        n_epoch=600, lr_drop=3000, max_es_cnt=-1, lr=1e-3, wd=0.05,
        use_neg=True, clip_length=2.0,
        num_phrase=3, phrase_layers=2, context_layers=2, rank=32, t_sa=2,
        train_path="data/tvsum/tvsum_train.jsonl",
        eval_path="data/tvsum/tvsum_val.jsonl",
        **_HD_LOSSES,
    ),
    # FlashVTG_ms on YouTube-HL (no shipped reference script; mirrors the
    # youtube_uni hyper-parameters + FlashVTG_ms/config.py:135-153 defaults)
    "youtube_uni_ms": dict(
        dset_name="youtube_uni", variant="ms", v_feat_dim=2816,
        t_feat_dim=512, bsz=4, max_v_l=1000, max_q_l=32, eval_epoch=1,
        eval_bsz=4, enc_layers=3, t2v_layers=2, dummy_layers=2,
        num_dummies=3, kernel_size=5, num_conv_layers=2, num_mlp_layers=3,
        lw_cls=0.6, lw_sal=0.5, lw_saliency=0.7, label_loss_coef=5.0,
        n_epoch=5, lr_drop=2000, max_es_cnt=-1, lr=2e-4, clip_length=1.0,
        use_neg=True,
        num_phrase=3, phrase_layers=2, context_layers=2, rank=32, t_sa=2,
        train_path="data/youtube_uni/youtube_train.jsonl",
        eval_path="data/youtube_uni/youtube_valid.jsonl",
        **_HD_LOSSES,
    ),
    # scripts/youtube_uni/train.sh (HD task)
    "youtube_uni": dict(
        dset_name="youtube_uni", v_feat_dim=2816, t_feat_dim=512, bsz=4,
        max_v_l=1000, max_q_l=32, eval_epoch=1, eval_bsz=4,
        enc_layers=3, t2v_layers=2, dummy_layers=2, num_dummies=3,
        kernel_size=5, num_conv_layers=2, num_mlp_layers=3,
        lw_cls=0.6, lw_sal=0.5, lw_saliency=0.7, label_loss_coef=5.0,
        n_epoch=5, lr_drop=2000, max_es_cnt=-1, lr=2e-4, clip_length=1.0,
        use_neg=True,
        train_path="data/youtube_uni/youtube_train.jsonl",
        eval_path="data/youtube_uni/youtube_valid.jsonl",
        **_HD_LOSSES,
    ),
}


def from_preset(name: str, **overrides) -> ExperimentConfig:
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; have {sorted(PRESETS)}")
    kw = dict(PRESETS[name])
    kw.update(overrides)
    return ExperimentConfig(**kw)
