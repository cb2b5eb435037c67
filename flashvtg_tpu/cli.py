"""Command-line entry points (train / inference), drop-in shaped.

Mirrors the reference surface:
    python -m flashvtg_tpu.cli train  <data/MR.py|preset> --dset_name hl ...
    python -m flashvtg_tpu.cli infer  <data/MR.py|preset> --resume ckpt ...
    python -m flashvtg_tpu.cli export <data/MR.py|preset> --resume <ckpt> \
        --export_path model.ckpt   # reference-format torch .ckpt out
The positional config may be a reference-style python model-config file
(data/MR*.py, data/HD.py) or the name of a built-in preset; every
ExperimentConfig field is also exposed as a --flag.
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import os
import sys
from flashvtg_tpu.train.config import (
    ExperimentConfig,
    PRESETS,
    apply_model_cfg,
    from_preset,
    load_model_cfg_file,
)


def _bool_literal(s: str) -> bool:
    v = s.lower()
    if v in ("1", "true", "yes"):
        return True
    if v in ("0", "false", "no"):
        return False
    # an unknown token here usually means a bare bool flag placed BEFORE
    # the positional config swallowed the config name (nargs="?" grabs the
    # next token); rejecting loudly beats silently parsing it as False
    raise argparse.ArgumentTypeError(
        f"expected a boolean literal (true/false/1/0/yes/no), got {s!r}. "
        "If this is your config name, put bare bool flags AFTER the "
        "positional config (e.g. `cli train mypreset --debug`)."
    )


def _add_config_flags(parser: argparse.ArgumentParser):
    for f in dataclasses.fields(ExperimentConfig):
        name = f"--{f.name}"
        t = f.type if isinstance(f.type, type) else None
        if f.name in ("v_feat_dirs", "v_buckets", "strides", "nce_direction"):
            parser.add_argument(name, nargs="+", default=None)
        elif t is bool or str(f.type).startswith("bool"):
            # both forms work: bare `--debug` (the reference's store_true
            # style) and explicit `--debug true/false`
            parser.add_argument(
                name, nargs="?", const=True, default=None,
                type=_bool_literal,
            )
        elif str(f.type).startswith("int") or "int" in str(f.type):
            parser.add_argument(name, type=int, default=None)
        elif str(f.type).startswith("float") or "float" in str(f.type):
            parser.add_argument(name, type=float, default=None)
        else:
            parser.add_argument(name, type=str, default=None)


def parse_config(argv):
    """Returns (config, explicit_overrides)."""
    # the reference exposes aux_loss only through its inverted store_false
    # spelling (config.py:135 --no_aux_loss); accept that form too
    argv = [
        x
        for a in argv
        for x in (("--aux_loss", "false") if a == "--no_aux_loss" else (a,))
    ]
    parser = argparse.ArgumentParser()
    parser.add_argument("config", help="preset name or data/MR*.py-style file")
    _add_config_flags(parser)
    ns = parser.parse_args(argv)

    if ns.config in PRESETS:
        cfg = from_preset(ns.config)
    elif os.path.exists(ns.config):
        cfg = ExperimentConfig()
        cfg = apply_model_cfg(cfg, load_model_cfg_file(ns.config))
    else:
        raise SystemExit(f"unknown config {ns.config!r}")

    overrides = {}
    for f in dataclasses.fields(ExperimentConfig):
        v = getattr(ns, f.name, None)
        if v is None:
            continue
        if f.name in ("strides", "v_buckets"):
            v = tuple(int(x) for x in v)
        elif f.name == "nce_direction":
            v = tuple(v)
        overrides[f.name] = v
    return cfg.replace(**overrides), overrides


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s.%(msecs)03d:%(levelname)s:%(name)s - %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
    )
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    from flashvtg_tpu.utils.runtime import setup

    setup()
    mode, rest = argv[0], argv[1:]
    export_path = None
    if mode == "export":
        for i, a in enumerate(rest):
            if a == "--export_path":
                if i + 1 >= len(rest):
                    raise SystemExit("--export_path requires a value")
                export_path = rest[i + 1]
                rest = rest[:i] + rest[i + 2 :]
                break
            if a.startswith("--export_path="):
                export_path = a.split("=", 1)[1]
                rest = rest[:i] + rest[i + 1 :]
                break
    cfg, overrides = parse_config(rest)
    if mode != "infer" and ("serving" in overrides or cfg.serving):
        logging.getLogger(__name__).warning(
            "--serving only affects `infer` (docs/PRECISION.md); it is "
            "ignored for %s and is never persisted to opt.json", mode,
        )

    if mode in ("infer", "export") and cfg.resume:
        # TestOptions semantics (config.py:189-203): the opt.json saved next
        # to the checkpoint restores the training-time flags — EXCEPT the
        # eval-time knobs the reference explicitly keeps at their current
        # values (config.py:196-199 exclusion list: results_root, nms_thd,
        # debug, max_pred_l, min_pred_l, resume, resume_all,
        # no_sort_results). Explicit CLI flags of THIS invocation still win
        # over everything.
        opt_json = os.path.join(os.path.dirname(cfg.resume) or ".", "opt.json")
        if os.path.exists(opt_json):
            keep = {
                k: getattr(cfg, k)
                for k in (
                    "results_root", "nms_thd", "debug", "max_pred_l",
                    "min_pred_l", "resume", "resume_all", "no_sort_results",
                    # conscious deviation from the reference keep-list
                    # (PARITY.md): the sidecar opt.json records eval_bsz=1
                    # (the only value the reference model can run); OUR
                    # eval is eval-bsz-invariant (test_bucketing), so the
                    # invocation's batched value stays in force here
                    "eval_bsz",
                )
                if hasattr(cfg, k)
            }
            cfg = ExperimentConfig.load(opt_json).replace(
                **{**keep, **overrides}
            )

    if mode == "train":
        from flashvtg_tpu.train.loop import train

        best_params, best_score, results_dir = train(cfg)
        print(f"best score {best_score:.4f}; results in {results_dir}")
        return 0

    if mode == "infer":
        import jax.numpy as jnp

        from flashvtg_tpu.data.dataset import VTGDataset
        from flashvtg_tpu.models.flashvtg import FlashVTGModel
        from flashvtg_tpu.train.loop import (
            _dataset_cfg,
            evaluate,
            load_adapter,
            load_checkpoint,
        )

        if cfg.serving and "eval_precision" not in overrides:
            # documented serving profile (docs/PRECISION.md "Recommended
            # serving configuration"); explicit --eval_precision wins
            cfg = cfg.replace(eval_precision="tensorfloat32")
        if cfg.resume is None:
            raise SystemExit("--resume <checkpoint> is required for inference")
        if not os.path.exists(cfg.resume):
            raise SystemExit(f"--resume: no such checkpoint: {cfg.resume}")
        if not cfg.eval_path:
            raise SystemExit(
                "--eval_path <annotations.jsonl> is required for inference"
            )
        if not os.path.exists(cfg.eval_path):
            raise SystemExit(f"--eval_path: no such file: {cfg.eval_path}")
        model = cfg.build_model()
        if cfg.resume.endswith(".ckpt"):  # torch reference checkpoint
            from flashvtg_tpu.utils.torch_convert import load_torch_checkpoint

            mc = (
                cfg.ms_model_config() if cfg.variant == "ms"
                else cfg.model_config()
            )
            params = load_torch_checkpoint(cfg.resume, mc)
        else:
            params = load_checkpoint(cfg.resume)["params"]
        if cfg.resume_adapter:  # partial preload (inference.py:447-451)
            params = load_adapter(cfg, params)
        dataset = VTGDataset(
            _dataset_cfg(cfg, cfg.eval_path, load_labels=cfg.eval_split_name == "val")
        )
        # --eval_results_dir redirects test-time outputs (reference
        # config.py:201-202); default is next to the checkpoint
        results_dir = (
            cfg.eval_results_dir or os.path.dirname(cfg.resume) or "."
        )
        os.makedirs(results_dir, exist_ok=True)
        # criterion losses on labeled splits, like the reference's
        # inference.py:300-306 (silently skipped when labels are absent)
        loss_cfg = (
            cfg.ms_loss_config() if cfg.variant == "ms" else cfg.loss_config()
        )
        # data-parallel eval over all local chips whose count divides
        # eval_bsz (mirrors the production train() mesh policy)
        from flashvtg_tpu.train.loop import build_mesh_for

        mesh = build_mesh_for(cfg.eval_bsz)
        if mesh is not None:
            from flashvtg_tpu.parallel.mesh import replicate_params

            params = replicate_params(mesh, params)
        metrics, metrics_nms, eval_losses = evaluate(
            cfg, model, params, dataset, results_dir, tag="infer",
            loss_cfg=loss_cfg, mesh=mesh,
        )
        if eval_losses:
            print("eval losses:", {k: round(v, 4) for k, v in eval_losses.items()})
        if metrics is not None:
            print(dict(metrics["brief"]))
        if metrics_nms is not None:
            print("nms:", dict(metrics_nms["brief"]))
        return 0

    if mode == "export":
        # hand a model trained here back to reference-repo users: write a
        # torch .ckpt their FlashVTG/inference.py --resume loads strict=True
        if cfg.resume is None or export_path is None:
            raise SystemExit(
                "export requires --resume <checkpoint> and "
                "--export_path <out.ckpt>"
            )
        if not os.path.exists(cfg.resume):
            raise SystemExit(f"--resume: no such checkpoint: {cfg.resume}")
        from flashvtg_tpu.utils.torch_convert import (
            load_torch_checkpoint,
            save_torch_checkpoint,
        )

        mc = (
            cfg.ms_model_config() if cfg.variant == "ms"
            else cfg.model_config()
        )
        # Sidecars so reference-repo users can run their own
        # FlashVTG/inference.py on the export: TestOptions reloads opt.json
        # from dirname(--resume) (config.py:189-203) and builds the model
        # from the opt.json-pinned config file (inference.py:495). Never
        # clobber a training run's opt.json (it may carry feature dirs this
        # export invocation was not given) — and refuse a mismatched target
        # dir BEFORE writing anything, so a failed export leaves no partial
        # artifacts.
        export_dir = os.path.dirname(os.path.abspath(export_path))
        os.makedirs(export_dir, exist_ok=True)
        opt_sidecar = os.path.join(export_dir, "opt.json")
        existing_opt = None
        if os.path.exists(opt_sidecar):
            import json as _json

            with open(opt_sidecar) as f:
                existing_opt = _json.load(f)
            mismatched = [
                k for k in (
                    "variant", "hidden_dim", "enc_layers", "t2v_layers",
                    "dummy_layers", "num_dummies", "dim_feedforward",
                    "v_feat_dim", "t_feat_dim", "kernel_size",
                    "num_conv_layers", "num_mlp_layers", "n_input_proj",
                )
                if k in existing_opt
                and existing_opt[k] != getattr(cfg, k, None)
            ]
            if mismatched:
                raise SystemExit(
                    f"--export_path points into a directory whose opt.json "
                    f"records a different architecture ({', '.join(mismatched)}"
                    f" differ); export to a fresh directory instead"
                )

        epoch = -1
        if cfg.resume.endswith(".ckpt"):  # torch in, torch out (re-export)
            params = load_torch_checkpoint(cfg.resume, mc)
        else:
            from flashvtg_tpu.train.loop import load_checkpoint

            restored = load_checkpoint(cfg.resume)
            params = restored["params"]
            epoch = int(restored.get("epoch", -1))
        save_torch_checkpoint(
            export_path, params, mc, variant=cfg.variant, epoch=epoch
        )
        if existing_opt is None:
            # the sidecar writer translates eval_bsz to 1: the reference
            # model hard-asserts bs==1 in eval forward (model.py:248)
            cfg.save(opt_sidecar)
        else:
            # architecture matches the existing record: refresh only the
            # model-config file
            from flashvtg_tpu.train.config import emit_model_cfg

            with open(os.path.join(export_dir, "model_cfg.py"), "w") as f:
                f.write(emit_model_cfg(cfg))
        print(f"exported reference-format checkpoint to {export_path}")
        return 0

    raise SystemExit(f"unknown mode {mode!r} (use train|infer|export)")


if __name__ == "__main__":
    sys.exit(main())
