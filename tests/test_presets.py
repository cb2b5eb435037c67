"""Every shipped preset must construct end-to-end (config -> model config ->
module -> loss config -> declared loss keys) and round-trip through
opt.json — guards config rot as fields evolve."""

import dataclasses
import json

import pytest

from flashvtg_tpu.losses.criterion import loss_keys
from flashvtg_tpu.losses.criterion_ms import loss_keys_ms
from flashvtg_tpu.train.config import ExperimentConfig, PRESETS, from_preset


@pytest.mark.parametrize("name", sorted(PRESETS))
def test_preset_constructs(name):
    cfg = from_preset(name)
    model = cfg.build_model()
    assert model is not None
    if cfg.variant == "ms":
        keys = loss_keys_ms(cfg.ms_loss_config())
    else:
        keys = loss_keys(cfg.loss_config())
    assert "loss_saliency" in keys and "loss_label" in keys
    if cfg.dset_name in ("tvsum", "youtube_uni") and cfg.variant != "ms":
        # HD bundle: DynamicBCELoss cls on raw saliency targets, no reg
        assert "loss_cls" in keys and "loss_reg" not in keys
    # long-video presets must engage chunked attention
    if cfg.max_v_l > 512:
        assert 0 < cfg.attn_chunk < cfg.max_v_l


@pytest.mark.parametrize("name", sorted(PRESETS))
def test_preset_opt_json_roundtrip(tmp_path, name):
    cfg = from_preset(name)
    p = tmp_path / "opt.json"
    cfg.save(p)
    loaded = ExperimentConfig.load(p)
    a = dataclasses.asdict(cfg)
    b = dataclasses.asdict(loaded)
    for k in a:
        if k in ("eval_bsz", "serving"):
            # documented sidecar translations (PARITY.md deviation 7):
            # opt.json records eval_bsz=1 for the reference's bs==1 assert
            # (our reload keeps the invocation's value via the keep-list),
            # and serving never persists at all
            continue
        va, vb = a[k], b[k]
        if isinstance(va, tuple):
            va = list(va)
        if isinstance(vb, tuple):
            vb = list(vb)
        assert va == vb, k


def test_load_ignores_unknown_and_removed_fields(tmp_path):
    cfg = from_preset("qvhighlights_slowclip")
    p = tmp_path / "opt.json"
    cfg.save(p)
    raw = json.load(open(p))
    raw["use_pallas"] = True  # removed round-2 field in an old opt.json
    raw["some_future_flag"] = 7
    json.dump(raw, open(p, "w"))
    loaded = ExperimentConfig.load(p)
    assert loaded.dset_name == cfg.dset_name
