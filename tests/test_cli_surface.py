"""CLI surfaces: metric CLI against the golden fixture, config parsing."""

import json
import pathlib

import pytest

from flashvtg_tpu.cli import parse_config
from flashvtg_tpu.eval.cli import main as eval_main

REF = pathlib.Path("/root/reference")
FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.mark.skipif(
    not (REF / "standalone_eval/sample_val_preds.jsonl").exists(),
    reason="reference fixtures absent",
)
def test_eval_cli_golden(tmp_path):
    out = tmp_path / "metrics.json"
    eval_main(
        [
            "--submission_path", str(REF / "standalone_eval/sample_val_preds.jsonl"),
            "--gt_path", str(REF / "data/highlight_val_release.jsonl"),
            "--save_path", str(out),
            "--not_verbose",
        ]
    )
    got = json.load(open(out))
    expected = json.load(
        open(FIXTURES / "sample_val_preds_metrics_expected.json")
    )
    assert got["brief"] == expected["brief"]


def test_parse_config_preset_and_overrides():
    cfg, overrides = parse_config(
        ["qvhighlights_slowclip", "--bsz", "16", "--bucket_eval", "true",
         "--strides", "1", "2"]
    )
    assert cfg.bsz == 16 and cfg.bucket_eval and cfg.strides == (1, 2)
    assert set(overrides) == {"bsz", "bucket_eval", "strides"}
    # preset values survive where not overridden
    assert cfg.t2v_layers == 6 and cfg.dset_name == "hl"


def test_parse_config_file():
    cfg, _ = parse_config(["configs/HD.py", "--dset_name", "tvsum"])
    assert cfg.strides == (1,) and cfg.loss_cls == "dynamic_bce"
    assert cfg.dset_name == "tvsum"


def test_eval_cli_missing_file_clean_error(tmp_path):
    with pytest.raises(SystemExit, match="no such file"):
        eval_main(
            [
                "--submission_path", str(tmp_path / "absent.jsonl"),
                "--gt_path", str(tmp_path / "absent_gt.jsonl"),
                "--save_path", str(tmp_path / "out.json"),
            ]
        )


def test_infer_cli_clean_errors(tmp_path):
    from flashvtg_tpu.cli import main as cli_main

    with pytest.raises(SystemExit, match="--resume"):
        cli_main(["infer", "qvhighlights_slowclip"])
    with pytest.raises(SystemExit, match="no such checkpoint"):
        cli_main(
            ["infer", "qvhighlights_slowclip",
             "--resume", str(tmp_path / "absent_ckpt")]
        )
    with pytest.raises(SystemExit, match="--export_path"):
        cli_main(
            ["export", "qvhighlights_slowclip",
             "--resume", str(tmp_path / "absent_ckpt")]
        )
    with pytest.raises(SystemExit, match="requires a value"):
        cli_main(["export", "qvhighlights_slowclip", "--export_path"])
    with pytest.raises(SystemExit, match="no such checkpoint"):
        cli_main(  # --export_path=value form parses too
            ["export", "qvhighlights_slowclip",
             "--resume", str(tmp_path / "absent_ckpt"),
             f"--export_path={tmp_path}/out.ckpt"]
        )


def test_bare_bool_flags_parse_like_store_true():
    """Reference bool flags are argparse store_true; both the bare form and
    an explicit value must work here (MIGRATION.md: flag blocks carry
    over unchanged)."""
    cfg, _ = parse_config(["qvhighlights_slowclip", "--debug"])
    assert cfg.debug is True
    cfg, _ = parse_config(["qvhighlights_slowclip", "--debug", "false"])
    assert cfg.debug is False
    cfg, _ = parse_config(
        ["qvhighlights_slowclip", "--eval_untrained", "--bsz", "4"]
    )
    assert cfg.eval_untrained is True and cfg.bsz == 4
    # the reference's inverted spelling of its one store_false pair
    cfg, _ = parse_config(["qvhighlights_slowclip", "--no_aux_loss"])
    assert cfg.aux_loss is False


def test_bool_flag_rejects_unknown_literal():
    """ADVICE r3: a bare bool flag placed before the positional config
    swallows the config token; the type must reject non-boolean literals
    loudly (argparse exits 2 with the ArgumentTypeError message) instead of
    silently parsing them to False."""
    import pytest

    with pytest.raises(SystemExit):
        parse_config(["--debug", "qvhighlights_slowclip"])
    with pytest.raises(SystemExit):
        parse_config(["qvhighlights_slowclip", "--debug", "banana"])
