"""Fast config-level smoke gates for flag surfaces whose full integration
tests live in the slow set (round-4 advisor finding): --test_path final
evals (test_second_split.py), --eval_untrained (test_testoptions_flags.py),
and the train()->wandb.init wiring (test_wandb.py). Each slow test drives a
full train loop; these siblings pin the CLI->ExperimentConfig plumbing so
the fast loop still gates the flag surface itself.

Oracle: reference config.py flag definitions (--eval_untrained :31,
FlashVTG_ms/config.py --test_path :150, --use_wandb FlashVTG_ms/train.py).
"""

from flashvtg_tpu.cli import parse_config
from flashvtg_tpu.train.config import from_preset


def test_cli_plumbs_test_path():
    cfg, overrides = parse_config(
        ["qvhighlights_slowclip", "--test_path", "/data/test_split.jsonl"]
    )
    assert cfg.test_path == "/data/test_split.jsonl"
    assert overrides["test_path"] == "/data/test_split.jsonl"


def test_cli_plumbs_eval_untrained():
    cfg, _ = parse_config(["qvhighlights_slowclip", "--eval_untrained", "true"])
    assert cfg.eval_untrained is True
    # default off, like the reference's store_true (config.py:31)
    assert from_preset("qvhighlights_slowclip").eval_untrained is False


def test_cli_plumbs_use_wandb():
    cfg, _ = parse_config(["tvsum_ms", "--use_wandb", "true"])
    assert cfg.use_wandb is True
    # the project name the train loop hands to wandb.init (loop.py) matches
    # the _ms trainer's hardcoded project (FlashVTG_ms/train.py:115-125)
    assert cfg.wandb_project == "FlashVTG"
    assert from_preset("tvsum_ms").use_wandb is False
