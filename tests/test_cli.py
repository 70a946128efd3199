"""CLI parser coverage (fast, no execution of heavy paths)."""

import pytest

from maunet_tpu.cli import build_parser


@pytest.fixture(scope="module")
def parser():
    return build_parser()


def test_all_subcommands_parse(parser):
    cases = [
        ["train", "--model-type", "unet++", "--no-temporal-embeddings",
         "--seeds", "1", "2", "--epochs", "3", "--resume", "--wandb"],
        ["evaluate", "ckpt", "--precision", "float32", "--batch-size", "4"],
        ["synth-data", "/tmp/x", "--train", "8"],
        ["pack", "/tmp/x", "--shard-size", "32"],
        ["process", "--image-dir", "a", "--output-dir", "b"],
        ["acquire", "--workers", "4"],
        ["process-temperature"],
        ["bench"],
        ["sensitivity", "ckpt", "eval.csv", "--max-samples", "5"],
        ["gt-sensitivity"],
        ["compare-sensitivity", "dir"],
        ["stats", "a.csv", "b.csv"],
        ["eda", "extract", "d", "out.csv"],
        ["eda", "visualize", "x.npz"],
        ["eda", "analyze-csv", "m.csv"],
        ["eda", "visualize-tiles", "imgdir"],
    ]
    for argv in cases:
        args = parser.parse_args(argv)
        assert callable(args.fn), argv


def test_config_overrides_parse(parser):
    args = parser.parse_args(
        ["train", "-o", "training.batch_size=4", "-o", "seed=7"])
    assert args.override == ["training.batch_size=4", "seed=7"]

    from maunet_tpu.cli import _load_cfg

    cfg = _load_cfg(args)
    assert cfg.training.batch_size == 4
    assert cfg.seed == 7


def test_invalid_choices_rejected(parser):
    with pytest.raises(SystemExit):
        parser.parse_args(["train", "--model-type", "resnet"])
    with pytest.raises(SystemExit):
        parser.parse_args(["evaluate", "ckpt", "--precision", "fp8"])
