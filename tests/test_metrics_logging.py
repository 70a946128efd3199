"""RunningLoss / CSVLogger / tracking helpers."""

import csv

from maunet_tpu.train.metrics import CSVLogger, RunningLoss
from maunet_tpu.utils.tracking import NullTracker, make_emb_tag


def test_running_loss_modes():
    cum = RunningLoss("cumulative")
    assert cum.update(1.0, n=2) == 1.0
    assert cum.update(4.0, n=2) == 2.5  # (2+8)/4

    ema = RunningLoss("ema", ema_alpha=0.5)
    assert ema.update(1.0) == 1.0
    assert ema.update(3.0) == 2.0

    sma = RunningLoss("sma", window_size=2)
    sma.update(1.0)
    sma.update(3.0)
    assert sma.update(5.0) == 4.0  # window [3, 5]
    sma.reset()
    assert sma.get() == 0.0


def test_csv_logger_stable_columns(tmp_path):
    path = str(tmp_path / "log.csv")
    logger = CSVLogger(path)
    logger.log({"step": 0, "loss": 1.0})
    logger.log({"step": 1, "loss": 0.5, "extra": 9})   # extra ignored
    logger.log({"step": 2})                             # missing → blank
    with open(path) as f:
        rows = list(csv.DictReader(f))
    assert [r["step"] for r in rows] == ["0", "1", "2"]
    assert rows[1]["loss"] == "0.5"
    assert rows[2]["loss"] == ""
    # reopening appends with the discovered header
    CSVLogger(path).log({"step": 3, "loss": 0.1})
    with open(path) as f:
        assert len(list(csv.DictReader(f))) == 4


def test_emb_tags():
    assert make_emb_tag(True, True) == "emb"
    assert make_emb_tag(True, False) == "tempemb"
    assert make_emb_tag(False, True) == "metaemb"
    assert make_emb_tag(False, False) == "noemb"
    NullTracker().log({"x": 1})  # no-op
