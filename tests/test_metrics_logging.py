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


class CaptureTracker:
    """Records every tracker call — asserts the W&B parity call sites fire."""

    def __init__(self):
        self.rows, self.images, self.tables = [], [], []

    def log(self, row, step=None):
        self.rows.append((dict(row), step))

    def log_image(self, key, image_path, step=None):
        self.images.append((key, image_path, step))

    def log_table(self, key, dataframe, step=None):
        self.tables.append((key, dataframe, step))

    def finish(self):
        pass


def test_tracker_image_and_table_call_sites(tmp_path):
    """All three reference W&B media call sites fire through the Tracker
    protocol: training prediction plots (src/train.py:266-280), evaluation
    summary tables (test/evaluate.py:314-359), sensitivity figures
    (test/metadata_sensitivity.py:685-712)."""
    import os

    from maunet_tpu.analysis.sensitivity import run_sensitivity
    from maunet_tpu.config import Config
    from maunet_tpu.data.synthetic import generate_dataset
    from maunet_tpu.evaluate.evaluator import evaluate_checkpoint
    from maunet_tpu.train.loop import Trainer

    data = generate_dataset(str(tmp_path / "d"),
                            {"train": 4, "val": 2, "test": 4},
                            hw=32, temporal_len=64)
    cfg = Config().with_overrides(**{
        "training.batch_size": 2, "training.base_filters": 2,
        "training.temporal_dim": 2, "training.meta_dim": 2,
        "training.lstm_hidden": 4, "training.compute_dtype": "float32",
        "training.loss": "mse", "dataset.temporal_length": 64,
        "logging.frequency_plt": 1,  # plot every step
    })
    cap = CaptureTracker()
    trainer = Trainer(cfg, data_dir=data, work_dir=str(tmp_path / "w"),
                      study_name="cap", use_mesh=False, trackers=[cap])
    trainer.train(epochs=1)
    assert any(k == "train/predictions" for k, _, _ in cap.images), cap.images
    for _, png, _ in cap.images:
        assert os.path.exists(png)

    ckpt = str(tmp_path / "w" / "cap_trial_0_best")
    evaluate_checkpoint(ckpt, cfg, data_dir=data,
                        output_dir=str(tmp_path / "ev"),
                        precision="float32", trackers=[cap])
    assert any(k == "evaluation/summary" for k, _, _ in cap.tables)
    table = next(df for k, df, _ in cap.tables if k == "evaluation/summary")
    assert {"mae", "rmse", "channel"} <= set(table.columns)

    import glob

    eval_csv = glob.glob(str(tmp_path / "ev" / "*_evaluation.csv"))[0]
    run_sensitivity(ckpt, eval_csv, cfg, data_dir=data,
                    output_dir=str(tmp_path / "sens"), max_samples=4,
                    trackers=[cap])
    sens_imgs = [p for k, p, _ in cap.images if k.startswith("sensitivity/")]
    assert sens_imgs
    for p in sens_imgs:
        assert p.endswith(".png") and os.path.exists(p), p
