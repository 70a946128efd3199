"""Packed-shard dataset tests."""

import numpy as np
import pytest

from maunet_tpu.data.dataset import NpzDataset, make_batches
from maunet_tpu.data.shards import ShardedNpzDataset, pack_dataset
from maunet_tpu.data.synthetic import generate_dataset


@pytest.fixture(scope="module")
def roots(tmp_path_factory):
    src = tmp_path_factory.mktemp("synth_shard")
    generate_dataset(str(src), {"train": 11, "val": 1, "test": 1},
                     hw=32, temporal_len=64)
    packed = tmp_path_factory.mktemp("packed")
    pack_dataset(f"{src}/train", str(packed), shard_size=4, temporal_length=64)
    return str(src), str(packed)


def test_pack_and_equivalence(roots):
    src, packed = roots
    ds = NpzDataset(f"{src}/train", temporal_length=64)
    sds = ShardedNpzDataset(packed)
    assert len(sds) == len(ds) == 11
    for i in (0, 3, 4, 10):  # shard boundaries and tail
        a, b = ds[i], sds[i]
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=f"{i}/{k}")
        assert ds.get_metadata_from_idx(i) == sds.get_metadata_from_idx(i)


def test_sharded_batching_and_truncation(roots):
    _, packed = roots
    sds = ShardedNpzDataset(packed, temporal_length=32)
    batch = next(make_batches(sds, 4))
    assert batch.temp_series.shape == (4, 32)
    assert batch.temp_lengths.max() <= 32
    with pytest.raises(ValueError):
        ShardedNpzDataset(packed, temporal_length=128)


def test_cli_pack_and_trainer_on_shards(roots, tmp_path):
    """CLI pack → Trainer + evaluator consume the packed splits
    transparently via open_split."""
    src, _ = roots
    from maunet_tpu.cli import main

    out = str(tmp_path / "packed_ds")
    rc = main(["pack", src, "--out-dir", out, "--shard-size", "4",
               "-o", "dataset.temporal_length=64"])
    assert rc == 0
    import os

    assert os.path.exists(f"{out}/train/shard_00000.npz")
    assert os.path.exists(f"{out}/normalization_metrics.json")

    from maunet_tpu.config import Config
    from maunet_tpu.train.loop import Trainer

    cfg = Config().with_overrides(**{
        "training.batch_size": 4, "training.base_filters": 4,
        "training.temporal_dim": 4, "training.meta_dim": 4,
        "training.lstm_hidden": 8, "training.compute_dtype": "float32",
        "training.loss": "mse", "dataset.temporal_length": 64,
    })
    trainer = Trainer(cfg, data_dir=out, work_dir=str(tmp_path / "work"),
                      study_name="packed", use_mesh=False)
    result = trainer.train(epochs=1)
    assert np.isfinite(result.best_val_loss)


def test_sharded_sequential_read_correct(roots):
    """Sequential reads through the shard cache return the same samples as
    per-file reads on every pass (exercises the per-shard LRU reuse path).

    Read *speed* is a benchmark concern, not a test assert — see
    maunet_tpu/benchmarks.py (the old wall-clock assert here flaked on
    the 1-core CI host)."""
    src, packed = roots
    ds = NpzDataset(f"{src}/train", temporal_length=64)
    sds = ShardedNpzDataset(packed)

    for _ in range(2):  # second pass hits the warm shard cache
        for i in range(len(ds)):
            a, b = ds[i], sds[i]
            for k in a:
                np.testing.assert_array_equal(a[k], b[k], err_msg=f"{i}/{k}")


def test_compressed_shard_fallback(tmp_path, rng):
    """Foreign shards written with savez_compressed can't be memory-mapped;
    the eager whole-shard decode fallback must serve identical data."""
    import json

    from maunet_tpu.data.shards import INDEX_FILE, ShardedNpzDataset

    n, hw, t = 3, 8, 16
    arrays = dict(
        inputs=rng.normal(size=(n, 23, hw, hw)).astype(np.float32),
        targets=rng.normal(size=(n, 2, hw, hw)).astype(np.float32),
        metadata=rng.normal(size=(n, 4)).astype(np.float32),
        series=rng.normal(size=(n, t)).astype(np.float32),
        lengths=np.full((n,), t, np.int32),
        t1_dates=np.tile([2020.0, 6.0], (n, 1)).astype(np.float32),
        t2_dates=np.tile([2023.0, 6.0], (n, 1)).astype(np.float32),
    )
    np.savez_compressed(tmp_path / "shard_00000.npz", **arrays)
    names = [f"city{i}_10.0_20.0_2020_6_2023_6.npz" for i in range(n)]
    with open(tmp_path / INDEX_FILE, "w") as f:
        json.dump({"shard_size": n, "temporal_length": t,
                   "shards": ["shard_00000.npz"], "names": names}, f)

    ds = ShardedNpzDataset(str(tmp_path))
    for i in range(n):
        s = ds[i]
        np.testing.assert_array_equal(
            s["maps"], arrays["inputs"][i].transpose(1, 2, 0))
        np.testing.assert_array_equal(s["temp_series"], arrays["series"][i])
