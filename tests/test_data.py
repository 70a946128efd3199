"""Data layer tests: schema codec, synthetic fixtures, batching, pipeline."""

import numpy as np
import pytest

from maunet_tpu.data import (
    NpzDataset,
    RandomFlip,
    make_batches,
    make_sample_filename,
    parse_sample_filename,
    prefetch_to_device,
)
from maunet_tpu.data.schema import NormalizationStats
from maunet_tpu.data.synthetic import generate_dataset


@pytest.fixture(scope="module")
def synthetic_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    return generate_dataset(str(root), {"train": 10, "val": 4, "test": 5},
                            hw=32, temporal_len=96)


def test_filename_codec_roundtrip():
    name = make_sample_filename("New York", 77, 40.7128, -74.006, 2019, 7, 2023, 9)
    info = parse_sample_filename(name)
    assert info["city"] == "New York"
    assert info["lat"] == pytest.approx(40.7128)
    assert info["lon"] == pytest.approx(-74.006)
    assert (info["t1_year"], info["t1_month"]) == (2019, 7)
    assert (info["t2_year"], info["t2_month"]) == (2023, 9)


def test_normalization_stats_roundtrip(tmp_path):
    stats = NormalizationStats((0.1, 0.2, 0.3), (1.0, 1.1, 1.2), 30.0, 5.0,
                               (1, 2, 3, 4), (5, 6, 7, 8), 0.0, 1.0)
    p = str(tmp_path / "normalization_metrics.json")
    stats.to_json(p)
    assert NormalizationStats.from_json(p) == stats


def test_dataset_shapes(synthetic_root):
    ds = NpzDataset(f"{synthetic_root}/train", temporal_length=96)
    assert len(ds) == 10
    s = ds[0]
    assert s["maps"].shape == (32, 32, 23)
    assert s["targets"].shape == (32, 32, 2)
    assert s["metadata"].shape == (4,)
    assert s["temp_series"].shape == (96,)
    assert 0 < s["temp_lengths"] <= 96
    # one-hot DW channels sum to 1 everywhere
    np.testing.assert_allclose(s["maps"][..., :9].sum(-1), 1.0)
    np.testing.assert_allclose(s["maps"][..., 14:].sum(-1), 1.0)
    info = ds.get_metadata_from_idx(0)
    assert set(info) == {"city", "lat", "lon"}


def test_batching_fixed_shapes_and_padding(synthetic_root):
    ds = NpzDataset(f"{synthetic_root}/train", temporal_length=96)
    batches = list(make_batches(ds, batch_size=4))
    assert len(batches) == 3  # 10 samples → 4+4+2(padded)
    for b in batches:
        assert b.maps.shape == (4, 32, 32, 23)
        assert b.temp_series.shape == (4, 96)
        assert b.metadata_full.shape == (4, 8)
    assert batches[-1].valid.tolist() == [True, True, False, False]
    assert sum(b.valid.sum() for b in batches) == 10

    dropped = list(make_batches(ds, batch_size=4, drop_last=True))
    assert len(dropped) == 2


def test_batch_shuffle_is_seeded_and_epoch_keyed(synthetic_root):
    ds = NpzDataset(f"{synthetic_root}/train", temporal_length=96)
    a = next(make_batches(ds, 4, shuffle=True, seed=1, epoch=0)).sample_idx
    b = next(make_batches(ds, 4, shuffle=True, seed=1, epoch=0)).sample_idx
    c = next(make_batches(ds, 4, shuffle=True, seed=1, epoch=1)).sample_idx
    assert a.tolist() == b.tolist()
    assert a.tolist() != c.tolist()


def test_random_flip_seeded():
    x = np.arange(2 * 3 * 2, dtype=np.float32).reshape(2, 3, 2)
    y = x[..., :1].copy()
    f1, f2 = RandomFlip(seed=7), RandomFlip(seed=7)
    outs1 = [f1(x, y)[0].tolist() for _ in range(8)]
    outs2 = [f2(x, y)[0].tolist() for _ in range(8)]
    assert outs1 == outs2
    assert any(o != x.tolist() for o in outs1)
    fx, fy = None, None
    rf = RandomFlip(seed=1)
    for _ in range(16):
        fx, fy = rf(x, y)
        if fx.tolist() != x.tolist():
            break
    np.testing.assert_array_equal(fx, x[:, ::-1, :])
    np.testing.assert_array_equal(fy, y[:, ::-1, :])


def test_prefetch_to_device(synthetic_root):
    ds = NpzDataset(f"{synthetic_root}/val", temporal_length=96)
    batches = list(prefetch_to_device(make_batches(ds, 2)))
    assert len(batches) == 2
    assert batches[0]["maps"].shape == (2, 32, 32, 23)

    def boom():
        yield from make_batches(ds, 2)
        raise RuntimeError("loader failed")

    with pytest.raises(RuntimeError, match="loader failed"):
        list(prefetch_to_device(boom()))


def test_prefetch_abandoned_consumer_releases_worker(synthetic_root):
    """Abandoning the generator mid-epoch (train step raised, HPO moved on)
    must stop the worker thread instead of leaving it blocked on the full
    queue holding device batches alive."""
    import threading
    import time

    ds = NpzDataset(f"{synthetic_root}/val", temporal_length=96)

    def endless():
        while True:
            yield from make_batches(ds, 2)

    before = set(threading.enumerate())
    it = prefetch_to_device(endless(), buffer_size=1)
    next(it)
    workers = [t for t in threading.enumerate() if t not in before]
    assert workers
    it.close()  # consumer abandons mid-stream
    deadline = time.time() + 5.0
    while any(t.is_alive() for t in workers) and time.time() < deadline:
        time.sleep(0.05)
    assert not any(t.is_alive() for t in workers)
