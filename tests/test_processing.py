"""Data acquisition/processing layer tests (hermetic — synthetic .npy tiles,
synthetic CRU cube; no GEE / rasterio / xarray needed)."""

import os

import numpy as np
import pandas as pd
import pytest

from maunet_tpu.config import Config
from maunet_tpu.data.acquisition import (
    acquisition_moments,
    cleanup_partial_exports,
    interleave_cities,
    tile_basename,
)
from maunet_tpu.data.dataset import NpzDataset
from maunet_tpu.data.processing import (
    build_sample_list,
    filter_subset,
    process_future_data,
)
from maunet_tpu.data.split import train_test_val_split
from maunet_tpu.data.temperature import TemperatureQuery, write_cube
from maunet_tpu.data.tiles import (
    group_files_by_location_and_time,
    one_hot_encode,
    parse_tile_filename,
)

HW = 24


def _write_raw_tiles(image_dir, rng, cities, years=(2019, 2023, 2024, 2025)):
    """Synthetic raw tiles (.npy) following the acquisition naming scheme,
    with guaranteed land-cover change between timestamps."""
    os.makedirs(image_dir, exist_ok=True)
    for city, cid, lat, lon in cities:
        base = tile_basename(city, cid, lat, lon, 0.0, 0.0)
        for i, year in enumerate(years):
            dw = np.full((HW, HW), 1, np.float32)
            dw[: HW // 2] = (i + 1) % 9  # large class change between years
            np.save(f"{image_dir}/{base}_{year}_07_dw.npy", dw)
            np.save(f"{image_dir}/{base}_{year}_07_rgb.npy",
                    rng.uniform(0, 255, size=(3, HW, HW)).astype(np.float32))
            np.save(f"{image_dir}/{base}_{year}_07_ndvi.npy",
                    rng.uniform(-1, 1, size=(HW, HW)).astype(np.float32))
            np.save(f"{image_dir}/{base}_{year}_07_temp.npy",
                    rng.uniform(10, 45, size=(HW, HW)).astype(np.float32))


@pytest.fixture()
def raw_env(tmp_path, rng):
    cities = [("rome", 1, 41.9, 12.5), ("lagos", 2, 6.5, 3.4),
              ("lyon", 3, 45.7, 4.8)]
    image_dir = str(tmp_path / "raw_tiles")
    _write_raw_tiles(image_dir, rng, cities)

    temp_dir = str(tmp_path / "temperature" / "processed")
    n_months = (2025 - 1951 + 1) * 12
    cube = rng.normal(size=(n_months, 8, 12)).astype(np.float32)
    write_cube(temp_dir, cube, lats=np.linspace(-60, 70, 8),
               lons=np.linspace(-180, 180, 12), start_year=1951)

    cities_csv = str(tmp_path / "worldcities_processed.csv")
    pd.DataFrame({"city": [c[0] for c in cities], "lat": [c[2] for c in cities],
                  "lng": [c[3] for c in cities],
                  "population": [2.8e6, 1.4e7, 5e5],
                  "id": [c[1] for c in cities]}).to_csv(cities_csv, index=False)
    return tmp_path, image_dir, temp_dir, cities_csv


def test_acquisition_moments():
    moments = acquisition_moments()
    assert moments[0] == (2017, 7)
    assert moments[-1] == (2025, 9)
    assert len(moments) == 50
    assert all(m % 2 == 1 for _, m in moments)


def test_interleave_cities():
    df = pd.DataFrame({
        "city": list("abcde"), "lat": range(5), "lng": range(5),
        "population": [9e6, 8e6, 7e6, 60_000, 10_000], "id": range(5)})
    out = interleave_cities(df, min_population=50_000)
    assert len(out) == 4  # population filter drops 'e'
    assert out.iloc[0]["population"] == 9e6
    assert out.iloc[1]["population"] == 60_000  # biggest/smallest interleave


def test_tile_filename_roundtrip_and_grouping(raw_env):
    _, image_dir, _, _ = raw_env
    files = os.listdir(image_dir)
    meta = parse_tile_filename(sorted(files)[0])
    assert meta["type"] in ("dw", "rgb", "ndvi", "temp")
    assert meta["year"] in (2019, 2023, 2024, 2025)
    locations = group_files_by_location_and_time(image_dir)
    assert len(locations) == 3
    loc = next(iter(locations.values()))
    assert len(loc["timestamps"]) == 4
    assert set(next(iter(loc["timestamps"].values()))) == {"dw", "rgb", "ndvi", "temp"}
    assert parse_tile_filename("garbage.tif") is None


def test_cleanup_partial_exports(tmp_path):
    for t in ("dw", "rgb"):
        (tmp_path / f"x_{t}.tif").write_bytes(b"0")
    cleanup_partial_exports(str(tmp_path), "x", ["dw", "rgb"])
    assert not os.listdir(tmp_path)


def test_one_hot_encode():
    img = np.array([[0, 4], [8, 1]])
    oh = one_hot_encode(img)
    assert oh.shape == (9, 2, 2)
    np.testing.assert_array_equal(oh.sum(0), 1)
    assert oh[4, 0, 1] == 1 and oh[8, 1, 0] == 1


def test_temperature_query_truncation(raw_env):
    _, _, temp_dir, _ = raw_env
    q = TemperatureQuery(temp_dir)
    series = q.query(41.9, 12.5, 1952, 3)
    assert len(series) == 15  # 12 months of 1951 + Jan-Mar 1952
    full = q.query(41.9, 12.5, 2030, 12)
    assert len(full) == q.data.shape[0]
    batch = q.query_batch(np.array([41.9, 6.5]), np.array([12.5, 3.4]), 1952, 3)
    assert batch.shape == (2, 15)
    np.testing.assert_allclose(batch[0], series)


def test_split_policy_seeded():
    samples = [{"city_id": cid, "t2_year": year}
               for cid in range(200) for year in (2023, 2024, 2025)]
    tr1, va1, te1 = train_test_val_split(samples, holdout_ratio=0.05, seed=7)
    tr2, va2, te2 = train_test_val_split(samples, holdout_ratio=0.05, seed=7)
    assert [s["city_id"] for s in te1] == [s["city_id"] for s in te2]
    holdout_cities = {s["city_id"] for s in te1 if s["t2_year"] == 2023}
    assert len(holdout_cities) == 10  # 5% of 200
    assert all(s["t2_year"] == 2024 for s in va1)
    assert not any(s["city_id"] in holdout_cities for s in tr1)


def test_process_future_data_end_to_end(raw_env):
    tmp_path, image_dir, temp_dir, cities_csv = raw_env
    out_dir = str(tmp_path / "processed")
    cfg = Config().with_overrides(**{
        "paths.data_root": str(tmp_path),
        "dataset.image_shape_edge": HW,
    })
    result = process_future_data(
        cfg, image_dir=image_dir, output_dir=out_dir, cities_csv=cities_csv,
        target_shape=(HW, HW))
    assert result == out_dir
    assert os.path.exists(os.path.join(out_dir, "normalization_metrics.json"))
    train_ds = NpzDataset(os.path.join(out_dir, "train"), temporal_length=900)
    test_ds = NpzDataset(os.path.join(out_dir, "test"), temporal_length=900)
    assert len(train_ds) > 0 and len(test_ds) > 0
    s = train_ds[0]
    assert s["maps"].shape == (HW, HW, 23)
    assert s["targets"].shape == (HW, HW, 2)
    np.testing.assert_allclose(s["maps"][..., :9].sum(-1), 1.0)
    # idempotent restart: second run writes nothing new
    n_before = len(os.listdir(os.path.join(out_dir, "train")))
    process_future_data(cfg, image_dir=image_dir, output_dir=out_dir,
                        cities_csv=cities_csv, target_shape=(HW, HW))
    assert len(os.listdir(os.path.join(out_dir, "train"))) == n_before


def test_visualize_raw_tiles(raw_env, tmp_path):
    from maunet_tpu.analysis.tile_viz import visualize_raw_tiles

    _, image_dir, _, _ = raw_env
    out = visualize_raw_tiles(image_dir, out_path=str(tmp_path / "grid.png"),
                              edge=HW)
    assert os.path.exists(out)


def test_multihost_helpers():
    from maunet_tpu.parallel.multihost import (
        host_local_batch_slice,
        initialize_multihost,
    )

    initialize_multihost()  # single-process no-op
    s = host_local_batch_slice(16)
    assert s == slice(0, 16)  # single process owns the whole batch


def test_filter_subset_drops_unchanged(raw_env, rng, tmp_path):
    _, image_dir, _, cities_csv = raw_env
    # build an unchanged pair: identical tiles at two timestamps
    static_dir = str(tmp_path / "static_tiles")
    os.makedirs(static_dir)
    base = tile_basename("pisa", 9, 43.7, 10.4, 0.0, 0.0)
    dw = np.ones((HW, HW), np.float32)
    ndvi = rng.uniform(-1, 1, (HW, HW)).astype(np.float32)
    temp = rng.uniform(10, 45, (HW, HW)).astype(np.float32)
    for year in (2019, 2020):
        np.save(f"{static_dir}/{base}_{year}_07_dw.npy", dw)
        np.save(f"{static_dir}/{base}_{year}_07_rgb.npy",
                rng.uniform(0, 255, (3, HW, HW)).astype(np.float32))
        np.save(f"{static_dir}/{base}_{year}_07_ndvi.npy", ndvi)
        np.save(f"{static_dir}/{base}_{year}_07_temp.npy", temp)
    samples = build_sample_list(static_dir, {})
    assert len(samples) == 1
    kept = filter_subset(samples, (HW, HW), "static")
    assert kept == []
