"""Google Earth Engine batch acquisition.

Capability parity with reference src/data/parallel_dataset.py +
src/data/gee_functions_future.py: an 8-process pool splits the city list
into chunks; per city × 5 spatial offsets (±0.02°) × bi-monthly moments
2017-07 → 2025-09, four GeoTIFFs (dw / rgb / ndvi / temp) are exported over
a 2×2 km box at 10 m (30 m LST), with validity gating (≥90% valid DW pixels,
<10% cloud filters) and cascading cleanup of partial exports.

All pure logic (moments, offsets, city interleaving, naming, cleanup policy)
is importable and tested without Earth Engine; the ``ee``/``geemap`` calls
live behind ``_export_moment`` and require those packages (host-only,
network-bound — never part of CI; SURVEY.md §7 risks).
"""

from __future__ import annotations

import os
from multiprocessing import Pool

import numpy as np
import pandas as pd

from maunet_tpu.utils.logging import get_logger

log = get_logger(__name__)

OFFSETS = ((-0.02, 0.0), (0.02, 0.0), (0.0, -0.02), (0.0, 0.02), (0.0, 0.0))
VALID_PIXEL_THRESHOLD = 0.9
CLOUD_COVER_MAX = 10
BUFFER_METERS = 1000
EXPORT_TYPES = ("dw", "rgb", "ndvi", "temp")


def acquisition_moments(year_min: int = 2017, year_max: int = 2025,
                        month_min: int = 7, month_max: int = 9) -> list[tuple[int, int]]:
    """Bi-monthly (year, month) moments 2017-07 → 2025-09
    (reference gee_functions_future.py:91-101)."""
    moments = []
    for year in range(year_min, year_max + 1):
        for month in range(1, 13, 2):
            if (year == year_min and month < month_min) or \
               (year == year_max and month > month_max):
                continue
            moments.append((year, month))
    return moments


def interleave_cities(df: pd.DataFrame, min_population: int = 50_000) -> pd.DataFrame:
    """Filter by population and interleave biggest/smallest cities so every
    chunk gets a size mix (reference gee_functions_future.py:51-63)."""
    df = df[["city", "lat", "lng", "population", "id"]]
    df = df[df["population"] >= min_population].dropna()
    df = df.sort_values("population", ascending=False).reset_index(drop=True)
    n = len(df)
    rows = []
    for i in range(n // 2):
        rows.append(df.iloc[i])
        rows.append(df.iloc[-(i + 1)])
    if n % 2 == 1:
        rows.append(df.iloc[n // 2])
    return pd.DataFrame(rows).reset_index(drop=True)


def load_cities(raw_csv: str, processed_csv: str, min_population: int = 50_000,
                force: bool = False) -> pd.DataFrame:
    """(reference gee_functions_future.py:32-69)"""
    if not os.path.exists(raw_csv):
        raise FileNotFoundError(
            f"Raw city data not found — place SimpleMaps 'worldcities.csv' at {raw_csv}")
    if not force and os.path.exists(processed_csv):
        return pd.read_csv(processed_csv)
    result = interleave_cities(pd.read_csv(raw_csv), min_population)
    os.makedirs(os.path.dirname(processed_csv), exist_ok=True)
    result.to_csv(processed_csv, index=False)
    log.info(f"Processed city list → {processed_csv} ({len(result)} cities)")
    return result


def tile_basename(city_name: str, city_id, lat: float, lng: float,
                  offset_x: float, offset_y: float) -> str:
    return (f"{city_name.lower().replace(' ', '_')}_{city_id}_"
            f"{lat:.4f}_{lng:.4f}_{offset_x:.4f}_{offset_y:.4f}")


def cleanup_partial_exports(output_dir: str, name: str, done_types: list[str]) -> None:
    """Cascading deletion so the dataset never holds incomplete samples
    (reference gee_functions_future.py:179-232)."""
    for t in done_types:
        path = os.path.join(output_dir, f"{name}_{t}.tif")
        if os.path.exists(path):
            os.remove(path)


def _init_ee():
    import ee

    service_account = os.getenv("GEE_SERVICE_ACCOUNT")
    try:
        ee.Initialize(project=os.getenv("GEE_PROJECT_ID"))
    except Exception:
        credentials = ee.ServiceAccountCredentials(service_account, ".private-key.json")
        ee.Initialize(credentials)
    return ee


def _export_moment(ee, geemap, region, name: str, year: int, month: int,
                   output_dir: str) -> bool:
    """Export the 4 layers for one (location, moment); returns success
    (reference gee_functions_future.py:117-232)."""

    def apply_scale_landsat(image):
        optical = image.select("SR_B.*").multiply(0.0000275).add(-0.2)
        thermal = image.select("ST_B.*").multiply(0.00341802).add(149.0)
        return image.addBands(optical, overwrite=True).addBands(thermal, overwrite=True)

    def mask_l8_clouds(image):
        qa = image.select("QA_PIXEL")
        mask = (qa.bitwiseAnd(1 << 3).eq(0)
                .And(qa.bitwiseAnd(1 << 5).eq(0)))
        return image.updateMask(mask)

    start = ee.Date.fromYMD(year, month, 1)
    end = start.advance(30, "days")
    dw = (ee.ImageCollection("GOOGLE/DYNAMICWORLD/V1")
          .filterBounds(region).filterDate(start, end))
    l8 = (ee.ImageCollection("LANDSAT/LC08/C02/T1_L2")
          .map(apply_scale_landsat)
          .filter(ee.Filter.lt("CLOUD_COVER_LAND", CLOUD_COVER_MAX))
          .filterDate(start, end).filterBounds(region).map(mask_l8_clouds))
    s2 = (ee.ImageCollection("COPERNICUS/S2_HARMONIZED")
          .filter(ee.Filter.lt("CLOUDY_PIXEL_PERCENTAGE", CLOUD_COVER_MAX))
          .filterDate(start, end).filterBounds(region))

    if dw.size().getInfo() == 0 or s2.size().getInfo() == 0 or l8.size().getInfo() == 0:
        return False

    linked = dw.linkCollection(s2, s2.first().bandNames())
    dw_mean = linked.select("label").mean()
    valid_fraction = dw_mean.mask().reduceRegion(
        reducer=ee.Reducer.mean(), geometry=region, scale=10,
        maxPixels=1e13).get("label").getInfo()
    if valid_fraction is None or valid_fraction < VALID_PIXEL_THRESHOLD:
        return False

    exports = [
        ("dw", dw_mean, 10),
        ("rgb", linked.select(["B4", "B3", "B2"]).mean()
         .visualize(min=0, max=3000, bands=["B4", "B3", "B2"]), 10),
        ("ndvi", linked.median().normalizedDifference(["B8", "B4"]).rename("NDVI"), 10),
        ("temp", l8.select("ST_B10").mean().subtract(273.15), 30),
    ]
    done = []
    for kind, image, scale in exports:
        path = os.path.join(output_dir, f"{name}_{kind}.tif")
        geemap.ee_export_image(image.clip(region), filename=path, scale=scale,
                               region=region, file_per_band=False)
        if not os.path.exists(path):
            log.warning(f"Failed to export {kind} for {name}; cleaning up.")
            cleanup_partial_exports(output_dir, name, done)
            return False
        done.append(kind)
    return True


def process_city_chunk(args) -> int:
    """Pool worker: per-worker EE init, then city × offset × moment loop
    (reference gee_functions_future.py:71-235)."""
    chunk_id, cities_chunk, output_dir = args
    try:
        import geemap

        ee = _init_ee()
    except Exception as e:
        log.error(f"[chunk {chunk_id}] Earth Engine unavailable: {e}")
        return 0

    exported = 0
    moments = acquisition_moments()
    for city_name, lat_src, lng_src, _pop, city_id in cities_chunk.to_numpy():
        for offset_x, offset_y in OFFSETS:
            lat, lng = lat_src + offset_y, lng_src + offset_x
            base = tile_basename(city_name, city_id, lat, lng, offset_x, offset_y)
            region = ee.Geometry.Point((lng, lat)).buffer(BUFFER_METERS).bounds()
            for year, month in moments:
                name = f"{base}_{year}_{month:02d}"
                try:
                    if _export_moment(ee, geemap, region, name, year, month,
                                      output_dir):
                        exported += 1
                except Exception as e:
                    log.warning(f"Export failed for {name}: {e}")
    return exported


def run_acquisition(cfg, raw_cities_csv: str | None = None,
                    n_workers: int = 8) -> None:
    """Entry point (reference src/data/parallel_dataset.py:11-63)."""
    output_dir = cfg.paths.image_dataset
    os.makedirs(output_dir, exist_ok=True)
    raw = raw_cities_csv or os.path.join(cfg.paths.data_root, "raw", "cities",
                                         "worldcities.csv")
    cities = load_cities(raw, cfg.paths.cities_csv, cfg.dataset.min_population)
    chunks = np.array_split(cities, n_workers)
    args = [(i, chunk, output_dir) for i, chunk in enumerate(chunks)]
    with Pool(n_workers) as pool:
        counts = pool.map(process_city_chunk, args)
    log.success(f"Acquisition finished: {sum(counts)} tile sets exported.")
