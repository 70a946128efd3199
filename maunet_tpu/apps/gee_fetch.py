"""Live single-location satellite fetch for the planner app.

Capability parity with reference app/gee_utils.py:40-201: DW mode-composite,
Sentinel-2 median RGB + NDVI, Landsat-8 mean LST → °C over a 2×2 km box in a
60-day window, exported and resized to the serving resolution.  Requires
``ee``/``geemap`` (host-only, network-bound).
"""

from __future__ import annotations

import os

import numpy as np

from maunet_tpu.utils.logging import get_logger

log = get_logger(__name__)


def get_satellite_data(lat: float, lon: float, year: int, month: int,
                       cache_dir: str, img_size: int = 512) -> dict[str, np.ndarray]:
    """Fetch the four t1 layers for one location → arrays at img_size²:
    {'dw': (H,W) classes, 'rgb': (3,H,W) 0-255, 'ndvi': (H,W), 'temp': (H,W) °C}.
    """
    import ee
    import geemap

    from maunet_tpu.data.acquisition import _init_ee
    from maunet_tpu.data.tiles import load_and_resize_image, load_and_resize_rgb

    _init_ee()
    os.makedirs(cache_dir, exist_ok=True)
    point = ee.Geometry.Point((lon, lat))
    region = point.buffer(1000).bounds()
    start = ee.Date.fromYMD(year, month, 1)
    end = start.advance(60, "days")

    dw = (ee.ImageCollection("GOOGLE/DYNAMICWORLD/V1")
          .filterBounds(region).filterDate(start, end))
    s2 = (ee.ImageCollection("COPERNICUS/S2_HARMONIZED")
          .filter(ee.Filter.lt("CLOUDY_PIXEL_PERCENTAGE", 20))
          .filterBounds(region).filterDate(start, end))
    l8 = (ee.ImageCollection("LANDSAT/LC08/C02/T1_L2")
          .filterBounds(region).filterDate(start, end))

    if min(dw.size().getInfo(), s2.size().getInfo(), l8.size().getInfo()) == 0:
        raise RuntimeError("No imagery available for this location/date.")

    exports = {
        "dw": (dw.select("label").mode(), 10),
        "rgb": (s2.select(["B4", "B3", "B2"]).median()
                .visualize(min=0, max=3000, bands=["B4", "B3", "B2"]), 10),
        "ndvi": (s2.median().normalizedDifference(["B8", "B4"]).rename("NDVI"), 10),
        "temp": (l8.select("ST_B10").mean()
                 .multiply(0.00341802).add(149.0).subtract(273.15), 30),
    }
    layers: dict[str, np.ndarray] = {}
    shape = (img_size, img_size)
    for kind, (image, scale) in exports.items():
        path = os.path.join(cache_dir, f"fetched_{kind}.tif")
        geemap.ee_export_image(image.clip(region), filename=path, scale=scale,
                               region=region, file_per_band=False)
        if not os.path.exists(path):
            raise RuntimeError(f"Export of {kind} failed.")
        if kind == "rgb":
            layers[kind] = load_and_resize_rgb(path, shape)
        else:
            layers[kind] = load_and_resize_image(path, shape, nearest=(kind == "dw"))
    return layers


def make_synthetic_cache(cache_dir: str, img_size: int = 512,
                         seed: int = 0) -> dict[str, np.ndarray]:
    """Write synthetic demo layers (the reference bundles real Rome tiles in
    app/cache; we fabricate structurally-faithful ones so the planner runs
    with zero network access)."""
    from maunet_tpu.data.synthetic import _dw_map, _smooth_field

    rng = np.random.default_rng(seed)
    os.makedirs(cache_dir, exist_ok=True)
    dw = _dw_map(rng, img_size).astype(np.float32)
    green = np.isin(dw, [1, 2, 3, 4, 5]).astype(np.float32)
    layers = {
        "dw": dw,
        "rgb": np.clip(np.stack([_smooth_field(rng, img_size) * 60 + 110
                                 for _ in range(3)]), 0, 255).astype(np.float32),
        "ndvi": np.clip(0.25 + 0.5 * green + 0.15 * _smooth_field(rng, img_size),
                        -1, 1).astype(np.float32),
        "temp": (32.0 - 8.0 * green
                 + 3.0 * _smooth_field(rng, img_size)).astype(np.float32),
    }
    for kind, arr in layers.items():
        np.save(os.path.join(cache_dir, f"fetched_{kind}.npy"), arr)
    log.info(f"Synthetic demo cache written to {cache_dir}")
    return layers


def load_cached_layers(cache_dir: str, img_size: int = 512) -> dict[str, np.ndarray]:
    """Offline fallback: load previously fetched/bundled tiles (the reference
    bundles Rome tiles in app/cache, Home.py:50-126)."""
    from maunet_tpu.data.tiles import load_and_resize_image, load_and_resize_rgb

    shape = (img_size, img_size)
    layers = {}
    for kind in ("dw", "rgb", "ndvi", "temp"):
        for ext in (".tif", ".npy"):
            path = os.path.join(cache_dir, f"fetched_{kind}{ext}")
            if os.path.exists(path):
                if kind == "rgb":
                    layers[kind] = load_and_resize_rgb(path, shape)
                else:
                    layers[kind] = load_and_resize_image(
                        path, shape, nearest=(kind == "dw"))
                break
        else:
            from maunet_tpu.apps.planner_core import DEMO_CACHE, load_demo_layers

            if os.path.exists(DEMO_CACHE):
                log.info(f"No cached {kind} tile in {cache_dir}; using the "
                         "bundled demo tiles (reference bundles Rome tiles "
                         "in app/cache, Home.py:50-126).")
                return load_demo_layers(img_size)
            log.warning(f"No cached {kind} tile in {cache_dir}; "
                        "generating a synthetic demo cache.")
            return make_synthetic_cache(cache_dir, img_size)
    return layers
