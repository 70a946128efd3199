"""Serving-engine tests (streamlit-independent paths)."""

import numpy as np
import pytest

from reference_loader import make_reference_checkpoint, reference_available

from maunet_tpu.apps.engine import (
    CANVAS_RGB,
    DEFAULT_SERVING_STATS,
    PlannerEngine,
    canvas_to_dw_map,
)
from maunet_tpu.apps.research import architecture_diagram


def test_canvas_to_dw_map_palette_and_alpha():
    hw = (8, 8)
    rgba = np.zeros((8, 8, 4), np.uint8)
    # paint a "built" (class 6) square with full alpha
    rgba[:4, :4, :3] = CANVAS_RGB[6]
    rgba[:4, :4, 3] = 255
    original = np.full(hw, 2, np.uint8)  # grass everywhere
    out = canvas_to_dw_map(rgba, hw, original_map=original)
    assert (out[:4, :4] == 6).all()
    assert (out[4:, 4:] == 2).all()  # alpha=0 keeps original
    # approximate colors still snap to nearest class
    rgba[:4, :4, :3] = np.clip(CANVAS_RGB[6] + 10, 0, 255)
    out2 = canvas_to_dw_map(rgba, hw, original_map=original)
    assert (out2[:4, :4] == 6).all()


def test_architecture_diagram():
    text = architecture_diagram({"base_filters": 8, "temporal_embeddings": True,
                                 "metadata_embeddings": False})
    assert "LSTM" in text and "MLP" not in text
    assert "tanh" in text


def test_synthetic_demo_cache_roundtrip(tmp_path):
    from maunet_tpu.apps.gee_fetch import load_cached_layers

    cache = str(tmp_path / "cache")
    layers = load_cached_layers(cache, img_size=32)  # empty → synthesizes
    assert set(layers) == {"dw", "rgb", "ndvi", "temp"}
    assert layers["dw"].shape == (32, 32)
    assert layers["rgb"].shape == (3, 32, 32)
    # second call reads the files back through the tile readers
    layers2 = load_cached_layers(cache, img_size=32)
    np.testing.assert_allclose(layers2["ndvi"], layers["ndvi"], atol=1e-6)
    np.testing.assert_array_equal(layers2["dw"], layers["dw"])


@pytest.mark.skipif(not reference_available(), reason="reference tree not mounted")
def test_planner_engine_end_to_end(tmp_path, rng):
    ckpt = make_reference_checkpoint(str(tmp_path / "m.pth"))
    engine = PlannerEngine(str(tmp_path / "m.pth"), temporal_length=64,
                           img_size=32)
    hw = 32
    layers = {
        "dw": rng.integers(0, 9, size=(hw, hw)).astype(np.float32),
        "rgb": rng.uniform(0, 255, size=(3, hw, hw)).astype(np.float32),
        "ndvi": rng.uniform(-1, 1, size=(hw, hw)).astype(np.float32),
        "temp": rng.uniform(10, 45, size=(hw, hw)).astype(np.float32),
    }
    inp = engine.prepare_input(layers, None, 41.9, 12.5, 2_800_000,
                               2023, 7, 2025, 7)
    assert inp.maps.shape == (1, hw, hw, 23)
    assert inp.metadata.shape == (1, 8)
    ndvi, lst = engine.predict(inp)
    assert ndvi.shape == (hw, hw) and lst.shape == (hw, hw)
    assert np.abs(ndvi).max() <= 1.0
    # LST is in °C after denormalization
    assert np.isfinite(lst).all()

    # paint everything as trees → different prediction, cooling metric moves
    rgba = np.zeros((hw, hw, 4), np.uint8)
    rgba[..., :3] = CANVAS_RGB[1]
    rgba[..., 3] = 255
    inp2 = engine.prepare_input(layers, rgba, 41.9, 12.5, 2_800_000,
                                2023, 7, 2025, 7)
    ndvi2, lst2 = engine.predict(inp2)
    assert not np.allclose(lst, lst2)
    metric = engine.cooling_metric(lst, lst2)
    assert np.isfinite(metric)
    # DW t2 channels now one-hot trees everywhere
    assert (inp2.maps[0, :, :, 14 + 1] == 1).all()


def test_planner_core_data_mode_flow():
    """Credential-entry flow (reference app/Home.py:50-126): live only with
    project + (service account or key file); otherwise cache-only pinned to
    the bundled demo location."""
    from maunet_tpu.apps.planner_core import DEMO_LOCATION, resolve_data_mode

    assert resolve_data_mode("proj", "sa@x.iam").mode == "live"
    assert resolve_data_mode("proj", "", key_file_exists=True).mode == "live"
    for bad in (("", ""), ("proj", ""), ("", "sa@x.iam"), (None, None)):
        mode = resolve_data_mode(*bad)
        assert mode.mode == "cache"
        assert mode.defaults["lat"] == DEMO_LOCATION["lat"]
        assert "cache-only" in mode.reason


def test_planner_core_demo_cache_and_background():
    """The committed demo tiles load at serving resolution and colorize into
    the canvas paint background (reference app/Home.py:284-297: the canvas
    paints over the DW composite, not a blank image)."""
    import os

    from PIL import Image

    from maunet_tpu.apps.planner_core import (
        DEMO_CACHE,
        canvas_background,
        layer_views,
        load_demo_layers,
    )

    assert os.path.exists(DEMO_CACHE), "demo tiles must be committed"
    layers = load_demo_layers(256)
    assert layers["dw"].shape == (256, 256)
    assert layers["rgb"].shape == (3, 256, 256)
    assert set(np.unique(layers["dw"])) <= set(range(9))

    bg = canvas_background(layers["dw"])
    assert isinstance(bg, Image.Image)
    assert bg.mode == "RGBA" and bg.size == (256, 256)
    # not blank: multiple distinct land-cover colors visible
    assert len(set(bg.convert("RGB").getdata())) >= 3

    views = layer_views(layers)
    assert len(views) == 4
    for img, caption in views:
        assert np.all(np.isfinite(img)) and img.max() <= 255
        assert caption


def test_planner_core_prediction_views():
    from maunet_tpu.apps.planner_core import prediction_views

    rng = np.random.default_rng(0)
    ndvi = np.clip(rng.normal(0.3, 0.2, (64, 64)), -1, 1)
    lst_base = rng.normal(30, 3, (64, 64))
    lst_mod = lst_base - 1.5  # uniform cooling
    views, delta_mean = prediction_views(ndvi, lst_mod, lst_base)
    assert len(views) == 3
    assert delta_mean == pytest.approx(-1.5)
    for img, _ in views:
        assert img.min() >= 0 and img.max() <= 1


def test_cached_layers_fall_back_to_bundled_demo(tmp_path):
    """With an empty cache dir, the loader serves the committed demo tiles
    (the reference's cache-only mode needs its bundled Rome tiles)."""
    from maunet_tpu.apps.gee_fetch import load_cached_layers

    layers = load_cached_layers(str(tmp_path / "empty"), img_size=128)
    assert layers["dw"].shape == (128, 128)
    assert layers["temp"].mean() > 15  # °C-scale demo LST, not noise
