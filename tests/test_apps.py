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
