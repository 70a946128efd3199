"""Headless execution of the Streamlit apps (VERDICT r2 weak #4 / next #4).

The image has no streamlit package, so apps/planner.py and apps/research.py
were wiring that had never been imported.  These tests drive the real
``main()`` / page functions through full render passes against real
checkpoints, demo layers, and evaluation CSVs using the scripted
FakeStreamlit from maunet_tpu.apps.headless — any misspelled/stale ``st.*``
API raises AttributeError here (the fake has no catch-all getattr).
"""

import os

import numpy as np
import pandas as pd
import pytest

from reference_loader import make_reference_checkpoint, reference_available

from maunet_tpu.apps.engine import CANVAS_RGB
from maunet_tpu.apps.headless import FakeStreamlit, run_planner, run_research_page
from maunet_tpu.apps.research import PAGES

needs_reference = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted")


# ---------------------------------------------------------------------------
# planner (reference app/Home.py:50-416)
# ---------------------------------------------------------------------------

@needs_reference
def test_planner_full_flow_with_canvas(tmp_path):
    """Fetch demo layers → paint trees on the canvas → predict: the full
    serving flow renders 4 layer panels, 3 prediction panels, and the mean
    cooling metric."""
    models = tmp_path / "models"
    models.mkdir()
    make_reference_checkpoint(str(models / "m.pth"))

    hw = 32
    rgba = np.zeros((hw, hw, 4), np.uint8)
    rgba[:, :, :3] = CANVAS_RGB[1]  # trees everywhere
    rgba[:, :, 3] = 255

    st = run_planner(
        ["--models-dir", str(models), "--cache-dir", str(tmp_path / "cache"),
         "--img-size", str(hw), "--temporal-length", "64"],
        answers={"Run Prediction": True},
        canvas_rgba=rgba)

    assert st.rendered("set_page_config") == ["Urban Greening Planner"]
    # cache-only mode warning (no GEE credentials scripted)
    assert any("cache-only" in str(w) for w in st.rendered("warning"))
    # 4 satellite layers + 3 prediction maps
    images = [(c, m) for (c, m, _a, _k) in st.calls if m == "image"]
    assert len(images) == 7
    # the canvas ran with a key and the session kept the fetched layers
    assert st.rendered("st_canvas") == ["canvas"]
    assert "layers" in st.session_state
    (label, value, _delta), = st.rendered("metric")
    assert "temperature" in label.lower()
    assert "°C" in value and np.isfinite(float(value.replace("°C", "")))


def test_planner_no_checkpoints_stops(tmp_path):
    (tmp_path / "models").mkdir()
    st = run_planner(["--models-dir", str(tmp_path / "models"),
                      "--cache-dir", str(tmp_path / "cache")])
    assert any("No checkpoints" in str(e) for e in st.rendered("error"))
    # st.stop() ended the script before any layer rendering
    assert not st.rendered("image")


# ---------------------------------------------------------------------------
# research app (reference app_dev/Home.py + pages/1-4)
# ---------------------------------------------------------------------------

def _write_eval_csv(path, rng, bias=0.0, n=10):
    rows = []
    for idx in range(n):
        for ch in ("after_ndvi", "after_temp"):
            base = 0.08 if ch == "after_ndvi" else 5.0
            for dw_class in ("overall", "built", "trees"):
                rows.append({
                    "sample_idx": idx, "channel": ch, "dw_class": dw_class,
                    "mae": base + bias + rng.normal(scale=0.01),
                    "rmse": base * 1.2 + bias + rng.normal(scale=0.01),
                    "laplacian_var_pred": 0.1, "laplacian_var_gt": 0.12,
                    "is_known_city": idx % 2 == 0,
                    "t1_year": 2019 + (idx % 6), "t1_month": 6,
                    "t2_year": 2025, "t2_month": 6, "time_delta": 3,
                    "city": f"city{idx % 4}", "lat": 40.0, "lon": 2.0,
                })
    pd.DataFrame(rows).to_csv(path, index=False)


@pytest.fixture(scope="module")
def research_reports(tmp_path_factory, rng_module=None):
    rng = np.random.default_rng(7)
    reports = tmp_path_factory.mktemp("reports")
    _write_eval_csv(reports / "metaemb_evaluation.csv", rng, bias=0.0)
    _write_eval_csv(reports / "noemb_evaluation.csv", rng, bias=0.5)
    return str(reports)


@pytest.fixture(scope="module")
def research_data(tmp_path_factory):
    from maunet_tpu.data.synthetic import generate_dataset

    root = tmp_path_factory.mktemp("research_data")
    return generate_dataset(str(root), {"train": 2, "test": 2},
                            hw=32, temporal_len=64)


def test_research_comparison_page(research_reports):
    st = run_research_page("Model comparison", ["--reports-dir", research_reports])
    assert st.rendered("header") == ["Model comparison"]
    (df,) = st.rendered("dataframe")
    assert {"metaemb", "noemb"} == set(df.index)


def test_research_analysis_page(research_reports):
    st = run_research_page("Evaluation analysis",
                           ["--reports-dir", research_reports])
    metrics = dict((m[0], m[1]) for m in st.rendered("metric"))
    assert set(metrics) == {"MAE", "RMSE", "Samples"}
    assert st.rendered("bar_chart") and st.rendered("line_chart")
    assert len(st.rendered("dataframe")) == 1  # known-vs-unknown table


def test_research_statistics_page(research_reports):
    st = run_research_page(
        "Statistical comparison",
        ["--reports-dir", research_reports],
        answers={"Runs to compare": ["metaemb", "noemb"]})
    dfs = st.rendered("dataframe")
    assert len(dfs) == 2  # t-tests + nonparametric table
    tt = dfs[0]
    assert not tt.empty and (tt["winner"] == "metaemb").all()
    figs = st.rendered("pyplot")
    assert len(figs) == 2  # significance matrix + error correlation


def test_research_statistics_page_needs_two_runs(research_reports):
    st = run_research_page("Statistical comparison",
                           ["--reports-dir", research_reports],
                           answers={"Runs to compare": ["metaemb"]})
    assert any("two runs" in str(i) for i in st.rendered("info"))


def test_research_dataset_page(research_data):
    st = run_research_page("Dataset map", ["--data-dir", research_data])
    assert st.rendered("pyplot")  # geomap figure
    assert st.rendered("map")
    (counts,) = st.rendered("dataframe")
    assert counts.sum() == 4  # 2 train + 2 test samples


def test_research_interpretation_page(research_reports):
    st = run_research_page("Metric interpretation",
                           ["--reports-dir", research_reports])
    (df,) = st.rendered("dataframe")
    assert "quality" in df.columns


@needs_reference
def test_research_model_browser_page(research_data, tmp_path):
    ckpt = make_reference_checkpoint(str(tmp_path / "m.pth"))
    st = run_research_page(
        "Model browser", ["--data-dir", research_data],
        answers={"Checkpoint path (.pth or orbax dir)": ckpt,
                 "Predict a test sample (zoomed quadrants)": True})
    assert st.rendered("json")  # hyperparameters
    (label, value, _), = st.rendered("metric")
    assert label == "Parameters"
    # architecture diagram figure + 2 zoomed-quadrant figures (NDVI, LST)
    assert len(st.rendered("pyplot")) == 3
    assert st.rendered("text")  # ASCII diagram in the expander
    # interactive HTML diagram (analysis/diagram_html.py)
    (html,) = st.rendered("components_html")
    assert "mau-node" in html and "conv0_0" in html


def test_research_main_router_covers_every_page(research_reports):
    """The page router itself (main) executes; with no answers each page
    renders its default state without AttributeErrors."""
    for page in PAGES:
        st = run_research_page("main", ["--reports-dir", research_reports],
                               answers={"Page": page})
        assert st.calls, page


def test_fake_streamlit_surfaces_api_typos():
    st = FakeStreamlit()
    with pytest.raises(AttributeError):
        st.textinput("oops")  # not a streamlit API
