"""Urban Greening Planner — interactive Streamlit app.

Capability parity with reference app/Home.py:50-416: GEE credential entry
with a cache-only fallback, sidebar location/date inputs, checkpoint picker,
four-layer display, a drawable land-cover canvas with the 9-class brush
palette, and predict → NDVI / LST / ΔLST maps with the mean-cooling metric.

Run:  streamlit run maunet_tpu/apps/planner.py -- --models-dir models
Requires streamlit (+ streamlit_drawable_canvas for painting; degrades to
no-edit prediction without it).  All inference runs through
maunet_tpu.apps.engine (JAX/TPU).
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from maunet_tpu.apps.engine import CANVAS_PALETTE, PlannerEngine
from maunet_tpu.utils.dw import dw_to_rgb


def _args():
    p = argparse.ArgumentParser()
    p.add_argument("--models-dir", default="models")
    p.add_argument("--cache-dir", default="app_cache")
    p.add_argument("--data-dir", default=None,
                   help="processed dataset dir (for normalization stats)")
    p.add_argument("--img-size", type=int, default=512)
    known, _ = p.parse_known_args()
    return known


def main() -> None:
    import streamlit as st

    args = _args()
    st.set_page_config(page_title="Urban Greening Planner", layout="wide")
    st.title("🌳 Urban Greening Planner (TPU)")

    # --- Sidebar: location/date/model (reference Home.py:128-172) ---
    with st.sidebar:
        st.header("Location & Time")
        lat = st.number_input("Latitude", -60.0, 70.0, 41.9, step=0.01)
        lon = st.number_input("Longitude", -180.0, 180.0, 12.5, step=0.01)
        population = st.number_input("Population", 0, 50_000_000, 2_800_000)
        year_t1 = st.number_input("Observation year (t1)", 2017, 2025, 2023)
        month_t1 = st.number_input("Observation month (t1)", 1, 12, 7)
        year_t2 = st.number_input("Target year (t2)", 2017, 2035, 2025)
        month_t2 = st.number_input("Target month (t2)", 1, 12, 7)

        ckpts = sorted(glob.glob(os.path.join(args.models_dir, "*.pth"))
                       + [d for d in glob.glob(os.path.join(args.models_dir, "*"))
                          if os.path.isdir(d)])
        if not ckpts:
            st.error(f"No checkpoints found in {args.models_dir}")
            st.stop()
        ckpt = st.selectbox("Model checkpoint", ckpts)

        use_live = st.checkbox("Fetch live satellite data (needs GEE)", False)

    @st.cache_resource
    def get_engine(path: str) -> PlannerEngine:
        stats = None
        if args.data_dir:
            from maunet_tpu.data.schema import NormalizationStats

            stats_path = os.path.join(args.data_dir, "normalization_metrics.json")
            if os.path.exists(stats_path):
                stats = NormalizationStats.from_json(stats_path)
        return PlannerEngine(path, stats=stats, img_size=args.img_size)

    engine = get_engine(ckpt)

    # --- Fetch layers (reference Home.py:182-278) ---
    if st.button("Fetch Satellite Data") or "layers" not in st.session_state:
        from maunet_tpu.apps.gee_fetch import get_satellite_data, load_cached_layers

        try:
            if use_live:
                st.session_state.layers = get_satellite_data(
                    lat, lon, int(year_t1), int(month_t1), args.cache_dir,
                    args.img_size)
            else:
                st.session_state.layers = load_cached_layers(
                    args.cache_dir, args.img_size)
        except Exception as e:
            st.warning(f"Could not load satellite layers: {e}")
            st.stop()

    layers = st.session_state.layers
    cols = st.columns(4)
    cols[0].image(dw_to_rgb(layers["dw"]), caption="Land cover (t1)")
    cols[1].image(np.clip(layers["rgb"].transpose(1, 2, 0) / 255, 0, 1),
                  caption="RGB (t1)")
    cols[2].image(np.clip((layers["ndvi"] + 1) / 2, 0, 1), caption="NDVI (t1)")
    temp = layers["temp"]
    cols[3].image(np.clip((temp - temp.min()) / (temp.ptp() + 1e-9), 0, 1),
                  caption="LST °C (t1)")

    # --- Drawable canvas (reference Home.py:280-328) ---
    st.subheader("Paint your land-cover change")
    canvas_rgba = None
    try:
        from streamlit_drawable_canvas import st_canvas

        brush_names = ["water", "trees", "grass", "flooded veg", "crops",
                       "shrub", "built", "bare", "snow"]
        brush = st.radio("Brush class", list(range(9)), horizontal=True,
                         format_func=lambda i: f"{brush_names[i]}")
        canvas = st_canvas(
            fill_color=CANVAS_PALETTE[brush] + "AA",
            stroke_color=CANVAS_PALETTE[brush],
            stroke_width=st.slider("Brush size", 2, 60, 20),
            background_image=None,
            height=512, width=512, drawing_mode="freedraw", key="canvas")
        if canvas is not None and canvas.image_data is not None:
            canvas_rgba = canvas.image_data
    except ImportError:
        st.info("streamlit_drawable_canvas not installed — predicting "
                "without land-cover edits.")

    # --- Predict (reference Home.py:330-416) ---
    if st.button("Run Prediction", type="primary"):
        inp_base = engine.prepare_input(layers, None, lat, lon, population,
                                        year_t1, month_t1, year_t2, month_t2)
        ndvi_base, lst_base = engine.predict(inp_base)
        inp_mod = engine.prepare_input(layers, canvas_rgba, lat, lon, population,
                                       year_t1, month_t1, year_t2, month_t2)
        ndvi_mod, lst_mod = engine.predict(inp_mod)

        c1, c2, c3 = st.columns(3)
        c1.image(np.clip((ndvi_mod + 1) / 2, 0, 1), caption="Predicted NDVI (t2)")
        lo, hi = lst_mod.min(), lst_mod.max()
        c2.image(np.clip((lst_mod - lo) / (hi - lo + 1e-9), 0, 1),
                 caption=f"Predicted LST °C (t2) [{lo:.1f}, {hi:.1f}]")
        delta = lst_mod - lst_base
        dmax = max(abs(delta).max(), 1e-9)
        c3.image(np.clip((delta / dmax + 1) / 2, 0, 1),
                 caption="ΔLST vs no-change baseline")
        st.metric("Mean temperature change of your plan",
                  f"{engine.cooling_metric(lst_base, lst_mod):+.2f} °C")


if __name__ == "__main__":
    main()
