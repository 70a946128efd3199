"""Research & figures app — Streamlit.

Capability parity with the reference's app_dev/ 6-page research app
(app_dev/Home.py + pages/*): single-model browser with an architecture
diagram, multi-model side-by-side comparison, evaluation-CSV analysis
dashboards, statistical comparison (paired t-tests + Wilcoxon/Mann-Whitney/
Pearson with significance matrices), dataset geo-distribution map, and a
metric-interpretation page.

Run:  streamlit run maunet_tpu/apps/research.py -- --reports-dir reports/tests
All statistics come from maunet_tpu.analysis (testable without streamlit).
"""

from __future__ import annotations

import argparse
import glob
import os

import pandas as pd


def _args():
    p = argparse.ArgumentParser()
    p.add_argument("--reports-dir", default="reports/tests")
    p.add_argument("--data-dir", default=None)
    known, _ = p.parse_known_args()
    return known


def _find_eval_csvs(reports_dir: str) -> dict[str, str]:
    return {os.path.basename(f).replace("_evaluation.csv", ""): f
            for f in sorted(glob.glob(os.path.join(reports_dir, "*_evaluation.csv")))}


def page_model_browser(st, args):
    st.header("Model browser")
    from maunet_tpu.evaluate.evaluator import load_any_checkpoint

    path = st.text_input("Checkpoint path (.pth or orbax dir)")
    if not path:
        return
    loaded = load_any_checkpoint(path)
    hp = loaded.hyperparams
    st.json(hp)
    import jax

    n = sum(int(x.size) for x in jax.tree_util.tree_leaves(
        loaded.variables["params"]))
    st.metric("Parameters", f"{n:,}")
    # Interactive node graph (parity with the reference's streamlit-flow
    # diagram, app_dev/app_src/model_diagram.py:8-222) — self-contained
    # HTML/SVG so it needs no extra component package.
    from maunet_tpu.analysis.diagram_html import model_diagram, render_html

    try:
        html_component = st.components.v1.html
    except AttributeError:  # real streamlit: submodule needs explicit import
        import streamlit.components.v1 as _components

        html_component = _components.html
    html_component(render_html(model_diagram(hp)), height=580)
    from maunet_tpu.analysis.figures import plot_architecture_diagram

    with st.expander("Static figure"):
        st.pyplot(plot_architecture_diagram(hp))
    with st.expander("Text diagram"):
        st.text(architecture_diagram(hp))

    if args.data_dir and st.button("Predict a test sample (zoomed quadrants)"):
        from maunet_tpu.analysis.figures import plot_zoomed_views
        from maunet_tpu.data.dataset import NpzDataset, make_batches
        from maunet_tpu.evaluate.evaluator import predict_batch

        ds = NpzDataset(os.path.join(args.data_dir, "test"))
        batch = next(make_batches(ds, 1))
        preds = predict_batch(loaded, batch)
        for ch_idx, ch in enumerate(("NDVI", "LST")):
            st.pyplot(plot_zoomed_views(
                batch.targets[0, :, :, ch_idx], preds[0, :, :, ch_idx],
                ch, error=True))


def architecture_diagram(hp: dict) -> str:
    """ASCII architecture diagram (the reference renders an interactive
    streamlit-flow diagram, app_dev/app_src/model_diagram.py:8-222)."""
    bf = int(hp.get("base_filters", 64))
    filters = [bf * 2 ** i for i in range(5)]
    lines = [f"Input (H, W, 23)"]
    for i, f in enumerate(filters[:-1]):
        lines.append(f"{'  ' * i}└─ VGGBlock conv{i}_0 → {f}ch → maxpool 2×2")
    embed = []
    if hp.get("temporal_embeddings", True):
        embed.append(f"LSTM({hp.get('lstm_hidden', 96)}) → {hp.get('temporal_dim', 64)}d")
    if hp.get("metadata_embeddings", True):
        embed.append(f"MLP → {hp.get('meta_dim', 64)}d")
    fuse = " + ".join(embed) if embed else "no embeddings"
    lines.append(f"{'  ' * 4}└─ bottleneck conv4_0 → {filters[-1]}ch  [fused: {fuse}]")
    for i in reversed(range(4)):
        lines.append(f"{'  ' * i}┌─ up ×2 (align-corners) + skip → conv{i}_1 → {filters[i]}ch")
    lines.append("Output 1×1 conv → (NDVI: tanh, LST: identity)")
    return "\n".join(lines)


def page_comparison(st, args):
    st.header("Model comparison")
    csvs = _find_eval_csvs(args.reports_dir)
    chosen = st.multiselect("Evaluation runs", list(csvs), default=list(csvs)[:2])
    if len(chosen) < 1:
        return
    rows = []
    for name in chosen:
        df = pd.read_csv(csvs[name])
        overall = df[df["dw_class"] == "overall"]
        for ch, g in overall.groupby("channel"):
            rows.append({"model": name, "channel": ch,
                         "mae": g["mae"].mean(), "rmse": g["rmse"].mean(),
                         "lap_var_pred": g["laplacian_var_pred"].mean()})
    st.dataframe(pd.DataFrame(rows).pivot(index="model", columns="channel"))


def page_analysis(st, args):
    st.header("Evaluation analysis")
    csvs = _find_eval_csvs(args.reports_dir)
    if not csvs:
        st.info("No evaluation CSVs found.")
        return
    name = st.selectbox("Run", list(csvs))
    df = pd.read_csv(csvs[name])
    channel = st.selectbox("Channel", sorted(df["channel"].unique()))
    sub = df[(df["channel"] == channel) & (df["dw_class"] == "overall")]
    c1, c2, c3 = st.columns(3)
    c1.metric("MAE", f"{sub['mae'].mean():.4f}")
    c2.metric("RMSE", f"{sub['rmse'].mean():.4f}")
    c3.metric("Samples", len(sub))
    st.subheader("Per-class MAE")
    per_class = (df[(df["channel"] == channel) & (df["dw_class"] != "overall")]
                 .groupby("dw_class")["mae"].mean().sort_values())
    st.bar_chart(per_class)
    st.subheader("Known vs unknown cities")
    st.dataframe(sub.groupby("is_known_city")[["mae", "rmse"]].mean())
    st.subheader("Error vs temporal distance")
    st.line_chart(sub.groupby("t1_year")["mae"].mean())


def page_statistics(st, args):
    st.header("Statistical comparison")
    from maunet_tpu.analysis.stats import comparative_analysis, nonparametric_tests

    csvs = _find_eval_csvs(args.reports_dir)
    chosen = st.multiselect("Runs to compare", list(csvs), default=list(csvs)[:2])
    if len(chosen) < 2:
        st.info("Pick at least two runs.")
        return
    paths = [csvs[c] for c in chosen]
    st.subheader("Paired t-tests")
    tt = comparative_analysis(paths, chosen)
    st.dataframe(tt[tt["winner"] != "insignificant"] if not tt.empty else tt)
    st.subheader("Wilcoxon / Mann-Whitney / Pearson")
    st.dataframe(nonparametric_tests(paths, chosen))

    from maunet_tpu.analysis.figures import (
        error_correlation_matrix,
        significance_matrix,
    )

    channel = st.selectbox(
        "Channel", sorted(pd.read_csv(paths[0])["channel"].unique()))
    metric = st.radio("Metric", ["mae", "rmse"], horizontal=True)
    st.subheader("Pairwise significance matrix (Wilcoxon)")
    _, fig = significance_matrix(paths, chosen, channel, metric)
    st.pyplot(fig)
    st.subheader("Sample-wise error correlation")
    _, fig = error_correlation_matrix(paths, chosen, channel, metric)
    st.pyplot(fig)


def page_dataset(st, args):
    st.header("Dataset geo-distribution")
    if not args.data_dir:
        st.info("Pass --data-dir to inspect a processed dataset.")
        return
    from maunet_tpu.data.dataset import NpzDataset

    rows = []
    for split in ("train", "val", "test"):
        split_dir = os.path.join(args.data_dir, split)
        if not os.path.isdir(split_dir):
            continue
        ds = NpzDataset(split_dir)
        for i in range(len(ds)):
            info = ds.get_metadata_from_idx(i)
            rows.append({**info, "split": split})
    df = pd.DataFrame(rows)
    from maunet_tpu.analysis.figures import plot_dataset_geomap

    st.pyplot(plot_dataset_geomap(df))
    st.map(df.rename(columns={"lat": "latitude", "lon": "longitude"}))
    st.dataframe(df.groupby(["split", "city"]).size().rename("samples"))


def page_interpretation(st, args):
    st.header("Metric interpretation")
    from maunet_tpu.analysis.stats import interpret_metrics

    csvs = _find_eval_csvs(args.reports_dir)
    if not csvs:
        st.info("No evaluation CSVs found.")
        return
    name = st.selectbox("Run", list(csvs))
    rows = interpret_metrics(csvs[name], name)
    st.dataframe(pd.DataFrame(rows))


PAGES = {
    "Model browser": page_model_browser,
    "Model comparison": page_comparison,
    "Evaluation analysis": page_analysis,
    "Statistical comparison": page_statistics,
    "Dataset map": page_dataset,
    "Metric interpretation": page_interpretation,
}


def main() -> None:
    import streamlit as st

    args = _args()
    st.set_page_config(page_title="MAUNet Research", layout="wide")
    page = st.sidebar.radio("Page", list(PAGES))
    PAGES[page](st, args)


if __name__ == "__main__":
    main()
