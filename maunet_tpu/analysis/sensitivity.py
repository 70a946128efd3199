"""Metadata sensitivity sweeps.

Capability parity with reference test/metadata_sensitivity.py:41-712, rebuilt
TPU-native: for each analyzed tile, the 50-point latitude sweep, 50-point
longitude sweep, and 20×20 lat-lon heatmap grid each run as ONE jitted
batched forward (the reference hand-batches repeats and chunks heatmaps into
mini-batches of 50).  Shapes are static (50 / 50 / 400) so each sweep
compiles once for the whole run.

Outputs match the reference exactly:
- ``sensitivity_data_<model>.json`` with {model_name, model_type, sweeps:
  {latitude/longitude: {x, channels: {ch: {mean, std}}}}, heatmaps:
  {sample_idx: {sample_label, orig_lat, orig_lon, channels: {ch: {values,
  lats, lons}}}}} (reference :625-683) — consumed unchanged by
  compare_sensitivity;
- average and per-sample sweep plots + heatmap figures (PDF).
"""

from __future__ import annotations

import json
import os
import random

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from maunet_tpu.config import Config
from maunet_tpu.data.dataset import NpzDataset
from maunet_tpu.data.schema import NormalizationStats
from maunet_tpu.evaluate.evaluator import load_any_checkpoint
from maunet_tpu.utils.logging import get_logger
from maunet_tpu.utils.tracking import make_emb_tag

log = get_logger(__name__)

LAT_STEPS = 50
LON_STEPS = 50
LAT_RANGE = np.linspace(-60, 70, LAT_STEPS)     # avoid extreme poles (ref :218)
LON_RANGE = np.linspace(-180, 180, LON_STEPS)
HEAT_STEPS = 20
TEMP_OFFSET_STEPS = 41
# z-scored CRU units: ±2σ of local climate level
TEMP_OFFSET_RANGE = np.linspace(-2.0, 2.0, TEMP_OFFSET_STEPS)


def select_samples(df_eval: pd.DataFrame, max_samples: int = 1000,
                   seed: int = 0):
    """Pick 5 best / 5 worst cities by mean RMSE, one median-RMSE sample
    each, plus a ≤max_samples subsample for averaging (reference :135-188;
    the reference's random.sample is unseeded — here seeded)."""
    overall = df_eval[df_eval["dw_class"] == "overall"].copy()
    by_city = overall.groupby("city")["rmse"].mean().reset_index().sort_values("rmse")
    best_cities = by_city.head(5)["city"].tolist()
    worst_cities = by_city.tail(5)["city"].tolist()

    def median_sample(city):
        rows = overall[overall["city"] == city].sort_values("rmse")
        return int(rows.iloc[len(rows) // 2]["sample_idx"])

    target_indices, groups = [], {}
    for city in best_cities:
        idx = median_sample(city)
        target_indices.append(idx)
        groups[idx] = "Best"
    for city in worst_cities:
        idx = median_sample(city)
        groups.setdefault(idx, "Worst")
        if idx not in target_indices:
            target_indices.append(idx)

    all_indices = overall["sample_idx"].unique().tolist()
    if len(all_indices) > max_samples:
        remaining = sorted(set(all_indices) - set(target_indices))
        rng = random.Random(seed)
        sampled = rng.sample(remaining, min(len(remaining),
                                            max_samples - len(target_indices)))
        all_indices = target_indices + sampled
    return all_indices, target_indices, groups, overall


def run_sensitivity(
    checkpoint_path: str,
    eval_csv: str,
    cfg: Config | None = None,
    data_dir: str | None = None,
    output_dir: str = "reports/sensitivity",
    max_samples: int = 1000,
    study_name: str = "sensitivity_analysis",
    seed: int = 0,
    make_plots: bool = True,
    trackers: list | None = None,
) -> str:
    cfg = cfg or Config()
    data_dir = data_dir or cfg.paths.processed_image_dataset
    os.makedirs(output_dir, exist_ok=True)

    stats = NormalizationStats.from_json(
        os.path.join(data_dir, "normalization_metrics.json"))
    meta_mean = np.array(stats.meta_mean)
    meta_std = np.array(stats.meta_std)

    loaded = load_any_checkpoint(checkpoint_path, study_name)
    hp = loaded.hyperparams
    metadata_features = int(hp.get("metadata_input_length",
                                   loaded.meta.get("metadata_input_length", 4)))
    model_name = make_emb_tag(bool(hp.get("temporal_embeddings", True)),
                              bool(hp.get("metadata_embeddings", True)))
    model_type = hp.get("model_type", "unet")
    if "++" in model_type:
        model_name += "++"

    df_eval = pd.read_csv(eval_csv)
    all_indices, target_indices, groups, overall = select_samples(
        df_eval, max_samples, seed)
    log.info(f"Analyzing {len(all_indices)} samples "
             f"({len(target_indices)} highlighted).")

    ds = NpzDataset(os.path.join(data_dir, "test"),
                    temporal_length=cfg.dataset.temporal_length)
    channels = list(cfg.dataset.target_channels)

    def sweep_forward(variables, maps, series, lengths, meta_full):
        """One batched forward over N metadata variants of a single tile →
        per-channel spatial means, LST un-normalized."""
        out = loaded.model.apply(variables, maps, series, meta_full, lengths)
        means = jnp.mean(out.astype(jnp.float32), axis=(1, 2))  # (N, C)
        lst = means[:, 1] * stats.temp_std + stats.temp_mean
        return jnp.stack([means[:, 0], lst], axis=1)

    sweep_jit = jax.jit(sweep_forward)

    # Variant batches are chunked to bound HBM: a 400-variant heatmap of
    # 256² tiles would otherwise materialize ~12 GB of broadcast inputs
    # (the reference mini-batches heatmaps at 50 for the same reason,
    # metadata_sensitivity.py:385).  50 is also the sweep length, so every
    # chunk shares one compiled shape.
    variant_chunk = LAT_STEPS

    def _run_chunk(sample, meta_overrides: np.ndarray) -> np.ndarray:
        n = meta_overrides.shape[0]
        maps = jnp.broadcast_to(jnp.asarray(sample["maps"]),
                                (n, *sample["maps"].shape))
        series = jnp.broadcast_to(jnp.asarray(sample["temp_series"]),
                                  (n, sample["temp_series"].shape[0]))
        lengths = jnp.full((n,), sample["temp_lengths"], jnp.int32)
        meta = jnp.asarray(meta_overrides, jnp.float32)
        if metadata_features == 8:
            dates = np.concatenate([sample["t1_dates"], sample["t2_dates"]])
            meta = jnp.concatenate(
                [meta, jnp.broadcast_to(jnp.asarray(dates), (n, 4))], axis=1)
        return np.asarray(sweep_jit(loaded.variables, maps, series, lengths, meta))

    def run_variants(sample, meta_overrides: np.ndarray) -> np.ndarray:
        """meta_overrides: (N, 4) z-scored metadata rows; returns (N, C)."""
        n = meta_overrides.shape[0]
        if n <= variant_chunk:
            return _run_chunk(sample, meta_overrides)
        pieces = []
        for start in range(0, n, variant_chunk):
            chunk = meta_overrides[start:start + variant_chunk]
            if chunk.shape[0] < variant_chunk:  # pad to the compiled shape
                pad = np.repeat(chunk[-1:], variant_chunk - chunk.shape[0], 0)
                out = _run_chunk(sample, np.concatenate([chunk, pad]))
                pieces.append(out[:chunk.shape[0]])
            else:
                pieces.append(_run_chunk(sample, chunk))
        return np.concatenate(pieces)

    lat_norms = (LAT_RANGE - meta_mean[0]) / meta_std[0]
    lon_norms = (LON_RANGE - meta_mean[1]) / meta_std[1]
    heat_lat = np.linspace(-60, 70, HEAT_STEPS)
    heat_lon = np.linspace(-180, 180, HEAT_STEPS)
    hl, ho = np.meshgrid(heat_lat, heat_lon, indexing="ij")

    lat_accum = {ch: [] for ch in channels}
    lon_accum = {ch: [] for ch in channels}
    results_lat, results_lon = [], []
    heatmaps = {}

    for sample_idx in all_indices:
        sample = ds[int(sample_idx)]
        base_meta = sample["metadata"]
        orig_lat = base_meta[0] * meta_std[0] + meta_mean[0]
        orig_lon = base_meta[1] * meta_std[1] + meta_mean[1]
        is_highlight = sample_idx in target_indices

        if is_highlight:
            rows = overall[overall["sample_idx"] == sample_idx]
            city = str(rows.iloc[0]["city"]).title()
            base_rmse = rows["rmse"].mean()
            label = f"{groups.get(sample_idx, 'Other')} {city} RMSE={base_rmse:.3f}"
        else:
            label = f"Sample {sample_idx}"

        def variants_with(col: int, values: np.ndarray) -> np.ndarray:
            m = np.tile(base_meta, (len(values), 1))
            m[:, col] = values
            return m

        lat_vals = run_variants(sample, variants_with(0, lat_norms))
        lon_vals = run_variants(sample, variants_with(1, lon_norms))
        for c, ch in enumerate(channels):
            lat_accum[ch].append(lat_vals[:, c])
            lon_accum[ch].append(lon_vals[:, c])
            if is_highlight:
                for j, v in enumerate(LAT_RANGE):
                    results_lat.append({"sample_label": label, "latitude": v,
                                        "orig_lat": orig_lat, ch: lat_vals[j, c]})
                for j, v in enumerate(LON_RANGE):
                    results_lon.append({"sample_label": label, "longitude": v,
                                        "orig_lon": orig_lon, ch: lon_vals[j, c]})

        if is_highlight:
            m = np.tile(base_meta, (HEAT_STEPS * HEAT_STEPS, 1))
            m[:, 0] = (hl.ravel() - meta_mean[0]) / meta_std[0]
            m[:, 1] = (ho.ravel() - meta_mean[1]) / meta_std[1]
            heat_vals = run_variants(sample, m)  # (400, C)
            heatmaps[str(int(sample_idx))] = {
                "sample_label": label,
                "orig_lat": float(orig_lat),
                "orig_lon": float(orig_lon),
                "channels": {
                    ch: {
                        "values": heat_vals[:, c].reshape(HEAT_STEPS, HEAT_STEPS).tolist(),
                        "lats": heat_lat.tolist(),
                        "lons": heat_lon.tolist(),
                    } for c, ch in enumerate(channels)
                },
            }

    export = {
        "model_name": model_name,
        "model_type": model_type,
        "sweeps": {
            "latitude": {"x": LAT_RANGE.tolist(), "channels": {}},
            "longitude": {"x": LON_RANGE.tolist(), "channels": {}},
        },
        "heatmaps": heatmaps,
    }
    for key, accum in [("latitude", lat_accum), ("longitude", lon_accum)]:
        for ch in channels:
            stack = np.stack(accum[ch])
            export["sweeps"][key]["channels"][ch] = {
                "mean": stack.mean(axis=0).tolist(),
                "std": stack.std(axis=0).tolist(),
            }

    export_path = os.path.join(output_dir, f"sensitivity_data_{model_name}.json")
    with open(export_path, "w") as f:
        json.dump(export, f, indent=4)
    log.success(f"Saved sensitivity data to {export_path}")

    if make_plots:
        from maunet_tpu.analysis.plots import (
            plot_average_sensitivity,
            plot_heatmaps,
            plot_individual_sensitivity,
        )

        figure_paths = list(plot_average_sensitivity(export, output_dir))
        if results_lat:
            plot_individual_sensitivity(
                pd.DataFrame(results_lat), "latitude", channels, output_dir)
            plot_individual_sensitivity(
                pd.DataFrame(results_lon), "longitude", channels, output_dir)
        figure_paths += plot_heatmaps(export, output_dir)
        # Sensitivity figures to the tracker (reference
        # test/metadata_sensitivity.py:685-712 logs them as wandb images).
        for tracker in trackers or []:
            for fig_path in figure_paths:
                key = os.path.splitext(os.path.basename(fig_path))[0]
                # the .png twin — wandb.Image cannot ingest PDF
                tracker.log_image(f"sensitivity/{key}", fig_path[:-4] + ".png")
    return export_path


def run_temporal_sensitivity(
    checkpoint_path: str,
    eval_csv: str,
    cfg: Config | None = None,
    data_dir: str | None = None,
    output_dir: str = "reports/sensitivity",
    max_samples: int = 24,
    study_name: str = "temporal_sensitivity",
    seed: int = 0,
) -> str:
    """Temporal analog of the latitude sweep (round-4, VERDICT r3 next #2):
    shift the whole (z-scored) CRU series of each analyzed tile by a constant
    offset δ ∈ [-2, 2] and record the per-channel spatial-mean response.

    A model whose LSTM genuinely reads the recent local climate must respond
    ~linearly in δ; on the planted-signal fixture (data/synthetic.py: the LST
    target carries ``temporal_signal · mean(series[-12:])``), the recovered
    LST slope in °C per z-unit must approach ``temporal_signal · temp_std``
    while a temporal-blind model reads flat.  Exports
    ``sensitivity_data_temporal_<model>.json`` with the same sweeps schema as
    the metadata export (consumed by the same plotting/compare tooling).

    No counterpart exists in the reference — its sensitivity suite sweeps
    only metadata (test/metadata_sensitivity.py:217-220); the temporal
    channel was its *best* NDVI variant yet never probed end-to-end.
    """
    cfg = cfg or Config()
    data_dir = data_dir or cfg.paths.processed_image_dataset
    os.makedirs(output_dir, exist_ok=True)

    stats = NormalizationStats.from_json(
        os.path.join(data_dir, "normalization_metrics.json"))
    loaded = load_any_checkpoint(checkpoint_path, study_name)
    hp = loaded.hyperparams
    metadata_features = int(hp.get("metadata_input_length",
                                   loaded.meta.get("metadata_input_length", 4)))
    model_name = make_emb_tag(bool(hp.get("temporal_embeddings", True)),
                              bool(hp.get("metadata_embeddings", True)))
    if "++" in hp.get("model_type", "unet"):
        model_name += "++"

    df_eval = pd.read_csv(eval_csv)
    all_indices, _, _, _ = select_samples(df_eval, max_samples, seed)
    ds = NpzDataset(os.path.join(data_dir, "test"),
                    temporal_length=cfg.dataset.temporal_length)
    channels = list(cfg.dataset.target_channels)
    n = TEMP_OFFSET_STEPS

    def sweep_forward(variables, maps, series, lengths, meta_full):
        out = loaded.model.apply(variables, maps, series, meta_full, lengths)
        means = jnp.mean(out.astype(jnp.float32), axis=(1, 2))
        lst = means[:, 1] * stats.temp_std + stats.temp_mean
        return jnp.stack([means[:, 0], lst], axis=1)

    sweep_jit = jax.jit(sweep_forward)
    offsets = jnp.asarray(TEMP_OFFSET_RANGE, jnp.float32)

    accum = {ch: [] for ch in channels}
    for sample_idx in all_indices:
        sample = ds[int(sample_idx)]
        maps = jnp.broadcast_to(jnp.asarray(sample["maps"]),
                                (n, *sample["maps"].shape))
        # shift only the valid prefix (padding stays zero; the LSTM masks it
        # out anyway under per_sample, but batch_max-mode imports read it)
        t = sample["temp_series"].shape[0]
        valid = (np.arange(t) < int(sample["temp_lengths"])).astype(np.float32)
        series = (jnp.asarray(sample["temp_series"])[None]
                  + offsets[:, None] * jnp.asarray(valid)[None])
        lengths = jnp.full((n,), sample["temp_lengths"], jnp.int32)
        meta = jnp.broadcast_to(jnp.asarray(sample["metadata"]), (n, 4))
        if metadata_features == 8:
            dates = np.concatenate([sample["t1_dates"], sample["t2_dates"]])
            meta = jnp.concatenate(
                [meta, jnp.broadcast_to(jnp.asarray(dates), (n, 4))], axis=1)
        vals = np.asarray(sweep_jit(loaded.variables, maps, series, lengths,
                                    meta))
        for c, ch in enumerate(channels):
            accum[ch].append(vals[:, c])

    export = {
        "model_name": model_name,
        "model_type": hp.get("model_type", "unet"),
        "sweeps": {"temporal_offset": {
            "x": TEMP_OFFSET_RANGE.tolist(),
            "channels": {
                ch: {"mean": np.stack(accum[ch]).mean(axis=0).tolist(),
                     "std": np.stack(accum[ch]).std(axis=0).tolist()}
                for ch in channels
            },
        }},
        "heatmaps": {},
    }
    export_path = os.path.join(
        output_dir, f"sensitivity_data_temporal_{model_name}.json")
    with open(export_path, "w") as f:
        json.dump(export, f, indent=4)
    log.success(f"Saved temporal sensitivity data to {export_path}")
    return export_path
