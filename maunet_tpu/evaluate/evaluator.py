"""Checkpoint evaluator: the reference's test/evaluate.py rebuilt TPU-native.

Produces a long-format CSV with the exact reference schema and filename
pattern (test/evaluate.py:244-311): one row per (sample, channel, 'overall')
plus one per (sample, channel, dw_class present), with MAE/RMSE in physical
units (°C for LST), Laplacian-variance sharpness, known/unknown-city flags
and t1/t2 dates — so the reference's downstream statistical tooling reads
our CSVs unchanged.

Hot path is fully on device (evaluate.metrics.eval_metrics); the host only
formats rows.  Accepts both native orbax checkpoints and reference ``.pth``
files (converted on the fly via maunet_tpu.interop).
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from maunet_tpu.config import Config
from maunet_tpu.data.dataset import make_batches
from maunet_tpu.data.pipeline import prefetch_to_device
from maunet_tpu.data.schema import NormalizationStats
from maunet_tpu.evaluate.metrics import (
    NUM_CLASSES,
    dw_map_from_input,
    eval_metrics,
    unnormalize_targets,
)
from maunet_tpu.models.factory import build_model
from maunet_tpu.train.steps import make_forward_fn
from maunet_tpu.utils.dw import DW_CLASSES
from maunet_tpu.utils.logging import get_logger
from maunet_tpu.utils.tracking import make_emb_tag

log = get_logger(__name__)


@dataclass
class LoadedModel:
    model: Any
    variables: dict
    hyperparams: dict
    meta: dict


def _device_resident(variables):
    """Commit restored variables to device ONCE.  Both the orbax and the
    torch-interop loaders return host numpy pytrees; passing those to a
    jitted forward re-uploads every parameter on EVERY dispatch (~132 MB
    for U-Net-64 — measured 1041 ms vs 0.1 ms per dispatch on the v5e
    relay, the difference between 1 and 900+ tiles/s in the evaluator
    pipeline).  Multi-process setups keep host arrays: the shard_map
    callers assemble globally-replicated arrays themselves."""
    if jax.process_count() > 1:
        return variables
    return jax.device_put(variables)


def load_any_checkpoint(path: str, study_name: str = "",
                        compute_dtype=None) -> LoadedModel:
    """Load a native orbax checkpoint directory or a reference .pth file."""
    compute_dtype = compute_dtype or jnp.bfloat16
    if path.endswith(".pth") or path.endswith(".pt"):
        from maunet_tpu.interop import load_torch_checkpoint

        variables, hyperparams, ckpt = load_torch_checkpoint(path, study_name)
        # Converted torch checkpoints reproduce the reference's batch-max
        # LSTM padding behaviour (SURVEY.md §7 hard parts).
        model = build_model(hyperparams, lstm_mask_mode="batch_max",
                            compute_dtype=compute_dtype)
        meta = {k: v for k, v in ckpt.items() if k != "model_state_dict"}
        return LoadedModel(model, _device_resident(variables), hyperparams,
                           meta)

    from maunet_tpu.train.checkpoint import restore_variables

    variables, meta = restore_variables(path)
    hyperparams = dict(meta.get("hyperparameters", {}))
    hyperparams.setdefault("metadata_input_length",
                           meta.get("metadata_input_length", 8))
    model = build_model(hyperparams, compute_dtype=compute_dtype)
    return LoadedModel(model, _device_resident(variables), hyperparams, meta)


@functools.lru_cache(maxsize=8)
def _metrics_program(model, metadata_features: int, stats, mesh):
    """Jitted ``(variables, batch) -> (metrics, outputs_un, targets_un)``,
    cached ACROSS ``evaluate_checkpoint`` calls.  A fresh closure per call
    would re-trace and re-compile the whole program (~10-20 s through the
    relay) even when the architecture is identical; linen Modules,
    ``NormalizationStats`` and ``Mesh`` all hash by value, so two calls
    evaluating the same configuration share one executable."""
    forward = make_forward_fn(model, metadata_features)

    def _batch_metrics(variables, batch):
        outputs = forward(variables, batch)
        targets_un = unnormalize_targets(batch["targets"], stats)
        outputs_un = unnormalize_targets(outputs, stats)
        dw = dw_map_from_input(batch["maps"])
        m = eval_metrics(outputs_un, targets_un, dw)
        return m, outputs_un, targets_un

    if mesh is not None:
        from maunet_tpu.parallel.infer import shard_batch_fn

        return shard_batch_fn(_batch_metrics, mesh)
    return jax.jit(_batch_metrics)


def predict_batch(loaded: LoadedModel, batch) -> np.ndarray:
    """Run one host Batch through a loaded checkpoint → (B, H, W, 2) numpy
    predictions (used by the research app's zoomed-quadrant views)."""
    from maunet_tpu.train.steps import make_forward_fn

    metadata_features = int(loaded.hyperparams.get(
        "metadata_input_length", loaded.meta.get("metadata_input_length", 8)))
    forward = make_forward_fn(loaded.model, metadata_features)
    return np.asarray(forward(loaded.variables, batch.as_dict()))


def known_cities_from_train_dir(train_dir: str) -> set[str]:
    """Cities appearing in the train split, parsed from filenames
    (reference test/evaluate.py:66-79)."""
    if not os.path.isdir(train_dir):
        log.warning(f"Training directory not found at {train_dir}; "
                    "known/unknown cities unavailable.")
        return set()
    from maunet_tpu.data.schema import parse_sample_filename
    from maunet_tpu.data.shards import INDEX_FILE

    index_path = os.path.join(train_dir, INDEX_FILE)
    if os.path.exists(index_path):
        import json

        with open(index_path) as f:
            names = json.load(f)["names"]
    else:
        names = [f for f in os.listdir(train_dir) if f.endswith(".npz")]
    return {parse_sample_filename(f)["city"] for f in names}


def evaluate_checkpoint(
    checkpoint_path: str,
    cfg: Config | None = None,
    data_dir: str | None = None,
    study_name: str = "test",
    jobid: str = "",
    n_visualize: int = 0,
    output_dir: str = "reports/tests",
    batch_size: int | None = None,
    trackers: list | None = None,
    precision: str = "bfloat16",
    mesh=None,
    use_mesh: bool = False,
) -> pd.DataFrame:
    """``mesh`` / ``use_mesh`` run the hot loop data-parallel over a device
    mesh (all axes flattened — parallel.infer): the forward pass AND the
    on-device metric reductions execute as one shard_map program per batch,
    Pallas kernels included.  ``use_mesh=True`` without an explicit mesh
    builds a 1-axis mesh over every visible device."""
    cfg = cfg or Config()
    data_dir = data_dir or cfg.paths.processed_image_dataset
    trackers = trackers or []
    if mesh is None and use_mesh:
        from maunet_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()  # all devices on the data axis

    compute_dtype = jnp.float32 if precision == "float32" else jnp.bfloat16
    loaded = load_any_checkpoint(checkpoint_path, study_name,
                                 compute_dtype=compute_dtype)
    hp = loaded.hyperparams
    metadata_features = int(hp.get("metadata_input_length",
                                   loaded.meta.get("metadata_input_length", 4)))
    batch_size = batch_size or int(hp.get("batch_size", 16))
    trial_id = loaded.meta.get("trial_id", "unknown")
    model_type = hp.get("model_type", "unet")
    tag_emb = make_emb_tag(bool(hp.get("temporal_embeddings", True)),
                           bool(hp.get("metadata_embeddings", True)))

    stats_path = os.path.join(data_dir, "normalization_metrics.json")
    stats = NormalizationStats.from_json(stats_path) if os.path.exists(stats_path) else None
    if stats is None:
        log.warning("Normalization metrics not found. Using raw data.")

    train_cities = known_cities_from_train_dir(os.path.join(data_dir, "train"))
    from maunet_tpu.data import open_split

    ds = open_split(data_dir, "test",
                    temporal_length=cfg.dataset.temporal_length)

    batch_sharding = None
    if mesh is not None:
        from maunet_tpu.parallel.infer import (flat_batch_sharding,
                                               round_up_to_mesh)

        batch_size = round_up_to_mesh(batch_size, mesh)
        batch_sharding = flat_batch_sharding(mesh)
        if jax.process_count() == 1:
            # Replicate the variables over the mesh ONCE — a single-device-
            # committed pytree would be re-broadcast on every dispatch.
            from maunet_tpu.parallel.mesh import replicated

            loaded.variables = jax.device_put(loaded.variables,
                                              replicated(mesh))
    batch_metrics = _metrics_program(loaded.model, metadata_features, stats,
                                     mesh)

    channels = list(cfg.dataset.target_channels)
    results: list[dict] = []
    sample_idx = 0
    created_visuals = 0

    # Dispatch the whole epoch asynchronously, then fetch once.  A per-batch
    # ``device_get`` (round 4) synchronized the relay every batch — each
    # round trip costs ~1 s of tunnel latency, two orders of magnitude above
    # the 8 ms forward — so the device idled between batches.  Deferring the
    # fetch keeps the pipeline full: the prefetch worker uploads batch i+1
    # while the device runs batch i, and the host pays ONE sync at the end.
    from maunet_tpu.data.pipeline import cast_maps_bf16

    pending: list[dict] = []
    for batch in prefetch_to_device(
            make_batches(ds, batch_size), sharding=batch_sharding,
            host_transform=cast_maps_bf16 if compute_dtype == jnp.bfloat16
            else None):
        metrics, outputs_un, targets_un = batch_metrics(loaded.variables, batch)
        entry = {"metrics": metrics, "valid": batch["valid"],
                 "t1": batch["t1_dates"], "t2": batch["t2_dates"]}
        if len(pending) * batch_size < n_visualize:
            # Only visualization batches retain (and later fetch) images.
            entry["images"] = (batch["maps"], outputs_un, targets_un)
        pending.append(entry)
    fetched = jax.device_get(pending)

    for entry in fetched:
        metrics = entry["metrics"]
        valid = np.asarray(entry["valid"])
        t1 = np.asarray(entry["t1"])
        t2 = np.asarray(entry["t2"])
        maps_h = outputs_un = targets_un = None
        if "images" in entry:
            maps_h, outputs_un, targets_un = entry["images"]

        if np.isnan(metrics["mae"][valid]).any():
            log.error(f"NaN values found in outputs near sample {sample_idx}")
        # constant-output degeneracy probe (reference test/evaluate.py:196-199
        # checks unique-value counts; zero Laplacian variance is the same
        # signal without a device->host image copy)
        degenerate = np.asarray(metrics["lap_var_pred"])[valid] == 0.0
        if degenerate.any():
            log.warning(
                f"Outputs have a single unique value (zero Laplacian variance) "
                f"for {int(degenerate.sum())} sample-channels near sample "
                f"{sample_idx}")

        for i in range(valid.shape[0]):
            if not valid[i]:
                continue
            info = ds.get_metadata_from_idx(sample_idx)
            is_known = info["city"] in train_cities
            t1y, t1m = int(t1[i, 0]), int(t1[i, 1])
            t2y, t2m = int(t2[i, 0]), int(t2[i, 1])
            base = {
                "is_known_city": is_known,
                "t1_year": t1y, "t1_month": t1m,
                "t2_year": t2y, "t2_month": t2m,
                "time_delta": t2y - t1y,
                **info,
            }
            first_row = len(results)  # this sample's rows start here
            for c, ch_name in enumerate(channels):
                results.append({
                    "sample_idx": sample_idx, "channel": ch_name,
                    "dw_class": "overall",
                    "mae": float(metrics["mae"][i, c]),
                    "rmse": float(metrics["rmse"][i, c]),
                    "laplacian_var_pred": float(metrics["lap_var_pred"][i, c]),
                    "laplacian_var_gt": float(metrics["lap_var_gt"][i, c]),
                    **base,
                })
                for k in range(NUM_CLASSES):
                    if not metrics["class_present"][i, k]:
                        continue
                    results.append({
                        "sample_idx": sample_idx, "channel": ch_name,
                        "dw_class": DW_CLASSES[k],
                        "mae": float(metrics["class_mae"][i, c, k]),
                        "rmse": float(metrics["class_rmse"][i, c, k]),
                        "laplacian_var_pred": None, "laplacian_var_gt": None,
                        **base,
                    })

            if created_visuals < n_visualize and maps_h is not None:
                from maunet_tpu.evaluate.visualize import plot_evaluation_sample

                plot_evaluation_sample(
                    np.asarray(maps_h[i], dtype=np.float32),
                    np.asarray(targets_un[i]), np.asarray(outputs_un[i]),
                    pd.DataFrame(results[first_row:]),
                    channels, stats, info, study_name, trial_id, sample_idx,
                    os.path.join(output_dir, "visualizations"))
                created_visuals += 1
            sample_idx += 1

    df = pd.DataFrame(results)
    os.makedirs(output_dir, exist_ok=True)
    report_path = os.path.join(
        output_dir,
        f"{study_name}_{model_type}_{tag_emb}_{trial_id}_job{jobid}_evaluation.csv")
    df.to_csv(report_path, index=False)
    log.success(f"Full evaluation report saved to {report_path}")

    info_path = report_path.replace("_evaluation.csv", "_info.csv")
    pd.DataFrame([{
        "evaluation_csv_path": report_path,
        "model_embedding_type": tag_emb,
        "study_name": study_name,
        "trial_id": trial_id,
        "model_architecture": model_type,
    }]).to_csv(info_path, index=False)

    summary = (df.groupby(["is_known_city", "t1_year", "channel", "dw_class",
                           "city", "lat", "lon"])
               [["mae", "rmse", "laplacian_var_pred", "laplacian_var_gt"]]
               .mean().reset_index())
    for known, label in [(True, "Known"), (False, "Unknown")]:
        part = summary[summary["is_known_city"] == known]
        if not part.empty:
            log.info(f"--- {label} Cities ---\n"
                     + part.to_string(max_rows=40))
    for tracker in trackers:
        overall = df[df["dw_class"] == "overall"]
        tracker.log({
            f"metrics/{'known' if k else 'unknown'}/{ch}/mae": float(g["mae"].mean())
            for (k, ch), g in overall.groupby(["is_known_city", "channel"])
        })
        # Summary table to the tracker (reference test/evaluate.py:314-359
        # logs the grouped summary as a wandb.Table).
        tracker.log_table("evaluation/summary", summary)
    return df
