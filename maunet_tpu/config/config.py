"""Typed configuration system.

Replaces the reference's Hydra/OmegaConf import-time global CONFIG
(reference: urban_planner/config.py:43-74, conf/config.yaml:1-62) with frozen
dataclasses loaded explicitly — no import-time side effects, no mutable
globals.  Key names mirror conf/config.yaml so experiment configs translate
1:1; path constants are derived from a single `data_root` instead of ~20
hardcoded module attributes.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any

import yaml


def _freeze(x):
    if isinstance(x, list):
        return tuple(_freeze(v) for v in x)
    return x


@dataclass(frozen=True)
class PathsConfig:
    """Filesystem layout. Everything hangs off `data_root` (reference attaches
    ~20 absolute path constants in urban_planner/config.py:47-69)."""

    data_root: str = "data"
    reports_root: str = "reports"
    models_dir: str = "models"

    @property
    def image_dataset(self) -> str:
        return os.path.join(self.data_root, "output_changes_future")

    @property
    def processed_image_dataset(self) -> str:
        return os.path.join(self.data_root, "processed_future")

    @property
    def raw_temperature_dir(self) -> str:
        return os.path.join(self.data_root, "temperature", "raw_cru")

    @property
    def processed_temperature_dir(self) -> str:
        return os.path.join(self.data_root, "temperature", "processed")

    @property
    def cities_csv(self) -> str:
        return os.path.join(self.data_root, "processed", "cities", "worldcities_processed.csv")

    @property
    def normalization_metrics(self) -> str:
        return os.path.join(self.processed_image_dataset, "normalization_metrics.json")


@dataclass(frozen=True)
class DatasetConfig:
    """Mirrors conf/config.yaml `dataset:` (reference conf/config.yaml:11-34)."""

    dataset_type: str = "future"
    min_population: int = 50_000
    image_shape_edge: int = 250
    # TPU note: tiles are padded/cropped to `tile_size` for static XLA shapes.
    # 256 is the MXU/VPU-friendly default; set equal to image_shape_edge for
    # exact-parity runs against the reference's odd 250-pixel chain.
    tile_size: int = 256
    nb_images_per_cities: int = 11
    nb_input_channels: int = 23
    nb_metadata_features: int = 8
    temporal_length: int = 828
    temporal_start_year: int = 1951
    temporal_end_year: int = 2019
    num_dw_classes: int = 9
    input_channels: tuple[str, ...] = (
        "before_ghap", "before_ndvi", "before_temp", "before_rgb",
        "change_mask", "before_dw", "after_dw",
    )
    # NDVI first: its channel gets the tanh output activation
    # (reference conf/config.yaml:29, src/model.py:286-291).
    target_channels: tuple[str, ...] = ("after_ndvi", "after_temp")
    train_ratio: float = 0.7
    test_ratio: float = 0.2
    val_ratio: float = 0.1
    # Change-filter thresholds (reference src/data/processing_10m/process.py:22-24).
    ndvi_change_threshold: float = 0.1
    temp_change_threshold: float = 0.1
    dw_change_threshold: float = 0.1
    holdout_city_ratio: float = 0.01


@dataclass(frozen=True)
class TrainingConfig:
    """Mirrors conf/config.yaml `training:` (reference conf/config.yaml:40-52)."""

    optimizer: str = "adamw"           # adamw | adam | sgd
    loss: str = "l1-gradient-ssim"     # mse | mse-gradient | l1-gradient-ssim
    epochs: int = 50
    gradient_clipping: float = 0.0     # global-norm clip; 0 disables
    batch_size: int = 16
    learning_rate: float = 1e-4
    momentum: float = 0.9
    lstm_hidden: int = 96
    meta_dim: int = 64
    temporal_dim: int = 64
    weight_decay: float = 1e-3
    base_filters: int = 64
    model_type: str = "unet"           # unet | unet++
    temporal_embeddings: bool = True
    metadata_embeddings: bool = True
    deep_supervision: bool = False
    # TPU compute policy: bf16 matmul/conv compute with f32 params & reductions.
    compute_dtype: str = "bfloat16"
    # jax.checkpoint each VGGBlock (recompute in backward): trades FLOPs for
    # activation memory — for big batches or 512px training tiles.
    remat: bool = False
    # Keep an eval/checkpoint copy every epoch (the reference keeps best-val
    # only and cannot resume optimizer state, src/train.py:303-320).
    keep_last_checkpoints: int = 3


@dataclass(frozen=True)
class LoggingConfig:
    """Mirrors conf/config.yaml `logging:` (reference conf/config.yaml:36-38)."""

    frequency_log: int = 200
    frequency_plt: int = 1000


@dataclass(frozen=True)
class ModelConfig:
    """Serving-time model geometry (reference conf/config.yaml:55-59)."""

    img_size: int = 512


@dataclass(frozen=True)
class ParallelConfig:
    """TPU mesh layout. The reference is single-device (SURVEY.md §2.2); here
    data-parallel over ICI is first-class, with optional spatial sharding of
    the H axis for very large tiles (XLA inserts conv halo exchanges)."""

    data_axis: str = "data"
    spatial_axis: str = "spatial"
    data_parallel: int = -1   # -1 = all devices
    spatial_parallel: int = 1


@dataclass(frozen=True)
class Config:
    project_name: str = "urban_green_planning"
    seed: int = 42
    paths: PathsConfig = field(default_factory=PathsConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    logging: LoggingConfig = field(default_factory=LoggingConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    def with_overrides(self, **dotted: Any) -> "Config":
        """Return a new Config with dotted-key overrides, e.g.
        ``cfg.with_overrides(**{"training.batch_size": 8})``."""
        out = self
        for key, value in dotted.items():
            parts = key.split(".")
            out = _replace_nested(out, parts, value)
        return out


def _replace_nested(obj, parts: list[str], value):
    if len(parts) == 1:
        f = {fld.name: fld for fld in dataclasses.fields(obj)}[parts[0]]
        if isinstance(value, list):
            value = _freeze(value)
        return dataclasses.replace(obj, **{parts[0]: value})
    child = getattr(obj, parts[0])
    return dataclasses.replace(obj, **{parts[0]: _replace_nested(child, parts[1:], value)})


_SECTIONS = {
    "paths": PathsConfig,
    "dataset": DatasetConfig,
    "training": TrainingConfig,
    "logging": LoggingConfig,
    "model": ModelConfig,
    "parallel": ParallelConfig,
}


def load_config(path: str | None = None, overrides: dict[str, Any] | None = None) -> Config:
    """Load a Config from YAML (same section names as the reference's
    conf/config.yaml), ignoring unknown keys, then apply dotted overrides."""
    data: dict[str, Any] = {}
    if path is not None:
        with open(path) as f:
            data = yaml.safe_load(f) or {}

    kwargs: dict[str, Any] = {}
    for name, cls in _SECTIONS.items():
        section = data.get(name, {}) or {}
        names = {fld.name for fld in dataclasses.fields(cls)}
        clean = {k: _freeze(v) for k, v in section.items() if k in names}
        kwargs[name] = cls(**clean)
    for scalar in ("project_name", "seed"):
        if scalar in data:
            kwargs[scalar] = data[scalar]

    cfg = Config(**kwargs)
    if overrides:
        cfg = cfg.with_overrides(**overrides)
    return cfg
