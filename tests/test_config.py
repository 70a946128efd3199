"""Config system tests."""

import dataclasses

import pytest
import yaml

from maunet_tpu.config import Config, load_config


def test_defaults_mirror_reference_yaml():
    cfg = Config()
    # semantics of conf/config.yaml (reference :11-61)
    assert cfg.dataset.nb_input_channels == 23
    assert cfg.dataset.nb_metadata_features == 8
    assert cfg.dataset.temporal_length == 828
    assert cfg.dataset.image_shape_edge == 250
    assert cfg.dataset.target_channels == ("after_ndvi", "after_temp")
    assert cfg.training.batch_size == 16
    assert cfg.training.loss == "l1-gradient-ssim"
    assert cfg.training.lstm_hidden == 96
    assert cfg.training.meta_dim == 64
    assert cfg.training.temporal_dim == 64
    assert cfg.logging.frequency_log == 200
    assert cfg.model.img_size == 512
    assert cfg.seed == 42


def test_yaml_load_and_unknown_keys(tmp_path):
    path = tmp_path / "cfg.yaml"
    path.write_text(yaml.safe_dump({
        "seed": 7,
        "training": {"batch_size": 4, "bogus_key": 1},
        "dataset": {"temporal_length": 64},
        "paths": {"data_root": "/data/x"},
    }))
    cfg = load_config(str(path))
    assert cfg.seed == 7
    assert cfg.training.batch_size == 4
    assert cfg.dataset.temporal_length == 64
    assert cfg.paths.data_root == "/data/x"
    assert cfg.paths.processed_image_dataset.startswith("/data/x")
    assert cfg.training.epochs == 50  # untouched default


def test_overrides_and_immutability():
    cfg = Config()
    cfg2 = cfg.with_overrides(**{"training.learning_rate": 3e-3,
                                 "dataset.tile_size": 512})
    assert cfg2.training.learning_rate == 3e-3
    assert cfg2.dataset.tile_size == 512
    assert cfg.training.learning_rate == 1e-4  # original untouched
    with pytest.raises(dataclasses.FrozenInstanceError):
        cfg.seed = 1  # type: ignore[misc]


def test_to_dict_roundtrippable():
    d = Config().to_dict()
    assert d["training"]["optimizer"] == "adamw"
    assert isinstance(d["dataset"]["input_channels"], tuple)
