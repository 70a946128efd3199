"""Interop edge cases: legacy embedding-flag resolution (three checkpoint
generations, reference test/evaluate.py:92-114), bare state_dict files, and
shape-based hyperparameter inference."""

import numpy as np
import pytest

from reference_loader import make_reference_checkpoint, reference_available

from maunet_tpu.interop.torch_import import (
    infer_hyperparams,
    resolve_embedding_flags,
)


def test_modern_flags_win():
    ckpt = {"hyperparameters": {"temporal_embeddings": False,
                                "metadata_embeddings": True}}
    assert resolve_embedding_flags(ckpt) == (False, True)


def test_legacy_additional_embeddings():
    # generation 2: additional_embeddings flag
    assert resolve_embedding_flags({"additional_embeddings": True}) == (True, True)
    assert resolve_embedding_flags({"additional_embeddings": False,
                                    "metadata_only_embeddings": True}) == (False, True)
    assert resolve_embedding_flags({"additional_embeddings": False}) == (False, False)


def test_legacy_noemb_study_name():
    # generation 1: encoded in the study name only
    assert resolve_embedding_flags({"study_name": "run-noemb"}) == (False, False)
    assert resolve_embedding_flags({}, study_name="x-noemb") == (False, False)
    assert resolve_embedding_flags({"study_name": "run-emb"}) == (True, True)


@pytest.mark.skipif(not reference_available(), reason="reference tree not mounted")
def test_bare_state_dict_and_shape_inference(tmp_path):
    """A stripped checkpoint (bare state_dict, no metadata — the reference app
    rewrites checkpoints this way) still loads: architecture comes from
    weight shapes."""
    import torch

    from maunet_tpu.interop import load_torch_checkpoint

    make_reference_checkpoint(str(tmp_path / "full.pth"), base_filters=4,
                              temporal_dim=4, meta_dim=6, lstm_dim=8)
    full = torch.load(str(tmp_path / "full.pth"), weights_only=False)
    torch.save(full["model_state_dict"], str(tmp_path / "bare.pth"))

    variables, hp, ckpt = load_torch_checkpoint(str(tmp_path / "bare.pth"))
    assert hp["base_filters"] == 4
    assert hp["temporal_dim"] == 4
    assert hp["meta_dim"] == 6
    assert hp["lstm_hidden"] == 8
    assert hp["spatial_channels"] == 23
    assert hp["meta_features"] == 8
    assert hp["out_channels"] == 2
    assert hp["model_type"] == "unet"
    assert not hp["deep_supervision"]
    # encoders present in weights → flags True under the legacy default
    assert hp["temporal_embeddings"] and hp["metadata_embeddings"]

    from maunet_tpu.models import build_model
    import jax.numpy as jnp

    model = build_model(hp, compute_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    out = model.apply(
        variables,
        jnp.asarray(rng.normal(size=(1, 32, 32, 23)), jnp.float32),
        jnp.asarray(rng.normal(size=(1, 40)), jnp.float32),
        jnp.asarray(rng.normal(size=(1, 8)), jnp.float32),
        jnp.asarray([40], jnp.int32))
    assert out.shape == (1, 32, 32, 2)


@pytest.mark.skipif(not reference_available(), reason="reference tree not mounted")
def test_unetpp_checkpoint_inference(tmp_path):
    import torch

    from maunet_tpu.interop import load_torch_checkpoint

    make_reference_checkpoint(str(tmp_path / "pp.pth"), model_type="unet++",
                              base_filters=4)
    variables, hp, _ = load_torch_checkpoint(str(tmp_path / "pp.pth"))
    assert hp["model_type"] == "unet++"
    # U-Net++ always gets both encoders (reference swallows ablation flags)
    assert hp["temporal_embeddings"] and hp["metadata_embeddings"]
    assert "conv0_4" in variables["params"]
