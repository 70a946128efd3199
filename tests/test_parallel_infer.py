"""Sharded inference/eval: the mesh past the Trainer (round-4 priority #1).

Proves the Pallas packed-resident inference path under a GSPMD mesh: the
fused conv kernels run (interpret mode) per shard inside shard_map with the
batch sharded over ALL mesh axes, and outputs must match single-device
execution.  Also covers the evaluator's --use-mesh path and the serving
engine's mesh-sharded predict_many."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maunet_tpu.data.dataset import NpzDataset, make_batches
from maunet_tpu.data.synthetic import generate_dataset
from maunet_tpu.models import UrbanPredictor
from maunet_tpu.ops.pallas import packed_vgg as pvgg
from maunet_tpu.parallel.infer import (
    make_sharded_forward_fn,
    round_up_to_mesh,
    shard_batch_fn,
)
from maunet_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def synthetic_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_pinfer")
    return generate_dataset(str(root), {"train": 6, "val": 2, "test": 5},
                            hw=32, temporal_len=64)


def _model(model_type: str):
    return UrbanPredictor(
        model_type, base_filters=16, temporal_dim=8, meta_dim=8, lstm_dim=8,
        compute_dtype=jnp.float32, pack_lanes=True, pack_min_s=2)


def _inputs(rng, b=8, hw=64, t=24):
    maps = jnp.asarray(rng.normal(size=(b, hw, hw, 23)), jnp.float32)
    series = jnp.asarray(rng.normal(size=(b, t)), jnp.float32)
    meta = jnp.asarray(rng.normal(size=(b, 8)), jnp.float32)
    lengths = jnp.asarray(rng.integers(1, t, size=(b,)), jnp.int32)
    return maps, series, meta, lengths


@pytest.mark.parametrize("model_type", ["unet", "unet++"])
def test_sharded_forward_matches_single_pallas(model_type, rng, monkeypatch):
    """The flagship check: fused Pallas kernels (interpret mode) executing
    under a 2-axis mesh with the batch sharded over both axes flattened —
    bitwise-level agreement with the unsharded forward."""
    monkeypatch.setattr(pvgg, "INTERPRET", True)
    model = _model(model_type)
    maps, series, meta, lengths = _inputs(rng)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), maps, series, meta, lengths)
    ref = model.apply(variables, maps, series, meta, lengths)

    mesh = make_mesh(4, 2)  # both axes carry data samples when flattened
    batch = {"maps": maps, "temp_series": series, "metadata": meta,
             "temp_lengths": lengths,
             "t1_dates": jnp.zeros((maps.shape[0], 2), jnp.float32),
             "t2_dates": jnp.zeros((maps.shape[0], 2), jnp.float32)}

    def fwd(variables, batch):
        return model.apply(variables, batch["maps"], batch["temp_series"],
                           batch["metadata"], batch["temp_lengths"])

    out = shard_batch_fn(fwd, mesh)(variables, batch)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_sharded_forward_fn_metadata_concat(rng):
    """make_sharded_forward_fn applies the 8-feature metadata concat per
    shard (reference src/train.py:244) and matches the single-device
    make_forward_fn on the XLA path."""
    from maunet_tpu.train.steps import make_forward_fn

    model = _model("unet")
    maps, series, meta, lengths = _inputs(rng, b=8, hw=32)
    batch = {"maps": maps, "temp_series": series,
             "metadata": meta[:, :4],
             "temp_lengths": lengths,
             "t1_dates": meta[:, 4:6], "t2_dates": meta[:, 6:8]}
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), maps, series, meta, lengths)
    ref = make_forward_fn(model, 8)(variables, batch)
    mesh = make_mesh(8, 1)
    out = make_sharded_forward_fn(model, 8, mesh)(variables, batch)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_round_up_to_mesh():
    mesh = make_mesh(4, 2)
    assert round_up_to_mesh(1, mesh) == 8
    assert round_up_to_mesh(8, mesh) == 8
    assert round_up_to_mesh(9, mesh) == 16


@pytest.fixture(scope="module")
def native_checkpoint(synthetic_root, tmp_path_factory):
    """A native orbax checkpoint trained one step on the synthetic data."""
    from maunet_tpu.train import create_train_state, make_optimizer
    from maunet_tpu.train.checkpoint import save_checkpoint

    model = UrbanPredictor("unet", base_filters=4, temporal_dim=4, meta_dim=8,
                           lstm_dim=8, compute_dtype=jnp.float32)
    opt = make_optimizer("adamw", 1e-3)
    ds = NpzDataset(f"{synthetic_root}/train", temporal_length=64)
    batch = next(make_batches(ds, 2)).as_dict()
    state = create_train_state(model, opt, jax.random.PRNGKey(0), batch)
    path = str(tmp_path_factory.mktemp("ckpt") / "native")
    save_checkpoint(path, state, {
        "epoch": 0,
        "hyperparameters": {
            "model_type": "unet", "base_filters": 4, "temporal_dim": 4,
            "meta_dim": 8, "lstm_hidden": 8, "batch_size": 4,
            "temporal_embeddings": True, "metadata_embeddings": True,
            "metadata_input_length": 8,
        },
        "metadata_input_length": 8, "trial_id": 1,
    })
    return path


def test_evaluate_checkpoint_use_mesh(native_checkpoint, synthetic_root,
                                      tmp_path):
    """evaluate --use-mesh: same CSV numbers as the single-device run, hot
    loop sharded over the 8-device mesh (batch size rounds up to the mesh)."""
    from maunet_tpu.config import Config
    from maunet_tpu.evaluate.evaluator import evaluate_checkpoint

    cfg = Config().with_overrides(**{"dataset.temporal_length": 64})
    kw = dict(cfg=cfg, data_dir=synthetic_root, study_name="mesh",
              n_visualize=0, precision="float32", batch_size=3)
    df_single = evaluate_checkpoint(
        native_checkpoint, output_dir=str(tmp_path / "single"), **kw)
    df_mesh = evaluate_checkpoint(
        native_checkpoint, output_dir=str(tmp_path / "mesh"),
        use_mesh=True, **kw)

    assert len(df_single) == len(df_mesh)
    key = ["sample_idx", "channel", "dw_class"]
    a = df_single.sort_values(key).reset_index(drop=True)
    b = df_mesh.sort_values(key).reset_index(drop=True)
    for col in ("mae", "rmse"):
        np.testing.assert_allclose(a[col].to_numpy(), b[col].to_numpy(),
                                   rtol=1e-4)


def test_engine_predict_many_mesh(native_checkpoint, rng):
    """PlannerEngine with a mesh serves request batches data-parallel;
    results match the per-request single-device path (pad rows dropped)."""
    from maunet_tpu.apps.engine import PlannerEngine, PlannerInput

    mesh = make_mesh(4, 2)
    eng = PlannerEngine(native_checkpoint, temporal_length=64, mesh=mesh)
    eng_single = PlannerEngine(native_checkpoint, temporal_length=64)
    inputs = [
        PlannerInput(
            maps=rng.normal(size=(1, 32, 32, 23)).astype(np.float32),
            metadata=rng.normal(size=(1, 8)).astype(np.float32),
            temp_series=rng.normal(size=(1, 64)).astype(np.float32),
            temp_lengths=np.array([40], np.int32),
        )
        for _ in range(3)  # deliberately not a multiple of the mesh size
    ]
    many = eng.predict_many(inputs)
    assert len(many) == 3
    for inp, (ndvi, lst) in zip(inputs, many):
        ndvi1, lst1 = eng_single.predict(inp)
        np.testing.assert_allclose(ndvi, ndvi1, atol=1e-5)
        np.testing.assert_allclose(lst, lst1, atol=1e-4)
