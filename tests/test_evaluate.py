"""Evaluation subsystem tests: metric parity with scipy/numpy and the
end-to-end evaluator CSV contract (including reference .pth checkpoints)."""

import os

import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest
from scipy import ndimage

from reference_loader import reference_available

from maunet_tpu.config import Config
from maunet_tpu.data.synthetic import generate_dataset
from maunet_tpu.evaluate import (
    dw_map_from_input,
    eval_metrics,
    laplacian_variance,
    unnormalize_targets,
)
from maunet_tpu.data.schema import NormalizationStats
from maunet_tpu.evaluate.evaluator import evaluate_checkpoint
from maunet_tpu.utils.dw import DW_CLASSES


@pytest.fixture(scope="module")
def synthetic_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_eval")
    return generate_dataset(str(root), {"train": 6, "val": 2, "test": 5},
                            hw=32, temporal_len=64)


def test_laplacian_variance_matches_scipy(rng):
    x = rng.normal(size=(2, 3, 17, 23)).astype(np.float32)
    ours = np.asarray(laplacian_variance(jnp.asarray(x)))
    for b in range(2):
        for c in range(3):
            expected = np.var(ndimage.laplace(x[b, c]))
            np.testing.assert_allclose(ours[b, c], expected, rtol=1e-4)


def test_eval_metrics_match_numpy(rng):
    b, h, w, c = 2, 16, 16, 2
    pred = rng.normal(size=(b, h, w, c)).astype(np.float32)
    tgt = rng.normal(size=(b, h, w, c)).astype(np.float32)
    dw = rng.integers(0, 9, size=(b, h, w)).astype(np.int32)
    m = {k: np.asarray(v) for k, v in eval_metrics(
        jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(dw)).items()}

    for i in range(b):
        for ch in range(c):
            p, t = pred[i, :, :, ch], tgt[i, :, :, ch]
            np.testing.assert_allclose(m["mae"][i, ch], np.abs(p - t).mean(),
                                       rtol=1e-5)
            np.testing.assert_allclose(m["rmse"][i, ch],
                                       np.sqrt(((p - t) ** 2).mean()), rtol=1e-5)
            for k in range(9):
                mask = dw[i] == k
                if mask.any():
                    np.testing.assert_allclose(
                        m["class_mae"][i, ch, k],
                        np.abs(p[mask] - t[mask]).mean(), rtol=1e-4)
                else:
                    assert np.isnan(m["class_mae"][i, ch, k])


def test_dw_map_roundtrip(rng):
    dw = rng.integers(0, 9, size=(2, 8, 8))
    onehot = np.eye(9, dtype=np.float32)[dw]
    maps = np.concatenate([onehot, rng.normal(size=(2, 8, 8, 14))], axis=-1)
    np.testing.assert_array_equal(np.asarray(dw_map_from_input(jnp.asarray(maps))), dw)


def test_unnormalize():
    stats = NormalizationStats((0,)*3, (1,)*3, 30.0, 5.0, (0,)*4, (1,)*4, 0, 1)
    arr = jnp.asarray(np.ones((1, 4, 4, 2), np.float32))
    out = np.asarray(unnormalize_targets(arr, stats))
    np.testing.assert_allclose(out[..., 0], 1.0)   # NDVI untouched
    np.testing.assert_allclose(out[..., 1], 35.0)  # LST → °C


@pytest.mark.skipif(not reference_available(), reason="reference tree not mounted")
def test_evaluator_end_to_end_with_torch_checkpoint(synthetic_root, tmp_path):
    """Full pipeline: a reference-format .pth checkpoint is converted and
    evaluated; the CSV must carry the reference schema."""
    import torch

    from reference_loader import load_reference_model_module

    ref = load_reference_model_module()
    torch.manual_seed(0)
    model = ref.UrbanPredictor(
        model_type="unet", spatial_channels=23, seq_len=64, temporal_dim=4,
        meta_features=8, meta_dim=6, lstm_dim=8, out_channels=2,
        base_filters=4, temporal_embeddings=True, metadata_embeddings=True)
    ckpt_path = str(tmp_path / "ref_model.pth")
    torch.save({
        "epoch": 3, "step": 100, "model_state_dict": model.state_dict(),
        "loss": 0.5,
        "hyperparameters": {
            "batch_size": 4, "temporal_dim": 4, "meta_dim": 6,
            "lstm_hidden": 8, "base_filters": 4, "model_type": "unet",
            "temporal_embeddings": True, "metadata_embeddings": True,
        },
        "model_type": "unet", "study_name": "ref-emb", "trial_id": 7,
        "metadata_input_length": 8,
    }, ckpt_path)

    cfg = Config().with_overrides(**{"dataset.temporal_length": 64})
    df = evaluate_checkpoint(
        ckpt_path, cfg, data_dir=synthetic_root, study_name="t",
        output_dir=str(tmp_path / "reports"), n_visualize=1)

    expected_cols = {
        "sample_idx", "channel", "dw_class", "mae", "rmse",
        "laplacian_var_pred", "laplacian_var_gt", "is_known_city",
        "t1_year", "t1_month", "t2_year", "t2_month", "time_delta",
        "city", "lat", "lon",
    }
    assert expected_cols <= set(df.columns)
    assert df["sample_idx"].nunique() == 5
    assert set(df["channel"]) == {"after_ndvi", "after_temp"}
    overall = df[df["dw_class"] == "overall"]
    assert len(overall) == 10  # 5 samples × 2 channels
    assert overall["mae"].notna().all()
    assert set(df["dw_class"]) - {"overall"} <= set(DW_CLASSES.values())
    # held-out city (Perth appears only in test split) → unknown
    assert (~df[df["city"] == "Perth"]["is_known_city"]).all()
    assert df[df["city"] == "Rome"]["is_known_city"].all()

    out_csvs = [f for f in os.listdir(tmp_path / "reports") if f.endswith(".csv")]
    assert any(f == "t_unet_emb_7_job_evaluation.csv" for f in out_csvs)
    assert any(f.endswith("_info.csv") for f in out_csvs)
    viz = os.listdir(tmp_path / "reports" / "visualizations")
    assert len(viz) == 1

    # cross-check one overall row against a host-side reference-style compute
    import jax

    from maunet_tpu.evaluate.evaluator import load_any_checkpoint
    from maunet_tpu.data.dataset import NpzDataset, make_batches

    loaded = load_any_checkpoint(ckpt_path)
    ds = NpzDataset(f"{synthetic_root}/test", temporal_length=64)
    batch = next(make_batches(ds, 4))
    out = loaded.model.apply(
        loaded.variables, jnp.asarray(batch.maps), jnp.asarray(batch.temp_series),
        jnp.asarray(batch.metadata_full), jnp.asarray(batch.temp_lengths))
    stats = NormalizationStats.from_json(
        os.path.join(synthetic_root, "normalization_metrics.json"))
    pred_lst = np.asarray(out)[0, :, :, 1] * stats.temp_std + stats.temp_mean
    gt_lst = batch.targets[0, :, :, 1] * stats.temp_std + stats.temp_mean
    expected_mae = np.abs(pred_lst - gt_lst).mean()
    row = df[(df.sample_idx == 0) & (df.channel == "after_temp")
             & (df.dw_class == "overall")].iloc[0]
    np.testing.assert_allclose(row["mae"], expected_mae, rtol=1e-3)
