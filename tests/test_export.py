"""JAX → .pth export round-trip and profiling-utility tests."""

import numpy as np
import pytest

from reference_loader import reference_available

from maunet_tpu.utils.profiling import StepTimer, device_memory_stats


def test_step_timer():
    import time

    t = StepTimer(skip_first=1)
    for _ in range(5):
        t.tick()
        time.sleep(0.01)
    s = t.summary()
    assert s["n"] == 3
    assert 0.005 < s["mean_s"] < 0.1
    assert s["steps_per_s"] > 5


def test_device_memory_stats():
    stats = device_memory_stats()
    assert len(stats) == 8  # virtual CPU devices
    assert all("device" in s for s in stats)


@pytest.mark.skipif(not reference_available(), reason="reference tree not mounted")
def test_torch_export_roundtrip(rng, tmp_path):
    """JAX-init variables → .pth → import → identical variables, and the
    exported checkpoint loads into the actual reference torch model."""
    import jax
    import jax.numpy as jnp
    import torch

    from reference_loader import load_reference_model_module

    from maunet_tpu.interop import convert_state_dict, load_torch_checkpoint
    from maunet_tpu.interop.torch_export import export_torch_checkpoint
    from maunet_tpu.models import UrbanPredictor

    model = UrbanPredictor("unet", base_filters=4, temporal_dim=4, meta_dim=6,
                           lstm_dim=8, compute_dtype=jnp.float32)
    maps = jnp.asarray(rng.normal(size=(1, 32, 32, 23)), jnp.float32)
    series = jnp.asarray(rng.normal(size=(1, 40)), jnp.float32)
    meta = jnp.asarray(rng.normal(size=(1, 8)), jnp.float32)
    lengths = jnp.asarray([40], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), maps, series, meta, lengths)

    hp = {"model_type": "unet", "base_filters": 4, "temporal_dim": 4,
          "meta_dim": 6, "lstm_hidden": 8,
          "temporal_embeddings": True, "metadata_embeddings": True}
    path = str(tmp_path / "exported.pth")
    export_torch_checkpoint(path, jax.device_get(variables), hp,
                            study_name="export-test", trial_id=0)

    # 1) bit-exact round trip through our importer
    re_vars, re_hp, _ = load_torch_checkpoint(path)
    flat_a = jax.tree_util.tree_leaves_with_path(jax.device_get(variables)["params"])
    flat_b = dict(jax.tree_util.tree_leaves_with_path(re_vars["params"]))
    for key, a in flat_a:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(flat_b[key]))

    # 2) the reference torch model loads it and agrees on the forward pass
    ref = load_reference_model_module()
    tm = ref.UrbanPredictor(
        model_type="unet", spatial_channels=23, seq_len=40, temporal_dim=4,
        meta_features=8, meta_dim=6, lstm_dim=8, out_channels=2,
        base_filters=4, temporal_embeddings=True, metadata_embeddings=True)
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    tm.load_state_dict(ckpt["model_state_dict"])
    tm.eval()
    with torch.no_grad():
        torch_out = tm(
            torch.from_numpy(np.asarray(maps).transpose(0, 3, 1, 2)),
            torch.from_numpy(np.asarray(series)),
            torch.from_numpy(np.asarray(meta)))
    jax_out = model.apply(variables, maps, series, meta, lengths)
    np.testing.assert_allclose(
        np.asarray(jax_out), torch_out.numpy().transpose(0, 2, 3, 1), atol=2e-4)
