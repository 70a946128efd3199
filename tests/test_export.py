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
def test_optimizer_state_export_resume(rng, tmp_path):
    """JAX AdamW state → .pth → torch optimizer loads it and resumes:
    per-param exp_avg/exp_avg_sq land on the right torch parameters
    (cross-framework training resume; reference embeds optimizer_state_dict
    at src/train.py:305-319)."""
    import jax
    import jax.numpy as jnp
    import optax
    import torch

    from reference_loader import load_reference_model_module

    from maunet_tpu.interop.torch_export import export_torch_checkpoint
    from maunet_tpu.models import UrbanPredictor

    model = UrbanPredictor("unet", base_filters=4, temporal_dim=4, meta_dim=6,
                           lstm_dim=8, compute_dtype=jnp.float32)
    maps = jnp.asarray(rng.normal(size=(2, 16, 16, 23)), jnp.float32)
    series = jnp.asarray(rng.normal(size=(2, 24)), jnp.float32)
    meta = jnp.asarray(rng.normal(size=(2, 8)), jnp.float32)
    lengths = jnp.asarray([24, 24], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), maps, series, meta, lengths)
    params, batch_stats = variables["params"], variables["batch_stats"]

    tx = optax.adamw(1e-3, weight_decay=1e-2)
    opt_state = tx.init(params)

    def loss_fn(p):
        out, _ = model.apply({"params": p, "batch_stats": batch_stats},
                             maps, series, meta, lengths,
                             train=True, mutable=["batch_stats"])
        return jnp.mean(out ** 2)

    for _ in range(3):  # populate non-trivial mu/nu
        grads = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

    hp = {"model_type": "unet", "base_filters": 4, "temporal_dim": 4,
          "meta_dim": 6, "lstm_hidden": 8, "lr": 1e-3, "weight_decay": 1e-2,
          "optimizer": "adamw",
          "temporal_embeddings": True, "metadata_embeddings": True}
    path = str(tmp_path / "with_opt.pth")
    export_torch_checkpoint(
        path, jax.device_get({"params": params, "batch_stats": batch_stats}),
        hp, opt_state=jax.device_get(opt_state))

    ref = load_reference_model_module()
    tm = ref.UrbanPredictor(
        model_type="unet", spatial_channels=23, seq_len=24, temporal_dim=4,
        meta_features=8, meta_dim=6, lstm_dim=8, out_channels=2,
        base_filters=4, temporal_embeddings=True, metadata_embeddings=True)
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    tm.load_state_dict(ckpt["model_state_dict"])
    optim = torch.optim.AdamW(tm.parameters(), lr=1e-3, weight_decay=1e-2)
    optim.load_state_dict(ckpt["optimizer_state_dict"])

    # every param got state, step count came through, and the moments landed
    # on the right torch parameter (check one conv + the final 1x1)
    import optax as _optax

    from maunet_tpu.interop.torch_export import _find_state

    adam = _find_state(jax.device_get(opt_state), _optax.ScaleByAdamState)
    named = dict(tm.named_parameters())
    name_list = list(named)
    t_params = list(tm.parameters())
    for probe in ("model.final.weight", "model.conv0_0.conv1.weight",
                  "model.temporal_encoder.lstm.weight_ih_l0"):
        p = t_params[name_list.index(probe)]
        st = optim.state[p]
        assert float(st["step"]) == 3.0
        assert st["exp_avg"].shape == p.shape
    mu_final = np.asarray(adam.mu["final"]["kernel"])  # (1,1,Cin,Cout)
    got = optim.state[named["model.final.weight"]]["exp_avg"].numpy()
    np.testing.assert_allclose(got, mu_final.transpose(3, 2, 0, 1), rtol=1e-6)

    # torch can actually take a resumed step
    out = tm(torch.from_numpy(np.asarray(maps).transpose(0, 3, 1, 2)),
             torch.from_numpy(np.asarray(series)),
             torch.from_numpy(np.asarray(meta)))
    out.pow(2).mean().backward()
    optim.step()
    assert all(torch.isfinite(q).all() for q in tm.parameters())


@pytest.mark.skipif(not reference_available(), reason="reference tree not mounted")
def test_optimizer_state_export_sgd(rng, tmp_path):
    """SGD momentum buffers round-trip into torch.optim.SGD."""
    import jax
    import jax.numpy as jnp
    import torch

    from reference_loader import load_reference_model_module

    from maunet_tpu.interop.torch_export import export_torch_checkpoint
    from maunet_tpu.models import UrbanPredictor
    from maunet_tpu.train.optimizers import make_optimizer

    model = UrbanPredictor("unet", base_filters=4, temporal_dim=4, meta_dim=6,
                           lstm_dim=8, compute_dtype=jnp.float32)
    maps = jnp.asarray(rng.normal(size=(1, 16, 16, 23)), jnp.float32)
    series = jnp.asarray(rng.normal(size=(1, 24)), jnp.float32)
    meta = jnp.asarray(rng.normal(size=(1, 8)), jnp.float32)
    lengths = jnp.asarray([24], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), maps, series, meta, lengths)
    params, batch_stats = variables["params"], variables["batch_stats"]

    tx = make_optimizer("sgd", learning_rate=1e-2, momentum=0.9)
    opt_state = tx.init(params)
    import optax

    def loss_fn(p):
        out, _ = model.apply({"params": p, "batch_stats": batch_stats},
                             maps, series, meta, lengths,
                             train=True, mutable=["batch_stats"])
        return jnp.mean(out ** 2)

    grads = jax.grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)

    hp = {"model_type": "unet", "base_filters": 4, "temporal_dim": 4,
          "meta_dim": 6, "lstm_hidden": 8, "lr": 1e-2, "optimizer": "sgd",
          "momentum": 0.9,
          "temporal_embeddings": True, "metadata_embeddings": True}
    path = str(tmp_path / "sgd.pth")
    export_torch_checkpoint(
        path, jax.device_get({"params": params, "batch_stats": batch_stats}),
        hp, opt_state=jax.device_get(opt_state))

    ref = load_reference_model_module()
    tm = ref.UrbanPredictor(
        model_type="unet", spatial_channels=23, seq_len=24, temporal_dim=4,
        meta_features=8, meta_dim=6, lstm_dim=8, out_channels=2,
        base_filters=4, temporal_embeddings=True, metadata_embeddings=True)
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    tm.load_state_dict(ckpt["model_state_dict"])
    optim = torch.optim.SGD(tm.parameters(), lr=1e-2, momentum=0.9)
    optim.load_state_dict(ckpt["optimizer_state_dict"])
    named = dict(tm.named_parameters())
    buf = optim.state[named["model.final.weight"]]["momentum_buffer"]
    assert buf.shape == named["model.final.weight"].shape
    assert buf.abs().sum() > 0


@pytest.mark.skipif(not reference_available(), reason="reference tree not mounted")
def test_reference_param_order_matches_torch(rng):
    """Our hardcoded reference_param_order exactly matches
    model.named_parameters() order for both model types."""
    from reference_loader import load_reference_model_module

    from maunet_tpu.interop.torch_export import reference_param_order

    ref = load_reference_model_module()
    for model_type, ds in (("unet", False), ("unet++", False), ("unet++", True)):
        tm = ref.UrbanPredictor(
            model_type=model_type, spatial_channels=23, seq_len=24,
            temporal_dim=4, meta_features=8, meta_dim=6, lstm_dim=8,
            out_channels=2, base_filters=4, deep_supervision=ds,
            temporal_embeddings=True, metadata_embeddings=True)
        got = [n for n, _ in tm.named_parameters()]
        assert got == reference_param_order(model_type, ds), (model_type, ds)


@pytest.mark.skipif(not reference_available(), reason="reference tree not mounted")
def test_cli_export_torch_from_trained_checkpoint(tmp_path):
    """Trainer checkpoint → `maunet export-torch` → torch model AND torch
    optimizer load the result (full cross-framework resume path)."""
    import torch

    from reference_loader import load_reference_model_module

    from maunet_tpu.cli import main
    from maunet_tpu.config import Config
    from maunet_tpu.data.synthetic import generate_dataset
    from maunet_tpu.train.loop import Trainer

    data = generate_dataset(str(tmp_path / "d"), {"train": 4, "val": 2, "test": 2},
                            hw=32, temporal_len=64)
    cfg = Config().with_overrides(**{
        "training.batch_size": 2, "training.base_filters": 4,
        "training.temporal_dim": 4, "training.meta_dim": 4,
        "training.lstm_hidden": 8, "training.compute_dtype": "float32",
        "training.loss": "mse", "training.optimizer": "adamw",
        "dataset.temporal_length": 64,
    })
    trainer = Trainer(cfg, data_dir=data, work_dir=str(tmp_path / "w"),
                      study_name="exp", use_mesh=False)
    trainer.train(epochs=1)
    ckpt_dir = str(tmp_path / "w" / "exp_trial_0_best")
    out_pth = str(tmp_path / "exported.pth")
    assert main(["export-torch", ckpt_dir, out_pth]) == 0

    ref = load_reference_model_module()
    tm = ref.UrbanPredictor(
        model_type="unet", spatial_channels=23, seq_len=64, temporal_dim=4,
        meta_features=8, meta_dim=4, lstm_dim=8, out_channels=2,
        base_filters=4, temporal_embeddings=True, metadata_embeddings=True)
    ckpt = torch.load(out_pth, map_location="cpu", weights_only=False)
    tm.load_state_dict(ckpt["model_state_dict"])
    optim = torch.optim.AdamW(tm.parameters(),
                              lr=ckpt["hyperparameters"]["learning_rate"],
                              weight_decay=ckpt["hyperparameters"]["weight_decay"])
    optim.load_state_dict(ckpt["optimizer_state_dict"])
    steps = {float(s["step"]) for s in optim.state.values()}
    assert steps and all(s >= 1.0 for s in steps)


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
