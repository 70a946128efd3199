"""Golden parity tests: JAX models vs the actual reference PyTorch models.

Builds the reference ``UrbanPredictor`` (imported read-only from
/root/reference/src/model.py) with random weights, converts its state_dict
through maunet_tpu.interop, and asserts forward-pass agreement in f32.
This validates every parity-critical detail at once: conv/BN semantics,
align_corners=True bilinear (incl. the double-interpolation odd-size path),
LSTM gate order and padding behaviour, and the tanh-on-NDVI output split.
"""

import numpy as np
import pytest

from reference_loader import load_reference_model_module, reference_available

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

import jax.numpy as jnp  # noqa: E402

from maunet_tpu.interop import convert_state_dict, infer_hyperparams  # noqa: E402
from maunet_tpu.models import build_model  # noqa: E402


def _randomize_bn_stats(model, gen):
    """Give BN running stats non-trivial values so eval-mode parity actually
    exercises them."""
    for mod in model.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean.copy_(torch.randn(mod.running_mean.shape, generator=gen) * 0.3)
            mod.running_var.copy_(torch.rand(mod.running_var.shape, generator=gen) + 0.5)


def _make_torch_model(model_type, seq_len=40, temporal=True, metadata=True,
                      base_filters=8, deep_supervision=False, meta_features=8):
    ref = load_reference_model_module()
    gen = torch.Generator().manual_seed(0)
    torch.manual_seed(0)
    model = ref.UrbanPredictor(
        model_type=model_type,
        spatial_channels=23,
        seq_len=seq_len,
        temporal_dim=4,
        meta_features=meta_features,
        meta_dim=6,
        lstm_dim=8,
        out_channels=2,
        base_filters=base_filters,
        deep_supervision=deep_supervision,
        temporal_embeddings=temporal,
        metadata_embeddings=metadata,
    )
    model.eval()
    with torch.no_grad():
        _randomize_bn_stats(model, gen)
    return model


def _inputs(rng, b=2, hw=64, t=40, meta_features=8, lengths=None):
    maps = rng.normal(size=(b, 23, hw, hw)).astype(np.float32)
    series = rng.normal(size=(b, t)).astype(np.float32)
    if lengths is not None:
        for i, ln in enumerate(lengths):
            series[i, ln:] = 0.0  # zero padding as in reference collate
    meta = rng.normal(size=(b, meta_features)).astype(np.float32)
    return maps, series, meta


def _compare(torch_model, rng, hw=64, lengths=None, t=40, atol=2e-4):
    maps, series, meta = _inputs(rng, hw=hw, t=t, lengths=lengths)
    with torch.no_grad():
        ref_out = torch_model(
            torch.from_numpy(maps), torch.from_numpy(series), torch.from_numpy(meta)
        )

    state_dict = torch_model.state_dict()
    inner = torch_model.model
    is_pp = "unetpp" in type(inner).__name__
    # Real checkpoints always carry the embedding flags in `hyperparameters`
    # (reference src/train.py:156-168).
    ckpt_meta = {
        "model_type": "unet++" if is_pp else "unet",
        "hyperparameters": {
            "temporal_embeddings": getattr(inner, "temporal_embeddings", True),
            "metadata_embeddings": getattr(inner, "metadata_embeddings", True),
        },
    }
    hp = infer_hyperparams(state_dict, ckpt_meta)
    variables = convert_state_dict(state_dict)
    model = build_model(hp, lstm_mask_mode="batch_max", compute_dtype=jnp.float32)

    lengths_arr = (jnp.asarray(lengths, jnp.int32) if lengths is not None
                   else jnp.full((maps.shape[0],), t, jnp.int32))
    out = model.apply(
        variables,
        jnp.asarray(maps.transpose(0, 2, 3, 1)),
        jnp.asarray(series),
        jnp.asarray(meta),
        lengths_arr,
    )
    if isinstance(ref_out, list):  # deep supervision
        assert isinstance(out, tuple) and len(out) == len(ref_out)
        for r, o in zip(ref_out, out):
            np.testing.assert_allclose(
                np.asarray(o), r.numpy().transpose(0, 2, 3, 1), atol=atol)
    else:
        np.testing.assert_allclose(
            np.asarray(out), ref_out.numpy().transpose(0, 2, 3, 1), atol=atol)


def test_unet_parity(rng):
    _compare(_make_torch_model("unet"), rng)


def test_unet_parity_odd_size(rng):
    """50 → 25 → 12 → 6 → 3 chain: exercises the decoder's double
    interpolation (scale-2 then exact-size match)."""
    _compare(_make_torch_model("unet"), rng, hw=50)


def test_unet_parity_variable_lengths(rng):
    """Zero-padded variable-length CRU series, batch_max masking replicates
    the reference's padding leak-through (src/model.py:23-34)."""
    _compare(_make_torch_model("unet"), rng, lengths=[40, 23])


def test_unet_noemb_parity(rng):
    _compare(_make_torch_model("unet", temporal=False, metadata=False), rng)


def test_unet_metaemb_parity(rng):
    _compare(_make_torch_model("unet", temporal=False, metadata=True), rng)


def test_unetpp_parity(rng):
    _compare(_make_torch_model("unet++"), rng, hw=48)


def test_unetpp_parity_odd(rng):
    _compare(_make_torch_model("unet++"), rng, hw=50)


def test_unetpp_deep_supervision_parity(rng):
    _compare(_make_torch_model("unet++", deep_supervision=True), rng, hw=32)


def test_lstm_per_sample_masking_differs(rng):
    """per_sample masking (the corrected default) must differ from the
    reference's padding-leak behaviour when lengths < batch max, and agree
    for full-length samples."""
    import jax

    from maunet_tpu.models.encoders import TemporalEncoder

    series = rng.normal(size=(2, 40)).astype(np.float32)
    series[1, 23:] = 0.0
    lengths = jnp.asarray([40, 23], jnp.int32)
    leak = TemporalEncoder(8, 4, mask_mode="batch_max", compute_dtype=jnp.float32)
    masked = TemporalEncoder(8, 4, mask_mode="per_sample", compute_dtype=jnp.float32)
    variables = leak.init(jax.random.PRNGKey(0), jnp.asarray(series), lengths)
    out_leak = leak.apply(variables, jnp.asarray(series), lengths)
    out_masked = masked.apply(variables, jnp.asarray(series), lengths)
    assert not np.allclose(np.asarray(out_leak[1]), np.asarray(out_masked[1]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_leak[0]), np.asarray(out_masked[0]),
                               atol=1e-6)
