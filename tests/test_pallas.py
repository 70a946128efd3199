"""Pallas kernel tests (interpret mode on the CPU backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maunet_tpu.models.encoders import TemporalEncoder
from maunet_tpu.ops.pallas.lstm import lstm_last_hidden


def _scan_reference(x_proj, w_hh, lengths):
    b, t, four_h = x_proj.shape
    hd = four_h // 4
    h = jnp.zeros((b, hd), jnp.float32)
    c = jnp.zeros((b, hd), jnp.float32)
    active = jnp.arange(t)[:, None] < lengths[None, :]

    def step(carry, inp):
        h, c = carry
        xp, act = inp
        gates = xp + h @ w_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        m = act[:, None]
        return (jnp.where(m, h_new, h), jnp.where(m, c_new, c)), None

    (h, _), _ = jax.lax.scan(step, (h, c), (jnp.swapaxes(x_proj, 0, 1), active))
    return h


@pytest.mark.parametrize("t,lengths", [
    (128, [128, 128]),           # exactly one chunk
    (300, [300, 150]),           # partial final chunk + per-sample masking
    (828, [828, 400]),           # production length
])
def test_lstm_kernel_matches_scan(rng, t, lengths):
    b, hd = 2, 16
    x_proj = jnp.asarray(rng.normal(size=(b, t, 4 * hd)), jnp.float32)
    w_hh = jnp.asarray(rng.normal(size=(hd, 4 * hd)) * 0.1, jnp.float32)
    lens = jnp.asarray(lengths, jnp.int32)
    ours = lstm_last_hidden(x_proj, w_hh, lens, interpret=True)
    ref = _scan_reference(x_proj, w_hh, lens)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_masked_class_sums_matches_xla(rng):
    from maunet_tpu.evaluate.metrics import _class_sums_xla
    from maunet_tpu.ops.pallas.masked_stats import masked_class_sums

    b, h, w, c = 2, 16, 16, 2
    pred = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
    dw = jnp.asarray(rng.integers(0, 9, size=(b, h, w)), jnp.int32)

    err = pred - tgt
    ref = _class_sums_xla(jnp.abs(err), err * err, dw)
    ours = masked_class_sums(pred, tgt, dw, interpret=True)
    for a, b_ in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_temporal_encoder_backends_agree(rng):
    series = jnp.asarray(rng.normal(size=(2, 300)), jnp.float32)
    lengths = jnp.asarray([300, 123], jnp.int32)
    scan_enc = TemporalEncoder(16, 8, backend="scan", compute_dtype=jnp.float32)
    variables = scan_enc.init(jax.random.PRNGKey(0), series, lengths)
    out_scan = scan_enc.apply(variables, series, lengths)

    import maunet_tpu.ops.pallas.lstm as plstm

    orig = plstm.lstm_last_hidden

    def interpreted(x_proj, w_hh, lens, interpret=False):
        return orig(x_proj, w_hh, lens, interpret=True)

    plstm.lstm_last_hidden = interpreted
    try:
        pallas_enc = TemporalEncoder(16, 8, backend="pallas",
                                     compute_dtype=jnp.float32)
        out_pallas = pallas_enc.apply(variables, series, lengths)
    finally:
        plstm.lstm_last_hidden = orig
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_pallas),
                               atol=1e-5)
