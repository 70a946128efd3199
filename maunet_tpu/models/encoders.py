"""Non-spatial context encoders: metadata MLP and CRU-history LSTM.

TPU design: the LSTM is a single ``lax.scan`` over a statically-shaped
(B, 828) padded series.  The input projection (input_size=1) for *all*
timesteps is hoisted out of the scan into one matmul; the recurrent matmul
(B, H)·(H, 4H) is the only per-step work.  Length handling is explicit:

- ``mask_mode='per_sample'`` (framework default): each sample's hidden state
  freezes at its own true length — the mathematically correct behaviour.
- ``mask_mode='batch_max'`` (parity mode): state freezes at the *batch max*
  length, replicating the reference's unmasked zero-padding leak-through
  (reference src/model.py:23-34 never uses lengths; its padding is only to
  the batch max via pad_sequence, src/dataset.py:106) — required to
  reproduce outputs of the public PyTorch checkpoints.
- ``mask_mode='none'``: run the full padded length.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _uniform_init(scale: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)
    return init


class TemporalEncoder(nn.Module):
    """LSTM(1 → hidden) over the monthly CRU series, last hidden state →
    Linear(hidden → out_dim).  Capability parity: reference src/model.py:23-34.

    Gate ordering in the packed weights is torch's (i, f, g, o) so the
    checkpoint converter is a pure transpose.
    """

    hidden_dim: int
    out_dim: int
    mask_mode: str = "per_sample"
    compute_dtype: jnp.dtype = jnp.bfloat16
    # 'auto': Pallas full-sequence kernel on TPU (ops/pallas/lstm.py — weights
    # and state stay in VMEM for all 828 steps), lax.scan elsewhere.
    backend: str = "auto"

    def _use_pallas(self) -> bool:
        if self.backend == "pallas":
            return True
        if self.backend == "scan":
            return False
        import jax

        return jax.default_backend() == "tpu"

    @nn.compact
    def __call__(self, series: jnp.ndarray, lengths: jnp.ndarray | None = None) -> jnp.ndarray:
        b, t = series.shape
        hd = self.hidden_dim
        scale = 1.0 / float(hd) ** 0.5
        w_ih = self.param("w_ih", _uniform_init(scale), (1, 4 * hd))
        w_hh = self.param("w_hh", _uniform_init(scale), (hd, 4 * hd))
        b_ih = self.param("b_ih", _uniform_init(scale), (4 * hd,))
        b_hh = self.param("b_hh", _uniform_init(scale), (4 * hd,))

        # Hoist the input projection out of the recurrence: one (B, T, 4H)
        # matmul feeds either backend.
        x_proj = series[..., None] * w_ih[0][None, None, :] + (b_ih + b_hh)

        # All three masking modes reduce to per-sample effective lengths.
        if lengths is None or self.mask_mode == "none":
            eff_lengths = jnp.full((b,), t, jnp.int32)
        elif self.mask_mode == "batch_max":
            eff_lengths = jnp.broadcast_to(jnp.max(lengths), (b,)).astype(jnp.int32)
        elif self.mask_mode == "per_sample":
            eff_lengths = lengths.astype(jnp.int32)
        else:
            raise ValueError(f"unknown mask_mode: {self.mask_mode}")

        from maunet_tpu.ops.pallas.lstm import lstm_last_hidden, lstm_last_hidden_scan

        if self._use_pallas():
            h_final = lstm_last_hidden(x_proj, w_hh, eff_lengths)
        else:
            h_final = lstm_last_hidden_scan(x_proj, w_hh, eff_lengths)
        out = nn.Dense(
            self.out_dim, name="fc",
            dtype=jnp.float32, param_dtype=jnp.float32,
        )(h_final)
        return out.astype(self.compute_dtype)


class MetadataEncoder(nn.Module):
    """MLP Linear(in→32) → ReLU → Linear(32→out_dim) over the 4- or 8-feature
    metadata vector (lat, lon, population, Δt [, t1/t2 dates]).
    Capability parity: reference src/model.py:38-48."""

    out_dim: int
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, meta: jnp.ndarray) -> jnp.ndarray:
        kw = dict(dtype=jnp.float32, param_dtype=jnp.float32)
        x = nn.relu(nn.Dense(32, name="fc0", **kw)(meta))
        x = nn.Dense(self.out_dim, name="fc2", **kw)(x)
        return x.astype(self.compute_dtype)
