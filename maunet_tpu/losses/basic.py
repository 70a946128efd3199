"""Pixelwise and gradient losses (pure JAX, NHWC).

Capability parity with reference src/utils/losses.py:5-57.  All reductions in
f32 regardless of input dtype (safe under bf16 training).
"""

from __future__ import annotations

import jax.numpy as jnp


def _f32(x):
    return x.astype(jnp.float32)


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((_f32(pred) - _f32(target)) ** 2)


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(_f32(pred) - _f32(target)))


def gradient_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """L1 difference of absolute finite-difference maps in both spatial
    directions (reference src/utils/losses.py:5-25).  NHWC: spatial axes 1, 2."""
    pred, target = _f32(pred), _f32(target)
    dy_p = jnp.abs(pred[:, 1:, :, :] - pred[:, :-1, :, :])
    dx_p = jnp.abs(pred[:, :, 1:, :] - pred[:, :, :-1, :])
    dy_t = jnp.abs(target[:, 1:, :, :] - target[:, :-1, :, :])
    dx_t = jnp.abs(target[:, :, 1:, :] - target[:, :, :-1, :])
    return jnp.mean(jnp.abs(dy_p - dy_t)) + jnp.mean(jnp.abs(dx_p - dx_t))
