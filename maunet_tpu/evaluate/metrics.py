"""On-device evaluation metrics.

The reference evaluator computes per-sample × per-channel × per-DW-class
MAE/RMSE and Laplacian-variance sharpness in Python loops on the host
(test/evaluate.py:210-275).  Here the whole block is one jitted function:
the 9-class masked reductions vectorize as a one-hot einsum and every sample
in the batch is processed in parallel on the TPU.

Numerical parity notes:
- Laplacian matches ``scipy.ndimage.laplace`` exactly: correlation with the
  [[0,1,0],[1,-4,1],[0,1,0]] stencil under scipy's 'reflect' boundary
  (edge-duplicating — ``jnp.pad(mode='symmetric')``).
- The DW class map replicates the reference's quirky
  ``argmax_c(input[c] * c)`` construction (test/evaluate.py:212-217), which
  for one-hot inputs equals the class index.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from maunet_tpu.data.schema import NormalizationStats

NUM_CLASSES = 9


def dw_map_from_input(maps: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 23) input stack → (B, H, W) int32 DW-t1 class map."""
    weighted = maps[..., :NUM_CLASSES] * jnp.arange(NUM_CLASSES, dtype=maps.dtype)
    return jnp.argmax(weighted, axis=-1).astype(jnp.int32)


def laplacian(x: jnp.ndarray) -> jnp.ndarray:
    """scipy.ndimage.laplace-equivalent for (..., H, W) arrays."""
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)], mode="symmetric")
    return (xp[..., :-2, 1:-1] + xp[..., 2:, 1:-1]
            + xp[..., 1:-1, :-2] + xp[..., 1:-1, 2:]
            - 4.0 * xp[..., 1:-1, 1:-1])


def laplacian_variance(x: jnp.ndarray) -> jnp.ndarray:
    """Variance of the Laplacian over the spatial axes (sharpness proxy,
    reference test/evaluate.py:241-242)."""
    lap = laplacian(x)
    return jnp.var(lap, axis=(-2, -1))


def unnormalize_targets(arr: jnp.ndarray, stats: NormalizationStats | None) -> jnp.ndarray:
    """Un-normalize (B, H, W, 2) [NDVI, LST]: LST back to °C, NDVI unchanged
    (reference test/evaluate.py:23-41)."""
    if stats is None:
        return arr
    lst = arr[..., 1:2] * stats.temp_std + stats.temp_mean
    return jnp.concatenate([arr[..., 0:1], lst], axis=-1)


def _class_sums_xla(abs_err, sq_err, dw_map):
    """XLA fallback: one-hot einsum (materializes (B, H, W, 9))."""
    onehot = jax.nn.one_hot(dw_map, NUM_CLASSES, dtype=jnp.float32)
    counts = jnp.einsum("bhwk->bk", onehot)
    sum_abs = jnp.einsum("bhwc,bhwk->bck", abs_err, onehot)
    sum_sq = jnp.einsum("bhwc,bhwk->bck", sq_err, onehot)
    return sum_abs, sum_sq, counts


def _use_pallas(backend: str) -> bool:
    if backend == "pallas":
        return True
    if backend == "xla":
        return False
    return jax.default_backend() == "tpu"


@functools.partial(jax.jit, static_argnames=("backend",))
def eval_metrics(pred: jnp.ndarray, target: jnp.ndarray, dw_map: jnp.ndarray,
                 backend: str = "auto"):
    """All reference evaluation metrics for one batch, fully on device.

    Args:
        pred, target: (B, H, W, C) un-normalized.
        dw_map: (B, H, W) int class map.
        backend: 'auto' (Pallas masked-reduction kernel on TPU, einsum
            elsewhere), 'pallas', or 'xla'.

    Returns dict of arrays:
        mae, rmse, lap_var_pred, lap_var_gt: (B, C)
        class_mae, class_rmse: (B, C, 9)  (NaN where the class is absent)
        class_present: (B, 9) bool
    """
    err = (pred - target).astype(jnp.float32)
    abs_err = jnp.abs(err)
    sq_err = err * err

    mae = jnp.mean(abs_err, axis=(1, 2))
    rmse = jnp.sqrt(jnp.mean(sq_err, axis=(1, 2)))

    # (B, H, W, C) → (B, C, H, W) for spatial-axis reductions
    lap_pred = laplacian_variance(jnp.moveaxis(pred.astype(jnp.float32), -1, 1))
    lap_gt = laplacian_variance(jnp.moveaxis(target.astype(jnp.float32), -1, 1))

    if _use_pallas(backend):
        from maunet_tpu.ops.pallas.masked_stats import masked_class_sums

        sum_abs, sum_sq, counts = masked_class_sums(pred, target, dw_map)
    else:
        sum_abs, sum_sq, counts = _class_sums_xla(abs_err, sq_err, dw_map)
    safe = jnp.maximum(counts, 1.0)[:, None, :]
    class_mae = jnp.where(counts[:, None, :] > 0, sum_abs / safe, jnp.nan)
    class_rmse = jnp.where(counts[:, None, :] > 0, jnp.sqrt(sum_sq / safe), jnp.nan)

    return {
        "mae": mae,
        "rmse": rmse,
        "lap_var_pred": lap_pred,
        "lap_var_gt": lap_gt,
        "class_mae": class_mae,
        "class_rmse": class_rmse,
        "class_present": counts > 0,
    }
