"""Pallas TPU kernel: per-Dynamic-World-class masked error reductions.

The evaluator needs, per sample and channel, the masked MAE/RMSE over each
of the 9 land-cover classes (evaluate/metrics.py).  The XLA fallback builds
a one-hot (B, H, W, 9) f32 tensor and einsums it — materializing 9× the
image in HBM.  This kernel streams each (sample, channel) error map and the
sample's class map through VMEM once and emits the 9-class partial sums
directly; the class masks only ever exist in registers.

Layout notes: the grid is (B, C) with fully-2D (H, W) blocks — full 2-D
reductions are the one shape Mosaic guarantees for float ADD reductions
(channel-sliced 3-D reductions trip its shape-invariant-numerics layout
check).  The per-sample class counts are written once per sample (c == 0
program) into a block revisited by the other channel programs.

Outputs (sum_abs, sum_sq, counts) are converted to NaN-guarded means by the
caller, identically to the fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NUM_CLASSES = 9


def _kernel(err_ref, dw_ref, sum_abs_ref, sum_sq_ref, count_ref):
    """One grid step = one (sample, channel).

    err_ref: (H, W) f32 error map;  dw_ref: (H, W) i32 class map
    sum_abs_ref/sum_sq_ref: (1, NUM_CLASSES);  count_ref: (1, NUM_CLASSES)
    """
    c_idx = pl.program_id(1)
    err = err_ref[:]
    abs_err = jnp.abs(err)
    sq_err = err * err
    dw = dw_ref[:]

    abs_sums, sq_sums, counts = [], [], []
    for k in range(NUM_CLASSES):
        mask = (dw == k).astype(jnp.float32)
        counts.append(jnp.sum(mask))
        abs_sums.append(jnp.sum(abs_err * mask))
        sq_sums.append(jnp.sum(sq_err * mask))

    sum_abs_ref[:] = jnp.stack(abs_sums)[None, :]
    sum_sq_ref[:] = jnp.stack(sq_sums)[None, :]

    @pl.when(c_idx == 0)
    def _():
        count_ref[:] = jnp.stack(counts)[None, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def masked_class_sums(pred: jnp.ndarray, target: jnp.ndarray,
                      dw_map: jnp.ndarray, interpret: bool = False):
    """(B, H, W, C) pred/target + (B, H, W) int class map →
    (sum_abs (B, C, 9), sum_sq (B, C, 9), counts (B, 9))."""
    b, h, w, c = pred.shape
    err = jnp.moveaxis((pred - target).astype(jnp.float32), -1, 1)  # (B, C, H, W)

    grid_spec = pl.GridSpec(
        grid=(b, c),
        in_specs=[
            pl.BlockSpec((None, None, h, w), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, h, w), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, None, 1, NUM_CLASSES),
                         lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, 1, NUM_CLASSES),
                         lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, NUM_CLASSES), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    sum_abs, sum_sq, counts = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, c, 1, NUM_CLASSES), jnp.float32),
            jax.ShapeDtypeStruct((b, c, 1, NUM_CLASSES), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, NUM_CLASSES), jnp.float32),
        ],
        interpret=interpret,
    )(err, dw_map.astype(jnp.int32))
    return sum_abs[:, :, 0, :], sum_sq[:, :, 0, :], counts[:, 0, :]
