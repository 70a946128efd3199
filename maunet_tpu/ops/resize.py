"""align_corners=True bilinear resize, TPU-native.

The reference upsamples with ``F.interpolate(..., mode='bilinear',
align_corners=True)`` (reference src/model.py:121,219,245).  JAX's
``jax.image.resize`` implements only the half-pixel (align_corners=False)
convention, so we build the exact align-corners operator ourselves — as two
small dense matmuls (one per spatial axis).  On TPU this runs on the MXU and
fuses with neighbouring ops, instead of the gather/scatter lowering a naive
per-pixel implementation would produce.

For output size M from input size N (align_corners):
    src(i) = i * (N - 1) / (M - 1)        for M > 1, else 0
    out[i] = (1 - frac) * x[floor(src)] + frac * x[ceil(src)]

which is exactly ``out = W @ x`` with a row-stochastic (M, N) matrix holding
at most two non-zeros per row.  The matrices are built with numpy at trace
time (shapes are static under jit) and cached.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) align-corners linear-interpolation matrix (float32)."""
    w = np.zeros((n_out, n_in), dtype=np.float32)
    if n_out == 1 or n_in == 1:
        # torch align_corners with a single output (or input) row samples x[0]
        w[:, 0] = 1.0
        return w
    src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = (src - lo).astype(np.float32)
    rows = np.arange(n_out)
    w[rows, lo] = 1.0 - frac
    w[rows, hi] += frac
    return w


def resize_align_corners(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear align-corners resize of an NHWC tensor to ``out_hw``.

    Exactly matches ``torch.nn.functional.interpolate(x_nchw, size=out_hw,
    mode='bilinear', align_corners=True)`` up to float associativity.
    """
    b, h, w, c = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    dtype = x.dtype
    wh = jnp.asarray(_interp_matrix(h, oh), dtype=dtype)
    ww = jnp.asarray(_interp_matrix(w, ow), dtype=dtype)
    # (oh, h) @ (b, h, w*c) -> contract over h, then same over w.
    y = jnp.einsum("oh,bhwc->bowc", wh, x)
    y = jnp.einsum("pw,bhwc->bhpc", ww, y)
    return y


def upsample_align_corners(x: jnp.ndarray, scale: int = 2) -> jnp.ndarray:
    """``nn.Upsample(scale_factor=scale, mode='bilinear', align_corners=True)``
    (reference src/model.py:219)."""
    b, h, w, c = x.shape
    return resize_align_corners(x, (h * scale, w * scale))


def upsample_like(x: jnp.ndarray, target_hw: tuple[int, int],
                  pre_scale: int | None = 2) -> jnp.ndarray:
    """Replicates the reference decoder's upsample-then-fix-size composition.

    The U-Net decoder applies ``self.up`` (scale-2 align-corners upsample) and
    then ``_upsample_match`` to the skip tensor's size (reference
    src/model.py:243-246,279-282).  For odd chains (… 31 → 15) this is a
    *double* interpolation (15→30, then 30→31) whose result differs from a
    single 15→31 resize — we reproduce both steps bit-faithfully.

    ``pre_scale=None`` performs a single resize to ``target_hw`` — the U-Net++
    behaviour (reference src/model.py:111-121).
    """
    if pre_scale is not None:
        x = upsample_align_corners(x, pre_scale)
    if x.shape[1:3] != tuple(target_hw):
        x = resize_align_corners(x, tuple(target_hw))
    return x
