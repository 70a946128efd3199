"""Lane-packed 3x3 convolution for narrow-channel convs.

The MXU multiplies 128-lane tiles: a conv with ``Cout`` output channels
fills only ``min(Cout, 128)/128`` of the lane dimension, so the 64-channel
level-0 convs of the classic U-Net run at <=50% of matmul peak and the
32-channel U-Net++ convs at <=25% (XPlane evidence: docs/TRACE.md §5).
This module trades FLOPs for lane fill:

    pack ``s`` horizontally-adjacent output pixels into the lane dimension.

Each group of ``s`` output columns depends on ``s + 2`` input columns
(3-tap SAME conv), so the width-tap dimension of the kernel is absorbed
into a dense ``(s+2)·Cin -> s·Cout`` contraction per group — a conv with
kernel extent 1 in W, ``s×`` the lane fill, and ``(s+2)/3×`` the FLOPs:
net ~1.5× on 64-channel convs (s=2) and ~2× on 32-channel convs (s=4) at
the fill-limited roofline.

The transform is exact (the packed kernel is the original kernel scattered
into structured zeros — zero-padding in W is reproduced by the explicit
pad) and fully differentiable: gradients flow to the original ``(3, 3,
Cin, Cout)`` parameter through the packing, so checkpoints keep the
reference's parameter shapes (reference src/model.py:9-21 VGGBlock convs).

Pure XLA — the strided-slice stack + conv lowers to one MXU-shaped conv;
no Pallas needed for this one (the pack/reshape fuse into the surrounding
graph).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_factor(cout: int, width: int, max_s: int = 4) -> int:
    """Largest useful pack factor: fill the 128-lane tile but never exceed
    ``max_s`` (FLOP inflation (s+2)/3 grows faster than fill beyond s=4),
    and require the tile width to divide evenly."""
    s = 1
    while (s * 2 <= max_s and cout * s * 2 <= 128 and width % (s * 2) == 0):
        s *= 2
    return s


def pack_weights(kernel: jnp.ndarray, s: int) -> jnp.ndarray:
    """(KH, 3, Cin, Cout) -> (KH, 1, (s+2)*Cin, s*Cout) packed kernel.

    Packed input channel ``t*Cin + ci`` is input column ``group*s + t - 1``
    (one-column halo each side); packed output channel ``p*Cout + co`` is
    output column ``group*s + p``.  Output sub-pixel ``p`` reads taps
    ``t = p + kx``:  W[ky, t, ci, p, co] = kernel[ky, t-p, ci, co].
    """
    kh, kw, cin, cout = kernel.shape
    assert kw == 3, f"lane packing is specialized to 3-tap width, got {kw}"
    cols = []
    for p in range(s):
        # place the 3 width taps at offsets p..p+2 of the (s+2) window
        cols.append(jnp.pad(kernel, ((0, 0), (p, s - 1 - p), (0, 0), (0, 0))))
    w = jnp.stack(cols, axis=3)            # (kh, s+2, cin, s, cout)
    w = w.transpose(0, 1, 2, 3, 4).reshape(kh, 1, (s + 2) * cin, s * cout)
    return w


def packed_conv(x: jnp.ndarray, kernel: jnp.ndarray, s: int) -> jnp.ndarray:
    """3x3 SAME conv via width-lane packing.  ``x`` is NHWC with W % s == 0;
    ``kernel`` is (3, 3, Cin, Cout).  Exact (up to dtype) vs
    ``lax.conv_general_dilated(..., padding='SAME')``."""
    b, h, w, cin = x.shape
    kh, kw, kcin, cout = kernel.shape
    assert kcin == cin and w % s == 0, (x.shape, kernel.shape, s)
    if s == 1:
        return jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    g = w // s
    xpad = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
    # (s+2) strided column slices -> (B, H, G, (s+2)*Cin), t-major to match
    # pack_weights' channel order.
    taps = [jax.lax.slice(xpad, (0, 0, t, 0),
                          (b, h, t + s * (g - 1) + 1, cin), (1, 1, s, 1))
            for t in range(s + 2)]
    xp = jnp.stack(taps, axis=3).reshape(b, h, g, (s + 2) * cin)
    wp = pack_weights(kernel, s).astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        xp, wp, window_strides=(1, 1), padding=((1, 1), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out.reshape(b, h, w, cout)
