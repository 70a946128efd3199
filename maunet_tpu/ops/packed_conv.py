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

The transform computes the same taps (the packed kernel is the original
kernel scattered into structured zeros; zero-padding in W is reproduced by
the halo construction), differing from one fused conv only by summation
order across the three channel blocks — f32-reassociation-level in f32,
one extra rounding per block in bf16.  It is fully differentiable: gradients flow to the original ``(3, 3,
Cin, Cout)`` parameter through the packing, so checkpoints keep the
reference's parameter shapes (reference src/model.py:9-21 VGGBlock convs).

Pure XLA — a zero-copy column-grouping reshape, two small halo tensors,
and three MXU-shaped convs; no Pallas needed for this one.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Packed(NamedTuple):
    """A lane-packed NHWC tensor: ``x`` has shape (B, H, W/s, s*cin) where
    packed channel ``p*cin + c`` is column ``g*s + p``, channel ``c``.

    Produced by packed-output convs/resizes so consumers read it without an
    unpack→repack round trip (each such pair is a full-tensor layout copy on
    TPU — the round-3 XPlane trace showed ~1.5 ms/step of exactly these
    copies between U-Net++ decoder nodes).
    """

    x: jnp.ndarray
    cin: int

    @property
    def s(self) -> int:
        return self.x.shape[-1] // self.cin

    def unpack(self) -> jnp.ndarray:
        b, h, g, sc = self.x.shape
        return self.x.reshape(b, h, g * self.s, self.cin)


def pack(x: jnp.ndarray, s: int) -> Packed:
    """View an NHWC tensor as lane-packed (free reshape when C is minor)."""
    b, h, w, c = x.shape
    assert w % s == 0, (x.shape, s)
    return Packed(x.reshape(b, h, w // s, s * c), c)


def pack_factor(cout: int, width: int, max_s: int = 4, min_s: int = 1) -> int:
    """Largest useful pack factor: fill the 128-lane tile but never exceed
    ``max_s`` (FLOP inflation (s+2)/3 grows faster than fill beyond s=4),
    and require the tile width to divide evenly.

    ``min_s`` gates marginal packings: measured in-model on v5e, s=2 on
    64-channel convs *loses* (the 2x input re-read outweighs the 2x fill
    on convs already near their fill roofline: U-Net-64 9.9 -> 12.2
    ms/batch) while s=4 on 32-channel convs wins (U-Net++-32 23.3 -> 19.5
    ms/batch); callers pass ``min_s=4`` to pack only where it pays."""
    s = 1
    while (s * 2 <= max_s and cout * s * 2 <= 128 and width % (s * 2) == 0):
        s *= 2
    return s if s >= min_s else 1


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
    return w.reshape(kh, 1, (s + 2) * cin, s * cout)


def packed_conv(x: jnp.ndarray | Packed, kernel: jnp.ndarray, s: int,
                out_packed: bool = False) -> jnp.ndarray | Packed:
    """3x3 SAME conv via width-lane packing.  ``x`` is NHWC with W % s == 0,
    or an already-:class:`Packed` tensor (its own ``s`` must equal ``s``);
    ``kernel`` is (3, 3, Cin, Cout).  Same taps as
    ``lax.conv_general_dilated(..., padding='SAME')``; differs only by the
    cross-block summation order (see module docstring).

    ``out_packed=True`` returns the result as :class:`Packed` — chaining
    packed convs (VGGBlock conv1→conv2, node→node skips) without the
    intermediate unpack/repack, which XLA materializes as full layout copies.
    """
    kh, kw, cin, cout = kernel.shape
    if s == 1:
        assert not isinstance(x, Packed) and not out_packed
        return jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if isinstance(x, Packed):
        assert x.cin == cin and x.s == s, (x.x.shape, x.cin, kernel.shape, s)
        groups = x.x
        b, h, g, _ = groups.shape
    else:
        b, h, w, xc = x.shape
        assert xc == cin and w % s == 0, (x.shape, kernel.shape, s)
        g = w // s
        # Group s adjacent columns: a free reshape (W is the second-minor dim
        # of NHWC, so (W, C) -> (G, s*C) is a view).
        groups = x.reshape(b, h, g, s * cin)
    # The one-column halos are the last column of the previous group / first
    # column of the next — plain contiguous pad+slice, NOT strided gathers
    # (measured: a stack of stride-s slices is ~7x slower than the conv it
    # feeds).
    zero = jnp.zeros((b, h, 1, cin), groups.dtype)
    left = jnp.concatenate([zero, groups[:, :, :-1, (s - 1) * cin:]], axis=2)
    right = jnp.concatenate([groups[:, :, 1:, :cin], zero], axis=2)
    # Convolve the three channel blocks separately instead of materializing
    # their (s+2)·Cin concat: the main block is the zero-copy reshape of x
    # itself, so the only extra HBM traffic is the two 1-column-per-group
    # halo tensors (2/s of the input, vs (s+2)/s for an explicit concat).
    # Channel-block order [col -1 | cols 0..s-1 | col s] == taps t = 0..s+1.
    wp = pack_weights(kernel, s).astype(groups.dtype)
    conv1x = lambda t, wslice: jax.lax.conv_general_dilated(
        t, wslice, window_strides=(1, 1), padding=((1, 1), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = (conv1x(left, wp[:, :, :cin])
           + conv1x(groups, wp[:, :, cin:(s + 1) * cin])
           + conv1x(right, wp[:, :, (s + 1) * cin:]))
    if out_packed:
        return Packed(out, cout)
    return out.reshape(b, h, g * s, cout)
