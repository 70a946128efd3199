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

import jax
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


def resize_align_corners(x: jnp.ndarray, out_hw: tuple[int, int],
                         out_pack: int = 1, prefer_xla: bool = False):
    """Bilinear align-corners resize of an NHWC tensor to ``out_hw``.

    Exactly matches ``torch.nn.functional.interpolate(x_nchw, size=out_hw,
    mode='bilinear', align_corners=True)`` up to float associativity.

    ``out_pack=s`` emits the result directly in the lane-packed form
    (B, oh, ow/s, s*C) consumed by ``ops.packed_conv``.

    On TPU, supported shapes (the production tile chains) run as a fused
    Pallas kernel (``ops/pallas/resize_pack.py``) whose canonical in/out
    layouts kill the ~2 ms/step of relayout copies XLA's H-minor dot
    layouts otherwise push into every consumer; other shapes (odd tiles,
    CPU, interpreters) use the einsum path below.
    """
    from maunet_tpu.ops.packed_conv import Packed

    if isinstance(x, Packed):
        # Packed producer (a packed-resident decoder row): read it in place
        # through the kernel's phase-split W-pass — the unpack reshape XLA
        # materialized as a full-tensor copy in front of every decoder
        # ``up()`` (4 × ~0.1 ms/step at 256²/B8, round-3 trace) never exists.
        b, h, gi, sc = x.x.shape
        w, c = gi * x.s, x.cin
        oh, ow = out_hw
        if (jax.default_backend() == "tpu" and not prefer_xla
                and (h, w) != (oh, ow)):
            from maunet_tpu.ops.pallas import resize_pack as rp

            if rp.supported((h, w), (oh, ow), out_pack, c, s_in=x.s):
                y = rp.resize_pack_vjp(x.x, (oh, ow), out_pack, x.s)
                return Packed(y, c) if out_pack > 1 else y
        x = x.unpack()

    b, h, w, c = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        if out_pack == 1:
            return x
        # Identity resize straight to the packed form: a free reshape, not
        # an identity-matrix einsum.
        from maunet_tpu.ops.packed_conv import pack

        return pack(x, out_pack)
    if jax.default_backend() == "tpu" and not prefer_xla:
        from maunet_tpu.ops.pallas import resize_pack as rp

        if rp.supported((h, w), (oh, ow), out_pack, c):
            # out_pack>1 emits the lane-packed form straight from the
            # kernel's canonical C-minor output (a free reshape) — the
            # per-phase einsum path below left a full-tensor relayout copy
            # plus a phase-concat copy in front of the packed level-0 conv
            # row (0.42 + 0.11 ms at 256²/B8, round-3 U-Net trace).
            y = rp.resize_pack_vjp(x, (oh, ow), out_pack)
            return Packed(y, c) if out_pack > 1 else y
    dtype = x.dtype
    wh = jnp.asarray(_interp_matrix(h, oh), dtype=dtype)
    if out_pack > 1:
        s = out_pack
        assert ow % s == 0, (out_hw, s)
        # W-pass FIRST, at the source height, as one einsum PER SUB-PIXEL
        # PHASE: phase p's interpolation matrix (g, w) maps straight to a
        # 4-D (b, h, g, c) einsum, and the channel-axis concat of the s
        # phases IS the packed channel order (p·C + c).  The earlier 5-D
        # single-einsum form ("gpw,bhwc->bhgpc" + reshape) left XLA a
        # (b,h,g,p,c) intermediate it re-laid out — a full-tensor copy per
        # decoder node, 4 × 0.15 ms/step at 256² in the round-3 trace.
        # H∘W == W∘H exactly up to float associativity (both separable
        # linear maps).
        wwp = jnp.asarray(_interp_matrix(w, ow).reshape(ow // s, s, w), dtype)
        z = jnp.concatenate(
            [_wpass(wwp[:, p], x) for p in range(s)], axis=-1)
        if h != oh:
            z = _hpass(wh, z)
        return Packed(z, c)
    y = x if h == oh else _hpass(wh, x)
    ww = jnp.asarray(_interp_matrix(w, ow), dtype=dtype)
    return y if w == ow else _wpass(ww, y)


def _hpass(wh: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """(oh, h) ⊗ (b, h, w, c) → (b, oh, w, c), with ``b`` as a true dot
    batch dim.  ``einsum("oh,bhwc->bowc")``'s dot emits (o, b, w, c) and the
    trailing logical transpose becomes a deferred minor-H layout XLA pushes
    into every consumer as a full-tensor copy (~0.1 ms each at 256², round-3
    trace); batching over ``b`` makes the dot's natural output order the
    layout-canonical one, so no transpose exists."""
    b = x.shape[0]
    whb = jnp.broadcast_to(wh, (b,) + wh.shape)  # fused into the dot by XLA
    return jax.lax.dot_general(
        whb, x, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=x.dtype)


def _wpass(ww: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """(ow, w) ⊗ (b, h, w, c) → (b, h, ow, c) with ``b, h`` as true dot
    batch dims (same no-transpose rationale as :func:`_hpass`)."""
    b, h = x.shape[:2]
    wwb = jnp.broadcast_to(ww, (b, h) + ww.shape)
    return jax.lax.dot_general(
        wwb, x, (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=x.dtype)


def upsample_align_corners(x: jnp.ndarray, scale: int = 2) -> jnp.ndarray:
    """``nn.Upsample(scale_factor=scale, mode='bilinear', align_corners=True)``
    (reference src/model.py:219)."""
    b, h, w, c = x.shape
    return resize_align_corners(x, (h * scale, w * scale))


def upsample_like(x: jnp.ndarray, target_hw: tuple[int, int],
                  pre_scale: int | None = 2, out_pack: int = 1,
                  prefer_xla: bool = False):
    """Replicates the reference decoder's upsample-then-fix-size composition.

    The U-Net decoder applies ``self.up`` (scale-2 align-corners upsample) and
    then ``_upsample_match`` to the skip tensor's size (reference
    src/model.py:243-246,279-282).  For odd chains (… 31 → 15) this is a
    *double* interpolation (15→30, then 30→31) whose result differs from a
    single 15→31 resize — we reproduce both steps bit-faithfully.

    ``pre_scale=None`` performs a single resize to ``target_hw`` — the U-Net++
    behaviour (reference src/model.py:111-121).  ``out_pack=s`` returns the
    lane-packed form (see :func:`resize_align_corners`).

    ``prefer_xla=True`` (the TRAIN path) skips the layout-pinning Pallas
    kernel: the train graph's backward convs want XLA's H-minor layouts,
    and the round-3 train trace showed the pinned canonical output buying
    four ~0.33 ms relayout copies per step instead of saving them.
    """
    from maunet_tpu.ops.packed_conv import Packed

    def hw_of(t):
        return ((t.x.shape[1], t.x.shape[2] * t.s) if isinstance(t, Packed)
                else t.shape[1:3])

    if pre_scale is not None:
        h, w = hw_of(x)
        if (h * pre_scale, w * pre_scale) == tuple(target_hw):
            # The scale-2 upsample already lands on the target size, so the
            # fix-up resize is the identity and the composition is one
            # resize — emitted directly in the requested packed form.
            return resize_align_corners(x, tuple(target_hw),
                                        out_pack=out_pack,
                                        prefer_xla=prefer_xla)
        if isinstance(x, Packed):
            x = x.unpack()
        x = resize_align_corners(x, (x.shape[1] * pre_scale,
                                     x.shape[2] * pre_scale),
                                 prefer_xla=prefer_xla)
    if hw_of(x) != tuple(target_hw) or out_pack > 1:
        x = resize_align_corners(x, tuple(target_hw), out_pack=out_pack,
                                 prefer_xla=prefer_xla)
    return x
