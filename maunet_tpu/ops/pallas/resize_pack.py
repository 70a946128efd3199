"""Fused align-corners bilinear resize with lane-packed output (Pallas).

Why this kernel exists: the XLA path for the decoder resizes
(``ops/resize.py``, two interpolation matmuls) is numerically fine but
layout-poisoned — XLA assigns the resize dots an H-minor output layout
``{1,3,2,0}``, and every consumer (the packed decoder convs, their halo
slices, the node concats) inserts a full-tensor relayout copy.  The round-3
XPlane trace of U-Net++ at 256²/B8 shows ~2 ms/step of exactly these
copies (8×0.105 ms halo copies + 4×0.106 ms conv-input copies +
0.29/0.11/0.11 ms level-1 concat copies).  No einsum/dot_general
formulation changes XLA's choice; a Pallas custom call pins canonical
(C-minor) layouts on both sides by construction.

Kernel structure, per grid step ``(batch, output-row block)`` — shaped by
what Mosaic lowers well (no reshapes that merge a sub-lane-width minor dim,
no transposes):

* **H-pass = fixed-pattern 4-tap weighted add.**  Output row ``r`` of a
  block reads input window positions ``g(r)+k, k ∈ {-1,0,1,2}`` with
  ``g(r) = (r·h)//oh + HW`` — a *grid-invariant* gather (plain dim-0 vreg
  indexing); the per-block drift of the true align-corners source rows is
  absorbed into per-block tap weights built on the host (taps that don't
  land on the true ``floor/ceil`` source rows get weight 0).  The input
  window is assembled from three static-index blocks (8-row halos around
  the proportional main rows); the host plan asserts the 4-tap window
  covers every true source row and the caller falls back to the XLA path
  otherwise.
* **W-pass = per-row MXU matmul** with the dense (ow, w) interpolation
  matrix (unrolled over the ≤64 block rows — each a clean 2-D dot).
* **Packed emit is free**: the kernel writes the plain (oh, ow, C) result;
  ``(ow, C)`` and ``(ow/s, s·C)`` have identical flat memory order on the
  canonical layout, so the caller's reshape to the ``Packed`` convention
  of ``ops/packed_conv.py`` (channel ``p·C + c`` = column ``g·s + p``)
  is a bitcast.

Matches ``torch.nn.functional.interpolate(mode='bilinear',
align_corners=True)`` like ``ops/resize.py`` (reference src/model.py:
111-121,219) with the same dtype discipline: weights in the input dtype,
f32 MXU accumulation in the W-pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from maunet_tpu.ops.resize import _interp_matrix

_HW = 8      # halo block rows; also the sublane quantum the plan requires
_TAPS = 4    # max H-pass taps per output row (window g(r)-1 .. g(r)+2)


class _Plan:
    def __init__(self, mr, weights):
        self.mr = mr              # main-block input rows per output block
        self.weights = weights    # (nb, taps, br) f32 H-pass tap weights

    @property
    def taps(self) -> int:
        return self.weights.shape[1]


@functools.lru_cache(maxsize=256)
def _row_plan(h: int, oh: int, br: int) -> _Plan | None:
    """Per-block H-pass tap weights over the (halo|main|halo) window.

    Tries the smallest tap window first: a pure align-corners upsample has
    at most 2 nonzero source rows per output row, and every VPU tap pass
    runs over the full (w, C) plane — the 4→2 tap cut halves the H-pass
    VPU time of the hot level-0 decoder resizes.  Falls back to wider
    windows when the fixed pattern g(r)-1+k cannot reach some block's true
    source rows; returns None (caller takes the XLA path) if even 4 taps
    cannot."""
    if oh % br or br * h % oh or h % _HW:
        return None
    mr = br * h // oh
    if mr % _HW or mr == 0:
        return None
    nb = oh // br
    n_hblk = h // _HW
    wh = _interp_matrix(h, oh)                    # (oh, h)
    for taps in (2, 3, _TAPS):
        weights = np.zeros((nb, taps, br), np.float32)
        ok = True
        for i in range(nb):
            if not ok:
                break
            li = max(i * (mr // _HW) - 1, 0)
            ri = min(i * (mr // _HW) + mr // _HW, n_hblk - 1)
            # global input row held at each window position
            rows = (list(range(li * _HW, li * _HW + _HW))
                    + list(range(i * mr, i * mr + mr))
                    + list(range(ri * _HW, ri * _HW + _HW)))
            for r in range(br):
                g = (r * h) // oh + _HW
                for gl_row in np.nonzero(wh[i * br + r])[0]:
                    for k in range(taps):
                        t = g - 1 + k
                        if 0 <= t < len(rows) and rows[t] == gl_row:
                            weights[i, k, r] = wh[i * br + r, gl_row]
                            break
                    else:
                        ok = False                # tap window can't reach
                        break
                if not ok:
                    break
        if ok:
            return _Plan(mr, weights)
    return None


def _pick_br(oh: int, ow: int, c: int) -> int:
    """Output-row block size: big enough to amortize, small enough that the
    f32 W-pass intermediate stays well under VMEM."""
    for br in (64, 32, 16, 8):
        if oh % br == 0 and br * ow * c * 4 <= 4 << 20:
            return br
    return _HW


def supported(in_hw, out_hw, s: int, c: int, s_in: int = 1) -> bool:
    """Static gate: shapes the kernel handles (the production tile chains);
    everything else stays on the XLA einsum path."""
    h, w = in_hw
    oh, ow = out_hw
    if ow % max(s, 1) or oh < h or ow < w or oh % _HW:
        return False
    if c % 8 or w % _HW or h % _HW:
        return False
    # Packed emit runs the W-pass as s per-phase dots with c output lanes
    # each — worth it from half lane width up (classic U-Net level-0: s=2,
    # c=128; U-Net++ level-0: s=4, c=64 — each kills a 0.2 ms relayout
    # copy in front of the fused conv row).  Below that the per-phase dots
    # idle too many lanes and the einsum path wins.
    if s > 1 and ((s * c) % 128 or c < 64):
        return False
    # Packed INPUT (B, h, w/s_in, s_in*c): the W-pass contracts each input
    # phase separately (lane-slice + per-phase dot), so the producer's
    # packed form is read in place — the unpack reshape XLA materialized as
    # a full-tensor copy in front of every decoder ``up()`` never exists.
    # Needs full-lane-tile packed channels and sublane-aligned groups.
    if s_in > 1 and ((s_in * c) % 128 or (w // s_in) % 8 or w % s_in):
        return False
    return _row_plan(h, oh, _pick_br(oh, ow, c)) is not None


def _make_kernel(br: int, mr: int, h_ratio: tuple[int, int], out_dtype,
                 s: int = 1, s_in: int = 1, c: int = 0, taps: int = _TAPS):
    h, oh = h_ratio

    def kernel(ww_ref, wt_ref, left_ref, main_ref, right_ref, out_ref):
        xw = jnp.concatenate(
            [left_ref[0], main_ref[0], right_ref[0]], axis=0)  # (IR, w, C)
        dt = xw.dtype
        rows = []
        for r in range(br):
            # H-pass: fixed tap window (dim-0 static indexing), per-row
            # scalar weights from SMEM, f32 VPU accumulation.  The plan
            # already shrank the window to the fewest taps that reach every
            # true source row (2-3 for the pure-upsample decoder chains).
            g = (r * h) // oh + _HW
            acc = None
            for k in range(taps):
                term = wt_ref[0, k, r] * xw[g - 1 + k].astype(jnp.float32)
                acc = term if acc is None else acc + term
            acc = acc.astype(dt)
            if s_in > 1:
                # Packed input (g_in, s_in·C): phase q holds column
                # g·s_in + q at lanes [q·C, (q+1)·C).  The phases
                # sublane-concatenate into ONE (s_in·g_in, C) operand and
                # contract against row-stacked matrices: per output phase a
                # single K=s_in·g_in dot instead of s_in K=g_in dots that
                # each zero-pad K to the 128-wide MXU pass (the level-0
                # decoder resize runs gi=64 — the concat halves its MXU
                # passes).
                xcat = jnp.concatenate(
                    [acc[:, q * c:(q + 1) * c] for q in range(s_in)], axis=0)
                rows.append(jnp.concatenate(
                    [jax.lax.dot_general(
                        ww_ref[p], xcat, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                     for p in range(max(s, 1))], axis=-1)
                    if s > 1 else
                    jax.lax.dot_general(
                        ww_ref[0], xcat, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))
            elif s == 1:
                # W-pass: one (ow, w) x (w, C) MXU matmul per row.
                rows.append(jax.lax.dot_general(
                    ww_ref[0], acc, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            else:
                # Packed emit: one dot per sub-pixel phase — phase p's
                # (ow/s, w) matrix holds interpolation rows p, p+s, …, and
                # the lane-axis concat IS the packed channel order
                # (p·C + c ↔ column g·s + p).  Emitting (ow/s, s·C)
                # directly avoids the (ow, C) → (ow/s, s·C) reshape, which
                # Mosaic/XLA materialized as a 0.45 ms relayout copy.
                rows.append(jnp.concatenate(
                    [jax.lax.dot_general(
                        ww_ref[p], acc, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                     for p in range(s)], axis=-1))
        out_ref[0] = jnp.stack(rows).astype(out_dtype)  # (br, ow/s, s·C)

    return kernel


@functools.partial(jax.jit, static_argnames=("out_hw", "s", "s_in",
                                              "interpret"))
def resize_pack(x: jnp.ndarray, out_hw: tuple[int, int], s: int = 1,
                s_in: int = 1, interpret: bool = False) -> jnp.ndarray:
    """(B, h, w, C) → (B, oh, ow/s, s·C) fused align-corners resize.

    Caller must have checked :func:`supported`.  ``s=1`` returns the plain
    NHWC resize; ``s>1`` returns the lane-packed layout of
    ``ops.packed_conv.Packed`` (channel ``p·C + c`` is column ``g·s + p``).
    ``s_in>1`` takes ``x`` already in that packed layout —
    (B, h, w/s_in, s_in·C) — and reads it in place (no unpack copy).
    """
    b, h, gi, sc = x.shape
    w, c = gi * s_in, sc // s_in
    oh, ow = out_hw
    br = _pick_br(oh, ow, c)
    plan = _row_plan(h, oh, br)
    assert plan is not None, (x.shape, out_hw)
    mr = plan.mr
    dtype = x.dtype
    wwn = _interp_matrix(w, ow)                                # (ow, w)
    if s > 1:
        # phase p rows: p, p+s, … — see the kernel's packed-emit comment
        wwn = wwn.reshape(ow // s, s, w).transpose(1, 0, 2)    # (s, ow/s, w)
    else:
        wwn = wwn[None]                                        # (1, ow, w)
    if s_in > 1:
        # Row-stack the input-phase column slices to match the kernel's
        # sublane-concat operand: K index q·g_in + g ↔ source column
        # g·s_in + q — (s, ow/s, w) → (s, ow/s, s_in·g_in).
        wwn = wwn.reshape(wwn.shape[0], wwn.shape[1], gi, s_in)
        wwn = wwn.transpose(0, 1, 3, 2).reshape(
            wwn.shape[0], wwn.shape[1], s_in * gi)
    ww = jnp.asarray(wwn, dtype)
    wt = jnp.asarray(plan.weights, jnp.float32)                # (nb,taps,br)
    nb = oh // br
    mh, nhb = mr // _HW, h // _HW

    grid = (b, nb)
    in_specs = [
        pl.BlockSpec(ww.shape, lambda bi, i: (0,) * ww.ndim),
        pl.BlockSpec((1, plan.taps, br), lambda bi, i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, _HW, gi, sc),
                     lambda bi, i: (bi, jnp.maximum(i * mh - 1, 0), 0, 0)),
        pl.BlockSpec((1, mr, gi, sc), lambda bi, i: (bi, i, 0, 0)),
        pl.BlockSpec((1, _HW, gi, sc),
                     lambda bi, i: (bi, jnp.minimum(i * mh + mh, nhb - 1),
                                    0, 0)),
    ]
    out = pl.pallas_call(
        _make_kernel(br, mr, (h, oh), dtype, s, s_in, c, plan.taps),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, br, ow // s, s * c),
                               lambda bi, i: (bi, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, oh, ow // s, s * c), dtype),
        interpret=interpret,
    )(ww, wt, x, x, x)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def resize_pack_vjp(x: jnp.ndarray, out_hw: tuple[int, int],
                    s: int = 1, s_in: int = 1) -> jnp.ndarray:
    """:func:`resize_pack` with a reverse rule (the resize is linear, so the
    backward is the transposed-matrix resize, run on the XLA einsum path —
    the backward shapes are downsamples the kernel does not handle)."""
    return resize_pack(x, out_hw, s, s_in)


def _rp_fwd(x, out_hw, s, s_in):
    return resize_pack(x, out_hw, s, s_in), x.shape


def _rp_bwd(out_hw, s, s_in, in_shape, g):
    from maunet_tpu.ops.resize import _hpass, _interp_matrix, _wpass

    b, h, gi, sc = in_shape
    w, c = gi * s_in, sc // s_in
    oh, ow = out_hw
    if s > 1:
        g = g.reshape(b, oh, ow, c)        # free unpack of the cotangent
    dt = g.dtype
    wh_t = jnp.asarray(_interp_matrix(h, oh).T, dt)   # (h, oh)
    ww_t = jnp.asarray(_interp_matrix(w, ow).T, dt)   # (w, ow)
    dx = _hpass(wh_t, _wpass(ww_t, g))
    if s_in > 1:
        dx = dx.reshape(b, h, gi, sc)      # free repack of the cotangent
    return (dx,)


resize_pack_vjp.defvjp(_rp_fwd, _rp_bwd)
