"""Core conv blocks.

TPU design notes: tensors are NHWC (the layout XLA tiles best onto the MXU);
convs run in ``compute_dtype`` (bf16 by default) with f32 parameters, while
BatchNorm statistics and normalization always run in f32.  The (conv → BN →
ReLU) pair is the hot kernel of the whole framework — XLA fuses the BN/ReLU
epilogue into the convolution itself (verified by XPlane trace, docs/TRACE.md).

Two structural optimizations over a naive translation, both trace-driven:

1. **Split first conv over concat parts.**  Every decoder block in both
   models convolves a channel-concatenation (skip ‖ upsampled [‖ embedding]).
   Materializing the concat costs a full HBM round-trip *plus* an XLA layout
   copy (the resize matmul and the skip tensor disagree on tiled layout —
   ``copy.29``-style kernels were ~14% of device time at 256²).  Since
   ``conv(concat(a, b), W) == conv(a, W[:, :, :Ca]) + conv(b, W[:, :, Ca:])``,
   ``SplitConv`` keeps ONE parameter tensor (checkpoint-compatible with the
   reference's single conv, reference src/model.py:9-21) but never builds the
   concatenated activation.

2. **Closed-form conv of broadcast embeddings.**  The temporal/metadata
   embeddings enter as spatially-constant maps (reference src/model.py:98-108:
   ``unsqueeze(-1).expand(H, W)``).  A zero-padded 3×3 conv of a constant
   field has only 9 distinct output values per (sample, channel) — interior
   plus 8 border cases — so the embedding contribution is computed as a
   (B, 3, 3, C) einsum and interpolated onto the grid with two tiny masked
   matmuls: O(B·9·D·C + B·H·W·C) instead of O(B·H·W·9·D·C).  At U-Net++
   decoder nodes the embedding map is 40-57% of the first conv's input
   channels at full tile resolution, so this removes ~half those FLOPs
   while staying bit-accurate to the zero-pad conv semantics.
"""

from __future__ import annotations

import functools
from typing import Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from maunet_tpu.ops.packed_conv import (Packed, pack, pack_factor,
                                        pack_weights, packed_conv)

Parts = Union[jnp.ndarray, Sequence[jnp.ndarray]]


def _build_packed_jobs(jobs, is_bcast, s: int, hw, features: int, cd):
    """Lower (part, kernel-slice) jobs into the fused kernels' argument
    form: lane-packed part tensors + packed-weight tensors + the compact
    closed-form ``add`` term from broadcast parts.  Returns None when a
    spatial part can't pack (odd width)."""
    spatial = [(p, w) for p, w in jobs if not is_bcast(p)]
    if not spatial:
        return None
    parts_x, wps, cins = [], [], []
    for p, w in spatial:
        if isinstance(p, Packed):
            xp, cin = p.x, p.cin
        else:
            pb, ph, pw, pc = p.shape
            if pw % s:
                return None
            padc = (-pc) % 8
            if padc:
                # The kernel's halo slices need 8-aligned channel blocks;
                # zero-pad the channels (and the matching kernel rows) —
                # zero channels contribute zero, and the pad fuses into
                # the producer (e.g. the 23-channel input cast).
                p = jnp.pad(p, ((0, 0),) * 3 + ((0, padc),))
                w = jnp.pad(w, ((0, 0), (0, 0), (0, padc), (0, 0)))
                pc += padc
            xp, cin = p.reshape(pb, ph, pw // s, s * pc), pc
        parts_x.append(xp.astype(cd))
        wps.append(pack_weights(w, s)
                   .reshape(3, (s + 2) * cin, s * features).astype(cd))
        cins.append(cin)
    add = None
    for p, w in jobs:
        if is_bcast(p):
            e = _const_conv(p, w, *hw, out_pack=s, compact_h=True)
            add = e if add is None else add + e
    return (tuple(parts_x), tuple(wps), tuple(cins),
            None if add is None else add.astype(cd))


def _fold_bias(epilogue, bias: jnp.ndarray, s: int):
    """BN affine + conv bias → the kernels' tiled (scale, bias) epilogue."""
    a, bvec = epilogue
    a = a.astype(jnp.float32)
    b_eff = bvec.astype(jnp.float32) + bias * a
    return jnp.tile(a, s), jnp.tile(b_eff, s)


def _fused_conv_epilogue(jobs, is_bcast, s: int, hw, features: int,
                         bias: jnp.ndarray, epilogue, cd) -> Packed | None:
    """Run the (virtual-concat conv → BN affine → ReLU) sequence as ONE
    Pallas kernel (ops/pallas/packed_vgg) with canonical layouts pinned on
    both sides.  ``jobs`` are (part, kernel-slice) pairs; broadcast parts
    become the kernel's pre-affine ``add`` term via the closed-form conv.
    Returns None when the kernel doesn't apply (CPU, unsupported shapes) —
    caller falls back to the XLA path.
    """
    from maunet_tpu.ops.pallas import packed_vgg as pvgg

    if not (jax.default_backend() == "tpu" or pvgg.INTERPRET):
        return None
    built = _build_packed_jobs(jobs, is_bcast, s, hw, features, cd)
    if built is None:
        return None
    parts_x, wps, cins, add = built
    if not pvgg.supported([q.shape for q in parts_x], cins, s, features):
        return None
    out = pvgg.packed_conv3x3_fused(
        parts_x, wps, cins, s, features,
        _fold_bias(epilogue, bias, s),
        add=add, relu=True, interpret=pvgg.INTERPRET)
    return Packed(out, features)


@functools.lru_cache(maxsize=64)
def _border_mask(n: int) -> np.ndarray:
    """(n, 3) mask: A[y, k] = 1 if kernel row-tap k (dy = k-1) lands inside a
    zero-padded length-n axis for output position y."""
    y = np.arange(n)[:, None]
    k = np.arange(3)[None, :]
    return ((y + k - 1 >= 0) & (y + k - 1 < n)).astype(np.float32)


def _const_conv(emb: jnp.ndarray, kernel: jnp.ndarray, h: int, w: int,
                out_pack: int = 1, compact_h: bool = False) -> jnp.ndarray:
    """3×3 SAME (zero-pad) conv of a spatially-constant (B, D) input,
    evaluated in closed form.  Returns (B, h, w, C) in f32 — or, with
    ``out_pack=s``, the lane-packed (B, h, w/s, s*C) form directly (the
    W-axis einsum emits the packed channel order natively).

    ``compact_h=True`` (requires ``out_pack>1`` and h >= 3) returns only the
    three distinct H-rows — (B, 3, w/s, s*C) with rows {y=0, interior,
    y=h-1} — the form ``packed_conv3x3_fused`` expands per-row in VMEM.
    Materializing the H-broadcast here cost two full-tensor relayout copies
    per decoder node (~0.7 ms/step at 256²/B8, round-3 trace)."""
    e = emb.reshape(emb.shape[0], -1).astype(jnp.float32)
    k = kernel.astype(jnp.float32)
    # Per-tap contribution (B, 3, 3, C), then interpolate over the border
    # masks of each axis.
    taps = jnp.einsum("bd,ijdc->bijc", e, k)
    if compact_h:
        assert out_pack > 1 and h >= 3
        # The zero-pad border mask has exactly 3 distinct rows for h >= 3.
        a = jnp.asarray(np.array([[0, 1, 1], [1, 1, 1], [1, 1, 0]],
                                 np.float32))
        hh = 3
    else:
        a = jnp.asarray(_border_mask(h))
        hh = h
    out = jnp.einsum("hi,bijc->bhjc", a, taps)
    if out_pack > 1:
        s = out_pack
        bm = jnp.asarray(_border_mask(w).reshape(w // s, s, 3))
        z = jnp.einsum("gpj,bhjc->bhgpc", bm, out)
        bsz, c = emb.shape[0], kernel.shape[-1]
        return z.reshape(bsz, hh, w // s, s * c)
    b = jnp.asarray(_border_mask(w))
    return jnp.einsum("wj,bhjc->bhwc", b, out)


class SplitConv(nn.Module):
    """3×3 SAME conv over a virtual channel-concatenation.

    Parameters are a single (3, 3, sum(C_i), features) kernel + bias — the
    same pytree as ``nn.Conv`` — so torch checkpoint import/export and BN
    folding are unaffected.  Parts with spatial shape (B, 1, 1, D) while the
    block target is larger are broadcast embeddings and take the closed-form
    path; all other parts must share the target (H, W).

    Each part's conv accumulates in f32 inside the MXU but is rounded to
    ``compute_dtype`` before the cross-part add (bf16 partial sums keep HBM
    writes at bf16 width) — in bf16 mode that is one extra rounding per
    part vs. a single fused conv; with ``compute_dtype=float32`` (the mode
    golden/parity tests run in) the result is exact.
    """

    features: int
    compute_dtype: jnp.dtype = jnp.bfloat16
    # Concatenate the spatial parts into one conv instead of one conv per
    # part.  Right for narrow blocks (U-Net++ at 32 channels: four 32-ch
    # parts pad to a full 128-lane tile only when packed together, and many
    # small convs pay fixed pipeline overhead); wrong for the classic U-Net
    # decoder, where 2-way splitting avoids the skip/upsample layout copy.
    group_spatial: bool = False
    # Lane-pack adjacent output columns when features < 128
    # (ops/packed_conv.py): s x MXU lane fill for (s+2)/3 x FLOPs.
    pack: bool = False
    # Smallest pack factor worth taking (see ops.packed_conv.pack_factor):
    # 4 for the XLA packed path (s=2 at 64 channels loses there), 2 when the
    # caller routes through the fused Pallas kernel (halos from VMEM, fused
    # epilogue — the two costs that made XLA's s=2 lose don't exist).
    pack_min_s: int = 4
    # Return the lane-packed form (only meaningful when packing fires):
    # packed-resident decoder rows chain node->node without layout copies.
    out_packed: bool = False
    # Train-mode lane-packed Pallas forward with XLA backward
    # (ops/train_conv.py) — set by VGGBlock when train=True; gated per
    # call site by train_conv.supported (narrow channels, TPU, even W).
    train_fused: bool = False

    @nn.compact
    def __call__(self, parts: Sequence[jnp.ndarray], epilogue=None,
                 bias_grad: bool = True):
        def c_of(p):
            return p.cin if isinstance(p, Packed) else p.shape[-1]

        def hw_of(p):
            if isinstance(p, Packed):
                return (p.x.shape[1], p.x.shape[2] * p.s)
            return p.shape[1:3]

        total_in = sum(c_of(p) for p in parts)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, total_in, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        hw = next((hw_of(p) for p in parts if hw_of(p) != (1, 1)),
                  hw_of(parts[0]))
        cd = self.compute_dtype

        def is_bcast(p):
            return (not isinstance(p, Packed) and p.shape[1:3] == (1, 1)
                    and hw != (1, 1))

        # Lane packing reaches full MXU fill per part on its own, so when it
        # fires the spatial concat is pure overhead (measured: U-Net++ 17.9
        # -> 16.2 ms/batch ungrouped).  Grouping only pays for *unpacked*
        # narrow convs (odd tile widths where pack_factor returns 1).
        pack_s = (pack_factor(self.features, hw[1], min_s=self.pack_min_s)
                  if self.pack else 1)
        group = self.group_spatial and pack_s == 1
        if pack_s == 1:
            assert not self.out_packed and not any(
                isinstance(p, Packed) for p in parts), \
                "packed parts require an active pack factor"

        # (tensor, kernel-slice) conv jobs; broadcast parts stay separate.
        jobs, off = [], 0
        if group:
            spatial = [p for p in parts if not is_bcast(p)]
            # Channel order must match the reference concat order, so
            # grouping is only valid when spatial parts form a prefix.
            assert all(is_bcast(p) for p in parts[len(spatial):]), \
                "group_spatial requires spatial parts before broadcast parts"
            cs = sum(p.shape[-1] for p in spatial)
            if len(spatial) > 1:
                jobs.append((jnp.concatenate(spatial, axis=-1),
                             jax.lax.slice_in_dim(kernel, 0, cs, axis=2)))
            elif spatial:
                jobs.append((spatial[0],
                             jax.lax.slice_in_dim(kernel, 0, cs, axis=2)))
            off = cs
            parts = parts[len(spatial):]
        for p in parts:
            c = c_of(p)
            jobs.append((p, jax.lax.slice_in_dim(kernel, off, off + c, axis=2)))
            off += c

        if epilogue is not None:
            assert self.out_packed, "epilogue implies a packed-resident output"
            y = _fused_conv_epilogue(jobs, is_bcast, pack_s, hw,
                                     self.features, bias, epilogue, cd)
            if y is not None:
                return y

        if self.train_fused and pack_s == 1 and not self.out_packed \
                and epilogue is None:
            from maunet_tpu.ops.pallas import packed_vgg as pvgg
            from maunet_tpu.ops.train_conv import splitconv_train_fused
            y = splitconv_train_fused(jobs, is_bcast, hw, self.features, cd,
                                      interpret=pvgg.INTERPRET)
            if y is not None:
                if not bias_grad:
                    bias = jax.lax.stop_gradient(bias)
                return y + bias.astype(y.dtype)

        out = None
        for p, w in jobs:
            if is_bcast(p):
                # Closed-form conv of a spatially-constant map; cast to the
                # accumulation dtype of the spatial convs.
                y = _const_conv(p, w, *hw,
                                out_pack=pack_s if self.out_packed else 1
                                ).astype(cd)
            else:
                # One f32 accumulation inside the MXU, rounded once to
                # compute_dtype per part (bf16 partial sums keep HBM writes
                # at bf16 width; in f32 mode this is exact).
                if isinstance(p, Packed):
                    p = Packed(p.x.astype(cd), p.cin)
                else:
                    p = p.astype(cd)
                y = packed_conv(p, w.astype(cd), pack_s,
                                out_packed=self.out_packed)
                if isinstance(y, Packed):
                    y = y.x
            out = y if out is None else out + y
        if epilogue is not None:
            # XLA fallback of the fused path: same folded-affine arithmetic.
            a, bv = epilogue
            a = a.astype(jnp.float32)
            b_eff = bv.astype(jnp.float32) + bias * a
            y = (out.astype(jnp.float32) * jnp.tile(a, pack_s)
                 + jnp.tile(b_eff, pack_s))
            return Packed(jnp.maximum(y, 0.0).astype(cd), self.features)
        # bias_grad=False (train-mode callers with BatchNorm right after):
        # batch-stat BN cancels any constant channel shift exactly, so the
        # bias gradient is mathematically zero — stop_gradient deletes the
        # full-tensor reduce_sum XLA would otherwise emit for it (~2.6
        # ms/train-step across the model) without changing any value.
        if not bias_grad:
            bias = jax.lax.stop_gradient(bias)
        b_vec = bias.astype(out.dtype)
        if self.out_packed:
            return Packed(out + jnp.tile(b_vec, pack_s), self.features)
        return out + b_vec


class PackedConv3x3(nn.Module):
    """3x3 SAME conv with lane packing; parameter pytree ({kernel, bias})
    and initializers identical to ``nn.Conv`` so it is a drop-in swap.
    Accepts/returns the lane-packed form when the caller keeps the decoder
    row packed-resident (``out_packed``)."""

    features: int
    compute_dtype: jnp.dtype = jnp.bfloat16
    pack_min_s: int = 4  # see SplitConv.pack_min_s
    out_packed: bool = False
    train_fused: bool = False  # see SplitConv.train_fused

    @nn.compact
    def __call__(self, x: jnp.ndarray | Packed, epilogue=None,
                 bias_grad: bool = True):
        if isinstance(x, Packed):
            cin, s, width = x.cin, x.s, x.x.shape[2] * x.s
        else:
            cin, width = x.shape[-1], x.shape[2]
            s = pack_factor(self.features, width, min_s=self.pack_min_s)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        cd = self.compute_dtype
        if epilogue is not None:
            assert self.out_packed, "epilogue implies a packed-resident output"
            hw = ((x.x.shape[1], width) if isinstance(x, Packed)
                  else x.shape[1:3])
            y = _fused_conv_epilogue([(x, kernel)], lambda p: False, s, hw,
                                     self.features, bias, epilogue, cd)
            if y is None:
                y = packed_conv(
                    Packed(x.x.astype(cd), x.cin) if isinstance(x, Packed)
                    else x.astype(cd),
                    kernel.astype(cd), s, out_packed=True)
                a, bv = epilogue
                a = a.astype(jnp.float32)
                b_eff = bv.astype(jnp.float32) + bias * a
                z = (y.x.astype(jnp.float32) * jnp.tile(a, s)
                     + jnp.tile(b_eff, s))
                y = Packed(jnp.maximum(z, 0.0).astype(cd), self.features)
            return y
        if isinstance(x, Packed):
            x = Packed(x.x.astype(cd), x.cin)
        else:
            x = x.astype(cd)
        if self.train_fused and s == 1 and not self.out_packed \
                and not isinstance(x, Packed):
            from maunet_tpu.ops.pallas import packed_vgg as pvgg
            from maunet_tpu.ops.train_conv import train_conv3x3
            y = train_conv3x3([x], [kernel], self.features,
                              interpret=pvgg.INTERPRET)
            if y is not None:
                if not bias_grad:
                    bias = jax.lax.stop_gradient(bias)
                return y + bias.astype(y.dtype)
        y = packed_conv(x, kernel.astype(cd), s, out_packed=self.out_packed)
        if not bias_grad:  # see SplitConv: zero through train-mode BN
            bias = jax.lax.stop_gradient(bias)
        if isinstance(y, Packed):
            return Packed(y.x + jnp.tile(bias.astype(y.x.dtype), s),
                          self.features)
        return y + bias.astype(y.dtype)


class BatchNormPacked(nn.Module):
    """Inference-only BatchNorm over a lane-packed tensor.

    Declares the exact variable tree of ``nn.BatchNorm`` (params scale/bias,
    batch_stats mean/var, all shape ``(features,)``) so checkpoints are
    interchangeable, and applies the same eval arithmetic in its folded
    affine form — ``x * a + b`` with ``a = scale·rsqrt(var+eps)``,
    ``b = bias - mean·a`` — in f32, with each per-channel vector tiled
    ``s``× over the packed channel dim.  Setup-style so :meth:`affine` can
    hand the folded vectors to a fused conv epilogue (ops/pallas/packed_vgg)
    without running the normalization as a separate op.
    """

    features: int
    s: int
    epsilon: float = 1e-5

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones_init(),
                                (self.features,), jnp.float32)
        self.bias = self.param("bias", nn.initializers.zeros_init(),
                               (self.features,), jnp.float32)
        self.mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32))
        self.var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32))

    def affine(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Folded (a, b) f32 vectors of length ``features`` (untiled)."""
        a = self.scale * jax.lax.rsqrt(self.var.value + self.epsilon)
        return a, self.bias - self.mean.value * a

    def __call__(self, xp: jnp.ndarray) -> jnp.ndarray:
        a, b = self.affine()
        tile = lambda v: jnp.tile(v, self.s)
        return xp.astype(jnp.float32) * tile(a) + tile(b)


class VGGBlock(nn.Module):
    """(Conv3x3 → BatchNorm → ReLU) × 2.

    Capability parity with the reference's universal conv block
    (reference src/model.py:9-21).  Submodule names (conv1/bn1/conv2/bn2)
    deliberately match the PyTorch attribute names so checkpoint conversion
    is a pure layout transform.

    ``x`` may be a sequence of tensors: they are treated as a channel
    concatenation but convolved part-wise (see ``SplitConv``) — decoder
    callers pass [skip, upsampled, embedding?] unconcatenated.
    """

    middle_channels: int
    out_channels: int
    compute_dtype: jnp.dtype = jnp.bfloat16
    # Inference mode with BatchNorm pre-folded into the conv weights
    # (models/fuse.py): conv → ReLU only, single fused MXU kernel per conv.
    bn_fused: bool = False
    # See SplitConv.group_spatial.
    group_spatial: bool = False
    # See SplitConv.pack.
    pack: bool = False
    # See SplitConv.pack_min_s.
    pack_min_s: int = 4
    # Packed-resident inference: inputs may be Packed, the output stays
    # Packed, and BN/ReLU run in packed space (BatchNormPacked) — no
    # unpack/repack layout copies between chained blocks.  Inference-only
    # (training BN needs per-true-channel batch stats).
    packed_io: bool = False
    # Fuse BOTH convs of the block into one Pallas kernel where supported
    # (packed_io only): the mid activation stays in VMEM, saving its HBM
    # write+read per block (ops/pallas/packed_vgg.packed_pair_fused).
    # Default OFF — measured regression on v5e (256²/B8: U-Net++ 987 vs
    # 1040 tiles/s, U-Net 945 vs 959, best-of pair config): the chained
    # single-conv kernels are compute-bound with the mid tensor's HBM
    # round-trip fully hidden by grid pipelining, so the fusion saves no
    # wall-clock while its 2-row conv1 overlap recompute adds ~5%.  Kept
    # as a tested mode for bandwidth-starved parts (docs/TRACE.md §10).
    fuse_pair: bool = False
    # Train-mode lane-packed Pallas forward for the narrow convs
    # (ops/train_conv.py): s× MXU lane fill on the forward, XLA's own conv
    # VJP kernels on the backward.  Applied only when train=True; gated
    # per conv by train_conv.supported.
    train_fused: bool = False

    @nn.compact
    def __call__(self, x: Parts, train: bool = False):
        # NB: Packed is a NamedTuple — exclude it from the sequence check.
        parts = (list(x) if isinstance(x, (list, tuple))
                 and not isinstance(x, Packed) else [x])
        if self.packed_io:
            assert not train, "packed_io is an inference-only mode"
            return self._call_packed(parts)
        assert not any(isinstance(p, Packed) for p in parts), \
            "Packed parts require packed_io"
        conv1 = SplitConv(self.middle_channels, compute_dtype=self.compute_dtype,
                          group_spatial=self.group_spatial, pack=self.pack,
                          pack_min_s=self.pack_min_s,
                          train_fused=self.train_fused and train,
                          name="conv1")
        # PackedConv3x3 is the nn.Conv drop-in (identical params/initializers/
        # arithmetic; falls through to a plain conv at s=1, and pack_min_s=999
        # pins s=1 when packing is off) — used for both modes so the train
        # path can pass bias_grad=False.
        conv2 = PackedConv3x3(
            self.out_channels, compute_dtype=self.compute_dtype,
            pack_min_s=self.pack_min_s if self.pack else 999,
            train_fused=self.train_fused and train, name="conv2")
        if self.bn_fused:
            assert not train, "bn_fused is an inference-only mode"
            x = nn.relu(conv1(parts)).astype(self.compute_dtype)
            x = nn.relu(conv2(x))
            return x
        # BatchNorm: torch defaults are momentum=0.1 (i.e. flax momentum=0.9)
        # and eps=1e-5; stats and normalization in f32.
        bn_kw = dict(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )
        # In train mode each conv feeds batch-stat BN, which cancels the conv
        # bias exactly — bias_grad=False skips its (zero) gradient reduces.
        x = conv1(parts, bias_grad=not train)
        x = nn.relu(nn.BatchNorm(name="bn1", **bn_kw)(x))
        x = x.astype(self.compute_dtype)
        x = conv2(x, bias_grad=not train)
        x = nn.relu(nn.BatchNorm(name="bn2", **bn_kw)(x))
        return x.astype(self.compute_dtype)

    def _call_packed(self, parts) -> Packed:
        """Each (conv → BN → ReLU) runs as one fused epilogue: the BN's
        folded affine (or identity, when BN is already folded into the conv
        weights) rides the conv kernel's f32 accumulator — no separate
        normalization op, no layout freedom between conv and activation.
        When the whole block qualifies (fuse_pair), BOTH convs run as ONE
        Pallas kernel with the mid activation resident in VMEM
        (ops/pallas/packed_vgg.packed_pair_fused) — no HBM round trip
        between conv1 and conv2."""
        cd = self.compute_dtype
        mid, out = self.middle_channels, self.out_channels

        def hw_of(p):
            if isinstance(p, Packed):
                return (p.x.shape[1], p.x.shape[2] * p.s)
            return p.shape[1:3]

        hw = next((hw_of(p) for p in parts if hw_of(p) != (1, 1)),
                  hw_of(parts[0]))

        def is_bcast(p):
            return (not isinstance(p, Packed) and p.shape[1:3] == (1, 1)
                    and hw != (1, 1))

        width = hw[1]
        s1 = pack_factor(mid, width, min_s=self.pack_min_s)
        s2 = pack_factor(out, width, min_s=self.pack_min_s)
        ident = lambda n: (jnp.ones((n,), jnp.float32),
                           jnp.zeros((n,), jnp.float32))

        if (self.fuse_pair and s1 == s2 and s1 > 1
                and self._pair_eligible(parts, is_bcast, s1)):
            from maunet_tpu.ops.pallas import packed_vgg as pvgg

            total_in = sum(p.cin if isinstance(p, Packed) else p.shape[-1]
                           for p in parts)
            k1, b1c = _ConvParams(total_in, mid, name="conv1")()
            k2, b2c = _ConvParams(mid, out, name="conv2")()
            if self.bn_fused:
                aff1, aff2 = ident(mid), ident(out)
            else:
                aff1 = BatchNormPacked(mid, s1, name="bn1").affine()
                aff2 = BatchNormPacked(out, s2, name="bn2").affine()
            jobs, off = [], 0
            for p in parts:
                c = p.cin if isinstance(p, Packed) else p.shape[-1]
                jobs.append((p, jax.lax.slice_in_dim(k1, off, off + c,
                                                     axis=2)))
                off += c
            parts_x, wps, cins, add = _build_packed_jobs(
                jobs, is_bcast, s1, hw, mid, cd)
            wp2 = (pack_weights(k2, s1)
                   .reshape(3, (s1 + 2) * mid, s1 * out).astype(cd))
            y = pvgg.packed_pair_fused(
                parts_x, wps, cins, s1, mid, wp2, out,
                _fold_bias(aff1, b1c, s1), _fold_bias(aff2, b2c, s1),
                add=add, interpret=pvgg.INTERPRET)
            return Packed(y, out)

        conv1 = SplitConv(mid, compute_dtype=cd,
                          group_spatial=False, pack=True, out_packed=True,
                          pack_min_s=self.pack_min_s, name="conv1")
        conv2 = PackedConv3x3(out, compute_dtype=cd,
                              out_packed=True, pack_min_s=self.pack_min_s,
                              name="conv2")
        if self.bn_fused:
            y = conv1(parts, epilogue=ident(mid))
            return conv2(y, epilogue=ident(out))
        bn1 = BatchNormPacked(mid, s1, name="bn1")
        bn2 = BatchNormPacked(out, s2, name="bn2")
        y = conv1(parts, epilogue=bn1.affine())
        return conv2(y, epilogue=bn2.affine())

    def _pair_eligible(self, parts, is_bcast, s: int) -> bool:
        """Static (shape-only) eligibility for the whole-block fused kernel
        — decided before any params are created so exactly one param-owning
        path runs per block."""
        from maunet_tpu.ops.pallas import packed_vgg as pvgg

        if not (jax.default_backend() == "tpu" or pvgg.INTERPRET):
            return False
        shapes, cins = [], []
        for p in parts:
            if is_bcast(p):
                continue
            if isinstance(p, Packed):
                shapes.append(p.x.shape)
                cins.append(p.cin)
            else:
                b, h, w, c = p.shape
                if w % s:
                    return False
                c += (-c) % 8
                shapes.append((b, h, w // s, s * c))
                cins.append(c)
        if not shapes:
            return False
        return pvgg.pair_supported(shapes, tuple(cins), s,
                                   self.middle_channels, self.out_channels)


class _ConvParams(nn.Module):
    """Bare parameter holder with ``nn.Conv``'s exact pytree ({kernel,
    bias}, same shapes/initializers) — lets the whole-block fused path
    (packed_pair_fused) own both convs' weights without instantiating the
    conv modules, while staying checkpoint-interchangeable with
    SplitConv/PackedConv3x3 call sites of the same name."""

    in_channels: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, self.in_channels, self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        return kernel, bias


class PackedConv1x1(nn.Module):
    """1x1 conv over a lane-packed tensor via a block-diagonal packed kernel.
    Parameter tree ({kernel (1,1,Cin,F), bias (F,)}) identical to ``nn.Conv``
    so the output heads stay checkpoint-compatible; the packed input is
    consumed in place (no unpack copy before the head)."""

    features: int
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, xp: Packed) -> Packed:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, xp.cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        s, cd = xp.s, self.compute_dtype
        kb = jnp.einsum("pq,cf->pcqf", jnp.eye(s, dtype=jnp.float32),
                        kernel[0, 0]).reshape(1, 1, s * xp.cin,
                                              s * self.features)
        out = jax.lax.conv_general_dilated(
            xp.x.astype(cd), kb.astype(cd), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = out + jnp.tile(bias.astype(out.dtype), s)
        return Packed(out, self.features)


def max_pool_2x2(x: jnp.ndarray | Packed,
                 out_packed: bool = False) -> jnp.ndarray | Packed:
    """2×2/stride-2 max pool, floor semantics for odd sizes (torch
    ``nn.MaxPool2d(2, 2)``, reference src/model.py:58,218): 31 → 15.

    A :class:`Packed` input pools in packed space: the W-direction max pairs
    adjacent columns *within* a group, which in packed channel order is an
    elementwise max of channel slices — no unpack reshape (the unpack view
    fed to ``reduce_window`` costs a layout copy + a 2× slower pool, round-3
    trace).  Returns the unpacked pooled tensor — or, with ``out_packed``
    and a pooled pack factor still >= 2, the :class:`Packed` s/2 form
    directly: a consumer whose own pack factor is s/2 (U-Net++'s conv1_0,
    s=4 row pooled into the s=2 row) then reads it in place instead of
    paying an unpack+repack relayout pair.

    ``out_packed=True`` is honored strictly: requesting it on an input whose
    pooled pack factor would degenerate (s//2 < 2) is a caller bug and
    asserts here — the return type is decided by the caller's request alone,
    so a drifted caller gate fails loudly at the call site instead of
    leaking a Packed into a non-packed_io block (ADVICE r3).
    """
    if isinstance(x, Packed):
        s, c = x.s, x.cin
        assert s % 2 == 0, s
        assert not out_packed or s // 2 >= 2, (
            f"out_packed requires a pooled pack factor >= 2 (input s={s})")
        xp = x.x  # (b, h, g, s*c); column p of group g is channels [p*c:(p+1)*c]
        pairs = [jnp.maximum(xp[..., (2 * i) * c:(2 * i + 1) * c],
                             xp[..., (2 * i + 1) * c:(2 * i + 2) * c])
                 for i in range(s // 2)]
        m = pairs[0] if len(pairs) == 1 else jnp.concatenate(pairs, axis=-1)
        # H-pair max via reshape, not reduce_window: (h) -> (h/2, 2) is a
        # free view and the pair-max vectorizes; reduce_window on the same
        # tensor ran ~7x off bandwidth in the round-3 trace.
        b, h, g, sc = m.shape
        m = m.reshape(b, h // 2, 2, g, sc).max(axis=2)
        if out_packed:
            return Packed(m, c)
        return Packed(m, c).unpack()
    b, h, w, c = x.shape
    x = x[:, : h // 2 * 2, : w // 2 * 2]  # floor semantics for odd sizes
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    # where-chains, not jnp.maximum(...).max(...): max's VJP splits ties with
    # a divide over the tie count (~2.4 ms/train-step of divide_multiply
    # fusions in the round-3 trace); where's VJP is a plain select routing
    # the gradient to one winner — torch MaxPool2d's convention.
    a, b2 = x[:, :, 0], x[:, :, 1]
    m = jnp.where(a >= b2, a, b2)
    m0, m1 = m[:, :, :, 0], m[:, :, :, 1]
    return jnp.where(m0 >= m1, m0, m1)


def broadcast_embeddings(emb: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(B, D) → (B, H, W, D) channel-broadcast for bottleneck/decoder fusion
    (reference src/model.py:98-108,248-259)."""
    b, d = emb.shape
    return jnp.broadcast_to(emb[:, None, None, :], (b, h, w, d))
