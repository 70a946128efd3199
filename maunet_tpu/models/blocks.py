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

from maunet_tpu.ops.packed_conv import pack_factor, packed_conv

Parts = Union[jnp.ndarray, Sequence[jnp.ndarray]]


@functools.lru_cache(maxsize=64)
def _border_mask(n: int) -> np.ndarray:
    """(n, 3) mask: A[y, k] = 1 if kernel row-tap k (dy = k-1) lands inside a
    zero-padded length-n axis for output position y."""
    y = np.arange(n)[:, None]
    k = np.arange(3)[None, :]
    return ((y + k - 1 >= 0) & (y + k - 1 < n)).astype(np.float32)


def _const_conv(emb: jnp.ndarray, kernel: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """3×3 SAME (zero-pad) conv of a spatially-constant (B, D) input,
    evaluated in closed form.  Returns (B, h, w, C) in f32."""
    e = emb.reshape(emb.shape[0], -1).astype(jnp.float32)
    k = kernel.astype(jnp.float32)
    # Per-tap contribution (B, 3, 3, C), then interpolate over the border
    # masks of each axis.
    taps = jnp.einsum("bd,ijdc->bijc", e, k)
    a = jnp.asarray(_border_mask(h))
    b = jnp.asarray(_border_mask(w))
    out = jnp.einsum("hi,bijc->bhjc", a, taps)
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

    @nn.compact
    def __call__(self, parts: Sequence[jnp.ndarray]) -> jnp.ndarray:
        total_in = sum(p.shape[-1] for p in parts)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, total_in, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        hw = next((p.shape[1:3] for p in parts if p.shape[1:3] != (1, 1)),
                  parts[0].shape[1:3])
        cd = self.compute_dtype

        def is_bcast(p):
            return p.shape[1:3] == (1, 1) and hw != (1, 1)

        # Lane packing reaches full MXU fill per part on its own, so when it
        # fires the spatial concat is pure overhead (measured: U-Net++ 17.9
        # -> 16.2 ms/batch ungrouped).  Grouping only pays for *unpacked*
        # narrow convs (odd tile widths where pack_factor returns 1).
        pack_s = (pack_factor(self.features, hw[1], min_s=4)
                  if self.pack else 1)
        group = self.group_spatial and pack_s == 1

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
            c = p.shape[-1]
            jobs.append((p, jax.lax.slice_in_dim(kernel, off, off + c, axis=2)))
            off += c

        out = None
        for p, w in jobs:
            if is_bcast(p):
                # Closed-form conv of a spatially-constant map; cast to the
                # accumulation dtype of the spatial convs.
                y = _const_conv(p, w, *hw).astype(cd)
            else:
                # One f32 accumulation inside the MXU, rounded once to
                # compute_dtype per part (bf16 partial sums keep HBM writes
                # at bf16 width; in f32 mode this is exact).
                y = packed_conv(p.astype(cd), w.astype(cd), pack_s)
            out = y if out is None else out + y
        return out + bias.astype(out.dtype)


class PackedConv3x3(nn.Module):
    """3x3 SAME conv with lane packing; parameter pytree ({kernel, bias})
    and initializers identical to ``nn.Conv`` so it is a drop-in swap."""

    features: int
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        cd = self.compute_dtype
        s = pack_factor(self.features, x.shape[2], min_s=4)
        y = packed_conv(x.astype(cd), kernel.astype(cd), s)
        return y + bias.astype(y.dtype)


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

    @nn.compact
    def __call__(self, x: Parts, train: bool = False) -> jnp.ndarray:
        parts = list(x) if isinstance(x, (list, tuple)) else [x]
        conv1 = SplitConv(self.middle_channels, compute_dtype=self.compute_dtype,
                          group_spatial=self.group_spatial, pack=self.pack,
                          name="conv1")
        if self.pack:
            conv2 = PackedConv3x3(self.out_channels,
                                  compute_dtype=self.compute_dtype, name="conv2")
        else:
            conv2 = nn.Conv(self.out_channels, kernel_size=(3, 3),
                            padding="SAME", dtype=self.compute_dtype,
                            param_dtype=jnp.float32, name="conv2")
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
        x = conv1(parts)
        x = nn.relu(nn.BatchNorm(name="bn1", **bn_kw)(x))
        x = x.astype(self.compute_dtype)
        x = conv2(x)
        x = nn.relu(nn.BatchNorm(name="bn2", **bn_kw)(x))
        return x.astype(self.compute_dtype)


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2×2/stride-2 max pool, floor semantics for odd sizes (torch
    ``nn.MaxPool2d(2, 2)``, reference src/model.py:58,218): 31 → 15."""
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2), padding="VALID")


def broadcast_embeddings(emb: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(B, D) → (B, H, W, D) channel-broadcast for bottleneck/decoder fusion
    (reference src/model.py:98-108,248-259)."""
    b, d = emb.shape
    return jnp.broadcast_to(emb[:, None, None, :], (b, h, w, d))
