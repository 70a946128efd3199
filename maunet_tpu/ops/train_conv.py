"""Train-mode 3x3 conv with a lane-packed Pallas forward (custom VJP).

The train step's forward convs at 64/32 output channels fill only 50%/25%
of the MXU's 128 lanes on the XLA path (the same fill ceiling that
motivated lane packing at inference, docs/TRACE.md §5-7).  Inference
routes these through ``ops/pallas/packed_vgg.packed_conv3x3_fused``; in
training that kernel was blocked because it fuses the *running-stats*
BatchNorm affine — but nothing stops using it for the raw convolution and
letting batch-stat BN run as usual on the result:

- **forward**: the packed fused kernel (``affine=None, relu=False``) over
  the free-reshape lane-packed view of the NHWC input — s× lane fill for
  (s+2)/3× FLOPs, halos sliced from VMEM, f32 accumulators.  The packed
  output is a free reshape back to NHWC.
- **backward**: ``jax.custom_vjp`` delegating to XLA's own conv VJP
  kernels (via ``jax.vjp`` of the reference XLA conv) — the measured
  ~124 TFLOP/s dgrad/wgrad path (docs/TRACE.md §8); wgrad contracts over
  batch×space so its MXU fill is not channel-limited and packing could
  only hurt it.

Numerics: the forward differs from the XLA conv only by f32-accumulator
reassociation across the three packed channel blocks (same delta the
inference path carries); the backward is bit-identical to the XLA path.

Capability parity: reference src/model.py:9-21 (VGGBlock convs) — this is
an execution strategy for the same parameters, wired in through
``models/blocks.py`` behind ``VGGBlock.train_fused``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from maunet_tpu.ops.packed_conv import pack_factor, pack_weights


def _ref_conv_sum(parts, kernels):
    """The XLA reference: sum of SAME convs of each part against its
    kernel slice, each rounded to the part's dtype (matches the SplitConv
    per-part rounding contract, models/blocks.py)."""
    out = None
    for p, w in zip(parts, kernels):
        y = jax.lax.conv_general_dilated(
            p, w.astype(p.dtype), window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = y if out is None else out + y
    return out


def _pallas_fwd(parts, kernels, s: int, features: int, interpret: bool):
    from maunet_tpu.ops.pallas import packed_vgg as pvgg

    cd = parts[0].dtype
    parts_x, wps, cins = [], [], []
    for p, w in zip(parts, kernels):
        b, h, w_, c = p.shape
        padc = (-c) % 8
        if padc:
            # The kernel's halo slices need 8-aligned channel blocks; zero
            # channels contribute zero and the pad fuses into the producer.
            p = jnp.pad(p, ((0, 0),) * 3 + ((0, padc),))
            w = jnp.pad(w, ((0, 0), (0, 0), (0, padc), (0, 0)))
            c += padc
        parts_x.append(p.reshape(b, h, w_ // s, s * c))
        wps.append(pack_weights(w, s)
                   .reshape(3, (s + 2) * c, s * features).astype(cd))
        cins.append(c)
    out = pvgg.packed_conv3x3_fused(
        tuple(parts_x), tuple(wps), tuple(cins), s, features,
        affine=None, relu=False, interpret=interpret)
    b, h, g, sc = out.shape
    return out.reshape(b, h, g * s, features)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv_vc(parts, kernels, cfg):
    s, features, interpret = cfg
    return _pallas_fwd(parts, kernels, s, features, interpret)


def _conv_vc_fwd(parts, kernels, cfg):
    return _conv_vc(parts, kernels, cfg), (parts, kernels)


def _conv_vc_bwd(cfg, res, g):
    parts, kernels = res
    _, vjp = jax.vjp(_ref_conv_sum, parts, kernels)
    d_parts, d_kernels = vjp(g)
    return d_parts, d_kernels


_conv_vc.defvjp(_conv_vc_fwd, _conv_vc_bwd)


def supported(parts, features: int, interpret: bool = False) -> int | None:
    """The pack factor the train-fused path would use, or None when the
    Pallas kernel doesn't apply (CPU, odd shapes, wide channels)."""
    from maunet_tpu.ops.pallas import packed_vgg as pvgg

    if not (jax.default_backend() == "tpu" or interpret):
        return None
    b, h, w, _ = parts[0].shape
    if any(p.shape[:3] != (b, h, w) for p in parts):
        return None
    s = pack_factor(features, w, min_s=2)
    if s < 2:
        return None
    cins = tuple(c + ((-c) % 8) for c in (p.shape[-1] for p in parts))
    shapes = [(b, h, w // s, s * c) for c in cins]
    if not pvgg.supported(shapes, cins, s, features):
        return None
    return s


def train_conv3x3(parts, kernels, features: int,
                  interpret: bool = False) -> jnp.ndarray | None:
    """3x3 SAME conv over a virtual channel-concat of NHWC ``parts`` (each
    with its f32 ``kernels`` slice), Pallas-packed forward + XLA backward.
    Returns None when unsupported — caller falls back to the XLA path.

    Static config (pack factor, features, interpret) rides the custom-VJP
    boundary as a hashable aux operand so the same traced function serves
    every eligible call site.
    """
    s = supported(parts, features, interpret)
    if s is None:
        return None
    return _conv_vc(tuple(parts), tuple(kernels), (s, features, interpret))


def splitconv_train_fused(jobs, is_bcast, hw, features: int, cd,
                          interpret: bool = False):
    """SplitConv train-path adapter: spatial (part, kernel-slice) jobs run
    through :func:`train_conv3x3`; broadcast-embedding jobs keep their
    differentiable closed-form conv (models/blocks._const_conv) added
    outside the custom-VJP boundary.  Returns None when the Pallas path
    doesn't apply — caller falls back to the XLA jobs loop."""
    from maunet_tpu.models.blocks import _const_conv

    spatial = [(p.astype(cd), w) for p, w in jobs if not is_bcast(p)]
    if not spatial:
        return None
    out = train_conv3x3([p for p, _ in spatial], [w for _, w in spatial],
                        features, interpret=interpret)
    if out is None:
        return None
    for p, w in jobs:
        if is_bcast(p):
            out = out + _const_conv(p, w, *hw).astype(cd)
    return out
