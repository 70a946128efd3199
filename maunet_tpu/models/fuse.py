"""Inference-time BatchNorm folding.

At eval time BatchNorm is an affine transform with frozen statistics, so it
folds exactly into the preceding convolution's kernel and bias:

    y = γ·(conv(x) + b − μ)/√(σ² + ε) + β
      = conv_{K·s}(x) + (b − μ)·s + β,      s = γ/√(σ² + ε)

This removes every BN normalize op (f32 elementwise passes over full
feature maps — pure HBM bandwidth) from the inference graph, leaving
conv → ReLU chains that XLA fuses into single MXU kernels.  Models take
``bn_fused=True`` to skip BN layers and consume folded variables.

Numerics are exact up to float re-association (validated in tests against
the unfused graph).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

BN_EPS = 1e-5


def _fold_pair(conv: dict, bn: dict, stats: dict) -> dict:
    s = bn["scale"] / jnp.sqrt(stats["var"] + BN_EPS)
    kernel = conv["kernel"] * s  # (kh, kw, I, O) * (O,)
    bias = conv.get("bias", 0.0)
    bias = (bias - stats["mean"]) * s + bn["bias"]
    return {"kernel": kernel, "bias": bias}


def fold_batchnorm(variables: dict[str, Any]) -> dict[str, Any]:
    """Fold every (convN, bnN) pair in the variable tree; returns fused
    ``{'params': ...}`` (no batch_stats) for a ``bn_fused=True`` model."""
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    def walk(p: dict, s: dict) -> dict:
        out = {}
        for name, child in p.items():
            if not isinstance(child, dict):
                out[name] = child
                continue
            bn_name = "bn" + name[4:] if name.startswith("conv") else None
            if bn_name and bn_name in p and name in ("conv1", "conv2"):
                out[name] = _fold_pair(child, p[bn_name], s[bn_name])
            elif name.startswith("bn") and ("conv" + name[2:]) in p:
                continue  # consumed by its conv
            else:
                out[name] = walk(child, s.get(name, {}))
        return out

    return {"params": walk(params, batch_stats)}
