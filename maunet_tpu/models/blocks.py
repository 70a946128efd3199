"""Core conv blocks.

TPU design notes: tensors are NHWC (the layout XLA tiles best onto the MXU);
convs run in ``compute_dtype`` (bf16 by default) with f32 parameters, while
BatchNorm statistics and normalization always run in f32.  The (conv → BN →
ReLU) pair is the hot kernel of the whole framework — XLA fuses the BN/ReLU
epilogue into the convolution; an explicitly fused Pallas inference path
lives in maunet_tpu/ops/pallas.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class VGGBlock(nn.Module):
    """(Conv3x3 → BatchNorm → ReLU) × 2.

    Capability parity with the reference's universal conv block
    (reference src/model.py:9-21).  Submodule names (conv1/bn1/conv2/bn2)
    deliberately match the PyTorch attribute names so checkpoint conversion
    is a pure layout transform.
    """

    middle_channels: int
    out_channels: int
    compute_dtype: jnp.dtype = jnp.bfloat16
    # Inference mode with BatchNorm pre-folded into the conv weights
    # (models/fuse.py): conv → ReLU only, single fused MXU kernel per conv.
    bn_fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        conv_kw = dict(
            kernel_size=(3, 3),
            padding="SAME",
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
        )
        if self.bn_fused:
            assert not train, "bn_fused is an inference-only mode"
            x = nn.relu(nn.Conv(self.middle_channels, name="conv1", **conv_kw)(x))
            x = nn.relu(nn.Conv(self.out_channels, name="conv2", **conv_kw)(x))
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
        x = nn.Conv(self.middle_channels, name="conv1", **conv_kw)(x)
        x = nn.relu(nn.BatchNorm(name="bn1", **bn_kw)(x))
        x = x.astype(self.compute_dtype)
        x = nn.Conv(self.out_channels, name="conv2", **conv_kw)(x)
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
