"""Metadata-augmented classic U-Net.

Capability parity with ``UrbanPredictor_unet`` (reference src/model.py:195-292):
4-down/4-up U-Net over the 23-channel tile stack, with the temporal (LSTM) and
metadata (MLP) embeddings optionally broadcast-concatenated **only at the
bottleneck**, bilinear align-corners upsampling with exact-size fix-ups for
odd chains, a 1×1 output conv, and tanh on the NDVI channel only (2-channel
outputs).

TPU-native differences: NHWC layout, bf16 compute / f32 params, the
align-corners resize runs as MXU matmuls (maunet_tpu/ops/resize.py), and the
LSTM handles sequence lengths explicitly (see encoders.TemporalEncoder).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from maunet_tpu.models.blocks import (PackedConv1x1, VGGBlock, max_pool_2x2)
from maunet_tpu.models.encoders import MetadataEncoder, TemporalEncoder
from maunet_tpu.ops.packed_conv import Packed, pack_factor
from maunet_tpu.ops.resize import upsample_like


class MetaUNet(nn.Module):
    out_channels: int = 2
    temporal_dim: int = 64
    meta_dim: int = 64
    lstm_dim: int = 96
    base_filters: int = 64
    temporal_embeddings: bool = True
    metadata_embeddings: bool = True
    lstm_mask_mode: str = "per_sample"
    compute_dtype: jnp.dtype = jnp.bfloat16
    bn_fused: bool = False
    # jax.checkpoint each VGGBlock: recompute activations in backward,
    # trading ~30% step FLOPs for O(depth) less live activation memory
    # (enables bigger batches / 512px training tiles).
    remat: bool = False
    # Lane-pack narrow convs (ops/packed_conv.py) — off by default; measured
    # per-model in maunet_tpu/benchmarks.py.
    pack_lanes: bool = False
    # Smallest pack factor worth taking (see blocks.SplitConv.pack_min_s).
    # With pack_lanes on and min_s=2, the 64-channel level-0 row runs
    # packed-resident through the fused Pallas kernel at inference (s=2,
    # full 128-lane fill); levels >=1 have >=128 channels and never pack.
    pack_min_s: int = 4
    # Whole-VGGBlock pair fusion for packed-resident blocks — see
    # blocks.VGGBlock.fuse_pair (default off: measured v5e regression).
    fuse_pair: bool = False
    # Train-mode lane-packed Pallas forward for narrow convs — see
    # blocks.VGGBlock.train_fused (applies to the 64-channel level-0 row).
    train_fused_conv: bool = False

    @nn.compact
    def __call__(
        self,
        maps: jnp.ndarray,                       # (B, H, W, 23)
        temp_series: jnp.ndarray,                # (B, T)
        metadata: jnp.ndarray,                   # (B, 4 or 8)
        temp_lengths: jnp.ndarray | None = None, # (B,)
        train: bool = False,
    ) -> jnp.ndarray:
        nb = [self.base_filters * (2 ** i) for i in range(5)]
        cd = self.compute_dtype
        # static_argnums: self=0, x=1, train=2 (train drives Python
        # control flow inside the block)
        block_cls = (nn.remat(VGGBlock, static_argnums=(2,))
                     if self.remat else VGGBlock)
        # Training keeps min_s=4: the s=2 rows only pay off through the fused
        # Pallas inference kernel — the XLA packed path they'd take in the
        # train step is the measured loser (docs/TRACE.md §6).
        min_s = self.pack_min_s if not train else max(self.pack_min_s, 4)
        vgg = lambda name, mid, out: block_cls(mid, out, compute_dtype=cd,
                                               bn_fused=self.bn_fused,
                                               pack=self.pack_lanes,
                                               pack_min_s=min_s,
                                               train_fused=self.train_fused_conv,
                                               name=name)
        # Packed-resident level-0 row (inference): the two 64-channel blocks
        # and the head stay in the lane-packed (B, H, W/2, 2*64) form —
        # convs run the fused Pallas kernel (ops/pallas/packed_vgg) at full
        # 128-lane fill with the BN affine + ReLU in the epilogue.
        s0 = (pack_factor(nb[0], maps.shape[2], min_s=min_s)
              if (self.pack_lanes and not train) else 1)
        vgg0 = lambda name, mid, out: block_cls(
            mid, out, compute_dtype=cd, bn_fused=self.bn_fused,
            pack=self.pack_lanes, pack_min_s=min_s,
            packed_io=s0 > 1, fuse_pair=self.fuse_pair,
            train_fused=self.train_fused_conv, name=name)

        maps = maps.astype(cd)

        # Encoder path (reference src/model.py:267-270).
        x0_0 = vgg0("conv0_0", nb[0], nb[0])(maps, train)
        x1_0 = vgg("conv1_0", nb[1], nb[1])(max_pool_2x2(x0_0), train)
        x2_0 = vgg("conv2_0", nb[2], nb[2])(max_pool_2x2(x1_0), train)
        x3_0 = vgg("conv3_0", nb[3], nb[3])(max_pool_2x2(x2_0), train)

        # Bottleneck with optional embedding fusion (reference :273-276).
        # Embeddings enter as (B, 1, 1, D) — VGGBlock/SplitConv convolve the
        # broadcast channels in closed form (see blocks._const_conv).
        x4_0 = max_pool_2x2(x3_0)
        fused = [x4_0]
        if self.temporal_embeddings:
            temb = TemporalEncoder(
                self.lstm_dim, self.temporal_dim, mask_mode=self.lstm_mask_mode,
                compute_dtype=cd, name="temporal_encoder",
            )(temp_series, temp_lengths)
            fused.append(temb[:, None, None, :])
        if self.metadata_embeddings:
            memb = MetadataEncoder(self.meta_dim, compute_dtype=cd,
                                   name="meta_encoder")(metadata.astype(jnp.float32))
            fused.append(memb[:, None, None, :])
        x4_0 = vgg("conv4_0", nb[4], nb[4])(fused, train)

        # Decoder path: scale-2 upsample + exact-size match, skip "concat"
        # passed as parts — the first conv of each block convolves skip and
        # upsample separately (same math, no concat materialization; see
        # blocks.SplitConv).  Reference :279-282 — note the *double*
        # interpolation for odd sizes.
        def up_cat(deep, skip, out_pack=1):
            hw = ((skip.x.shape[1], skip.x.shape[2] * skip.s)
                  if isinstance(skip, Packed) else skip.shape[1:3])
            u = upsample_like(deep, hw, pre_scale=2, out_pack=out_pack,
                              prefer_xla=train)
            if isinstance(u, Packed):
                u = Packed(u.x.astype(cd), u.cin)
            else:
                u = u.astype(cd)
            return [skip, u]

        x3_1 = vgg("conv3_1", nb[3], nb[3])(up_cat(x4_0, x3_0), train)
        x2_1 = vgg("conv2_1", nb[2], nb[2])(up_cat(x3_1, x2_0), train)
        x1_1 = vgg("conv1_1", nb[1], nb[1])(up_cat(x2_1, x1_0), train)
        x0_1 = vgg0("conv0_1", nb[0], nb[0])(
            up_cat(x1_1, x0_0, out_pack=s0), train)

        # Head runs in compute_dtype (the f32 input materialization was a
        # measurable HBM cost at 512² — docs/TRACE.md); activation in f32.
        # Packed inputs go through the block-diagonal packed 1x1 head (same
        # parameter tree as nn.Conv) and unpack only the tiny 2-ch output.
        if isinstance(x0_1, Packed):
            out = PackedConv1x1(self.out_channels, compute_dtype=cd,
                                name="final")(x0_1).unpack()
        else:
            out = nn.Conv(
                self.out_channels, kernel_size=(1, 1), name="final",
                dtype=cd, param_dtype=jnp.float32,
            )(x0_1)
        output = out.astype(jnp.float32)

        # Per-channel activation: tanh on NDVI (ch 0), identity on LST —
        # only for 2-channel outputs (reference :286-291).
        if self.out_channels == 2:
            output = jnp.concatenate(
                [jnp.tanh(output[..., 0:1]), output[..., 1:2]], axis=-1
            )
        return output
