"""Metadata-augmented nested U-Net++.

Capability parity with ``UrbanPredictor_unetpp`` (reference src/model.py:51-193):
dense skip grid x_{i,j}, with the combined temporal+metadata embedding map
broadcast-concatenated into **every decoder node** (all conv_{i,j>=1}), single
align-corners resize straight to the target size per node (reference
src/model.py:111-121), optional deep supervision with 4 heads (:90-94,180-185),
and tanh-on-NDVI output activation (:187-193).

Unlike the reference — which silently swallows the embedding-ablation flags
via ``**kwargs`` (src/model.py:53) — the flags here genuinely remove the
corresponding encoder and its channels.  The checkpoint importer always sets
both True for U-Net++ checkpoints to match reference behaviour.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from maunet_tpu.models.blocks import PackedConv1x1, VGGBlock, max_pool_2x2
from maunet_tpu.models.encoders import MetadataEncoder, TemporalEncoder
from maunet_tpu.ops.packed_conv import Packed, pack_factor
from maunet_tpu.ops.resize import upsample_like


class MetaUNetPP(nn.Module):
    out_channels: int = 2
    temporal_dim: int = 64
    meta_dim: int = 64
    lstm_dim: int = 96
    base_filters: int = 32
    deep_supervision: bool = False
    temporal_embeddings: bool = True
    metadata_embeddings: bool = True
    lstm_mask_mode: str = "per_sample"
    compute_dtype: jnp.dtype = jnp.bfloat16
    bn_fused: bool = False
    # jax.checkpoint each VGGBlock: recompute activations in backward,
    # trading ~30% step FLOPs for O(depth) less live activation memory
    # (enables bigger batches / 512px training tiles).
    remat: bool = False
    # Lane-pack the 32-channel convs (ops/packed_conv.py): 4x MXU lane fill
    # for 2x FLOPs.  On by default — measured on v5e at 256²/B8: inference
    # 23.3 -> 19.5 ms/batch (+20%), train step 59.0 -> 56.6 ms (+4%), with
    # identical parameters and outputs (exact transform).
    pack_lanes: bool = True
    # Smallest pack factor worth taking.  4 restricts packing to the
    # 32-channel level-0 row; 2 additionally packs the 64-channel level-1
    # row through the fused Pallas kernel (ops/pallas/packed_vgg) — only
    # profitable where that kernel fires (TPU inference), so the default
    # stays 4 and the factory/benchmarks opt levels in per-backend.
    pack_min_s: int = 4
    # Whole-VGGBlock pair fusion for packed-resident blocks — see
    # blocks.VGGBlock.fuse_pair (default off: measured v5e regression).
    fuse_pair: bool = False
    # Train-mode lane-packed Pallas forward for narrow convs — see
    # blocks.VGGBlock.train_fused (applies to the 32/64-channel rows).
    train_fused_conv: bool = False

    @nn.compact
    def __call__(
        self,
        maps: jnp.ndarray,
        temp_series: jnp.ndarray,
        metadata: jnp.ndarray,
        temp_lengths: jnp.ndarray | None = None,
        train: bool = False,
    ):
        nb = [self.base_filters * (2 ** i) for i in range(5)]
        cd = self.compute_dtype
        # static_argnums: self=0, x=1, train=2 (train drives Python
        # control flow inside the block)
        block_cls = (nn.remat(VGGBlock, static_argnums=(2,))
                     if self.remat else VGGBlock)
        # Packed-resident inference: every level whose lane packing fires
        # keeps its activations in the packed (B, H, W/s, s*C) form across
        # the whole row — convs, BN, ReLU, skips, and the resized deep
        # tensors all stay packed, so the unpack/repack pairs XLA turns into
        # full-tensor layout copies (~2.5 ms/step at 256², round-3 trace)
        # never exist.  Training keeps the unpacked path (batch-stat BN).
        widths = [maps.shape[2] // (2 ** i) for i in range(5)]
        # Training keeps min_s=4: the s=2 rows only pay off through the fused
        # Pallas inference kernel — the XLA packed path they'd take in the
        # train step is the measured loser (docs/TRACE.md §6).
        min_s = self.pack_min_s if not train else max(self.pack_min_s, 4)
        s_lvl = [
            pack_factor(nb[i], widths[i], min_s=min_s)
            if (self.pack_lanes and not train) else 1
            for i in range(5)
        ]
        # group_spatial: at 32 base filters, per-part convs under-fill the
        # MXU lanes 4x — pack the same-resolution skip tensors into one
        # dense conv and keep only the embedding part in closed form.
        vgg = lambda name, mid, out, lvl: block_cls(
            mid, out, compute_dtype=cd, bn_fused=self.bn_fused,
            group_spatial=True, pack=self.pack_lanes, pack_min_s=min_s,
            packed_io=s_lvl[lvl] > 1, fuse_pair=self.fuse_pair,
            train_fused=self.train_fused_conv, name=name)

        maps = maps.astype(cd)

        # Encode non-spatial context once (reference src/model.py:125-126).
        embs = []
        if self.temporal_embeddings:
            embs.append(TemporalEncoder(
                self.lstm_dim, self.temporal_dim, mask_mode=self.lstm_mask_mode,
                compute_dtype=cd, name="temporal_encoder",
            )(temp_series, temp_lengths))
        if self.metadata_embeddings:
            embs.append(MetadataEncoder(
                self.meta_dim, compute_dtype=cd, name="meta_encoder",
            )(metadata.astype(jnp.float32)))
        emb = jnp.concatenate(embs, axis=-1) if embs else None

        def node(name, mid, out, lvl, parts):
            """Decoder node: skip tensors + resized deep tensor + broadcast
            embedding map, then VGGBlock (reference :136-177).  Parts stay
            unconcatenated — SplitConv convolves each separately, and the
            (B, 1, 1, D) embedding part is folded in closed form (the
            embedding map is 40-57% of node input channels at full
            resolution; see blocks.py)."""
            pieces = list(parts)
            if emb is not None:
                pieces.append(emb[:, None, None, :])
            return vgg(name, mid, out, lvl)(pieces, train)

        def up(x, lvl):
            # U-Net++ resizes straight to the target size (single resize,
            # reference :111-121 — self.up is commented out in the
            # reference); emitted directly in the target level's packed form,
            # and a packed producer is read in place (ops/resize.py —
            # no unpack copy).  floor(floor(n/2)/2) == floor(n/4): repeated
            # 2x2 floor-pooling equals floor division by 2**lvl, so the
            # target size is static.
            hw = (maps.shape[1] // 2 ** lvl, widths[lvl])
            y = upsample_like(x, hw, pre_scale=None,
                              out_pack=s_lvl[lvl], prefer_xla=train)
            if isinstance(y, Packed):
                return Packed(y.x.astype(cd), y.cin)
            return y.astype(cd)

        def pool(x, lvl):
            # Hand the pooled tensor over in packed form when the consumer
            # level's pack factor is exactly s/2 (256² s_lvl 4 -> 2): the
            # consumer reads it in place, skipping an unpack+repack
            # relayout pair (blocks.max_pool_2x2).
            keep = (isinstance(x, Packed) and x.s // 2 >= 2
                    and s_lvl[lvl] == x.s // 2)
            return max_pool_2x2(x, out_packed=keep)

        x0_0 = vgg("conv0_0", nb[0], nb[0], 0)(maps, train)
        x1_0 = vgg("conv1_0", nb[1], nb[1], 1)(pool(x0_0, 1), train)
        x0_1 = node("conv0_1", nb[0], nb[0], 0, [x0_0, up(x1_0, 0)])

        x2_0 = vgg("conv2_0", nb[2], nb[2], 2)(pool(x1_0, 2), train)
        x1_1 = node("conv1_1", nb[1], nb[1], 1, [x1_0, up(x2_0, 1)])
        x0_2 = node("conv0_2", nb[0], nb[0], 0, [x0_0, x0_1, up(x1_1, 0)])

        x3_0 = vgg("conv3_0", nb[3], nb[3], 3)(pool(x2_0, 3), train)
        x2_1 = node("conv2_1", nb[2], nb[2], 2, [x2_0, up(x3_0, 2)])
        x1_2 = node("conv1_2", nb[1], nb[1], 1, [x1_0, x1_1, up(x2_1, 1)])
        x0_3 = node("conv0_3", nb[0], nb[0], 0,
                    [x0_0, x0_1, x0_2, up(x1_2, 0)])

        x4_0 = vgg("conv4_0", nb[4], nb[4], 4)(pool(x3_0, 4), train)
        x3_1 = node("conv3_1", nb[3], nb[3], 3, [x3_0, up(x4_0, 3)])
        x2_2 = node("conv2_2", nb[2], nb[2], 2, [x2_0, x2_1, up(x3_1, 2)])
        x1_3 = node("conv1_3", nb[1], nb[1], 1,
                    [x1_0, x1_1, x1_2, up(x2_2, 1)])
        x0_4 = node("conv0_4", nb[0], nb[0], 0,
                    [x0_0, x0_1, x0_2, x0_3, up(x1_3, 0)])

        # Heads run in compute_dtype (f32 input materialization at full tile
        # resolution is pure HBM cost — docs/TRACE.md); activations in f32.
        # Packed inputs go through the block-diagonal packed 1x1 head (same
        # parameter tree as nn.Conv) and unpack only the tiny 2-ch output.
        conv_kw = dict(kernel_size=(1, 1), dtype=cd, param_dtype=jnp.float32)

        def head(name, x):
            if isinstance(x, Packed):
                return PackedConv1x1(self.out_channels, compute_dtype=cd,
                                     name=name)(x).unpack()
            return nn.Conv(self.out_channels, name=name, **conv_kw)(x)

        if self.deep_supervision:
            # Four raw heads, no output activation (reference :180-185).
            return tuple(
                head(f"final{i}", x).astype(jnp.float32)
                for i, x in enumerate((x0_1, x0_2, x0_3, x0_4), start=1)
            )

        output = head("final", x0_4).astype(jnp.float32)
        if self.out_channels == 2:
            output = jnp.concatenate(
                [jnp.tanh(output[..., 0:1]), output[..., 1:2]], axis=-1
            )
        return output
