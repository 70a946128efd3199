"""Device mesh construction and sharding specs.

The reference is strictly single-device (SURVEY.md §2.2: no torch.distributed
/ NCCL / MPI anywhere); scale-out here is TPU-native GSPMD:

- a 2-axis ``Mesh('data', 'spatial')`` over ICI;
- batches shard over ``data`` (pure data parallelism — the right choice for a
  ~33M-parameter conv model; TP/PP are deliberately omitted, SURVEY.md §2.2);
- optionally the H image axis shards over ``spatial`` for very large tiles —
  XLA's SPMD partitioner inserts the conv halo exchanges automatically;
- parameters/optimizer state replicate; XLA turns the gradient reduction
  into ``all-reduce`` over ICI.

No manual collectives are written anywhere: ``jax.jit`` with NamedShardings
compiles the whole train step into one SPMD program.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data_parallel: int = -1,
    spatial_parallel: int = 1,
    devices=None,
    data_axis: str = "data",
    spatial_axis: str = "spatial",
) -> Mesh:
    """Build a (data × spatial) mesh.  ``data_parallel=-1`` consumes all
    remaining devices after the spatial axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if spatial_parallel <= 0:
        spatial_parallel = 1
    if data_parallel == -1:
        data_parallel = n // spatial_parallel
    used = data_parallel * spatial_parallel
    if used > n:
        raise ValueError(
            f"mesh {data_parallel}x{spatial_parallel} needs {used} devices, have {n}")
    grid = np.array(devices[:used]).reshape(data_parallel, spatial_parallel)
    return Mesh(grid, (data_axis, spatial_axis))


# Encoder downsampling factor of both models (4 pooling levels): the
# bottleneck feature map is H / 16.
MODEL_DOWNSAMPLE = 16


def validate_spatial_sharding(mesh: Mesh, tile_h: int,
                              downsample: int = MODEL_DOWNSAMPLE) -> None:
    """Require the *bottleneck* feature-map height to divide evenly over the
    spatial mesh axis.

    XLA's SPMD partitioner handles SAME-padding convs over a sharded spatial
    axis with halo exchanges, but degenerate shardings of the bottleneck
    feature map silently miscompile (verified against single-device numerics,
    jax 0.9.0):

    - uneven shards (H=2 propagated over a 4-way spatial axis) diverge
      grossly (max err ~3.7 on O(1) activations);
    - an H=2 map sharded 2-way, combined with a data-sharded batch and a
      conv kernel produced by ``lax.slice_in_dim`` (the SplitConv part
      kernels, models/blocks.py), diverges grossly (max err ~13) even
      though each shard is an even single row — H>=4 is exact in every
      mesh/slice combination tested, including single-row shards.

    The guard therefore rejects exactly the measured failure surface:
    uneven bottleneck shards, and bottleneck maps under 4 rows.  Real
    tiles (256/512 px -> bottleneck 16/32) pass on any sane axis size.
    """
    spatial_axis = mesh.axis_names[1]
    spatial = mesh.shape[spatial_axis]
    if spatial <= 1:
        return
    bottleneck = max(tile_h // downsample, 1)
    if bottleneck % spatial or bottleneck < 4:
        raise ValueError(
            f"spatial sharding over {spatial} devices requires the bottleneck "
            f"feature-map height (tile {tile_h} / {downsample} = {bottleneck}) "
            f"to be >= 4 and divisible by the '{spatial_axis}' axis; other "
            f"configurations miscompile SAME-conv halo exchanges under GSPMD "
            f"(see parallel/mesh.validate_spatial_sharding)")


def batch_pspec(mesh: Mesh, ndim: int, shard_spatial: bool = False) -> P:
    """PartitionSpec for a batch-major array: axis 0 over data, and (for
    NHWC image tensors) axis 1 over spatial when requested."""
    data_axis, spatial_axis = mesh.axis_names
    spec = [data_axis] + [None] * (ndim - 1)
    if shard_spatial and ndim >= 3 and mesh.shape[spatial_axis] > 1:
        spec[1] = spatial_axis
    return P(*spec)


def batch_sharding(mesh: Mesh, ndim: int = 4, shard_spatial: bool = False) -> NamedSharding:
    return NamedSharding(mesh, batch_pspec(mesh, ndim, shard_spatial))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_shardings_for(mesh: Mesh, batch: dict, shard_spatial: bool = False) -> dict:
    """NamedSharding per Batch field (dict input from Batch.as_dict())."""
    image_keys = {"maps", "targets"}
    if shard_spatial and "maps" in batch:
        validate_spatial_sharding(mesh, batch["maps"].shape[1])
    out = {}
    for k, v in batch.items():
        nd = getattr(v, "ndim", 0)
        if nd == 0:
            out[k] = replicated(mesh)
        else:
            out[k] = batch_sharding(mesh, nd, shard_spatial and k in image_keys)
    return out
