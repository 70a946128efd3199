"""Sharded inference / evaluation — the mesh past the Trainer.

The reference's second hot loop is the evaluator's no-grad forward pass
(reference test/evaluate.py:181-293); its sensitivity sweeps and the serving
app run the same path.  All of them are per-sample independent, so the
TPU-native scale-out is pure data parallelism: shard the batch axis over
EVERY mesh axis (flattened), replicate the parameters, no collectives at all.

Why ``shard_map`` and not GSPMD ``jit`` with in_shardings: the inference
models run Pallas kernels (the lane-packed fused conv rows,
ops/pallas/packed_vgg; the masked per-class eval reductions,
ops/pallas/masked_stats), and ``pallas_call`` has no SPMD partitioning rule —
under plain GSPMD jit the partitioner cannot split it.  ``shard_map`` runs
the whole per-shard program with *local* shapes, so every Pallas kernel
executes per device exactly as it does single-chip.  ``check_vma=False``
because ``pallas_call`` cannot declare how its outputs vary over mesh axes
(jax 0.9 raises on the default otherwise); safety comes from the
sharded-vs-single equivalence tests (tests/test_parallel_infer.py) and the
driver's ``dryrun_multichip`` inference check instead.

Spatial sharding is deliberately NOT offered here: at inference there is no
optimizer-state or activation-memory pressure, batches are ample (the eval
split has thousands of tiles), and flat data parallelism is collective-free
— strictly more efficient than paying conv halo exchanges.  Single-tile
latency-bound serving with a spatially-sharded XLA path remains possible
through ``train.steps.make_forward_fn`` under GSPMD jit (pack_lanes=False);
see apps/engine.PlannerEngine.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def flat_batch_spec(mesh: Mesh) -> P:
    """PartitionSpec sharding axis 0 over ALL mesh axes (flattened): the
    whole mesh acts as one data axis for per-sample-independent work."""
    return P(tuple(mesh.axis_names))


def flat_batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, flat_batch_spec(mesh))


def round_up_to_mesh(batch_size: int, mesh: Mesh) -> int:
    """Smallest batch size >= ``batch_size`` divisible by the mesh size
    (shard_map requires the sharded axis to divide evenly; the loader pads
    final partial batches with valid=False rows, so rounding up costs only
    masked lanes)."""
    n = mesh.size
    return -(-batch_size // n) * n


def shard_batch_fn(fn: Callable[[Any, dict], Any], mesh: Mesh) -> Callable:
    """Wrap a per-sample-independent ``(variables, batch_dict) -> pytree``
    function as one jitted SPMD program over ``mesh``.

    Every batch leaf shards on axis 0 over all mesh axes; ``variables``
    replicate; every output leaf must be batch-major (axis 0 = sample).
    The wrapped fn must contain NO cross-sample ops (true of the model
    forward and all eval metrics — they vmap over samples by construction).
    """
    spec = flat_batch_spec(mesh)
    return jax.jit(jax.shard_map(
        fn, mesh=mesh, in_specs=(P(), spec), out_specs=spec,
        check_vma=False))


def make_sharded_forward_fn(model, metadata_features: int, mesh: Mesh):
    """Sharded counterpart of ``train.steps.make_forward_fn``: jitted
    ``(variables, batch) -> (B, H, W, out)`` running data-parallel over the
    mesh, Pallas packed-resident path included."""
    from maunet_tpu.train.steps import _last_head, _metadata_full

    def forward(variables, batch):
        meta = _metadata_full(batch, metadata_features)
        return _last_head(model.apply(
            variables,
            batch["maps"], batch["temp_series"], meta, batch["temp_lengths"],
            train=False,
        ))

    return shard_batch_fn(forward, mesh)
