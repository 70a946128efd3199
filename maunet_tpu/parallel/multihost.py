"""Multi-host (pod-slice / multi-slice) initialization helpers.

The reference is strictly single-node (SURVEY.md §2.2).  On TPU pods each
host runs the same program; ``initialize_multihost()`` wires up
``jax.distributed`` (no-op on a single host), and ``host_local_batch_slice``
gives each host its shard of the global batch so
``jax.make_array_from_process_local_data`` can assemble globally-sharded
input arrays.  Within a slice collectives ride ICI; across slices XLA routes
them over DCN — no custom transport exists or is needed.
"""

from __future__ import annotations

import jax
import numpy as np

from maunet_tpu.utils.logging import get_logger

log = get_logger(__name__)


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Initialize jax.distributed when running multi-process; silently a
    no-op for single-process runs (the common case in this repo's CI)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info(f"jax.distributed initialized: process {jax.process_index()} "
             f"of {jax.process_count()}, {jax.local_device_count()} local / "
             f"{jax.device_count()} global devices")


def host_local_batch_slice(global_batch: int) -> slice:
    """This host's contiguous slice of the global batch, assuming
    process-major device order (the TPU default).  Prefer
    :func:`host_batch_slice_for_sharding`, which derives the slice from the
    actual sharding and is correct for any device layout."""
    per_host = global_batch // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)


def host_batch_slice_for_sharding(sharding, global_batch: int) -> slice:
    """The slice of the global batch owned by this process's addressable
    devices under a batch-major 1-D ``NamedSharding``.  This is the set of
    sample rows the host must load so
    ``jax.make_array_from_process_local_data`` assembles the right global
    array (SURVEY.md §2.2/§5 distributed plan)."""
    imap = sharding.addressable_devices_indices_map((global_batch,))
    spans = []
    for idx in imap.values():
        s = idx[0]
        spans.append((s.start or 0,
                      global_batch if s.stop is None else s.stop))
    lo = min(s for s, _ in spans)
    hi = max(e for _, e in spans)
    covered = set()
    for s, e in spans:
        covered.update(range(s, e))
    if covered != set(range(lo, hi)):
        raise ValueError(
            f"Host-addressable batch shards are non-contiguous ({spans}); "
            "per-host input sharding requires a process-contiguous mesh "
            "layout over the data axis.")
    return slice(lo, hi)


def make_global_batch(arrays: dict[str, np.ndarray], shardings: dict):
    """Assemble globally-sharded device arrays from process-local numpy data
    (each host passes only its local shard).  This is the multi-host
    device-put used by the input pipeline (data.pipeline._put)."""
    return {
        k: jax.make_array_from_process_local_data(shardings[k], np.asarray(v))
        for k, v in arrays.items()
    }
