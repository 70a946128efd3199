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
    """This host's contiguous slice of the global batch."""
    per_host = global_batch // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)


def make_global_batch(arrays: dict[str, np.ndarray], mesh, shardings: dict):
    """Assemble globally-sharded device arrays from process-local numpy data
    (each host passes only its local shard)."""
    return {
        k: jax.make_array_from_process_local_data(shardings[k], v)
        for k, v in arrays.items()
    }
