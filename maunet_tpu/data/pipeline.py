"""Host → HBM input pipeline.

The reference synchronously loads .npz files and moves tensors to the device
inside collate (src/dataset.py:99-106), serializing I/O with compute.  Here:

- a background thread pool decodes .npz batches ahead of consumption,
- batches are double-buffered onto the device with ``jax.device_put``
  (optionally with a NamedSharding so each data-parallel shard lands on its
  device directly), overlapping host I/O, transfer, and TPU compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterator

import jax

from maunet_tpu.data.dataset import Batch


def _put(batch: Batch, sharding=None) -> dict[str, Any]:
    return _put_dict(batch.as_dict(), sharding)


def _put_dict(arrays: dict[str, Any], sharding=None) -> dict[str, Any]:
    if sharding is None:
        return jax.device_put(arrays)
    if jax.process_count() > 1:
        # Multi-host: this process holds only its shard of the global batch
        # (the loader sliced it); assemble globally-sharded arrays.
        from maunet_tpu.parallel.multihost import make_global_batch

        shardings = (sharding if isinstance(sharding, dict)
                     else {k: sharding for k in arrays})
        return make_global_batch(arrays, shardings)
    out = {}
    for k, v in arrays.items():
        s = sharding.get(k) if isinstance(sharding, dict) else sharding
        out[k] = jax.device_put(v, s)
    return out


def cast_maps_bf16(arrays: dict[str, Any]) -> dict[str, Any]:
    """Host-side bf16 cast of the input stack before upload: halves the
    host→device transfer (48→24 MB per 256²/B8 batch — the eval pipeline is
    transfer-bound through the relay).  Bit-identical results: the model
    casts its inputs to the bf16 compute dtype at entry anyway (same
    round-to-nearest-even), and targets stay f32 for exact metrics."""
    import ml_dtypes

    out = dict(arrays)
    out["maps"] = arrays["maps"].astype(ml_dtypes.bfloat16)
    return out


def prefetch_to_device(
    batches: Iterator[Batch],
    buffer_size: int = 2,
    sharding=None,
    host_transform=None,
) -> Iterator[dict[str, Any]]:
    """Prefetch host batches on a worker thread and keep ``buffer_size``
    batches resident on device ahead of the consumer.

    If the consumer abandons the generator mid-epoch (e.g. a train step
    raises and HPO moves to the next trial), the worker must not stay
    blocked on a full queue holding device buffers alive — it polls a stop
    flag while putting and exits; generator close/GC sets the flag and
    drains the queue."""
    q: queue.Queue = queue.Queue(maxsize=buffer_size)
    sentinel = object()
    err: list[BaseException] = []
    stop = threading.Event()

    def worker():
        try:
            for batch in batches:
                if host_transform is not None:
                    arrays = host_transform(batch.as_dict())
                    item = _put_dict(arrays, sharding)
                else:
                    item = _put(batch, sharding)
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # propagate into consumer
            err.append(e)
        finally:
            while not stop.is_set():
                try:
                    q.put(sentinel, timeout=0.1)
                    break
                except queue.Full:
                    continue

    thread = threading.Thread(target=worker, daemon=True)
    thread.start()

    try:
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
        # Release device buffers still parked in the queue.
        while True:
            try:
                q.get_nowait()
            except queue.Empty:
                break


def shard_batch_spec(mesh, data_axis: str = "data") -> dict[str, jax.sharding.NamedSharding]:
    """Per-field shardings for a Batch dict: batch-major fields shard over the
    data axis; everything else replicates."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch_sharded = NamedSharding(mesh, P(data_axis))
    return {
        "maps": batch_sharded,
        "targets": batch_sharded,
        "metadata": batch_sharded,
        "temp_series": batch_sharded,
        "temp_lengths": batch_sharded,
        "t1_dates": batch_sharded,
        "t2_dates": batch_sharded,
        "valid": batch_sharded,
        "sample_idx": batch_sharded,
    }
