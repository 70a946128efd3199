"""Profiling & tracing — first-class, unlike the reference which has none
beyond SLURM wall-clock echoes (SURVEY.md §5).

- ``trace(logdir)``: jax.profiler trace context (XPlane/TensorBoard format).
- ``StepTimer``: cheap per-step wall-time accumulator with percentile
  summaries; used by the training loop and benchmarks.
- ``device_memory_stats()``: live HBM usage per device where the backend
  exposes it.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np

from maunet_tpu.utils.logging import get_logger

log = get_logger(__name__)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info(f"Profiler trace written to {logdir}")


class StepTimer:
    """Wall-clock step timer.  Call ``tick()`` once per step; read
    ``summary()`` for mean/percentiles.  Note: under async dispatch a tick
    measures dispatch-to-dispatch time; wrap a device sync (e.g. host copy)
    around the region you want device-accurate."""

    def __init__(self, skip_first: int = 1):
        self.skip_first = skip_first
        self._times: list[float] = []
        self._last: float | None = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
        self._last = now

    def reset(self) -> None:
        self._times.clear()
        self._last = None

    @property
    def steps(self) -> int:
        return max(0, len(self._times) - self.skip_first)

    def summary(self) -> dict[str, float]:
        times = np.asarray(self._times[self.skip_first:])
        if times.size == 0:
            return {}
        return {
            "mean_s": float(times.mean()),
            "p50_s": float(np.percentile(times, 50)),
            "p90_s": float(np.percentile(times, 90)),
            "p99_s": float(np.percentile(times, 99)),
            "steps_per_s": float(1.0 / times.mean()),
            "n": int(times.size),
        }


def device_memory_stats() -> list[dict]:
    """Per-device memory stats (bytes) where the backend exposes them."""
    import jax

    out = []
    for d in jax.devices():
        stats = {}
        try:
            stats = d.memory_stats() or {}
        except (AttributeError, NotImplementedError, RuntimeError):
            pass
        out.append({"device": str(d),
                    "bytes_in_use": stats.get("bytes_in_use"),
                    "bytes_limit": stats.get("bytes_limit")})
    return out
