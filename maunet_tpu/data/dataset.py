"""Host-side .npz tile dataset and fixed-shape batching.

Replaces the reference's torch Dataset/DataLoader/collate stack
(src/dataset.py:18-131) with a TPU-friendly design:

- **static shapes everywhere**: the CRU temperature series is padded to the
  full configured length (828) with an explicit length vector, instead of the
  reference's pad-to-batch-max (src/dataset.py:106) which would retrigger XLA
  compilation per batch;
- batches are plain dicts of numpy arrays in NHWC; device transfer is the
  pipeline's job (the reference moves tensors to device inside collate,
  breaking multi-worker loading — a quirk we do not replicate);
- the final partial batch is padded to full size with a ``valid`` mask so
  eval never recompiles.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Iterator

import numpy as np

from maunet_tpu.data.schema import parse_sample_filename


@dataclass
class Batch:
    """One fixed-shape batch (host numpy, NHWC)."""

    maps: np.ndarray          # (B, H, W, 23) f32
    targets: np.ndarray       # (B, H, W, 2)  f32
    metadata: np.ndarray      # (B, 4) f32  (z-scored lat/lon/pop/Δt)
    temp_series: np.ndarray   # (B, T) f32, zero-padded
    temp_lengths: np.ndarray  # (B,) i32 true lengths
    t1_dates: np.ndarray      # (B, 2) f32 (year, month)
    t2_dates: np.ndarray      # (B, 2) f32
    valid: np.ndarray         # (B,) bool — False for tail padding
    sample_idx: np.ndarray    # (B,) i32 dataset indices

    def as_dict(self) -> dict[str, np.ndarray]:
        return self.__dict__.copy()

    @property
    def metadata_full(self) -> np.ndarray:
        """8-feature metadata: concat(meta, t1, t2) (reference src/train.py:244)."""
        return np.concatenate([self.metadata, self.t1_dates, self.t2_dates], axis=1)


class NpzDataset:
    """Sorted list of per-sample .npz files for one split
    (reference src/dataset.py:18-82)."""

    def __init__(self, data_dir: str, temporal_length: int = 828,
                 transform: Callable | None = None, backend: str = "auto"):
        """backend: 'auto' uses the native C++ npz decoder when it builds
        (maunet_tpu/data/native.py), else numpy; 'numpy' / 'native' force."""
        if not os.path.isdir(data_dir):
            raise FileNotFoundError(f"Split directory not found: {data_dir}")
        self.data_dir = data_dir
        self.temporal_length = temporal_length
        self.transform = transform
        self.files = sorted(
            os.path.join(data_dir, f) for f in os.listdir(data_dir)
            if f.endswith(".npz")
        )
        self._native = False
        if backend in ("auto", "native"):
            from maunet_tpu.data import native

            self._native = native.available()
            if backend == "native" and not self._native:
                raise RuntimeError("native npz backend requested but unavailable")

    def __len__(self) -> int:
        return len(self.files)

    def get_metadata_from_idx(self, idx: int) -> dict:
        info = parse_sample_filename(self.files[idx])
        return {"city": info["city"], "lat": info["lat"], "lon": info["lon"]}

    def __getitem__(self, idx: int) -> dict[str, np.ndarray]:
        path = self.files[idx]
        info = parse_sample_filename(path)
        if self._native:
            from maunet_tpu.data import native

            data = native.load_npz(
                path, ["input", "target", "metadata", "temperature_serie"])
            maps = np.ascontiguousarray(
                data["input"].astype(np.float32).transpose(1, 2, 0))
            target = np.ascontiguousarray(
                data["target"].astype(np.float32).transpose(1, 2, 0))
            metadata = data["metadata"].astype(np.float32)
            series = data["temperature_serie"].astype(np.float32)
        else:
            with np.load(path) as data:
                maps = np.ascontiguousarray(
                    data["input"].astype(np.float32).transpose(1, 2, 0))   # HWC
                target = np.ascontiguousarray(
                    data["target"].astype(np.float32).transpose(1, 2, 0))
                metadata = data["metadata"].astype(np.float32)
                series = data["temperature_serie"].astype(np.float32)

        if self.transform is not None:
            maps, target = self.transform(maps, target)

        t = self.temporal_length
        length = min(len(series), t)
        padded = np.zeros((t,), np.float32)
        padded[:length] = series[:length]

        return {
            "maps": maps,
            "targets": target,
            "metadata": metadata,
            "temp_series": padded,
            "temp_lengths": np.int32(length),
            "t1_dates": np.array([info["t1_year"], info["t1_month"]], np.float32),
            "t2_dates": np.array([info["t2_year"], info["t2_month"]], np.float32),
        }


def make_batches(
    dataset: NpzDataset,
    batch_size: int,
    shuffle: bool = False,
    seed: int = 0,
    epoch: int = 0,
    drop_last: bool = False,
    pad_final: bool = True,
    sample_slice: slice | None = None,
) -> Iterator[Batch]:
    """Yield fixed-shape Batches.  Shuffling is seeded and epoch-keyed
    (the reference's shuffle/flip randomness is unseeded — SURVEY.md §7
    quirks; we make reproducibility the default).

    ``sample_slice`` selects this host's rows of each *global* batch for
    multi-host input sharding: every process computes the identical seeded
    permutation, then loads only its disjoint slice (the positions its
    addressable devices own — parallel.multihost.host_batch_slice_for_sharding),
    so no sample is read twice across the pod."""
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(np.random.SeedSequence([seed, epoch])).shuffle(order)

    for start in range(0, n, batch_size):
        idx = order[start:start + batch_size]
        if len(idx) < batch_size:
            if drop_last:
                return
            if pad_final:
                pad = np.full(batch_size - len(idx), idx[-1], idx.dtype)
                valid = np.concatenate([np.ones(len(idx), bool),
                                        np.zeros(len(pad), bool)])
                idx = np.concatenate([idx, pad])
            else:
                valid = np.ones(len(idx), bool)
        else:
            valid = np.ones(batch_size, bool)

        if sample_slice is not None:
            idx = idx[sample_slice]
            valid = valid[sample_slice]
            if idx.size == 0:
                continue

        samples = [dataset[int(i)] for i in idx]
        stack = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
        yield Batch(valid=valid, sample_idx=idx.astype(np.int32), **stack)
