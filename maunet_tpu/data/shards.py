"""Packed-shard dataset format.

The reference stores one compressed ``.npz`` per sample — thousands of tiny
files whose per-file open/inflate cost dominates host input time
(SURVEY.md §7 risks: "likely need an offline shard-packing step").  A packed
shard stacks SHARD_SIZE samples into one uncompressed ``.npz``:

    inputs   (N, 23, H, W) f32      targets (N, 2, H, W) f32
    metadata (N, 4) f32             series  (N, T) f32 (zero-padded)
    lengths  (N,) i32               names   (N,) str  (original filenames)

Uncompressed on purpose: tile data is float noise (zlib buys ~15-25%), and
uncompressed members are served straight from the page cache via one big
sequential read.  ``ShardedNpzDataset`` is interface-compatible with
``NpzDataset`` (same __getitem__ contract, filename-derived metadata), with
an LRU of open shards.
"""

from __future__ import annotations

import json
import os
import zipfile
from collections import OrderedDict
from typing import Callable

import numpy as np

from maunet_tpu.data.dataset import NpzDataset
from maunet_tpu.data.schema import parse_sample_filename
from maunet_tpu.utils.logging import get_logger

log = get_logger(__name__)

INDEX_FILE = "shards_index.json"


def pack_dataset(src_dir: str, out_dir: str, shard_size: int = 64,
                 temporal_length: int = 828) -> str:
    """Pack a per-sample .npz split directory into shards under ``out_dir``."""
    ds = NpzDataset(src_dir, temporal_length=temporal_length, backend="numpy")
    os.makedirs(out_dir, exist_ok=True)
    index = {"shard_size": shard_size, "temporal_length": temporal_length,
             "shards": [], "names": []}

    for start in range(0, len(ds), shard_size):
        idx = range(start, min(start + shard_size, len(ds)))
        samples = [ds[i] for i in idx]
        names = [os.path.basename(ds.files[i]) for i in idx]
        shard_name = f"shard_{start // shard_size:05d}.npz"
        np.savez(
            os.path.join(out_dir, shard_name),
            inputs=np.stack([s["maps"].transpose(2, 0, 1) for s in samples]),
            targets=np.stack([s["targets"].transpose(2, 0, 1) for s in samples]),
            metadata=np.stack([s["metadata"] for s in samples]),
            series=np.stack([s["temp_series"] for s in samples]),
            lengths=np.asarray([s["temp_lengths"] for s in samples], np.int32),
            t1_dates=np.stack([s["t1_dates"] for s in samples]),
            t2_dates=np.stack([s["t2_dates"] for s in samples]),
        )
        index["shards"].append(shard_name)
        index["names"].extend(names)

    with open(os.path.join(out_dir, INDEX_FILE), "w") as f:
        json.dump(index, f)
    log.success(f"Packed {len(index['names'])} samples into "
                f"{len(index['shards'])} shards at {out_dir}")
    return out_dir


def _mmap_npz_members(path: str) -> dict[str, np.ndarray]:
    """Memory-map every array of an *uncompressed* ``.npz``.

    ``np.load`` decodes whole members, so serving one sample from a 64-sample
    shard would read/decode the full shard — under shuffled training that is
    a ~shard_size read amplification per ``__getitem__``.  Stored (deflate-
    free) zip members are just ``.npy`` bytes at a file offset, so each maps
    as a ``np.memmap`` and the page cache faults in only the rows actually
    touched.  Raises ``ValueError`` on compressed members (caller falls back
    to eager decode)."""
    arrays: dict[str, np.ndarray] = {}
    with zipfile.ZipFile(path) as zf, open(path, "rb") as f:
        for info in zf.infolist():
            if info.compress_type != zipfile.ZIP_STORED:
                raise ValueError(f"{path}:{info.filename} is compressed")
            # The local header's name/extra lengths can differ from the
            # central directory's — parse it to find the member data start.
            f.seek(info.header_offset)
            local = f.read(30)
            name_len = int.from_bytes(local[26:28], "little")
            extra_len = int.from_bytes(local[28:30], "little")
            data_start = info.header_offset + 30 + name_len + extra_len
            f.seek(data_start)
            version = np.lib.format.read_magic(f)
            if version == (1, 0):
                shape, fortran, dtype = np.lib.format.read_array_header_1_0(f)
            else:
                shape, fortran, dtype = np.lib.format.read_array_header_2_0(f)
            if fortran:
                raise ValueError(f"{path}:{info.filename} is Fortran-ordered")
            arrays[info.filename.removesuffix(".npy")] = np.memmap(
                path, dtype=dtype, mode="r", offset=f.tell(), shape=shape)
    return arrays


class ShardedNpzDataset:
    """NpzDataset-compatible view over packed shards, with a small LRU of
    memory-mapped shards — random (shuffled-training) access faults in only
    the pages of the samples actually read."""

    def __init__(self, shard_dir: str, temporal_length: int | None = None,
                 transform: Callable | None = None, cache_shards: int = 2):
        with open(os.path.join(shard_dir, INDEX_FILE)) as f:
            self.index = json.load(f)
        self.shard_dir = shard_dir
        self.shard_size = int(self.index["shard_size"])
        self.names = self.index["names"]
        self.files = [os.path.join(shard_dir, n) for n in self.names]  # virtual
        self.transform = transform
        packed_t = int(self.index["temporal_length"])
        self.temporal_length = temporal_length or packed_t
        if self.temporal_length > packed_t:
            raise ValueError(f"temporal_length {self.temporal_length} exceeds "
                             f"packed length {packed_t}")
        self._cache: OrderedDict[int, dict] = OrderedDict()
        self._cache_shards = cache_shards

    def __len__(self) -> int:
        return len(self.names)

    def get_metadata_from_idx(self, idx: int) -> dict:
        info = parse_sample_filename(self.names[idx])
        return {"city": info["city"], "lat": info["lat"], "lon": info["lon"]}

    def _shard(self, shard_idx: int) -> dict:
        if shard_idx in self._cache:
            self._cache.move_to_end(shard_idx)
            return self._cache[shard_idx]
        path = os.path.join(self.shard_dir, self.index["shards"][shard_idx])
        try:
            shard = _mmap_npz_members(path)
        except ValueError:
            # Foreign (compressed) shard: eager whole-shard decode.
            with np.load(path) as z:
                shard = {k: z[k] for k in z.files}
        self._cache[shard_idx] = shard
        if len(self._cache) > self._cache_shards:
            self._cache.popitem(last=False)
        return shard

    def __getitem__(self, idx: int) -> dict[str, np.ndarray]:
        shard = self._shard(idx // self.shard_size)
        j = idx % self.shard_size
        maps = np.ascontiguousarray(shard["inputs"][j].transpose(1, 2, 0))
        target = np.ascontiguousarray(shard["targets"][j].transpose(1, 2, 0))
        if self.transform is not None:
            maps, target = self.transform(maps, target)
        t = self.temporal_length
        return {
            "maps": maps,
            "targets": target,
            "metadata": shard["metadata"][j],
            "temp_series": shard["series"][j][:t],
            "temp_lengths": np.int32(min(int(shard["lengths"][j]), t)),
            "t1_dates": shard["t1_dates"][j],
            "t2_dates": shard["t2_dates"][j],
        }
