import os as _os

from maunet_tpu.data.dataset import Batch, NpzDataset, make_batches  # noqa: F401
from maunet_tpu.data.pipeline import prefetch_to_device  # noqa: F401
from maunet_tpu.data.schema import (  # noqa: F401
    NormalizationStats,
    make_sample_filename,
    parse_sample_filename,
)
from maunet_tpu.data.transforms import RandomFlip  # noqa: F401


def open_split(data_dir: str, split: str, temporal_length: int = 828,
               transform=None):
    """Open a split as a dataset — packed shards when present
    (shards_index.json, data/shards.py), per-sample .npz otherwise."""
    from maunet_tpu.data.shards import INDEX_FILE, ShardedNpzDataset

    split_dir = _os.path.join(data_dir, split)
    if _os.path.exists(_os.path.join(split_dir, INDEX_FILE)):
        return ShardedNpzDataset(split_dir, temporal_length=temporal_length,
                                 transform=transform)
    return NpzDataset(split_dir, temporal_length=temporal_length,
                      transform=transform)
