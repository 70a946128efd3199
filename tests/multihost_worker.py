"""Worker process for the multi-host Trainer test (not a pytest module).

Spawned twice by tests/test_multiprocess.py with
``python multihost_worker.py <process_id> <data_dir> <out_json>``.
Each process drives 4 virtual CPU devices (8 global), joins a
jax.distributed cluster over localhost, and runs ONE Trainer epoch with
multi-host input sharding.  It records which dataset rows this host's loader
actually read and the final losses; the parent asserts the shards were
disjoint and the losses identical across processes.
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from maunet_tpu.config import Config  # noqa: E402
from maunet_tpu.parallel.multihost import initialize_multihost  # noqa: E402
from maunet_tpu.train.loop import Trainer  # noqa: E402


class RecordingDataset:
    """Transparent proxy recording every sample index the loader reads."""

    def __init__(self, ds):
        self._ds = ds
        self.seen: list[int] = []

    def __len__(self):
        return len(self._ds)

    def __getitem__(self, idx):
        self.seen.append(int(idx))
        return self._ds[idx]

    def __getattr__(self, name):
        return getattr(self._ds, name)


def main() -> None:
    pid, data_dir, out_json = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    initialize_multihost(coordinator_address="127.0.0.1:9346",
                         num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert jax.device_count() == 8

    cfg = Config().with_overrides(**{
        "training.batch_size": 8, "training.base_filters": 2,
        "training.temporal_dim": 2, "training.meta_dim": 2,
        "training.lstm_hidden": 4, "training.compute_dtype": "float32",
        "training.loss": "mse", "dataset.temporal_length": 32,
        "logging.frequency_plt": 0,
    })
    trainer = Trainer(cfg, data_dir=data_dir,
                      work_dir=os.path.join(data_dir, f"work_p{pid}"),
                      study_name="mh")
    rec = RecordingDataset(trainer.train_ds)
    trainer.train_ds = rec
    result = trainer.train(epochs=1)

    host_slice = trainer._host_slice
    with open(out_json, "w") as f:
        json.dump({
            "process": pid,
            "host_slice": [host_slice.start, host_slice.stop],
            "seen": rec.seen,
            "best_val_loss": float(result.best_val_loss),
            "n_train": len(rec),
        }, f)
    print(f"proc {pid} OK val={result.best_val_loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
