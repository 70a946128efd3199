"""Training loop.

Capability parity with the reference objective/epoch loop (src/train.py:120-331):
epoch loop over shuffled batches, loss dispatch by name, periodic step logging
(EMA/SMA/cumulative trackers), epoch-end masked validation with all loss
components, best-val checkpointing with embedded hyperparameters, and a
pruning hook for HPO.  TPU-native: one jitted SPMD train step, host-threaded
double-buffered input pipeline, optional multi-device mesh.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import numpy as np

from maunet_tpu.config import Config
from maunet_tpu.data.dataset import make_batches
from maunet_tpu.data.pipeline import prefetch_to_device
from maunet_tpu.data.transforms import RandomFlip
from maunet_tpu.losses import get_loss_fn
from maunet_tpu.models.factory import UrbanPredictor
from maunet_tpu.parallel.mesh import batch_shardings_for, make_mesh, replicated
from maunet_tpu.train.checkpoint import save_checkpoint
from maunet_tpu.train.metrics import CSVLogger, RunningLoss
from maunet_tpu.train.optimizers import make_optimizer
from maunet_tpu.train.state import create_train_state, param_count
from maunet_tpu.train.steps import make_eval_step, make_train_step
from maunet_tpu.utils.logging import get_logger

log = get_logger(__name__)


from maunet_tpu.train.hpo import TrialPruned  # noqa: E402,F401  (re-export)


class _NullCSVLogger:
    """Non-primary multi-host processes: metric rows are already global
    (collective reductions), so only process 0 writes them."""

    def log(self, row: dict) -> None:
        pass


@dataclass
class TrainResult:
    best_val_loss: float
    best_checkpoint: str | None
    epochs_run: int
    history: list[dict] = field(default_factory=list)


def hyperparams_from_config(cfg: Config) -> dict[str, Any]:
    """The hyperparameter dict embedded in checkpoints — same keys as the
    reference (src/train.py:156-168)."""
    t = cfg.training
    return {
        "learning_rate": t.learning_rate,
        "batch_size": t.batch_size,
        "weight_decay": t.weight_decay,
        "temporal_dim": t.temporal_dim,
        "meta_dim": t.meta_dim,
        "lstm_hidden": t.lstm_hidden,
        "base_filters": t.base_filters,
        "model_type": t.model_type,
        "target_channels": ",".join(cfg.dataset.target_channels),
        "input_channels": ",".join(cfg.dataset.input_channels),
        "temporal_embeddings": t.temporal_embeddings,
        "metadata_embeddings": t.metadata_embeddings,
        "deep_supervision": t.deep_supervision,
        # Extra vs the reference dict: lets `maunet export-torch` rebuild
        # the exact optax chain to convert optimizer state for torch resume.
        "optimizer": t.optimizer,
        "momentum": t.momentum,
        "gradient_clipping": t.gradient_clipping,
    }


class Trainer:
    def __init__(
        self,
        cfg: Config,
        data_dir: str | None = None,
        work_dir: str = "reports/training",
        study_name: str = "urban-predictor",
        trial_id: int = 0,
        use_mesh: bool = True,
        trackers: list | None = None,
    ):
        self.cfg = cfg
        self.study_name = study_name
        self.trial_id = trial_id
        self.work_dir = work_dir
        self.data_dir = data_dir or cfg.paths.processed_image_dataset
        self.trackers = trackers or []
        os.makedirs(work_dir, exist_ok=True)

        t = cfg.training
        import jax.numpy as jnp
        compute_dtype = jnp.bfloat16 if t.compute_dtype == "bfloat16" else jnp.float32
        self.model = UrbanPredictor(
            model_type=t.model_type,
            out_channels=len(cfg.dataset.target_channels),
            temporal_dim=t.temporal_dim,
            meta_dim=t.meta_dim,
            lstm_dim=t.lstm_hidden,
            base_filters=t.base_filters,
            deep_supervision=t.deep_supervision,
            temporal_embeddings=t.temporal_embeddings,
            metadata_embeddings=t.metadata_embeddings,
            compute_dtype=compute_dtype,
            remat=t.remat,
        )
        self.optimizer = make_optimizer(
            t.optimizer, t.learning_rate, t.weight_decay, t.momentum,
            t.gradient_clipping)
        self.loss_fn = get_loss_fn(t.loss)
        self.metadata_features = cfg.dataset.nb_metadata_features

        self.mesh = make_mesh(
            cfg.parallel.data_parallel, cfg.parallel.spatial_parallel,
            data_axis=cfg.parallel.data_axis,
            spatial_axis=cfg.parallel.spatial_axis,
        ) if use_mesh else None
        if self.mesh is not None:
            dp = self.mesh.shape[cfg.parallel.data_axis]
            if t.batch_size % dp != 0:
                raise ValueError(
                    f"training.batch_size={t.batch_size} must be divisible by "
                    f"the data-parallel mesh axis ({dp} devices); set "
                    f"parallel.data_parallel or adjust the batch size.")

        # Multi-host: each process loads only the batch rows its addressable
        # devices own; the pipeline assembles global arrays with
        # jax.make_array_from_process_local_data (SURVEY.md §2.2/§5).
        self._host_slice = None
        if self.mesh is not None and jax.process_count() > 1:
            from jax.sharding import NamedSharding, PartitionSpec

            from maunet_tpu.parallel.multihost import host_batch_slice_for_sharding

            self._host_slice = host_batch_slice_for_sharding(
                NamedSharding(self.mesh, PartitionSpec(cfg.parallel.data_axis)),
                t.batch_size)
            log.info(f"Multi-host input sharding: process "
                     f"{jax.process_index()}/{jax.process_count()} loads "
                     f"batch rows [{self._host_slice.start}:"
                     f"{self._host_slice.stop}) of {t.batch_size}")

        self.train_step = make_train_step(
            self.model, self.loss_fn, self.optimizer, self.metadata_features)
        self.eval_step = make_eval_step(self.model, self.metadata_features)
        self._plot_step = None  # built lazily on first plot step

        from maunet_tpu.data import open_split

        self.train_ds = open_split(
            self.data_dir, "train",
            temporal_length=cfg.dataset.temporal_length,
            transform=RandomFlip(cfg.seed))
        self.val_ds = open_split(
            self.data_dir, "val",
            temporal_length=cfg.dataset.temporal_length)

        # Multi-host: every process shares one work_dir (pod-style shared
        # filesystem; orbax saves are collective with the primary writing),
        # so only the primary process appends to the CSV log.
        csv_path = os.path.join(
            work_dir, f"{study_name}_trial{trial_id}_train_log.csv")
        self.csv = (CSVLogger(csv_path) if jax.process_index() == 0
                    else _NullCSVLogger())

    # ------------------------------------------------------------------
    def _batch_shardings(self, batch):
        if self.mesh is None:
            return None
        return batch_shardings_for(self.mesh, batch.as_dict())

    def _device_batches(self, dataset, shuffle, epoch, drop_last):
        batches = make_batches(
            dataset, self.cfg.training.batch_size, shuffle=shuffle,
            seed=self.cfg.seed, epoch=epoch, drop_last=drop_last,
            sample_slice=self._host_slice)
        first = next(batches, None)
        if first is None:
            return iter(())
        sharding = self._batch_shardings(first)

        def chain():
            yield first
            yield from batches

        return prefetch_to_device(chain(), buffer_size=2, sharding=sharding)

    def _plot_train_step(self, state, batch):
        if self._plot_step is None:
            from maunet_tpu.train.steps import make_train_step_with_outputs

            self._plot_step = make_train_step_with_outputs(
                self.model, self.loss_fn, self.optimizer, self.metadata_features)
        return self._plot_step(state, batch)

    def _render_plot(self, batch, outputs, metrics, epoch, step):
        try:
            from maunet_tpu.data.schema import NormalizationStats
            from maunet_tpu.train.visualize import plot_predictions_vs_targets

            stats_path = os.path.join(self.data_dir, "normalization_metrics.json")
            stats = (NormalizationStats.from_json(stats_path)
                     if os.path.exists(stats_path) else None)
            png = plot_predictions_vs_targets(
                jax.device_get(batch), np.asarray(outputs),
                os.path.join(self.work_dir, "visualizations"),
                self.study_name, self.trial_id, step,
                float(metrics["total"]), stats,
                channels=tuple(self.cfg.dataset.target_channels))
            # Live prediction plots to the tracker (reference
            # src/train.py:266-280 logs wandb.Image every frequency_plt).
            for tracker in self.trackers:
                tracker.log_image("train/predictions", png, step=step)
        except Exception as e:  # plotting must never kill training
            log.warning(f"Prediction plot failed at step {step}: {e}")

    def validate(self, state) -> dict[str, float]:
        """Masked validation over the val split (reference src/train.py:20-60)."""
        sums: dict[str, float] = {}
        for batch in self._device_batches(self.val_ds, False, 0, drop_last=False):
            out = jax.device_get(self.eval_step(state, batch))
            for k, v in out.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        n = sums.pop("num_samples", 0.0)
        if n == 0:
            log.warning("Validation loader was empty.")
            return {"total": float("inf")}
        return {k: v / n for k, v in sums.items()}

    @property
    def _last_checkpoint_path(self) -> str:
        return os.path.join(self.work_dir,
                            f"{self.study_name}_trial_{self.trial_id}_last")

    def train(
        self,
        epochs: int | None = None,
        epoch_callback: Callable[[int, float], None] | None = None,
        resume: bool = False,
    ) -> TrainResult:
        """Run the training loop.  With ``resume=True``, restore the full
        state (params + BN stats + optimizer + step) from the trial's last
        checkpoint and continue — exact resume, which the reference cannot do
        (best-val-only model_state_dict, SURVEY.md §5)."""
        cfg = self.cfg
        t = cfg.training
        epochs = epochs if epochs is not None else t.epochs

        if len(self.train_ds) == 0:
            raise ValueError(f"Train split is empty under {self.data_dir}")
        example = next(make_batches(self.train_ds, t.batch_size,
                                    drop_last=False,
                                    sample_slice=self._host_slice))
        rng = jax.random.PRNGKey(cfg.seed)
        state = create_train_state(self.model, self.optimizer, rng,
                                   example.as_dict(), self.metadata_features)

        start_epoch = 0
        best_val = float("inf")
        if resume and os.path.exists(self._last_checkpoint_path):
            from maunet_tpu.train.checkpoint import restore_checkpoint

            state, meta = restore_checkpoint(self._last_checkpoint_path, state)
            start_epoch = int(meta.get("epoch", -1)) + 1
            best_val = float(meta.get("best_val_loss", float("inf")))
            log.info(f"Resumed from epoch {start_epoch} "
                     f"(step {int(state.step)}, best_val {best_val:.4f}).")

        if self.mesh is not None:
            state = jax.device_put(state, replicated(self.mesh))
        log.info(f"Model: {t.model_type}, params={param_count(state):,}, "
                 f"mesh={None if self.mesh is None else dict(self.mesh.shape)}")

        ema = RunningLoss("ema", ema_alpha=0.98)
        sma = RunningLoss("sma", window_size=50)
        cum = RunningLoss("cumulative")

        best_path = None
        history = []
        step = int(state.step)
        epochs_run = 0

        for epoch in range(start_epoch, epochs):
            epochs_run = epoch + 1
            ema.reset(); sma.reset(); cum.reset()
            epoch_loss, n_samples = 0.0, 0
            t_epoch = time.time()

            step_losses = []  # device scalars; fetched once at epoch end
            for batch in self._device_batches(self.train_ds, True, epoch,
                                              drop_last=True):
                bsz = batch["maps"].shape[0]
                if (cfg.logging.frequency_plt
                        and step % cfg.logging.frequency_plt == 0
                        # plotting fetches the batch to host; a multi-host
                        # global batch is not addressable from one process
                        and jax.process_count() == 1):
                    state, metrics, outputs = self._plot_train_step(state, batch)
                    self._render_plot(batch, outputs, metrics, epoch, step)
                else:
                    state, metrics = self.train_step(state, batch)
                step_losses.append((metrics["total"], bsz))
                if step % cfg.logging.frequency_log == 0:
                    metrics = jax.device_get(metrics)
                    loss_val = float(metrics["total"])
                    row = {
                        "step": step, "epoch": epoch,
                        "batch_loss": loss_val,
                        "ema_loss": ema.update(loss_val),
                        "sma_loss": sma.update(loss_val),
                        "cum_loss": cum.update(loss_val, n=bsz),
                        **{f"loss_{k}": float(v) for k, v in metrics.items()
                           if k != "total"},
                    }
                    self.csv.log(row)
                    for tracker in self.trackers:
                        tracker.log(row, step=step)
                step += 1

            for loss_dev, bsz in jax.device_get(step_losses):
                epoch_loss += float(loss_dev) * bsz
                n_samples += bsz

            val = self.validate(state)
            val_loss = val["total"]
            train_loss = epoch_loss / n_samples if n_samples else float("inf")
            log.info(f"Epoch {epoch + 1}/{epochs} | Train {train_loss:.4f} | "
                     f"Val {val_loss:.4f} | {time.time() - t_epoch:.1f}s")
            epoch_row = {"epoch": epoch, "val_loss": val_loss,
                         **{f"val_{k}": v for k, v in val.items() if k != "total"}}
            history.append(epoch_row)
            for tracker in self.trackers:
                tracker.log(epoch_row, step=step)

            if val_loss < best_val:
                best_val = val_loss
                best_path = os.path.join(
                    self.work_dir,
                    f"{self.study_name}_trial_{self.trial_id}_best")
                save_checkpoint(best_path, state, {
                    "epoch": epoch,
                    "step": step,
                    "loss": best_val,
                    "hyperparameters": hyperparams_from_config(cfg),
                    "model_type": t.model_type,
                    "study_name": self.study_name,
                    "trial_id": self.trial_id,
                    "metadata_input_length": cfg.dataset.nb_metadata_features,
                })
                log.info(f"New best checkpoint (val={best_val:.4f}) → {best_path}")

            # always-current resume point (full state incl. optimizer)
            save_checkpoint(self._last_checkpoint_path, state, {
                "epoch": epoch,
                "step": step,
                "best_val_loss": best_val,
                "hyperparameters": hyperparams_from_config(cfg),
                "model_type": t.model_type,
                "study_name": self.study_name,
                "trial_id": self.trial_id,
                "metadata_input_length": cfg.dataset.nb_metadata_features,
            })

            if epoch_callback is not None:
                epoch_callback(epoch, val_loss)  # may raise TrialPruned

        return TrainResult(best_val, best_path, epochs_run, history)
