"""Jitted train / eval steps.

One SPMD program per step: forward (bf16 compute), loss, backward, optimizer
update, BN running-stat update.  With a multi-device mesh the same functions
compile data-parallel — batches arrive sharded over the ``data`` axis,
parameters replicated, and XLA inserts the gradient all-reduce over ICI
(no manual collectives; see maunet_tpu/parallel/mesh.py).

Replaces the reference's eager loop body (src/train.py:243-256) and masked
validation (src/train.py:20-60).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from maunet_tpu.losses.combined import per_sample_losses
from maunet_tpu.train.state import TrainState


def _ds_loss(loss_fn, outputs, targets):
    """Deep supervision: average the loss over the 4 heads (UNet++ training
    convention); single-head models pass through."""
    if not isinstance(outputs, (tuple, list)):
        return loss_fn(outputs, targets)
    per_head = [loss_fn(o, targets) for o in outputs]
    return {k: sum(d[k] for d in per_head) / len(per_head) for k in per_head[0]}


def _last_head(outputs):
    return outputs[-1] if isinstance(outputs, (tuple, list)) else outputs


def _metadata_full(batch: dict[str, Any], metadata_features: int) -> jnp.ndarray:
    """8-feature metadata = concat(meta, t1_dates, t2_dates)
    (reference src/train.py:244); 4-feature checkpoints take meta as-is
    (reference test/evaluate.py:184-185)."""
    if metadata_features == 8:
        return jnp.concatenate(
            [batch["metadata"], batch["t1_dates"], batch["t2_dates"]], axis=1)
    return batch["metadata"]


def make_train_step(
    model,
    loss_fn: Callable[..., dict[str, jnp.ndarray]],
    optimizer: optax.GradientTransformation,
    metadata_features: int = 8,
    donate: bool = True,
) -> Callable[[TrainState, dict[str, Any]], tuple[TrainState, dict[str, jnp.ndarray]]]:
    """Build a jitted train step: (state, batch) → (state, loss components)."""

    def step(state: TrainState, batch: dict[str, Any]):
        meta = _metadata_full(batch, metadata_features)

        def objective(params):
            outputs, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["maps"], batch["temp_series"], meta, batch["temp_lengths"],
                train=True, mutable=["batch_stats"],
            )
            losses = _ds_loss(loss_fn, outputs, batch["targets"])
            return losses["total"], (losses, updates["batch_stats"])

        (_, (losses, new_stats)), grads = jax.value_and_grad(
            objective, has_aux=True)(state.params)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        metrics = dict(losses)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_train_step_with_outputs(model, loss_fn, optimizer,
                                 metadata_features: int = 8):
    """Train step that additionally returns the batch predictions — used on
    plot steps (reference plots the live training outputs,
    src/train.py:279-280).  Compiled separately so the hot-path step never
    materializes outputs."""

    def step(state: TrainState, batch: dict[str, Any]):
        meta = _metadata_full(batch, metadata_features)

        def objective(params):
            outputs, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["maps"], batch["temp_series"], meta, batch["temp_lengths"],
                train=True, mutable=["batch_stats"],
            )
            losses = _ds_loss(loss_fn, outputs, batch["targets"])
            return losses["total"], (losses, updates["batch_stats"],
                                     _last_head(outputs))

        (_, (losses, new_stats, outputs)), grads = jax.value_and_grad(
            objective, has_aux=True)(state.params)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_state = TrainState(
            params=optax.apply_updates(state.params, updates),
            batch_stats=new_stats,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, dict(losses), outputs

    return jax.jit(step)


def make_eval_step(
    model,
    metadata_features: int = 8,
) -> Callable[[TrainState, dict[str, Any]], dict[str, jnp.ndarray]]:
    """Build a jitted eval step returning masked per-sample loss components
    plus the valid-sample count — host code aggregates sums/counts across
    batches, exactly excluding final-batch padding."""

    def step(state: TrainState, batch: dict[str, Any]):
        meta = _metadata_full(batch, metadata_features)
        outputs = model.apply(
            state.variables,
            batch["maps"], batch["temp_series"], meta, batch["temp_lengths"],
            train=False,
        )
        per_sample = per_sample_losses(_last_head(outputs), batch["targets"])
        valid = batch["valid"].astype(jnp.float32)
        sums = {k: jnp.sum(v * valid) for k, v in per_sample.items()}
        sums["num_samples"] = jnp.sum(valid)
        return sums

    return jax.jit(step)


def make_forward_fn(model, metadata_features: int = 8):
    """Jitted inference forward: (variables, batch) → outputs (NHWC)."""

    @partial(jax.jit, static_argnums=())
    def forward(variables, batch):
        meta = _metadata_full(batch, metadata_features)
        return _last_head(model.apply(
            variables,
            batch["maps"], batch["temp_series"], meta, batch["temp_lengths"],
            train=False,
        ))

    return forward
