"""Training state: parameters, BN statistics, optimizer state, step counter."""

from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray

    @property
    def variables(self) -> dict:
        return {"params": self.params, "batch_stats": self.batch_stats}


def create_train_state(
    model,
    optimizer: optax.GradientTransformation,
    rng: jax.Array,
    example_batch: dict[str, Any],
    metadata_features: int = 8,
) -> TrainState:
    """Initialize model variables from an example batch and wrap them with
    fresh optimizer state."""
    meta = example_batch["metadata"]
    if metadata_features == 8:
        meta = jnp.concatenate(
            [meta, example_batch["t1_dates"], example_batch["t2_dates"]], axis=1)
    variables = model.init(
        rng,
        jnp.asarray(example_batch["maps"]),
        jnp.asarray(example_batch["temp_series"]),
        jnp.asarray(meta),
        jnp.asarray(example_batch["temp_lengths"]),
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def param_count(state: TrainState) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(state.params))


ApplyFn = Callable[..., Any]
