"""Orbax checkpointing with embedded experiment metadata.

Improves on the reference's torch.save best-only checkpoints
(src/train.py:303-320): full state (params + BN stats + optimizer state +
step) is saved so training *resumes exactly* — the reference cannot resume
optimizer state (SURVEY.md §5).  The metadata sidecar carries the same fields
as the reference checkpoint dict (hyperparameters, model_type, study_name,
trial_id, metadata_input_length, epoch, loss) so evaluators/apps rebuild the
architecture identically.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import orbax.checkpoint as ocp

from maunet_tpu.train.state import TrainState

METADATA_FILE = "metadata.json"
STATE_DIR = "state"


def save_checkpoint(path: str, state: TrainState, metadata: dict[str, Any]) -> None:
    # Multi-host: every process must call ckptr.save (orbax synchronizes
    # internally and the primary host writes); only process 0 writes the
    # metadata sidecar.
    path = os.path.abspath(path)
    if jax.process_index() == 0:
        os.makedirs(path, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        state_path = os.path.join(path, STATE_DIR)
        ckptr.save(state_path, jax.device_get(state), force=True)
    if jax.process_index() == 0:
        with open(os.path.join(path, METADATA_FILE), "w") as f:
            json.dump(metadata, f, indent=2, default=str)


def load_metadata(path: str) -> dict[str, Any]:
    with open(os.path.join(os.path.abspath(path), METADATA_FILE)) as f:
        return json.load(f)


def restore_checkpoint(path: str, example_state: TrainState) -> tuple[TrainState, dict]:
    """Restore a TrainState; ``example_state`` supplies the pytree structure
    (build it with create_train_state on an example batch)."""
    path = os.path.abspath(path)
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                      jax.device_get(example_state))
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(os.path.join(path, STATE_DIR), abstract)
    return state, load_metadata(path)


def restore_variables(path: str) -> tuple[dict, dict]:
    """Restore only inference variables {params, batch_stats} without needing
    optimizer structure — for evaluators/apps."""
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        tree = ckptr.restore(os.path.join(path, STATE_DIR))
    variables = {"params": tree["params"], "batch_stats": tree.get("batch_stats", {})}
    return variables, load_metadata(path)
