"""PyTorch ``.pth`` checkpoint → JAX pytree conversion.

Loads the reference's checkpoint format (reference src/train.py:305-319:
dict with model_state_dict / hyperparameters / model_type / study_name /
metadata_input_length) and converts the weights into the
``{'params': ..., 'batch_stats': ...}`` variables of maunet_tpu models,
including the three generations of legacy embedding-flag resolution the
reference evaluator implements (test/evaluate.py:92-114).

Layout rules:
- Conv2d weight (O, I, kh, kw)  → linen Conv kernel (kh, kw, I, O)
- Linear weight (out, in)       → linen Dense kernel (in, out)
- BatchNorm weight/bias         → scale/bias; running_mean/var → batch_stats
- LSTM weight_ih_l0 (4H, in)    → w_ih (in, 4H); weight_hh_l0 (4H, H) → w_hh
  (H, 4H).  Gate order (i, f, g, o) is preserved — both sides use torch's
  packing.
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np


def _to_np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


def _set(tree: dict, path: list[str], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_state_dict(state_dict: dict[str, Any]) -> dict[str, Any]:
    """Convert a reference ``model_state_dict`` to linen variables."""
    params: dict = {}
    stats: dict = {}

    for key, tensor in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        name = key.removeprefix("model.")
        parts = name.split(".")
        arr = _to_np(tensor)

        # --- LSTM (temporal_encoder.lstm.*) ---
        if len(parts) >= 3 and parts[1] == "lstm":
            m = re.fullmatch(r"(weight|bias)_(ih|hh)_l0", parts[2])
            if not m:
                raise ValueError(f"Unsupported LSTM key: {key}")
            kind, which = m.groups()
            if kind == "weight":
                _set(params, [parts[0], f"w_{which}"], arr.T)
            else:
                _set(params, [parts[0], f"b_{which}"], arr)
            continue

        # --- MetadataEncoder MLP (meta_encoder.fc.{0,2}.*) ---
        if len(parts) == 4 and parts[1] == "fc" and parts[2] in ("0", "2"):
            target = [parts[0], f"fc{parts[2]}"]
            if parts[3] == "weight":
                _set(params, target + ["kernel"], arr.T)
            else:
                _set(params, target + ["bias"], arr)
            continue

        # --- TemporalEncoder head (temporal_encoder.fc.*) ---
        if len(parts) == 3 and parts[1] == "fc":
            if parts[2] == "weight":
                _set(params, [parts[0], "fc", "kernel"], arr.T)
            else:
                _set(params, [parts[0], "fc", "bias"], arr)
            continue

        # --- BatchNorm inside VGGBlocks (convX_Y.bn{1,2}.*) ---
        if len(parts) == 3 and parts[1].startswith("bn"):
            block, bn, leaf = parts
            if leaf == "weight":
                _set(params, [block, bn, "scale"], arr)
            elif leaf == "bias":
                _set(params, [block, bn, "bias"], arr)
            elif leaf == "running_mean":
                _set(stats, [block, bn, "mean"], arr)
            elif leaf == "running_var":
                _set(stats, [block, bn, "var"], arr)
            else:
                raise ValueError(f"Unsupported BN key: {key}")
            continue

        # --- Convolutions (convX_Y.conv{1,2}.* / final*.weight) ---
        if parts[-1] == "weight" and arr.ndim == 4:
            _set(params, parts[:-1] + ["kernel"], arr.transpose(2, 3, 1, 0))
            continue
        if parts[-1] == "bias":
            _set(params, parts[:-1] + ["bias"], arr)
            continue

        raise ValueError(f"Unrecognized checkpoint key: {key}")

    return {"params": params, "batch_stats": stats}


def resolve_embedding_flags(checkpoint: dict[str, Any], study_name: str = "") -> tuple[bool, bool]:
    """Three-generation legacy flag resolution (reference test/evaluate.py:92-114)."""
    hp = checkpoint.get("hyperparameters", {}) or {}
    if "temporal_embeddings" in hp:
        return bool(hp["temporal_embeddings"]), bool(hp["metadata_embeddings"])
    default_emb = True
    ckpt_study = checkpoint.get("study_name", "") or ""
    if "noemb" in study_name or "noemb" in ckpt_study:
        default_emb = False
    if checkpoint.get("additional_embeddings", default_emb):
        return True, True
    if checkpoint.get("metadata_only_embeddings", False):
        return False, True
    return False, False


def infer_hyperparams(state_dict: dict[str, Any], checkpoint: dict[str, Any] | None = None,
                      study_name: str = "") -> dict[str, Any]:
    """Derive architecture hyperparameters from checkpoint metadata, filling
    gaps from weight shapes (robust to stripped/legacy checkpoints — the
    reference app mutates checkpoints on disk, app/model_utils.py:22-36)."""
    checkpoint = checkpoint or {}
    hp = dict(checkpoint.get("hyperparameters", {}) or {})

    def shape(key):
        t = state_dict.get(key)
        return None if t is None else tuple(t.shape)

    prefix = "model." if any(k.startswith("model.") for k in state_dict) else ""
    s = lambda k: shape(prefix + k)

    c00 = s("conv0_0.conv1.weight")
    if c00:
        hp.setdefault("base_filters", c00[0])
        hp["spatial_channels"] = c00[1]
    lstm = s("temporal_encoder.lstm.weight_hh_l0")
    if lstm:
        hp.setdefault("lstm_hidden", lstm[1])
    tfc = s("temporal_encoder.fc.weight")
    if tfc:
        hp.setdefault("temporal_dim", tfc[0])
    mfc = s("meta_encoder.fc.2.weight")
    if mfc:
        hp.setdefault("meta_dim", mfc[0])
    mfc0 = s("meta_encoder.fc.0.weight")
    if mfc0:
        hp.setdefault("meta_features", mfc0[1])
    fin = s("final.weight") or s("final4.weight")
    if fin:
        hp.setdefault("out_channels", fin[0])
    hp.setdefault("model_type", checkpoint.get("model_type", "unet"))
    hp["deep_supervision"] = prefix + "final4.weight" in state_dict

    temporal, metadata = resolve_embedding_flags(checkpoint, study_name)
    # U-Net++ always instantiates both encoders regardless of flags
    # (reference quirk, src/model.py:53 — flags swallowed by **kwargs).
    if hp["model_type"] == "unet++":
        temporal = metadata = True
    # Trust the weights over the flags: if an encoder is present in the
    # state_dict it participated in the graph.
    if hp["model_type"] == "unet":
        temporal = prefix + "temporal_encoder.lstm.weight_ih_l0" in state_dict and temporal
        metadata = prefix + "meta_encoder.fc.0.weight" in state_dict and metadata
    hp["temporal_embeddings"] = temporal
    hp["metadata_embeddings"] = metadata
    hp.setdefault("metadata_input_length", checkpoint.get("metadata_input_length", 4))
    return hp


def load_torch_checkpoint(path: str, study_name: str = ""):
    """Load a reference ``.pth`` → (variables, hyperparams, raw_checkpoint).

    Requires torch (CPU) at call time only; the rest of the framework never
    imports torch.
    """
    import torch

    checkpoint = torch.load(path, map_location="cpu", weights_only=False)
    if "model_state_dict" in checkpoint:
        state_dict = checkpoint["model_state_dict"]
    else:  # bare state_dict file
        state_dict, checkpoint = checkpoint, {}
    hyperparams = infer_hyperparams(state_dict, checkpoint, study_name)
    variables = convert_state_dict(state_dict)
    return variables, hyperparams, checkpoint
