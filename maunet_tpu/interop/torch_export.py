"""JAX → PyTorch ``.pth`` checkpoint export.

The inverse of torch_import: models trained in this framework export to the
reference's checkpoint format (reference src/train.py:305-319), so the
reference's own evaluator/apps — and any PyTorch user — can consume them.
Layout transforms mirror torch_import exactly; round-trip is tested to be
bit-exact.
"""

from __future__ import annotations

from typing import Any

import numpy as np


def _flatten(tree: dict, prefix: str = "") -> dict[str, np.ndarray]:
    out = {}
    for key, value in tree.items():
        path = f"{prefix}.{key}" if prefix else key
        if isinstance(value, dict):
            out.update(_flatten(value, path))
        else:
            out[path] = np.asarray(value)
    return out


def variables_to_state_dict(variables: dict[str, Any]) -> dict[str, Any]:
    """linen variables {'params', 'batch_stats'} → torch state_dict with the
    reference's key names (``model.`` prefix included)."""
    import torch

    params = _flatten(variables["params"])
    stats = _flatten(variables.get("batch_stats", {}))
    sd: dict[str, Any] = {}

    for path, arr in params.items():
        parts = path.split(".")
        leaf = parts[-1]
        scope = parts[:-1]
        if leaf == "kernel" and arr.ndim == 4:      # conv HWIO → OIHW
            key = ".".join(scope) + ".weight"
            val = arr.transpose(3, 2, 0, 1)
        elif leaf == "kernel":                       # dense (in,out) → (out,in)
            key = ".".join(scope) + ".weight"
            val = arr.T
        elif leaf in ("w_ih", "w_hh"):               # LSTM (in,4H) → (4H,in)
            key = ".".join(scope) + f".lstm.weight_{leaf[2:]}_l0"
            val = arr.T
        elif leaf in ("b_ih", "b_hh"):
            key = ".".join(scope) + f".lstm.bias_{leaf[2:]}_l0"
            val = arr
        elif leaf == "scale":                        # BN γ
            key = ".".join(scope) + ".weight"
            val = arr
        elif leaf == "bias":
            key = ".".join(scope) + ".bias"
            val = arr
        else:
            raise ValueError(f"Unrecognized param leaf: {path}")
        # MetadataEncoder fc0/fc2 → torch Sequential fc.0/fc.2
        key = key.replace(".fc0.", ".fc.0.").replace(".fc2.", ".fc.2.")
        sd["model." + key] = torch.from_numpy(np.array(val, copy=True))

    for path, arr in stats.items():
        parts = path.split(".")
        leaf = {"mean": "running_mean", "var": "running_var"}[parts[-1]]
        key = "model." + ".".join(parts[:-1]) + "." + leaf
        sd[key] = torch.from_numpy(np.array(arr, copy=True))
        nbt = "model." + ".".join(parts[:-1]) + ".num_batches_tracked"
        sd.setdefault(nbt, torch.tensor(0, dtype=torch.int64))
    return sd


def export_torch_checkpoint(path: str, variables: dict[str, Any],
                            hyperparams: dict[str, Any],
                            **metadata: Any) -> str:
    """Write a reference-format .pth checkpoint."""
    import torch

    checkpoint = {
        "model_state_dict": variables_to_state_dict(variables),
        "hyperparameters": dict(hyperparams),
        "model_type": hyperparams.get("model_type", "unet"),
        "metadata_input_length": metadata.pop("metadata_input_length", 8),
        **metadata,
    }
    torch.save(checkpoint, path)
    return path
