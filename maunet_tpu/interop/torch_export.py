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


def _params_to_torch_arrays(params: dict[str, Any]) -> dict[str, np.ndarray]:
    """Flatten a linen ``params``-shaped pytree into {torch key: array} with
    the reference's key names and layouts (conv HWIO→OIHW etc.).  Works for
    any tree with the params structure — the params themselves, or optimizer
    moments (Adam mu/nu, SGD trace), which optax keeps params-shaped."""
    out: dict[str, np.ndarray] = {}
    for path, arr in _flatten(params).items():
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
        out["model." + key] = np.array(val, copy=True)
    return out


def variables_to_state_dict(variables: dict[str, Any]) -> dict[str, Any]:
    """linen variables {'params', 'batch_stats'} → torch state_dict with the
    reference's key names (``model.`` prefix included)."""
    import torch

    stats = _flatten(variables.get("batch_stats", {}))
    sd: dict[str, Any] = {}

    for key, val in _params_to_torch_arrays(variables["params"]).items():
        sd[key] = torch.from_numpy(val)

    for path, arr in stats.items():
        parts = path.split(".")
        leaf = {"mean": "running_mean", "var": "running_var"}[parts[-1]]
        key = "model." + ".".join(parts[:-1]) + "." + leaf
        sd[key] = torch.from_numpy(np.array(arr, copy=True))
        nbt = "model." + ".".join(parts[:-1]) + ".num_batches_tracked"
        sd.setdefault(nbt, torch.tensor(0, dtype=torch.int64))
    return sd


def reference_param_order(model_type: str = "unet",
                          deep_supervision: bool = False) -> list[str]:
    """Ordered torch parameter names of the reference model — the order
    ``model.parameters()`` yields them, i.e. module registration order in
    the reference's ``__init__`` (src/model.py:195-240 for unet — encoders
    registered first; :51-96 for unet++ — convs first, encoders after
    conv0_4, finals last).  This order defines the integer param ids in a
    torch optimizer state_dict."""

    def vgg(name: str) -> list[str]:
        return [f"{name}.{m}.{p}" for m in ("conv1", "bn1", "conv2", "bn2")
                for p in ("weight", "bias")]

    temporal = [f"temporal_encoder.lstm.{p}_l0"
                for p in ("weight_ih", "weight_hh", "bias_ih", "bias_hh")]
    temporal += ["temporal_encoder.fc.weight", "temporal_encoder.fc.bias"]
    meta = [f"meta_encoder.fc.{i}.{p}" for i in (0, 2)
            for p in ("weight", "bias")]

    names: list[str] = []
    if model_type == "unet":
        names += temporal + meta
        for blk in ("conv0_0", "conv1_0", "conv2_0", "conv3_0", "conv4_0",
                    "conv3_1", "conv2_1", "conv1_1", "conv0_1"):
            names += vgg(blk)
        names += ["final.weight", "final.bias"]
    elif model_type in ("unet++", "unetpp"):
        for blk in ("conv0_0", "conv1_0", "conv2_0", "conv3_0", "conv4_0",
                    "conv0_1", "conv1_1", "conv2_1", "conv3_1",
                    "conv0_2", "conv1_2", "conv2_2",
                    "conv0_3", "conv1_3", "conv0_4"):
            names += vgg(blk)
        names += temporal + meta
        if deep_supervision:
            for i in (1, 2, 3, 4):
                names += [f"final{i}.weight", f"final{i}.bias"]
        else:
            names += ["final.weight", "final.bias"]
    else:
        raise ValueError(f"Unknown model_type: {model_type}")
    return ["model." + n for n in names]


def _find_state(opt_state: Any, cls: type) -> Any:
    """Depth-first search for a state of type `cls` in an optax chain."""
    stack = [opt_state]
    while stack:
        s = stack.pop()
        if isinstance(s, cls):
            return s
        if isinstance(s, (tuple, list)):
            stack.extend(s)
    return None


def optimizer_state_to_torch(opt_state: Any, *, optimizer: str,
                             learning_rate: float, weight_decay: float = 0.0,
                             momentum: float = 0.9, model_type: str = "unet",
                             deep_supervision: bool = False) -> dict[str, Any]:
    """optax optimizer state → ``torch.optim`` state_dict, so a torch user
    can *resume training* from our checkpoints (the reference embeds
    optimizer_state_dict, src/train.py:305-319).

    Torch optimizer state is keyed by integer param id in
    ``model.parameters()`` order; :func:`reference_param_order` fixes that
    order.  Params absent from the JAX tree (e.g. ablated encoders) simply
    get no state entry — torch treats stateless params as fresh."""
    import optax
    import torch

    order = reference_param_order(model_type, deep_supervision)
    state: dict[int, dict[str, Any]] = {}
    optimizer = optimizer.lower()

    if optimizer in ("adam", "adamw"):
        adam = _find_state(opt_state, optax.ScaleByAdamState)
        if adam is None:
            raise ValueError("No ScaleByAdamState found in opt_state.")
        mu = _params_to_torch_arrays(adam.mu)
        nu = _params_to_torch_arrays(adam.nu)
        step = torch.tensor(float(np.asarray(adam.count)))
        for i, name in enumerate(order):
            if name in mu:
                state[i] = {"step": step.clone(),
                            "exp_avg": torch.from_numpy(mu[name]),
                            "exp_avg_sq": torch.from_numpy(nu[name])}
        group = {"lr": learning_rate, "betas": (0.9, 0.999), "eps": 1e-8,
                 "weight_decay": weight_decay, "amsgrad": False,
                 "maximize": False, "foreach": None, "capturable": False,
                 "differentiable": False, "fused": None,
                 "params": list(range(len(order)))}
    elif optimizer == "sgd":
        trace = _find_state(opt_state, optax.TraceState)
        if trace is None:
            raise ValueError("No TraceState found in opt_state.")
        bufs = _params_to_torch_arrays(trace.trace)
        for i, name in enumerate(order):
            if name in bufs:
                state[i] = {"momentum_buffer": torch.from_numpy(bufs[name])}
        group = {"lr": learning_rate, "momentum": momentum, "dampening": 0.0,
                 "weight_decay": 0.0, "nesterov": False, "maximize": False,
                 "foreach": None, "differentiable": False, "fused": None,
                 "params": list(range(len(order)))}
    else:
        raise NotImplementedError(f"Optimizer {optimizer!r} export not supported.")

    return {"state": state, "param_groups": [group]}


def export_torch_checkpoint(path: str, variables: dict[str, Any],
                            hyperparams: dict[str, Any],
                            opt_state: Any = None,
                            **metadata: Any) -> str:
    """Write a reference-format .pth checkpoint.  Pass ``opt_state`` (and
    optimizer/lr/weight_decay/momentum in ``hyperparams``) to embed an
    ``optimizer_state_dict`` for cross-framework training resume."""
    import torch

    checkpoint = {
        "model_state_dict": variables_to_state_dict(variables),
        "hyperparameters": dict(hyperparams),
        "model_type": hyperparams.get("model_type", "unet"),
        "metadata_input_length": metadata.pop("metadata_input_length", 8),
        **metadata,
    }
    if opt_state is not None:
        checkpoint["optimizer_state_dict"] = optimizer_state_to_torch(
            opt_state,
            optimizer=hyperparams.get("optimizer", "adamw"),
            learning_rate=hyperparams.get("lr",
                                          hyperparams.get("learning_rate", 1e-4)),
            weight_decay=hyperparams.get("weight_decay", 0.0),
            momentum=hyperparams.get("momentum", 0.9),
            model_type=hyperparams.get("model_type", "unet"),
            deep_supervision=hyperparams.get("deep_supervision", False))
    torch.save(checkpoint, path)
    return path
