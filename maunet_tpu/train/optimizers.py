"""Optax optimizer factories.

Capability parity with the reference's SGD/Adam/AdamW dispatch
(src/train.py:209-216) plus global-norm gradient clipping as a proper chained
transform.  The reference's clip quirk — clipping at a hardcoded 5.0 whenever
``gradient_clipping > 0`` (src/train.py:253-254) — is fixed: the configured
value is used.
"""

from __future__ import annotations

import optax


def make_optimizer(
    name: str = "adamw",
    learning_rate: float = 1e-4,
    weight_decay: float = 1e-3,
    momentum: float = 0.9,
    gradient_clipping: float = 0.0,
) -> optax.GradientTransformation:
    name = name.lower()
    if name == "sgd":
        tx = optax.sgd(learning_rate, momentum=momentum)
    elif name == "adam":
        # torch.optim.Adam(weight_decay=...) is L2 regularization added to
        # the gradient, not decoupled decay.
        tx = optax.chain(
            optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
            optax.scale_by_adam(),
            optax.scale(-learning_rate),
        )
    elif name == "adamw":
        tx = optax.adamw(learning_rate, weight_decay=weight_decay)
    else:
        raise NotImplementedError(f"Optimizer {name!r} not implemented.")

    if gradient_clipping and gradient_clipping > 0:
        tx = optax.chain(optax.clip_by_global_norm(gradient_clipping), tx)
    return tx
