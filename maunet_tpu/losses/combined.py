"""Combined training losses, returning ``{'total': ..., components...}`` dicts.

Capability parity with reference src/utils/losses.py:27-115, including the
per-channel rescaling before SSIM (NDVI [-1,1] → [0,1], LST clamped to [0,1],
reference :73-84).  NHWC: channel 0 is NDVI, channel 1 is LST.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from maunet_tpu.losses.basic import gradient_loss, l1_loss, mse_loss
from maunet_tpu.losses.ssim import ssim

LossDict = dict[str, jnp.ndarray]


def compute_loss_mse(outputs: jnp.ndarray, targets: jnp.ndarray) -> LossDict:
    m = mse_loss(outputs, targets)
    return {"total": m, "mse": m}


def compute_loss_mse_gradient(outputs: jnp.ndarray, targets: jnp.ndarray,
                              lambda_grad: float = 0.1) -> LossDict:
    m = mse_loss(outputs, targets)
    g = gradient_loss(outputs, targets)
    return {"total": m + lambda_grad * g, "mse": m, "gradient": g}


def _rescale_for_ssim(x: jnp.ndarray) -> jnp.ndarray:
    ndvi = (x[..., 0:1] + 1.0) / 2.0
    lst = jnp.clip(x[..., 1:2], 0.0, 1.0)
    return jnp.concatenate([ndvi, lst], axis=-1)


def compute_loss_l1_grad_ssim(outputs: jnp.ndarray, targets: jnp.ndarray,
                              lambda_grad: float = 0.1,
                              lambda_ssim: float = 0.5) -> LossDict:
    pixel = l1_loss(outputs, targets)
    grad = gradient_loss(outputs, targets)
    ssim_val = jnp.mean(ssim(_rescale_for_ssim(outputs), _rescale_for_ssim(targets),
                             data_range=1.0))
    ssim_l = 1.0 - ssim_val
    total = pixel + lambda_grad * grad + lambda_ssim * ssim_l
    return {"total": total, "pixel": pixel, "gradient": grad, "ssim": ssim_l}


def compute_all_loss(outputs: jnp.ndarray, targets: jnp.ndarray,
                     lambda_grad: float = 0.1, lambda_ssim: float = 0.5) -> LossDict:
    """Union of all components for validation logging (reference :101-115).
    Note: the 'total' key reflects the L1+grad+SSIM total, matching the
    reference's dict-update ordering."""
    losses: LossDict = {}
    losses.update(compute_loss_mse_gradient(outputs, targets, lambda_grad))
    losses.update(compute_loss_l1_grad_ssim(outputs, targets, lambda_grad, lambda_ssim))
    return losses


def per_sample_losses(outputs: jnp.ndarray, targets: jnp.ndarray,
                      lambda_grad: float = 0.1,
                      lambda_ssim: float = 0.5) -> LossDict:
    """All loss components as per-sample (B,) vectors — used by the masked
    validation step so padded tail samples can be excluded exactly."""
    o = outputs.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    red = lambda x: jnp.mean(x, axis=(1, 2, 3))
    mse = red((o - t) ** 2)
    pixel = red(jnp.abs(o - t))
    dy = jnp.abs(jnp.abs(o[:, 1:] - o[:, :-1]) - jnp.abs(t[:, 1:] - t[:, :-1]))
    dx = jnp.abs(jnp.abs(o[:, :, 1:] - o[:, :, :-1]) - jnp.abs(t[:, :, 1:] - t[:, :, :-1]))
    grad = red(dy) + red(dx)
    ssim_l = 1.0 - ssim(_rescale_for_ssim(o), _rescale_for_ssim(t), data_range=1.0)
    return {
        "mse": mse,
        "pixel": pixel,
        "gradient": grad,
        "ssim": ssim_l,
        "mse_gradient_total": mse + lambda_grad * grad,
        "total": pixel + lambda_grad * grad + lambda_ssim * ssim_l,
    }


LOSS_REGISTRY: dict[str, Callable[..., LossDict]] = {
    "mse": compute_loss_mse,
    "mse-gradient": compute_loss_mse_gradient,
    "l1-gradient-ssim": compute_loss_l1_grad_ssim,
}


def get_loss_fn(name: str) -> Callable[..., LossDict]:
    try:
        return LOSS_REGISTRY[name]
    except KeyError:
        raise NotImplementedError(
            f"Loss {name!r} not implemented (available: {sorted(LOSS_REGISTRY)})"
        ) from None
