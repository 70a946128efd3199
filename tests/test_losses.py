"""Loss parity and property tests.

Gradient/MSE losses are checked directly against the reference implementation
(imported read-only with piq stubbed out).  SSIM is validated against an
independent numpy implementation of the Wang et al. algorithm (piq is not
installed in this image) plus identity/symmetry properties.
"""

import importlib.util
import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest
from scipy import ndimage

from reference_loader import reference_available

from maunet_tpu.losses import (
    compute_all_loss,
    compute_loss_l1_grad_ssim,
    compute_loss_mse,
    compute_loss_mse_gradient,
    get_loss_fn,
    gradient_loss,
    ssim,
)


def _nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def _load_reference_losses():
    torch = pytest.importorskip("torch")  # noqa: F841
    if "piq" not in sys.modules:
        piq_stub = types.ModuleType("piq")
        piq_stub.ssim = None  # only gradient/mse paths are compared
        sys.modules["piq"] = piq_stub
    spec = importlib.util.spec_from_file_location(
        "reference_losses", "/root/reference/src/utils/losses.py")
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


@pytest.mark.skipif(not reference_available(), reason="reference tree not mounted")
def test_gradient_and_mse_parity_vs_reference(rng):
    import torch

    ref = _load_reference_losses()
    pred = rng.normal(size=(2, 32, 32, 2)).astype(np.float32)
    tgt = rng.normal(size=(2, 32, 32, 2)).astype(np.float32)
    tp, tt = torch.from_numpy(_nchw(pred)), torch.from_numpy(_nchw(tgt))

    np.testing.assert_allclose(
        float(gradient_loss(jnp.asarray(pred), jnp.asarray(tgt))),
        float(ref.gradient_loss(tp, tt)["gradient"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(compute_loss_mse(jnp.asarray(pred), jnp.asarray(tgt))["total"]),
        float(ref.compute_loss_mse(tp, tt)["total"]), rtol=1e-5)
    ours = compute_loss_mse_gradient(jnp.asarray(pred), jnp.asarray(tgt))
    theirs = ref.compute_loss_mse_gradient(tp, tt)
    for k in ("total", "mse", "gradient"):
        np.testing.assert_allclose(float(ours[k]), float(theirs[k]), rtol=1e-5)


def _ssim_numpy(x, y, data_range=1.0, size=11, sigma=1.5, k1=0.01, k2=0.03):
    """Independent scipy-based SSIM (valid region, gaussian window)."""
    x = x.astype(np.float64) / data_range
    y = y.astype(np.float64) / data_range
    coords = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    win = np.outer(g, g)

    def blur(img):
        out = ndimage.correlate(img, win, mode="constant")
        h = size // 2
        return out[h:-h, h:-h]

    c1, c2 = k1 ** 2, k2 ** 2
    vals = []
    for b in range(x.shape[0]):
        per_c = []
        for c in range(x.shape[-1]):
            xs, ys = x[b, :, :, c], y[b, :, :, c]
            mx, my = blur(xs), blur(ys)
            sxx = blur(xs * xs) - mx * mx
            syy = blur(ys * ys) - my * my
            sxy = blur(xs * ys) - mx * my
            cs = (2 * sxy + c2) / (sxx + syy + c2)
            ss = (2 * mx * my + c1) / (mx * mx + my * my + c1) * cs
            per_c.append(ss.mean())
        vals.append(np.mean(per_c))
    return np.array(vals)


def test_ssim_matches_independent_numpy(rng):
    x = rng.uniform(size=(3, 48, 48, 2)).astype(np.float32)
    y = np.clip(x + rng.normal(scale=0.1, size=x.shape), 0, 1).astype(np.float32)
    ours = np.asarray(ssim(jnp.asarray(x), jnp.asarray(y), downsample=False))
    theirs = _ssim_numpy(x, y)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_ssim_properties(rng):
    x = rng.uniform(size=(2, 40, 40, 2)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(ssim(jnp.asarray(x), jnp.asarray(x))),
                               1.0, atol=1e-6)
    y = rng.uniform(size=x.shape).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(ssim(jnp.asarray(x), jnp.asarray(y))),
        np.asarray(ssim(jnp.asarray(y), jnp.asarray(x))), atol=1e-6)
    assert np.all(np.asarray(ssim(jnp.asarray(x), jnp.asarray(y))) < 1.0)


def test_ssim_downsample_512():
    """512² inputs downsample by f=2 before SSIM (piq/MATLAB preprocessing)."""
    rng = np.random.default_rng(1)
    x = rng.uniform(size=(1, 512, 512, 2)).astype(np.float32)
    y = np.clip(x + rng.normal(scale=0.05, size=x.shape), 0, 1).astype(np.float32)
    full = float(ssim(jnp.asarray(x), jnp.asarray(y), downsample=True)[0])
    x2 = x.reshape(1, 256, 2, 256, 2, 2).mean(axis=(2, 4))
    y2 = y.reshape(1, 256, 2, 256, 2, 2).mean(axis=(2, 4))
    manual = float(ssim(jnp.asarray(x2), jnp.asarray(y2), downsample=False)[0])
    np.testing.assert_allclose(full, manual, atol=1e-6)


def test_combined_loss_dict_and_registry(rng):
    pred = rng.normal(size=(2, 32, 32, 2)).astype(np.float32)
    tgt = rng.normal(size=(2, 32, 32, 2)).astype(np.float32)
    d = compute_loss_l1_grad_ssim(jnp.asarray(pred), jnp.asarray(tgt))
    assert set(d) == {"total", "pixel", "gradient", "ssim"}
    np.testing.assert_allclose(
        float(d["total"]),
        float(d["pixel"]) + 0.1 * float(d["gradient"]) + 0.5 * float(d["ssim"]),
        rtol=1e-6)
    alld = compute_all_loss(jnp.asarray(pred), jnp.asarray(tgt))
    assert {"total", "mse", "gradient", "pixel", "ssim"} <= set(alld)
    assert get_loss_fn("mse") is compute_loss_mse
    with pytest.raises(NotImplementedError):
        get_loss_fn("huber")


def test_ssim_bounded_on_flat_clipped_inputs():
    """SSIM must stay in [-1, 1] even on flat (zero-variance) windows.

    On TPU the moment blurs used to run as bf16 MXU passes; σ² = E[x²]−μ²
    then rounds below zero on clipped-flat regions and the CS denominator
    crosses zero — observed SSIM ≈ −495 in a round-3 science run.  The fix
    (f32-exact blurs + σ² clamp) keeps the score bounded by construction.
    """
    import numpy as np

    from maunet_tpu.losses.ssim import ssim

    rng = np.random.RandomState(0)
    # Mostly-saturated images with tiny noise: near-zero true variance.
    x = np.clip(1.0 + 0.001 * rng.randn(2, 64, 64, 2), 0.0, 1.0)
    y = np.clip(1.0 + 0.001 * rng.randn(2, 64, 64, 2), 0.0, 1.0)
    s = np.asarray(ssim(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)))
    assert np.all(np.isfinite(s)) and np.all(np.abs(s) <= 1.0 + 1e-5), s
