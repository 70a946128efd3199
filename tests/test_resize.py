"""align-corners resize golden tests directly against torch.nn.functional."""

import jax.numpy as jnp
import numpy as np
import pytest

from maunet_tpu.ops.resize import (
    resize_align_corners,
    upsample_align_corners,
    upsample_like,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_resize(x_nhwc, size):
    t = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
    out = F.interpolate(t, size=size, mode="bilinear", align_corners=True)
    return out.numpy().transpose(0, 2, 3, 1)


@pytest.mark.parametrize("src,dst", [
    ((8, 8), (16, 16)),    # clean ×2
    ((15, 15), (30, 30)),  # odd ×2
    ((30, 30), (31, 31)),  # the decoder's +1 fix-up
    ((62, 62), (125, 125)),  # real odd chain step
    ((16, 16), (7, 5)),    # downscale, non-square
    ((1, 4), (3, 8)),      # degenerate single row
])
def test_resize_matches_torch(rng, src, dst):
    x = rng.normal(size=(2, *src, 3)).astype(np.float32)
    ours = np.asarray(resize_align_corners(jnp.asarray(x), dst))
    theirs = _torch_resize(x, dst)
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_upsample_like_double_interpolation(rng):
    """pre_scale=2 then exact-size match == torch's Upsample + interpolate
    composition (reference src/model.py:279: up() then _upsample_match)."""
    x = rng.normal(size=(1, 15, 15, 4)).astype(np.float32)
    ours = np.asarray(upsample_like(jnp.asarray(x), (31, 31), pre_scale=2))
    mid = _torch_resize(x, (30, 30))
    theirs = _torch_resize(mid, (31, 31))
    np.testing.assert_allclose(ours, theirs, atol=2e-5)
    # and it differs from the single-resize path — the parity trap
    single = np.asarray(upsample_like(jnp.asarray(x), (31, 31), pre_scale=None))
    assert not np.allclose(single, theirs, atol=1e-4)


def test_upsample_scale2(rng):
    x = rng.normal(size=(1, 9, 13, 2)).astype(np.float32)
    ours = np.asarray(upsample_align_corners(jnp.asarray(x), 2))
    np.testing.assert_allclose(ours, _torch_resize(x, (18, 26)), atol=1e-5)


def test_resize_identity(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 2)).astype(np.float32))
    assert resize_align_corners(x, (8, 8)) is x
