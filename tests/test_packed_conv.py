"""Lane-packed conv (ops/packed_conv.py): exactness vs lax.conv, gradient
flow to the unpacked parameter, and pack-factor selection."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maunet_tpu.ops.packed_conv import pack_factor, pack_weights, packed_conv


def _ref_conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("shape,s", [
    ((2, 8, 8, 5, 7), 2),
    ((2, 8, 16, 23, 64), 2),
    ((1, 4, 16, 16, 32), 4),
    ((2, 6, 12, 3, 4), 4),
    ((3, 5, 8, 4, 4), 2),
    ((2, 7, 10, 6, 6), 1),
])
def test_packed_conv_exact(rng, shape, s):
    b, h, w, cin, cout = shape
    x = jnp.asarray(rng.normal(size=(b, h, w, cin)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)), jnp.float32)
    if s == 1:
        # passthrough: literally the same conv call
        np.testing.assert_array_equal(
            np.asarray(packed_conv(x, k, s)), np.asarray(_ref_conv(x, k)))
    else:
        # same taps, summed per channel block -> f32 reassociation only;
        # scale-relative bound (abs error grows with the 9*cin-term dots)
        ref = np.asarray(_ref_conv(x, k))
        np.testing.assert_allclose(
            np.asarray(packed_conv(x, k, s)), ref,
            atol=2e-6 * max(1.0, float(np.max(np.abs(ref)))))


def test_packed_conv_gradients_match(rng):
    """d/dkernel and d/dx through the packing equal the plain conv's (up to
    f32 reassociation)."""
    x = jnp.asarray(rng.normal(size=(2, 6, 8, 5)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 5, 4)), jnp.float32)

    def loss(fn):
        return lambda x, k: jnp.sum(fn(x, k) ** 2)

    gx, gk = jax.grad(loss(lambda x, k: packed_conv(x, k, 2)), argnums=(0, 1))(x, k)
    rx, rk = jax.grad(loss(_ref_conv), argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), atol=1e-3)


def test_pack_weights_structure():
    """Packed kernel holds each tap exactly once: unpacking by summing the
    structured positions recovers the original kernel."""
    k = jnp.arange(3 * 3 * 2 * 5, dtype=jnp.float32).reshape(3, 3, 2, 5)
    s = 2
    w = pack_weights(k, s)                       # (3, 1, (s+2)*2, s*5)
    assert w.shape == (3, 1, (s + 2) * 2, s * 5)
    w5 = np.asarray(w).reshape(3, s + 2, 2, s, 5)
    for p in range(s):
        for kx in range(3):
            np.testing.assert_array_equal(w5[:, p + kx, :, p, :],
                                          np.asarray(k)[:, kx])
    # everything else is zero
    total = np.abs(w5).sum()
    expect = s * np.abs(np.asarray(k)).sum()
    np.testing.assert_allclose(total, expect)


def test_pack_factor():
    assert pack_factor(64, 256) == 2
    assert pack_factor(32, 256) == 4
    assert pack_factor(128, 256) == 1
    assert pack_factor(64, 255) == 1   # odd width: no even grouping
    assert pack_factor(4, 8, max_s=4) == 4
