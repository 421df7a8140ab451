"""Analytic golden cases derived from the reference's my_test.py config
(/root/reference/my_test.py:1-35): all-ones input/weight/mask, zero offsets,
3x3(x3) same-padding conv — outputs and gradients are known in closed form
(interior = prod(kernel), edges scaled by valid-tap counts)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modulated_deform_conv_tpu import (deform_conv2d, modulated_deform_conv2d,
                                       deform_conv3d, modulated_deform_conv3d)


def _ones_conv_counts(shape, k=3):
    """Expected output of a same-padded all-ones k^nd conv over an all-ones
    input: the number of in-bounds taps at each position."""
    out = np.zeros(shape)
    for idx in np.ndindex(*shape):
        cnt = 1
        for d, i in enumerate(idx):
            lo = max(0, i - (k // 2))
            hi = min(shape[d] - 1, i + (k // 2))
            cnt *= hi - lo + 1
        out[idx] = cnt
    return out


def test_golden_2d_plain_and_modulated():
    x = jnp.ones((1, 1, 5, 5), jnp.float32)
    off = jnp.zeros((1, 18, 5, 5), jnp.float32)
    mask = jnp.ones((1, 9, 5, 5), jnp.float32)
    w = jnp.ones((1, 1, 3, 3), jnp.float32)
    b = jnp.zeros((1,), jnp.float32)
    expect = _ones_conv_counts((5, 5))

    out = deform_conv2d(x, off, w, b, stride=1, padding=1)
    np.testing.assert_allclose(np.asarray(out[0, 0]), expect, atol=1e-5)

    out_m = modulated_deform_conv2d(x, off, mask, w, b, stride=1, padding=1)
    np.testing.assert_allclose(np.asarray(out_m[0, 0]), expect, atol=1e-5)


def test_golden_2d_gradients():
    x = jnp.ones((1, 1, 5, 5), jnp.float32)
    off = jnp.zeros((1, 18, 5, 5), jnp.float32)
    mask = jnp.ones((1, 9, 5, 5), jnp.float32)
    w = jnp.ones((1, 1, 3, 3), jnp.float32)
    b = jnp.zeros((1,), jnp.float32)

    def loss(x, off, mask, w, b):
        return modulated_deform_conv2d(x, off, mask, w, b, stride=1,
                                       padding=1).sum()

    gx, goff, gmask, gw, gb = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        x, off, mask, w, b)
    # d(sum out)/dx is the transpose conv of ones == same tap-count pattern.
    np.testing.assert_allclose(np.asarray(gx[0, 0]),
                               _ones_conv_counts((5, 5)), atol=1e-5)
    # grad_mask = unmasked sampled value * upstream = 1 wherever the tap is
    # in-bounds (mdeformable_conv.cu:315 semantics).
    assert float(gmask[0, 4, 2, 2]) == pytest.approx(1.0)
    # grad_weight[tap] = number of output positions whose tap sample is 1.
    np.testing.assert_allclose(
        np.asarray(gw[0, 0]),
        np.array([[16., 20., 16.], [20., 25., 20.], [16., 20., 16.]]),
        atol=1e-5)
    assert float(gb[0]) == pytest.approx(25.0)
    # ones-input is flat in the interior: offset grads are zero there.
    assert float(jnp.abs(goff[0, :, 2, 2]).max()) == pytest.approx(0.0)


def test_golden_3d():
    x = jnp.ones((1, 1, 4, 4, 4), jnp.float32)
    off = jnp.zeros((1, 81, 4, 4, 4), jnp.float32)
    mask = jnp.ones((1, 27, 4, 4, 4), jnp.float32)
    w = jnp.ones((1, 1, 3, 3, 3), jnp.float32)
    expect = _ones_conv_counts((4, 4, 4))

    out = deform_conv3d(x, off, w, None, stride=1, padding=1)
    np.testing.assert_allclose(np.asarray(out[0, 0]), expect, atol=1e-5)

    out_m = modulated_deform_conv3d(x, off, mask, w, None, stride=1, padding=1)
    np.testing.assert_allclose(np.asarray(out_m[0, 0]), expect, atol=1e-5)


def test_half_mask_scales_output():
    x = jnp.ones((1, 2, 5, 5), jnp.float32)
    off = jnp.zeros((1, 18, 5, 5), jnp.float32)
    mask = jnp.full((1, 9, 5, 5), 0.5, jnp.float32)
    w = jnp.ones((2, 2, 3, 3), jnp.float32)
    out = modulated_deform_conv2d(x, off, mask, w, None, stride=1, padding=1)
    plain = deform_conv2d(x, off, w, None, stride=1, padding=1)
    np.testing.assert_allclose(np.asarray(out), 0.5 * np.asarray(plain),
                               rtol=1e-6)
