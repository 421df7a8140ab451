#!/usr/bin/env python
"""Smoke example — the reference's my_test.py (1-35) as a checked script.

All-ones 5x5 input, zero offsets, all-ones mask/weight, stride 1, pad 1:
this reduces to an ordinary 3x3 same-padding convolution over ones, whose
outputs and input-gradients are analytically known (interior 9, edges 6,
corners 4).  Unlike the reference script, this asserts the values instead
of printing them.
"""
import jax
import jax.numpy as jnp
import numpy as np

import modulated_deform_conv_tpu as mdc

B, C, H, W, k = 1, 1, 5, 5, 3
K = k * k
x = jnp.ones((B, C, H, W))
offset = jnp.zeros((B, 2 * K, H, W))     # 18 channels: (dh, dw) per tap
mask = jnp.ones((B, K, H, W))            # 9 channels
weight = jnp.ones((1, C, k, k))
bias = jnp.zeros((1,))


@jax.jit
def run(x, offset, mask, weight, bias):
    out1 = mdc.deform_conv2d(x, offset, weight, bias, stride=1, padding=1)
    out2 = mdc.modulated_deform_conv2d(x, offset, mask, weight, bias,
                                       stride=1, padding=1)
    return out1, out2


out1, out2 = run(x, offset, mask, weight, bias)
expected = np.full((5, 5), 9.0)
expected[0] = expected[-1] = expected[:, 0] = expected[:, -1] = 6.0
for i in (0, -1):
    for j in (0, -1):
        expected[i, j] = 4.0
np.testing.assert_allclose(np.asarray(out1)[0, 0], expected, rtol=1e-6)
np.testing.assert_allclose(np.asarray(out2)[0, 0], expected, rtol=1e-6)

# loss = out.sum(); loss.backward()  (reference my_test.py:27-33)
grads = jax.jit(jax.grad(
    lambda *a: jnp.sum(mdc.modulated_deform_conv2d(
        *a, stride=1, padding=1)), argnums=(0, 1, 2, 3)))(
    x, offset, mask, weight)
gx = np.asarray(grads[0])[0, 0]
np.testing.assert_allclose(gx, expected, rtol=1e-6)  # symmetric case
print("smoke OK: out interior/edge/corner = 9/6/4, grads match")
