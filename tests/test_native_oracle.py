"""Cross-check the JAX ops against the independent native C++ oracle
(modulated_deform_conv_tpu/native/mdc_cpu.cpp) — forward AND backward,
2D and 3D, plain and modulated, with groups/deformable groups."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modulated_deform_conv_tpu import (deform_conv2d, modulated_deform_conv2d,
                                       deform_conv3d, modulated_deform_conv3d)

native = pytest.importorskip("modulated_deform_conv_tpu.native")

try:
    native.build()
    HAVE_NATIVE = True
except native.NativeBuildError:
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE,
                                reason="g++ unavailable to build oracle")


CASES = [
    # (nd, B, C, O, S, k, stride, pad, dil, g, dg, modulated)
    (2, 2, 4, 4, (6, 7), 3, 1, 1, 1, 2, 2, True),
    (2, 1, 3, 6, (8, 5), 3, 2, 0, 2, 3, 1, False),
    (2, 2, 4, 2, (5, 5), 2, 1, 1, 1, 1, 4, True),
    (3, 1, 2, 4, (4, 5, 4), 3, 1, 1, 1, 2, 1, True),
    (3, 2, 2, 2, (4, 4, 5), 2, 2, 1, 1, 1, 2, False),
]


def _make(nd, B, C, O, S, k, stride, pad, dil, g, dg, modulated, seed):
    rng = np.random.default_rng(seed)
    kernel = (k,) * nd
    K = k ** nd
    OS = tuple((S[d] + 2 * pad - (dil * (k - 1) + 1)) // stride + 1
               for d in range(nd))
    x = rng.standard_normal((B, C) + S)
    off = rng.uniform(-1.8, 1.8, (B, dg * nd * K) + OS) + 0.13
    mask = rng.uniform(0.1, 1.0, (B, dg * K) + OS) if modulated else None
    w = rng.standard_normal((O, C // g) + kernel) * 0.4
    b = rng.standard_normal((O,))
    return x, off, mask, w, b, OS


@pytest.mark.parametrize("case", CASES, ids=[str(c) for c in CASES])
def test_forward_matches_native(case):
    nd, B, C, O, S, k, stride, pad, dil, g, dg, modulated = case
    x, off, mask, w, b, OS = _make(*case, seed=11)
    want = native.forward(x, off, mask, w, b, (stride,) * nd, (pad,) * nd,
                          (dil,) * nd, g, dg)
    kw = dict(stride=stride, padding=pad, dilation=dil, groups=g,
              deformable_groups=dg)
    fns = {(2, False): deform_conv2d, (2, True): modulated_deform_conv2d,
           (3, False): deform_conv3d, (3, True): modulated_deform_conv3d}
    fn = fns[(nd, modulated)]
    args = [jnp.asarray(x, jnp.float32), jnp.asarray(off, jnp.float32)]
    if modulated:
        args.append(jnp.asarray(mask, jnp.float32))
    args += [jnp.asarray(w, jnp.float32), jnp.asarray(b, jnp.float32)]
    got = np.asarray(fn(*args, **kw))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("case", CASES[:3] + CASES[3:4],
                         ids=lambda c: str(c))
def test_backward_matches_native(case):
    nd, B, C, O, S, k, stride, pad, dil, g, dg, modulated = case
    x, off, mask, w, b, OS = _make(*case, seed=23)
    rng = np.random.default_rng(99)
    kw = dict(stride=stride, padding=pad, dilation=dil, groups=g,
              deformable_groups=dg)
    fns = {(2, False): deform_conv2d, (2, True): modulated_deform_conv2d,
           (3, False): deform_conv3d, (3, True): modulated_deform_conv3d}
    fn = fns[(nd, modulated)]

    cot = rng.standard_normal((B, O) + OS)

    with jax.enable_x64(True):
        args = [jnp.asarray(x), jnp.asarray(off)]
        if modulated:
            args.append(jnp.asarray(mask))
        args += [jnp.asarray(w), jnp.asarray(b)]
        out, vjp = jax.vjp(lambda *a: fn(*a, **kw), *args)
        grads = vjp(jnp.asarray(cot))

    gx, goff, gmask, gw, gb = native.backward(
        x, off, mask, w, cot, (stride,) * nd, (pad,) * nd, (dil,) * nd, g, dg)

    np.testing.assert_allclose(np.asarray(grads[0]), gx, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(grads[1]), goff, rtol=1e-8,
                               atol=1e-9)
    if modulated:
        np.testing.assert_allclose(np.asarray(grads[2]), gmask, rtol=1e-9,
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(grads[3]), gw, rtol=1e-9,
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(grads[4]), gb, rtol=1e-9,
                                   atol=1e-9)
    else:
        np.testing.assert_allclose(np.asarray(grads[2]), gw, rtol=1e-9,
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(grads[3]), gb, rtol=1e-9,
                                   atol=1e-9)
