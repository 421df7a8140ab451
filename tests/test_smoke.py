"""Fast smoke lane (VERDICT r2 item 8): one tiny parity case per kernel
family per ndim, sized so the whole `-m smoke` selection stays under a
minute on CPU (interpreter-mode Pallas is the cost driver — shapes and
window bounds here are minimal).

Full-coverage versions of these live in test_pallas_kernel.py /
test_shiftblend.py / test_sharding.py (the heavy ones behind -m slow).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import modulated_deform_conv_tpu as mdc
from modulated_deform_conv_tpu.ops import core
from modulated_deform_conv_tpu.ops.pallas import shiftblend as sb
from modulated_deform_conv_tpu.utils.config import DeformConvSpec

pytestmark = pytest.mark.smoke

RNG = np.random.default_rng(11)


def _case(nd, B, C, S, k, dg, modulated, offscale):
    kt = (k,) * nd
    spec = DeformConvSpec.make(nd, kt, 1, k // 2, 1, 1, dg, 64,
                               modulated=modulated)
    OS = spec.out_sizes(S)
    K = spec.tap_count
    x = jnp.asarray(RNG.standard_normal((B, C) + tuple(S)), jnp.float32)
    off = jnp.asarray(RNG.uniform(-offscale, offscale,
                                  (B, dg * nd * K) + OS), jnp.float32)
    m = (jnp.asarray(RNG.uniform(0, 1, (B, dg * K) + OS), jnp.float32)
         if modulated else None)
    w = jnp.asarray(RNG.standard_normal((C, C) + kt) * 0.1, jnp.float32)
    return spec, x, off, m, w


def test_shiftblend_2d_smoke():
    spec, x, off, m, w = _case(2, 1, 8, (6, 7), 3, 1, True, 0.9)
    ref = jax.jit(lambda *a: core.deform_conv_nd(*a, spec))(x, off, m, w,
                                                            None)
    got = jax.jit(lambda *a: sb.shift_conv_fwd_only(
        *a, spec, "float32", 1.0))(x, off, m, w, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_shiftblend_3d_smoke():
    # k=1/pad=0 keeps OS == S with only K=1 tap: the cheapest config that
    # still sweeps the full trilinear corner window per axis (the k=3
    # versions run minutes in interpreter mode — slow lane,
    # test_shiftblend.py).
    spec, x, off, m, w = _case(3, 1, 8, (3, 4, 5), 1, 1, False, 0.9)
    ref = jax.jit(lambda *a: core.deform_conv_nd(*a, spec))(x, off, None,
                                                            w, None)
    got = jax.jit(lambda *a: sb.shift_conv_fwd_only(
        *a, spec, "float32", 1.0))(x, off, None, w, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gathermm_2d_smoke():
    spec, x, off, m, w = _case(2, 1, 8, (6, 7), 3, 1, True, 2.5)
    ref = core.deform_conv_nd(x, off, m, w, None, spec)
    got = jax.jit(lambda *a: mdc.modulated_deform_conv2d(
        *a, None, stride=1, padding=1, impl="pallas",
        precision="float32"))(x, off, m, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gathermm_3d_smoke():
    spec, x, off, m, w = _case(3, 1, 8, (4, 4, 6), 2, 1, False, 2.5)
    ref = core.deform_conv_nd(x, off, None, w, None, spec)
    got = jax.jit(lambda *a: mdc.deform_conv3d(
        *a, None, stride=1, padding=1, impl="pallas",
        precision="float32"))(x, off, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sharded_smoke():
    from modulated_deform_conv_tpu.parallel.sharding import (
        make_mesh, sharded_modulated_deform_conv2d)
    spec, x, off, m, w = _case(2, 2, 8, (8, 8), 3, 1, True, 0.9)
    mesh = make_mesh((2, 2), ("data", "space"))
    got = jax.jit(lambda *a: sharded_modulated_deform_conv2d(
        *a, None, mesh=mesh, stride=1, padding=1, max_offset=1.0))(
        x, off, m, w)
    ref = core.deform_conv_nd(x, off, m, w, None, spec)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
