"""Finite-difference gradient checks for every differentiable input
(input/offset/mask/weight/bias) — SURVEY.md §4 test-pyramid item 2.

The reference ships hand-written analytic backward kernels
(deformable_conv.cu:198-287 etc.); here the backward is JAX autodiff of the
forward, so FD-vs-VJP agreement in float64 validates the same math.
Offsets are drawn away from exact integers to avoid the measure-zero kinks
of multilinear interpolation (where the reference's EPS guards also differ).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modulated_deform_conv_tpu import (deform_conv2d, modulated_deform_conv2d,
                                       deform_conv3d, modulated_deform_conv3d)


def _fd_check(fn, args, idx, eps=1e-5, rtol=5e-4, atol=5e-6, n_probe=12,
              seed=0):
    """Compare VJP gradient of sum(fn) against central finite differences on
    a few random coordinates of args[idx]."""
    loss = lambda *a: jnp.sum(fn(*a))
    g = jax.grad(loss, argnums=idx)(*args)
    rng = np.random.default_rng(seed)
    a = np.asarray(args[idx])
    flat = a.reshape(-1)
    coords = rng.choice(flat.size, size=min(n_probe, flat.size),
                        replace=False)
    for c in coords:
        ap = flat.copy(); ap[c] += eps
        am = flat.copy(); am[c] -= eps
        args_p = list(args); args_p[idx] = jnp.asarray(ap.reshape(a.shape))
        args_m = list(args); args_m[idx] = jnp.asarray(am.reshape(a.shape))
        fd = (float(loss(*args_p)) - float(loss(*args_m))) / (2 * eps)
        an = float(np.asarray(g).reshape(-1)[c])
        assert an == pytest.approx(fd, rel=rtol, abs=atol), \
            f"arg{idx} coord {c}: analytic {an} vs fd {fd}"


def _case_2d(modulated, seed=1):
    rng = np.random.default_rng(seed)
    B, C, O, H, W, k, dg, g = 1, 4, 4, 5, 6, 3, 2, 2
    OH, OW = 5, 6
    x = jnp.asarray(rng.standard_normal((B, C, H, W)), jnp.float64)
    # keep offsets fractional, away from integers
    off = jnp.asarray(rng.uniform(-1.7, 1.7, (B, dg * 2 * k * k, OH, OW))
                      + 0.23, jnp.float64)
    mask = jnp.asarray(rng.uniform(0.2, 1.0, (B, dg * k * k, OH, OW)),
                       jnp.float64)
    w = jnp.asarray(rng.standard_normal((O, C // g, k, k)) * 0.4, jnp.float64)
    b = jnp.asarray(rng.standard_normal((O,)), jnp.float64)
    kw = dict(stride=1, padding=1, dilation=1, groups=g, deformable_groups=dg)
    if modulated:
        fn = lambda x, o, m, w, b: modulated_deform_conv2d(x, o, m, w, b, **kw)
        return fn, (x, off, mask, w, b)
    fn = lambda x, o, w, b: deform_conv2d(x, o, w, b, **kw)
    return fn, (x, off, w, b)


@pytest.fixture(autouse=True)
def _x64():
    with jax.enable_x64(True):
        yield


@pytest.mark.parametrize("idx", [0, 1, 2, 3])
def test_gradcheck_2d_plain(idx):
    fn, args = _case_2d(False)
    _fd_check(fn, args, idx)


@pytest.mark.parametrize("idx", [0, 1, 2, 3, 4])
def test_gradcheck_2d_modulated(idx):
    fn, args = _case_2d(True)
    _fd_check(fn, args, idx)


@pytest.mark.parametrize("idx", [0, 1, 2, 3, 4])
def test_gradcheck_3d_modulated(idx):
    rng = np.random.default_rng(7)
    B, C, O, k, dg, g = 1, 2, 2, 2, 1, 1
    S = (3, 4, 4)
    K = k ** 3
    OS = (2, 3, 3)
    x = jnp.asarray(rng.standard_normal((B, C) + S), jnp.float64)
    off = jnp.asarray(rng.uniform(-1.3, 1.3, (B, dg * 3 * K) + OS) + 0.17,
                      jnp.float64)
    mask = jnp.asarray(rng.uniform(0.2, 1.0, (B, dg * K) + OS), jnp.float64)
    w = jnp.asarray(rng.standard_normal((O, C // g, k, k, k)) * 0.4,
                    jnp.float64)
    b = jnp.asarray(rng.standard_normal((O,)), jnp.float64)
    fn = lambda x, o, m, w, b: modulated_deform_conv3d(
        x, o, m, w, b, stride=1, padding=0, dilation=1, groups=g,
        deformable_groups=dg)
    _fd_check(fn, (x, off, mask, w, b), idx)


def test_gradcheck_3d_plain_offset():
    rng = np.random.default_rng(9)
    B, C, O, k = 1, 2, 2, 2
    S = (3, 3, 4)
    OS = (2, 2, 3)
    K = k ** 3
    x = jnp.asarray(rng.standard_normal((B, C) + S), jnp.float64)
    off = jnp.asarray(rng.uniform(-1.1, 1.1, (B, 3 * K) + OS) + 0.31,
                      jnp.float64)
    w = jnp.asarray(rng.standard_normal((O, C, k, k, k)) * 0.4, jnp.float64)
    fn = lambda x, o, w: deform_conv3d(x, o, w, None, stride=1, padding=0)
    _fd_check(fn, (x, off, w), 1)
