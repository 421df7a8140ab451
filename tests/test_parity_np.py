"""Parity of the JAX ops against the independent numpy scalar-loop oracle
across stride/padding/dilation/group/deformable-group sweeps (SURVEY.md §4
test-pyramid item 1-2).  Tiny shapes — the oracle is O(everything)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modulated_deform_conv_tpu import (deform_conv2d, modulated_deform_conv2d,
                                       deform_conv3d, modulated_deform_conv3d)
from np_oracle import deform_conv_nd_np


def _rand_case(rng, nd, B, C, O, S, k, stride, pad, dil, g, dg, modulated,
               off_scale=2.0):
    kernel = (k,) * nd
    K = k ** nd
    OS = tuple((S[d] + 2 * pad - (dil * (k - 1) + 1)) // stride + 1
               for d in range(nd))
    x = rng.standard_normal((B, C) + S).astype(np.float32)
    off = (off_scale * rng.standard_normal((B, dg * nd * K) + OS)).astype(
        np.float32)
    mask = (rng.uniform(0, 1, (B, dg * K) + OS).astype(np.float32)
            if modulated else None)
    w = rng.standard_normal((O, C // g) + kernel).astype(np.float32) * 0.3
    b = rng.standard_normal((O,)).astype(np.float32)
    return x, off, mask, w, b, OS


CASES_2D = [
    # (B, C, O, S, k, stride, pad, dil, g, dg, modulated)
    (1, 2, 3, (6, 5), 3, 1, 1, 1, 1, 1, False),
    (2, 4, 4, (5, 5), 3, 2, 1, 1, 2, 2, False),
    (1, 4, 2, (7, 6), 3, 1, 2, 2, 1, 4, True),
    (2, 6, 6, (6, 6), 3, 2, 0, 1, 3, 2, True),
    (1, 3, 3, (5, 7), 1, 1, 0, 1, 1, 3, True),   # 1x1 kernel
    (1, 2, 2, (8, 5), 2, 2, 1, 1, 1, 1, False),  # even kernel
]

CASES_3D = [
    (1, 2, 2, (4, 4, 4), 3, 1, 1, 1, 1, 1, False),
    (1, 4, 2, (4, 5, 4), 2, 2, 1, 1, 2, 2, True),
    (2, 2, 3, (3, 4, 5), 3, 1, 2, 2, 1, 1, True),
]


def _run(nd, case, seed):
    B, C, O, S, k, stride, pad, dil, g, dg, modulated = case
    rng = np.random.default_rng(seed)
    x, off, mask, w, b, OS = _rand_case(rng, nd, B, C, O, S, k, stride, pad,
                                        dil, g, dg, modulated)
    want = deform_conv_nd_np(x, off, mask, w, b, (stride,) * nd, (pad,) * nd,
                             (dil,) * nd, g, dg)
    kw = dict(stride=stride, padding=pad, dilation=dil, groups=g,
              deformable_groups=dg)
    if nd == 2:
        fn = modulated_deform_conv2d if modulated else deform_conv2d
    else:
        fn = modulated_deform_conv3d if modulated else deform_conv3d
    args = (jnp.asarray(x), jnp.asarray(off)) + (
        (jnp.asarray(mask),) if modulated else ()) + (jnp.asarray(w),
                                                      jnp.asarray(b))
    got = np.asarray(jax.jit(lambda *a: fn(*a, **kw))(*args))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("case", CASES_2D, ids=[str(c) for c in CASES_2D])
def test_parity_2d(case):
    _run(2, case, seed=hash(case) % 2**31)


@pytest.mark.parametrize("case", CASES_3D, ids=[str(c) for c in CASES_3D])
def test_parity_3d(case):
    _run(3, case, seed=hash(case) % 2**31)


def test_no_bias_matches_zero_bias():
    rng = np.random.default_rng(0)
    x, off, mask, w, b, OS = _rand_case(rng, 2, 1, 2, 2, (5, 5), 3, 1, 1, 1,
                                        1, 1, True)
    a = modulated_deform_conv2d(jnp.asarray(x), jnp.asarray(off),
                                jnp.asarray(mask), jnp.asarray(w), None,
                                stride=1, padding=1)
    b0 = modulated_deform_conv2d(jnp.asarray(x), jnp.asarray(off),
                                 jnp.asarray(mask), jnp.asarray(w),
                                 jnp.zeros((2,), jnp.float32), stride=1,
                                 padding=1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b0), rtol=1e-6)


def test_large_offsets_gate_to_zero():
    """Offsets pushing every sample far out of the image must produce 0
    (open-interval tap gate, deformable_conv.cu:78)."""
    x = jnp.ones((1, 1, 5, 5), jnp.float32)
    off = jnp.full((1, 18, 5, 5), 100.0, jnp.float32)
    w = jnp.ones((1, 1, 3, 3), jnp.float32)
    out = deform_conv2d(x, off, w, None, stride=1, padding=1)
    np.testing.assert_allclose(np.asarray(out), 0.0)
