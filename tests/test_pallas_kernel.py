"""Fused Pallas kernel (ops/pallas/gathermm.py) vs the XLA oracle path.

Runs in Pallas interpreter mode on CPU (see gathermm._interpret), so
shapes are kept tiny.  The same kernel compiles natively on TPU; bench.py
and /tmp drive scripts exercise that side.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import modulated_deform_conv_tpu as mdc
from modulated_deform_conv_tpu.ops.pallas import gathermm
from modulated_deform_conv_tpu.utils.config import DeformConvSpec

RNG = np.random.default_rng(42)


def _mk(B, C, H, W, k, g, dg, stride, padding, dilation, O=None,
        off_scale=3.0, modulated=True):
    O = O or C
    K = k * k
    spec = DeformConvSpec.make(2, (k, k), stride, padding, dilation, g, dg,
                               0, modulated=modulated)
    OH, OW = spec.out_sizes((H, W))
    x = jnp.asarray(RNG.standard_normal((B, C, H, W)), jnp.float32)
    off = jnp.asarray(RNG.uniform(-off_scale, off_scale,
                                  (B, dg * 2 * K, OH, OW)), jnp.float32)
    mask = (jnp.asarray(RNG.uniform(0, 1, (B, dg * K, OH, OW)), jnp.float32)
            if modulated else None)
    w = jnp.asarray(RNG.standard_normal((O, C // g, k, k)), jnp.float32)
    b = jnp.asarray(RNG.standard_normal((O,)), jnp.float32)
    kw = dict(stride=stride, padding=padding, dilation=dilation, groups=g,
              deformable_groups=dg)
    return x, off, mask, w, b, kw


def _run(x, off, mask, w, b, kw, impl, precision="float32"):
    if mask is None:
        fn = lambda *a: mdc.deform_conv2d(*a, **kw, impl=impl,
                                          precision=precision)
        args = (x, off, w, b)
    else:
        fn = lambda *a: mdc.modulated_deform_conv2d(*a, **kw, impl=impl,
                                                    precision=precision)
        args = (x, off, mask, w, b)
    return jax.jit(fn)(*args)


CONFIGS = [
    # B, C, H, W, k, g, dg, stride, padding, dilation
    (2, 16, 9, 8, 3, 1, 1, 1, 1, 1),
    (1, 16, 13, 9, 3, 2, 2, 2, 2, 2),   # odd sizes, OH % T != 0
    (2, 8, 8, 8, 1, 1, 1, 1, 0, 1),     # 1x1 kernel
    (1, 16, 10, 7, 2, 1, 2, 2, 1, 1),   # even kernel
    (2, 16, 9, 8, 3, 2, 1, 1, 1, 1),    # g=2 dg=1: unfused-GEMM fallback
]


@pytest.mark.parametrize("cfg", CONFIGS)
@pytest.mark.parametrize("modulated", [True, False])
def test_forward_matches_xla(cfg, modulated):
    x, off, mask, w, b, kw = _mk(*cfg, modulated=modulated)
    got = _run(x, off, mask, w, b, kw, "pallas")
    want = _run(x, off, mask, w, b, kw, "xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_gradients_match_xla():
    x, off, mask, w, b, kw = _mk(*CONFIGS[1])

    def loss(impl):
        def f(x, off, mask, w, b):
            o = mdc.modulated_deform_conv2d(x, off, mask, w, b, **kw,
                                            impl=impl, precision="float32")
            return jnp.sum(o * jnp.cos(0.1 * o))
        return f

    gp = jax.jit(jax.grad(loss("pallas"), argnums=(0, 1, 2, 3, 4)))(
        x, off, mask, w, b)
    gx = jax.jit(jax.grad(loss("xla"), argnums=(0, 1, 2, 3, 4)))(
        x, off, mask, w, b)
    for got, want, name in zip(gp, gx, ["x", "offset", "mask", "w", "b"]):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-5, atol=3e-5, err_msg=name)


def test_gradients_unfused_fallback():
    """g=2, dg=1 misaligns channel slabs and conv groups, exercising the
    fused_columns (+ XLA GEMM) path instead of the fully fused kernel."""
    from modulated_deform_conv_tpu.ops.pallas import gathermm as gm
    x, off, mask, w, b, kw = _mk(*CONFIGS[4])
    spec = DeformConvSpec.make(2, (3, 3), 1, 1, 1, 2, 1, 0, modulated=True)
    plan = gm._Plan(spec, x.shape[0], x.shape[1], x.shape[2:],
                    spec.out_sizes(x.shape[2:]), x.dtype)
    assert not gm._fuse_ok(plan, x.shape[1], 2, 16)

    def loss(impl):
        def f(x, off, mask, w, b):
            o = mdc.modulated_deform_conv2d(x, off, mask, w, b, **kw,
                                            impl=impl, precision="float32")
            return jnp.sum(o * o)
        return f

    gp = jax.jit(jax.grad(loss("pallas"), argnums=(0, 1, 2, 3, 4)))(
        x, off, mask, w, b)
    gx = jax.jit(jax.grad(loss("xla"), argnums=(0, 1, 2, 3, 4)))(
        x, off, mask, w, b)
    for got, want, name in zip(gp, gx, ["x", "offset", "mask", "w", "b"]):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_gradients_plain_op():
    x, off, _, w, b, kw = _mk(*CONFIGS[0], modulated=False)

    def loss(impl):
        def f(x, off, w, b):
            o = mdc.deform_conv2d(x, off, w, b, **kw, impl=impl,
                                  precision="float32")
            return jnp.sum(o * o)
        return f

    gp = jax.jit(jax.grad(loss("pallas"), argnums=(0, 1, 2, 3)))(x, off, w, b)
    gx = jax.jit(jax.grad(loss("xla"), argnums=(0, 1, 2, 3)))(x, off, w, b)
    for got, want, name in zip(gp, gx, ["x", "offset", "w", "b"]):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_extreme_offsets_zero_outside():
    """Samples far outside the plane contribute exactly zero (open-interval
    gate, reference deformable_conv.cu:78) — and huge offsets stay finite
    through the dynamic chunk-bound logic."""
    x, off, mask, w, b, kw = _mk(*CONFIGS[0])
    off = off.at[:, 0].set(1e6).at[:, 1].set(-1e6)
    got = _run(x, off, mask, w, b, kw, "pallas")
    want = _run(x, off, mask, w, b, kw, "xla")
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_integer_positions_exact():
    """Zero offsets -> plain convolution; interpolation hits grid points
    exactly (fh = fw = 0)."""
    B, C, H, W, k = 1, 8, 5, 5, 3
    K = k * k
    x = jnp.ones((B, C, H, W), jnp.float32)
    off = jnp.zeros((B, 2 * K, H, W), jnp.float32)
    mask = jnp.ones((B, K, H, W), jnp.float32)
    w = jnp.ones((1, C, k, k), jnp.float32)
    out = jax.jit(lambda *a: mdc.modulated_deform_conv2d(
        *a, stride=1, padding=1, impl="pallas", precision="float32"))(
        x, off, mask, w)
    o = np.asarray(out)[0, 0]
    assert o[2, 2] == pytest.approx(9 * C)
    assert o[0, 2] == pytest.approx(6 * C)
    assert o[0, 0] == pytest.approx(4 * C)


def test_precision_modes_close():
    x, off, mask, w, b, kw = _mk(*CONFIGS[0])
    ref = _run(x, off, mask, w, b, kw, "xla")
    scale = float(jnp.max(jnp.abs(ref)))
    for prec in gathermm.PRECISIONS:
        got = _run(x, off, mask, w, b, kw, "pallas", precision=prec)
        rel = float(jnp.max(jnp.abs(got - ref))) / scale
        assert rel < (1e-5 if prec == "float32" else 3e-2), (prec, rel)


@pytest.mark.slow
def test_3d_forward_and_grads_match_xla():
    B, C, D, H, W, k, dg = 1, 16, 6, 7, 5, 2, 2
    K = k ** 3
    spec = DeformConvSpec.make(3, (k, k, k), 1, 1, 1, 1, dg, 0,
                               modulated=True)
    OS = spec.out_sizes((D, H, W))
    x = jnp.asarray(RNG.standard_normal((B, C, D, H, W)), jnp.float32)
    off = jnp.asarray(RNG.uniform(-2, 2, (B, dg * 3 * K) + OS), jnp.float32)
    mask = jnp.asarray(RNG.uniform(0, 1, (B, dg * K) + OS), jnp.float32)
    w = jnp.asarray(RNG.standard_normal((8, C, k, k, k)), jnp.float32)

    def loss(impl):
        def f(x, off, mask, w):
            o = mdc.modulated_deform_conv3d(x, off, mask, w, None, padding=1,
                                            deformable_groups=dg, impl=impl,
                                            precision="float32")
            return jnp.sum(o * jnp.cos(0.1 * o))
        return f

    outp = jax.jit(lambda *a: mdc.modulated_deform_conv3d(
        *a, None, padding=1, deformable_groups=dg, impl="pallas",
        precision="float32"))(x, off, mask, w)
    outx = jax.jit(lambda *a: mdc.modulated_deform_conv3d(
        *a, None, padding=1, deformable_groups=dg, impl="xla"))(
        x, off, mask, w)
    np.testing.assert_allclose(np.asarray(outp), np.asarray(outx),
                               rtol=3e-5, atol=3e-5)

    gp = jax.jit(jax.grad(loss("pallas"), argnums=(0, 1, 2, 3)))(
        x, off, mask, w)
    gx = jax.jit(jax.grad(loss("xla"), argnums=(0, 1, 2, 3)))(
        x, off, mask, w)
    for got, want, name in zip(gp, gx, ["x", "offset", "mask", "w"]):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=5e-5, atol=5e-5, err_msg=name)


def test_eligibility_reasons():
    spec = DeformConvSpec.make(2, (3, 3), 1, 1, 1, 1, 1, 0, modulated=True)
    x = jnp.zeros((1, 16, 8, 8), jnp.float32)
    assert gathermm.ineligible_reason(x, spec) is None
    xhuge = jnp.zeros((1, 16, 2048, 2048), jnp.float32)
    plan = gathermm._Plan(spec, 1, 16, (2048, 2048), (2048, 2048),
                          jnp.float32)
    assert plan.stream                      # large planes stream from HBM
    xtiny = jnp.zeros((1, 4, 8, 8), jnp.float32)
    assert gathermm.ineligible_reason(xtiny, spec) is not None


@pytest.mark.slow
def test_streaming_mode_matches_resident(monkeypatch):
    """Planes too large for VMEM stream chunks from HBM via DMA; results
    must match the VMEM-resident path exactly."""
    from modulated_deform_conv_tpu.ops.pallas import gathermm as gm
    x, off, mask, w, b, kw = _mk(*CONFIGS[0])
    want = _run(x, off, mask, w, b, kw, "pallas")

    def loss(x, off, mask, w, b):
        o = mdc.modulated_deform_conv2d(x, off, mask, w, b, **kw,
                                        impl="pallas", precision="float32")
        return jnp.sum(o * o)

    gref = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(x, off, mask, w, b)

    monkeypatch.setattr(gm, "_X_PLANE_BUDGET", 1024)  # force streaming
    spec = DeformConvSpec.make(2, (3, 3), *CONFIGS[0][7:10], CONFIGS[0][5],
                               CONFIGS[0][6], 0, modulated=True)
    plan = gm._Plan(spec, x.shape[0], x.shape[1], x.shape[2:],
                    spec.out_sizes(x.shape[2:]), x.dtype)
    assert plan.stream
    got = _run(x, off, mask, w, b, kw, "pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    gstream = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(x, off, mask, w, b)
    for a, bb, name in zip(gstream, gref, ["x", "offset", "mask"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-6, atol=1e-6, err_msg=name)


@pytest.mark.slow
def test_channel_part_split_matches(monkeypatch):
    """When the input plane exceeds the VMEM budget, channels split across
    a grid dimension; results (and all grads) must match the unsplit path."""
    from modulated_deform_conv_tpu.ops.pallas import gathermm as gm
    x, off, mask, w, b, kw = _mk(*CONFIGS[0])

    def loss(x, off, mask, w, b):
        o = mdc.modulated_deform_conv2d(x, off, mask, w, b, **kw,
                                        impl="pallas", precision="float32")
        return jnp.sum(o * o)

    want = _run(x, off, mask, w, b, kw, "pallas")
    gref = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(x, off, mask, w, b)

    # C=16, H=9 (SPAD 16), W=8: plane 16*8*16*4 = 8KB; budget 4KB -> NCP=2.
    monkeypatch.setattr(gm, "_X_PLANE_BUDGET", 4 * 1024)
    spec = DeformConvSpec.make(2, (3, 3), *CONFIGS[0][7:10], CONFIGS[0][5],
                               CONFIGS[0][6], 0, modulated=True)
    plan = gm._Plan(spec, x.shape[0], x.shape[1], x.shape[2:],
                    spec.out_sizes(x.shape[2:]), x.dtype)
    assert plan.NCP == 2 and not plan.stream
    got = _run(x, off, mask, w, b, kw, "pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    gsplit = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(x, off, mask, w, b)
    # offset/mask grads reduce over channel parts in a different f32
    # summation order than the unsplit path.
    for a, bb, name in zip(gsplit, gref, ["x", "offset", "mask"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-5, atol=1e-3, err_msg=name)


def test_3d_planar_mode_matches_xla():
    """r4 planar mode (two-level lead-plane x in-plane chunk bounds,
    ANALYSIS §3c): a plane divisible by 8 triggers `_Plan.planar`; fwd and
    all grads must match the XLA oracle on both the fused and the
    columns (unfused, groups-forced) paths."""
    B, C, S, k, dg = 1, 16, (5, 16, 16), 3, 1
    K = k ** 3
    for g in (1, 2):      # g=2 fails _fuse_ok -> columns path
        spec = DeformConvSpec.make(3, (k,) * 3, 1, 1, 1, g, dg, 0,
                                   modulated=True)
        plan = gathermm._Plan(spec, B, C, S, spec.out_sizes(S), jnp.float32)
        assert plan.planar, "config must exercise planar mode"
        x = jnp.asarray(RNG.standard_normal((B, C) + S), jnp.float32)
        off = jnp.asarray(RNG.uniform(-2, 2, (B, dg * 3 * K) + S),
                          jnp.float32)
        mask = jnp.asarray(RNG.uniform(0, 1, (B, dg * K) + S), jnp.float32)
        w = jnp.asarray(RNG.standard_normal((C, C // g) + (k,) * 3) * 0.2,
                        jnp.float32)

        def loss(impl, g=g):
            def f(x, off, mask, w):
                o = mdc.modulated_deform_conv3d(
                    x, off, mask, w, None, padding=1, groups=g,
                    deformable_groups=dg, impl=impl, precision="float32")
                return jnp.sum(o * jnp.cos(0.1 * o))
            return f

        outp = jax.jit(lambda *a: mdc.modulated_deform_conv3d(
            *a, None, padding=1, groups=g, deformable_groups=dg,
            impl="pallas", precision="float32"))(x, off, mask, w)
        outx = jax.jit(lambda *a: mdc.modulated_deform_conv3d(
            *a, None, padding=1, groups=g, deformable_groups=dg,
            impl="xla"))(x, off, mask, w)
        np.testing.assert_allclose(np.asarray(outp), np.asarray(outx),
                                   rtol=3e-5, atol=3e-5)
        gp = jax.jit(jax.grad(loss("pallas"), argnums=(0, 1, 2, 3)))(
            x, off, mask, w)
        gx = jax.jit(jax.grad(loss("xla"), argnums=(0, 1, 2, 3)))(
            x, off, mask, w)
        for got, want, name in zip(gp, gx, ["x", "offset", "mask", "w"]):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=5e-5, atol=5e-5, err_msg=name)
