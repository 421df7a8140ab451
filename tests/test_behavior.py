"""Behavioral invariants: in_step independence, backward determinism,
dtype handling, shape validation errors."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modulated_deform_conv_tpu import (deform_conv2d, modulated_deform_conv2d)
from modulated_deform_conv_tpu.utils.config import (DeformConvSpec,
                                                    effective_step)


def _inputs(B=4, C=4, O=4, H=6, W=6, k=3, dg=2, g=2, seed=0):
    rng = np.random.default_rng(seed)
    OH = OW = H  # k=3, pad=1, stride=1 below
    x = jnp.asarray(rng.standard_normal((B, C, H, W)), jnp.float32)
    off = jnp.asarray(rng.uniform(-1.5, 1.5, (B, dg * 2 * k * k, OH, OW)),
                      jnp.float32)
    mask = jnp.asarray(rng.uniform(0, 1, (B, dg * k * k, OH, OW)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((O, C // g, k, k)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.standard_normal((O,)), jnp.float32)
    return x, off, mask, w, b


def test_effective_step_gcd():
    # GET_STEP semantics (reference config.h:43-60)
    assert effective_step(8, 64) == 8
    assert effective_step(256, 64) == 64
    assert effective_step(6, 4) == 2
    assert effective_step(5, 3) == 1
    assert effective_step(4, 0) == 4


@pytest.mark.parametrize("in_step", [1, 2, 4, 64, 3])
def test_in_step_invariance(in_step):
    """Results must be independent of the in_step memory knob
    (SURVEY.md §2.4: pure perf knob)."""
    x, off, mask, w, b = _inputs()
    base = modulated_deform_conv2d(x, off, mask, w, b, stride=1, padding=1,
                                   groups=2, deformable_groups=2, in_step=4)
    got = modulated_deform_conv2d(x, off, mask, w, b, stride=1, padding=1,
                                  groups=2, deformable_groups=2,
                                  in_step=in_step)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base), rtol=1e-6,
                               atol=1e-6)


def test_in_step_invariance_grads():
    x, off, mask, w, b = _inputs()

    def loss(in_step):
        def f(x, off, mask, w, b):
            return modulated_deform_conv2d(
                x, off, mask, w, b, stride=1, padding=1, groups=2,
                deformable_groups=2, in_step=in_step).sum()
        return jax.grad(f, argnums=(0, 1, 2, 3, 4))(x, off, mask, w, b)

    g1, g2 = loss(4), loss(1)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-5,
                                   atol=1e-5)


def test_backward_bitwise_deterministic():
    """Unlike the reference's atomicAdd scatter (nondeterministic summation
    order, SURVEY.md §5), our backward is bitwise reproducible."""
    x, off, mask, w, b = _inputs(seed=3)

    @jax.jit
    def grads(x, off, mask, w, b):
        return jax.grad(lambda *a: modulated_deform_conv2d(
            *a, stride=1, padding=1, groups=2, deformable_groups=2).sum(),
            argnums=(0, 1, 2, 3, 4))(x, off, mask, w, b)

    g1 = grads(x, off, mask, w, b)
    g2 = grads(x, off, mask, w, b)
    for a, b_ in zip(g1, g2):
        assert np.array_equal(np.asarray(a), np.asarray(b_))


def test_dtypes_bf16_close_to_fp32():
    x, off, mask, w, b = _inputs(seed=5)
    ref = modulated_deform_conv2d(x, off, mask, w, b, stride=1, padding=1,
                                  groups=2, deformable_groups=2)
    out = modulated_deform_conv2d(
        x.astype(jnp.bfloat16), off.astype(jnp.bfloat16),
        mask.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        b.astype(jnp.bfloat16), stride=1, padding=1, groups=2,
        deformable_groups=2)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               rtol=0.06, atol=0.06)


def test_fp16_supported():
    # reference dispatches fp16 too (AT_DISPATCH_FLOATING_TYPES_AND_HALF,
    # deformable_conv.cu:99)
    x, off, mask, w, b = _inputs(seed=6)
    out = modulated_deform_conv2d(
        x.astype(jnp.float16), off.astype(jnp.float16),
        mask.astype(jnp.float16), w.astype(jnp.float16), None, stride=1,
        padding=1, groups=2, deformable_groups=2)
    assert out.dtype == jnp.float16
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_shape_validation_errors():
    x, off, mask, w, b = _inputs()
    with pytest.raises(ValueError, match="offset shape"):
        deform_conv2d(x, off[:, :-1], w, None, stride=1, padding=1,
                      groups=2, deformable_groups=2)
    with pytest.raises(ValueError, match="mask shape"):
        modulated_deform_conv2d(x, off, mask[:, :-1], w, None, stride=1,
                                padding=1, groups=2, deformable_groups=2)
    with pytest.raises(ValueError, match="not divisible"):
        DeformConvSpec.make(2, 3, groups=3).validate(
            (1, 4, 5, 5), (1, 18, 3, 3), (4, 2, 3, 3))
    with pytest.raises(ValueError, match="in-channels"):
        deform_conv2d(x, off, jnp.ones((4, 4, 3, 3)), None, stride=1,
                      padding=1, groups=2, deformable_groups=2)


def test_jit_and_vmap_compose():
    x, off, mask, w, b = _inputs(B=2)
    f = jax.jit(lambda x, o, m: modulated_deform_conv2d(
        x, o, m, w, b, stride=1, padding=1, groups=2, deformable_groups=2))
    out = f(x, off, mask)
    # vmap over a leading replica axis
    xs = jnp.stack([x, x + 1])
    offs = jnp.stack([off, off])
    ms = jnp.stack([mask, mask])
    vout = jax.vmap(f)(xs, offs, ms)
    assert vout.shape == (2,) + out.shape
    np.testing.assert_allclose(np.asarray(vout[0]), np.asarray(out),
                               rtol=1e-6)


def test_bfloat16_inputs_both_impls():
    """bf16 inputs run on both paths (reference dispatches fp16 via
    AT_DISPATCH_FLOATING_TYPES_AND_HALF, deformable_conv.cu:99)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import modulated_deform_conv_tpu as mdc

    rng = np.random.default_rng(3)
    B, C, H, W, k, dg = 1, 16, 8, 8, 3, 2
    K = k * k
    x = jnp.asarray(rng.standard_normal((B, C, H, W)), jnp.bfloat16)
    off = jnp.asarray(rng.uniform(-1, 1, (B, dg * 2 * K, H, W)), jnp.bfloat16)
    m = jnp.asarray(rng.uniform(0, 1, (B, dg * K, H, W)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((C, C, k, k)), jnp.bfloat16)

    def loss(impl):
        def f(x, off, m, w):
            o = mdc.modulated_deform_conv2d(
                x, off, m, w, None, stride=1, padding=1,
                deformable_groups=dg, impl=impl)
            assert o.dtype == jnp.bfloat16
            return jnp.sum(o.astype(jnp.float32) ** 2)
        return f

    ref = float(jax.jit(loss("xla"))(x, off, m, w))
    got = float(jax.jit(loss("pallas"))(x, off, m, w))
    assert abs(got - ref) / (abs(ref) + 1e-9) < 0.05
    gs = jax.jit(jax.grad(loss("pallas"), argnums=(0, 1, 2, 3)))(x, off, m, w)
    assert all(g.dtype == jnp.bfloat16 for g in gs)


def test_float16_inputs_upcast():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import modulated_deform_conv_tpu as mdc

    rng = np.random.default_rng(4)
    B, C, H, W, k = 1, 8, 6, 6, 3
    K = k * k
    x = jnp.asarray(rng.standard_normal((B, C, H, W)), jnp.float16)
    off = jnp.zeros((B, 2 * K, H, W), jnp.float16)
    w = jnp.asarray(rng.standard_normal((C, C, k, k)), jnp.float16)
    out = jax.jit(lambda *a: mdc.deform_conv2d(
        *a, None, stride=1, padding=1, impl="pallas"))(x, off, w)
    assert out.dtype == jnp.float16


def test_float64_pallas_raises_auto_falls_back():
    """Dtype-matrix edge (VERDICT r2 item 7): the reference dispatches
    fp64 natively (deformable_conv.cu:99); here fp64 is an XLA-path-only
    dtype — impl='pallas' must raise LOUDLY (no silent downcast), and
    impl='auto' must fall back to the XLA path preserving float64."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest
    import modulated_deform_conv_tpu as mdc

    rng = np.random.default_rng(5)
    B, C, H, W, k = 1, 8, 6, 6, 3
    K = k * k
    with jax.enable_x64(True):
        x = jnp.asarray(rng.standard_normal((B, C, H, W)), jnp.float64)
        off = jnp.asarray(rng.uniform(-1, 1, (B, 2 * K, H, W)), jnp.float64)
        w = jnp.asarray(rng.standard_normal((C, C, k, k)), jnp.float64)
        with pytest.raises(NotImplementedError, match="dtype"):
            mdc.deform_conv2d(x, off, w, None, stride=1, padding=1,
                              impl="pallas")
        with pytest.raises(NotImplementedError, match="dtype"):
            mdc.deform_conv2d(x, off, w, None, stride=1, padding=1,
                              impl="shiftblend", offset_bound=1.0)
        out = mdc.deform_conv2d(x, off, w, None, stride=1, padding=1,
                                impl="auto")
        assert out.dtype == jnp.float64


def test_row_chunked_path_matches(monkeypatch):
    """Very large volumes chunk the leading output dim in the XLA path;
    results (fwd and grads) must match the unchunked computation."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import modulated_deform_conv_tpu as mdc
    from modulated_deform_conv_tpu.ops import core

    rng = np.random.default_rng(7)
    B, C, H, W, k, dg = 1, 8, 12, 7, 3, 1
    K = k * k
    x = jnp.asarray(rng.standard_normal((B, C, H, W)), jnp.float32)
    off = jnp.asarray(rng.uniform(-2, 2, (B, dg * 2 * K, H, W)), jnp.float32)
    m = jnp.asarray(rng.uniform(0, 1, (B, dg * K, H, W)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((C, C, k, k)), jnp.float32)

    def loss(x, off, m, w):
        o = mdc.modulated_deform_conv2d(x, off, m, w, None, stride=1,
                                        padding=1, impl="xla")
        return jnp.sum(o * o)

    want = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(x, off, m, w)
    out_ref = jax.jit(lambda *a: mdc.modulated_deform_conv2d(
        *a, None, stride=1, padding=1, impl="xla"))(x, off, m, w)

    monkeypatch.setattr(core, "_COL_BYTES_CAP", 8 * 1024)  # force chunking
    out_chunked = jax.jit(lambda *a: mdc.modulated_deform_conv2d(
        *a, None, stride=1, padding=1, impl="xla"))(x, off, m, w)
    np.testing.assert_allclose(np.asarray(out_chunked), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)
    got = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(x, off, m, w)
    for a, b, name in zip(got, want, ["x", "off", "mask", "w"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_debug_check_bounds_warns(capfd):
    """Opt-in runtime guard for the bounded-offset contract (VERDICT r4
    item 8): offsets beyond the declared bound print a jit-surviving
    warning; in-bound offsets stay silent."""
    x = jnp.ones((1, 8, 6, 6), jnp.float32)
    w = jnp.ones((8, 8, 3, 3), jnp.float32)
    big = jnp.full((1, 18, 6, 6), 3.5, jnp.float32)     # beyond bound 2.0
    small = jnp.full((1, 18, 6, 6), 0.5, jnp.float32)

    @jax.jit
    def run(off):
        return deform_conv2d(x, off, w, padding=1, offset_bound=2.0,
                             debug_check_bounds=True)

    run(big).block_until_ready()
    jax.effects_barrier()
    out = capfd.readouterr()
    assert "exceeds the declared offset_bound" in out.out + out.err

    run(small).block_until_ready()
    jax.effects_barrier()
    out = capfd.readouterr()
    assert "exceeds the declared offset_bound" not in out.out + out.err
