"""Shift-blend kernel (ops/pallas/shiftblend.py) vs the XLA oracle.

Interpreter-mode parity for forward + all gradients, the bounded-offset
contract (out-of-window taps are dropped like the reference's out-of-image
gate, deformable_conv.cu:78), and dispatch/eligibility behavior.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import modulated_deform_conv_tpu as mdc
from modulated_deform_conv_tpu.ops import core
from modulated_deform_conv_tpu.ops.pallas import shiftblend as sb
from modulated_deform_conv_tpu.utils.config import DeformConvSpec

RNG = np.random.default_rng(7)


def _inputs(nd, B, C, S, k, g, dg, modulated, offscale, dil=1):
    kt = (k,) * nd
    pad = (dil * (k - 1)) // 2
    spec = DeformConvSpec.make(nd, kt, 1, pad, dil, g, dg, 64,
                               modulated=modulated)
    OS = spec.out_sizes(S)
    K = spec.tap_count
    x = jnp.asarray(RNG.standard_normal((B, C) + tuple(S)), jnp.float32)
    off = jnp.asarray(RNG.uniform(-offscale, offscale,
                                  (B, dg * nd * K) + OS), jnp.float32)
    m = (jnp.asarray(RNG.uniform(0, 1, (B, dg * K) + OS), jnp.float32)
         if modulated else None)
    w = jnp.asarray(RNG.standard_normal((C, C // g) + kt) * 0.1, jnp.float32)
    return spec, x, off, m, w


def test_forward_matches_oracle_2d():
    spec, x, off, m, w = _inputs(2, 2, 16, (8, 9), 3, 2, 2, True, 1.9)
    ref = core.deform_conv_nd(x, off, m, w, None, spec)
    got = sb.shift_conv_fwd_only(x, off, m, w, None, spec, "float32", 2.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_grads_match_oracle_2d():
    spec, x, off, m, w = _inputs(2, 1, 8, (8, 8), 3, 1, 1, True, 0.9)

    def loss_sb(x, off, m, w):
        out = sb.shift_conv(x, off, m, w, jnp.float32(0), spec, "float32", 1.0)
        return jnp.sum(out * jnp.cos(out))

    def loss_ref(x, off, m, w):
        out = core.deform_conv_nd(x, off, m, w, None, spec)
        return jnp.sum(out * jnp.cos(out))

    gs = jax.grad(loss_sb, argnums=(0, 1, 2, 3))(x, off, m, w)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, off, m, w)
    for name, a, b in zip(("gx", "goff", "gmask", "gw"), gs, gr):
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=0, atol=3e-6, err_msg=name)


@pytest.mark.slow
def test_grads_match_oracle_2d_plain():
    """Non-modulated 2D backward (coverage gap found in r3: the modulated
    variants exercised different sweep-2 branches)."""
    spec, x, off, m, w = _inputs(2, 1, 8, (6, 7), 3, 1, 1, False, 1.5)

    def loss_sb(x, off, w):
        mm = jnp.zeros((0,), jnp.float32)
        return jnp.sum(jnp.square(sb.shift_conv(
            x, off, mm, w, jnp.float32(0), spec, "float32", 2.0)))

    def loss_ref(x, off, w):
        return jnp.sum(jnp.square(core.deform_conv_nd(
            x, off, None, w, None, spec)))

    g1 = jax.grad(loss_sb, argnums=(0, 1, 2))(x, off, w)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, off, w)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_grads_match_oracle_3d():
    spec, x, off, m, w = _inputs(3, 1, 8, (4, 5, 6), 3, 1, 1, False, 0.45)

    def loss_sb(x, off, w):
        out = sb.shift_conv(x, off, jnp.zeros((0,), x.dtype), w,
                            jnp.float32(0), spec,
                            "float32", 0.5)
        return jnp.sum(out * out)

    def loss_ref(x, off, w):
        out = core.deform_conv_nd(x, off, None, w, None, spec)
        return jnp.sum(out * out)

    gs = jax.grad(loss_sb, argnums=(0, 1, 2))(x, off, w)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, off, w)
    for name, a, b in zip(("gx", "goff", "gw"), gs, gr):
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=0, atol=3e-6, err_msg=name)


def test_out_of_bound_offsets_drop_taps():
    """Offsets beyond offset_bound lose the tap's contribution — exactly
    like the reference's open-interval gate drops off-image taps."""
    spec, x, off, m, w = _inputs(2, 1, 8, (9, 9), 3, 1, 1, False, 0.4)
    off = np.asarray(off)
    # Send tap f=4 (center) at one output position far out of the window.
    off_big = off.copy()
    off_big[0, 8, 4, 4] = 5.0       # channel 2*f = 8 -> tap 4, dim 0
    # Oracle with the same tap pushed out of the image entirely (gate=0).
    off_gated = off.copy()
    off_gated[0, 8, 4, 4] = -100.0
    got = sb.shift_conv_fwd_only(jnp.asarray(x), jnp.asarray(off_big), None,
                                 w, None, spec, "float32", 0.5)
    ref = core.deform_conv_nd(x, jnp.asarray(off_gated), None, w, None, spec)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_dispatch_and_eligibility():
    spec, x, off, m, w = _inputs(2, 1, 8, (8, 8), 3, 1, 1, True, 0.9)
    # No offset_bound -> shiftblend unavailable, impl="shiftblend" raises.
    with pytest.raises(NotImplementedError, match="offset_bound"):
        mdc.modulated_deform_conv2d(x, off, m, w, None, stride=1, padding=1,
                                    impl="shiftblend")
    # Stride 2 -> ineligible.
    assert sb.ineligible_reason(
        x, DeformConvSpec.make(2, 3, 2, 1, 1, 1, 1, modulated=True),
        2.0) is not None
    # Valid-conv (OS != S) -> ineligible.
    assert sb.ineligible_reason(
        x, DeformConvSpec.make(2, 3, 1, 0, 1, 1, 1, modulated=True),
        2.0) is not None
    # Eligible config reachable through the public API.
    out = mdc.modulated_deform_conv2d(x, off, m, w, None, stride=1,
                                      padding=1, impl="shiftblend",
                                      offset_bound=1.0)
    ref = mdc.modulated_deform_conv2d(x, off, m, w, None, stride=1,
                                      padding=1, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_loop_path_3d_matches():
    """Rolled-loop kernels (window too large to unroll; needs a
    128-aligned plane stride) match the oracle for forward + grads."""
    spec, x, off, m, w = _inputs(3, 1, 8, (4, 8, 16), 3, 1, 1, True, 0.45)
    plan = sb.SBPlan(spec, 1, 8, (4, 8, 16), (4, 8, 16), 0.5)
    assert not plan.unrolled          # 729 pairs -> loop path

    def loss_sb(x, off, m, w):
        out = sb.shift_conv(x, off, m, w, jnp.float32(0), spec, "float32", 0.5)
        return jnp.sum(out * jnp.cos(out))

    def loss_ref(x, off, m, w):
        out = core.deform_conv_nd(x, off, m, w, None, spec)
        return jnp.sum(out * jnp.cos(out))

    gs = jax.grad(loss_sb, argnums=(0, 1, 2, 3))(x, off, m, w)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, off, m, w)
    for name, a, b in zip(("gx", "goff", "gmask", "gw"), gs, gr):
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=0, atol=3e-6, err_msg=name)


@pytest.mark.slow
def test_lead_chunked_matches(monkeypatch):
    """Leading-axis halo chunking (large-volume path) matches the oracle
    for forward + grads, including the cross-block grad_x halo sums."""
    monkeypatch.setattr(sb, "_X_RESIDENT_BUDGET", 40 * 1024)
    spec, x, off, m, w = _inputs(2, 1, 8, (12, 8), 3, 1, 1, True, 0.9)
    assert sb._choose_lead(x, spec, 1.0) is not None

    def loss_sb(x, off, m, w):
        out = sb.deform_conv_shift(x, off, m, w, None, spec, "float32", 1.0)
        return jnp.sum(out * jnp.cos(out))

    def loss_ref(x, off, m, w):
        out = core.deform_conv_nd(x, off, m, w, None, spec)
        return jnp.sum(out * jnp.cos(out))

    gs = jax.grad(loss_sb, argnums=(0, 1, 2, 3))(x, off, m, w)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, off, m, w)
    for name, a, b in zip(("gx", "goff", "gmask", "gw"), gs, gr):
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=0, atol=3e-6, err_msg=name)


@pytest.mark.slow
def test_no_save_cols_recompute_matches(monkeypatch):
    """Oversized residual policy: columns/coefficients recomputed in the
    backward (loop path) still give exact grads."""
    monkeypatch.setattr(sb, "_RESIDUAL_BUDGET", 1024)
    spec, x, off, m, w = _inputs(3, 1, 8, (4, 8, 16), 3, 1, 1, True, 0.45)

    def loss_sb(x, off, m, w):
        out = sb.shift_conv(x, off, m, w, jnp.float32(0), spec, "float32", 0.5)
        return jnp.sum(jnp.cos(out))

    def loss_ref(x, off, m, w):
        out = core.deform_conv_nd(x, off, m, w, None, spec)
        return jnp.sum(jnp.cos(out))

    gs = jax.grad(loss_sb, argnums=(0, 1, 2, 3))(x, off, m, w)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, off, m, w)
    for name, a, b in zip(("gx", "goff", "gmask", "gw"), gs, gr):
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=0, atol=3e-6, err_msg=name)


def test_offsets_within_bound_validator():
    off = jnp.zeros((1, 18, 4, 4), jnp.float32)
    assert bool(sb.offsets_within_bound(off, 1.0))
    off2 = off.at[0, 3, 2, 2].set(1.5)
    assert not bool(sb.offsets_within_bound(off2, 1.0))
    # per-axis bounds: channel nd*f+d layout (d=0 is h)
    off3 = off.at[0, 0, 1, 1].set(1.8)      # h-offset
    assert bool(sb.offsets_within_bound(off3, (2.0, 1.0)))
    off4 = off.at[0, 1, 1, 1].set(1.8)      # w-offset
    assert not bool(sb.offsets_within_bound(off4, (2.0, 1.0)))


def test_grad_mask_exact_at_zero_mask():
    """grad_mask must equal sum_c grad_col * UNMASKED sampled value even
    where mask == 0 (reference mdeformable_conv.cu:315; the kernels save
    MASKED columns, so grad_mask comes from the r0_nm identity instead —
    this pins that it stays correct when entire mask rows are zero)."""
    spec, x, off, m, w = _inputs(2, 1, 16, (8, 8), 3, 1, 1, True, 1.7)
    m = m.at[0, 2].set(0.0)            # whole tap's mask plane zero
    m = m.at[0, :, 3, 4].set(0.0)      # one output position, all taps

    def loss_sb(m):
        out = sb.shift_conv(x, off, m, w, jnp.float32(0), spec,
                            "float32", 2.0)
        return jnp.sum(jnp.sin(out))

    def loss_ref(m):
        out = core.deform_conv_nd(x, off, m, w, None, spec)
        return jnp.sum(jnp.sin(out))

    gm_sb = jax.grad(loss_sb)(m)
    gm_ref = jax.grad(loss_ref)(m)
    # Nonzero gradient at the zeroed-mask entries (the whole point).
    assert float(jnp.max(jnp.abs(gm_ref[0, 2]))) > 1e-3
    scale = float(jnp.max(jnp.abs(gm_ref))) + 1e-9
    np.testing.assert_allclose(np.asarray(gm_sb) / scale,
                               np.asarray(gm_ref) / scale,
                               rtol=0, atol=3e-6)


def test_per_axis_offset_bound():
    """Tuple offset_bound: independent windows per axis (W = 2b+1 at
    integer bounds); grads and outputs match the oracle when offsets
    respect the per-axis contract."""
    spec, x, off, m, w = _inputs(2, 1, 16, (9, 10), 3, 1, 1, True, 1.0)
    # h-offsets up to +-1.9, w-offsets up to +-0.9
    off = off.at[:, 0::2].mul(1.9)
    off = off.at[:, 1::2].mul(0.9)

    def loss_sb(x, off, m, w):
        out = sb.shift_conv(x, off, m, w, jnp.float32(0), spec,
                            "float32", (2.0, 1.0))
        return jnp.sum(jnp.sin(out))

    def loss_ref(x, off, m, w):
        out = core.deform_conv_nd(x, off, m, w, None, spec)
        return jnp.sum(jnp.sin(out))

    plan = sb.SBPlan(spec, 1, 16, (9, 10), (9, 10), (2.0, 1.0))
    assert plan.W == (5, 3)      # integer bounds: 2b+1 rows per axis
    gs = jax.grad(loss_sb, argnums=(0, 1, 2, 3))(x, off, m, w)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, off, m, w)
    for name, a, b in zip(("gx", "goff", "gmask", "gw"), gs, gr):
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=0, atol=3e-6, err_msg=name)


def test_blk_exact_fit_selection():
    """r5 block rule: the unrolled path picks the 128-multiple in
    [256, 768] minimizing PPAD (pad lanes are pure sweep waste; cfg2's
    P=3136 pads 14% at 512 but 2% at 640 - measured ~9% faster), ties
    break toward 512."""
    spec = DeformConvSpec.make(2, 3, 1, 1, 1, 1, 1, 64, modulated=True)
    p = sb.SBPlan(spec, 1, 8, (56, 56), (56, 56), 2.0)   # P=3136
    assert (p.BLK, p.PPAD, p.NT) == (640, 3200, 5)
    p = sb.SBPlan(spec, 1, 8, (64, 64), (64, 64), 2.0)   # P=4096: tie->512
    assert (p.BLK, p.PPAD) == (512, 4096)
    p = sb.SBPlan(spec, 1, 8, (5, 5), (5, 5), 2.0)       # tiny P
    assert p.BLK == 128


def test_wrow_base_mapping_bijective():
    """r5 packed expanded-row layout: every (axis, dy, tap) row maps to a
    distinct flat row inside the (NWK, BLK) scratch, axis blocks are
    8-aligned, and wrow_base agrees with row0k + dy*K."""
    for nd, S in ((2, (8, 8)), (3, (4, 6, 8))):
        spec = DeformConvSpec.make(nd, 3, 1, 1, 1, 1, 1, 64, modulated=True)
        p = sb.SBPlan(spec, 1, 8, S, S, 1.5)
        seen = set()
        for d in range(nd):
            assert p.row0k[d] % 8 == 0
            for dy in range(p.W[d]):
                base = p.wrow_base[p.row0[d] + dy]
                assert base == p.row0k[d] + dy * p.K
                for k in range(p.K):
                    row = base + k
                    assert 0 <= row < p.NWK
                    assert row not in seen
                    seen.add(row)
        assert len(seen) == sum(p.W[d] for d in range(nd)) * p.K
