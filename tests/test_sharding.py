"""Multi-device tests on the simulated 8-device CPU mesh (SURVEY.md §4 item
5): batch + spatial sharding with halo exchange must reproduce the unsharded
op bit-for... within fp32 tolerance, including gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modulated_deform_conv_tpu import modulated_deform_conv2d, deform_conv2d
from modulated_deform_conv_tpu.parallel.sharding import (
    make_mesh, required_halo, sharded_deform_conv2d,
    sharded_modulated_deform_conv2d, sharded_deform_conv3d)
from modulated_deform_conv_tpu.utils.config import DeformConvSpec


def _case(B=4, C=4, O=4, H=16, W=8, k=3, dg=2, g=2, max_off=1.5, seed=0):
    rng = np.random.default_rng(seed)
    OH, OW = H, W  # stride 1, pad 1, k 3
    x = jnp.asarray(rng.standard_normal((B, C, H, W)), jnp.float32)
    off = jnp.asarray(
        rng.uniform(-max_off, max_off, (B, dg * 2 * k * k, OH, OW)),
        jnp.float32)
    mask = jnp.asarray(rng.uniform(0, 1, (B, dg * k * k, OH, OW)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((O, C // g, k, k)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.standard_normal((O,)), jnp.float32)
    return x, off, mask, w, b


def test_required_halo():
    spec = DeformConvSpec.make(2, 3, stride=1, padding=1)
    assert required_halo(spec, 0.0) == 1
    assert required_halo(spec, 2.3) == 4
    spec2 = DeformConvSpec.make(2, 3, stride=1, padding=0)
    # lower overshoot (k-1)*d+1-s-p = 2 dominates
    assert required_halo(spec2, 0.0) == 2


@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2), (2, 2), (1, 8)])
def test_sharded_modulated_2d_matches(mesh_shape):
    x, off, mask, w, b = _case()
    want = modulated_deform_conv2d(x, off, mask, w, b, stride=1, padding=1,
                                   groups=2, deformable_groups=2)
    mesh = make_mesh(mesh_shape, ("data", "space"))
    got = sharded_modulated_deform_conv2d(
        x, off, mask, w, b, mesh=mesh, stride=1, padding=1, groups=2,
        deformable_groups=2, max_offset=1.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                               atol=2e-5)


def test_sharded_plain_2d_matches():
    x, off, mask, w, b = _case(seed=2)
    want = deform_conv2d(x, off, w, None, stride=1, padding=1, groups=2,
                         deformable_groups=2)
    mesh = make_mesh((2, 4), ("data", "space"))
    got = sharded_deform_conv2d(x, off, w, None, mesh=mesh, stride=1,
                                padding=1, groups=2, deformable_groups=2,
                                max_offset=1.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                               atol=2e-5)


def test_sharded_grads_match():
    """Autodiff through shard_map + halo exchange: all five grads must match
    the unsharded grads (weight cotangent psummed across the mesh)."""
    x, off, mask, w, b = _case(B=2, H=8, W=8, seed=3)
    mesh = make_mesh((1, 8), ("data", "space"))

    def loss_unsharded(x, off, mask, w, b):
        return modulated_deform_conv2d(
            x, off, mask, w, b, stride=1, padding=1, groups=2,
            deformable_groups=2).var()

    def loss_sharded(x, off, mask, w, b):
        return sharded_modulated_deform_conv2d(
            x, off, mask, w, b, mesh=mesh, stride=1, padding=1, groups=2,
            deformable_groups=2, max_offset=1.5).var()

    g0 = jax.grad(loss_unsharded, argnums=(0, 1, 2, 3, 4))(x, off, mask, w, b)
    g1 = jax.grad(loss_sharded, argnums=(0, 1, 2, 3, 4))(x, off, mask, w, b)
    for a, b_ in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4,
                                   atol=2e-5)


def test_sharded_3d_matches():
    from modulated_deform_conv_tpu import deform_conv3d
    rng = np.random.default_rng(5)
    B, C, O, k = 2, 2, 2, 3
    S = (8, 6, 6)
    K = k ** 3
    x = jnp.asarray(rng.standard_normal((B, C) + S), jnp.float32)
    off = jnp.asarray(rng.uniform(-1.0, 1.0, (B, 3 * K) + S), jnp.float32)
    w = jnp.asarray(rng.standard_normal((O, C, k, k, k)) * 0.3, jnp.float32)
    want = deform_conv3d(x, off, w, None, stride=1, padding=1)
    mesh = make_mesh((2, 4), ("data", "space"))
    got = sharded_deform_conv3d(x, off, w, None, mesh=mesh, stride=1,
                                padding=1, max_offset=1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                               atol=2e-5)


def test_out_of_halo_contract_drops_taps():
    """Offsets genuinely beyond the halo: the sharded op must treat those
    samples as out-of-image (documented bounded-offset contract,
    sharding.py module docstring), matching an oracle where the same taps
    are explicitly gated out; in-contract positions stay exact."""
    x, off, mask, w, b = _case(max_off=1.0, seed=7)  # halo will be 2
    mesh = make_mesh((1, 8), ("data", "space"))
    # Shards: H=16 over 8 shards -> 2 rows/shard, halo=2 -> each local
    # block covers global rows [2i-2, 2i+4).  An h-offset of +5 at output
    # row 0 sends every tap to global rows {4,5,6}: inside the image (the
    # unsharded op samples them) but fully past shard 0's halo.
    off = np.asarray(off)
    off_violate = off.copy()
    off_violate[:, 0::2, 0, :] = 5.0          # all taps' h-offsets at oh=0
    # Oracle: the same taps pushed out of the *image* so the open-interval
    # gate (deformable_conv.cu:78) drops them in the unsharded op too.
    off_gated = off.copy()
    off_gated[:, 0::2, 0, :] = -1000.0

    def sharded(o):
        return sharded_modulated_deform_conv2d(
            x, jnp.asarray(o), mask, w, b, mesh=mesh, stride=1, padding=1,
            groups=2, deformable_groups=2, max_offset=1.0)

    got = sharded(off_violate)
    want = modulated_deform_conv2d(x, jnp.asarray(off_gated), mask, w, b,
                                   stride=1, padding=1, groups=2,
                                   deformable_groups=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                               atol=2e-5)
    # The violating output differs from the naive unsharded result (the
    # contract is a real behavioral boundary, not a no-op).
    naive = modulated_deform_conv2d(x, jnp.asarray(off_violate), mask, w, b,
                                    stride=1, padding=1, groups=2,
                                    deformable_groups=2)
    assert float(jnp.max(jnp.abs(naive - got))) > 1e-3
    # Gradients also honor the gate: d(out)/d(offset) is zero for the
    # dropped taps in the sharded op.
    g_sh = jax.grad(lambda o: sharded(o).var())(jnp.asarray(off_violate))
    assert float(jnp.max(jnp.abs(np.asarray(g_sh)[:, 0::2, 0, :]))) == 0.0


def test_required_halo_stride2_edges():
    # stride 2, k 3, pad 1: upper halo p+m, lower (k-1)d+1-s-p+m = 0+m.
    spec = DeformConvSpec.make(2, 3, stride=2, padding=1)
    assert required_halo(spec, 0.0) == 1
    assert required_halo(spec, 1.5) == 3
    # stride 2, k 2, pad 0: footprint (k-1)+1-s-p = 0 -> halo = m only.
    spec2 = DeformConvSpec.make(2, 2, stride=2, padding=0)
    assert required_halo(spec2, 0.0) == 0
    assert required_halo(spec2, 0.5) == 1


@pytest.mark.parametrize("mesh_shape,axes", [
    ((2, 2), ("data", "group")),
    ((1, 2), ("data", "group")),
])
def test_group_aligned_tp_matches(mesh_shape, axes):
    """Group-aligned TP: mesh axis divides groups and deformable_groups —
    input channels, weight O, offsets and output all shard; no collectives
    (the reference's per-group GEMM split, deformable_conv.cu:163-180)."""
    x, off, mask, w, b = _case(C=8, O=8, g=2, dg=2, seed=11)
    want = modulated_deform_conv2d(x, off, mask, w, b, stride=1, padding=1,
                                   groups=2, deformable_groups=2)
    mesh = make_mesh(mesh_shape, axes)
    got = sharded_modulated_deform_conv2d(
        x, off, mask, w, b, mesh=mesh, stride=1, padding=1, groups=2,
        deformable_groups=2, group_axis="group", spatial_axis=None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                               atol=2e-5)


@pytest.mark.slow
def test_within_group_tp_matches_with_grads():
    """Within-group TP (groups=1): weight/output shard along O, inputs are
    replicated on the axis; grad_x/grad_offset/grad_mask psum across it."""
    x, off, mask, w, b = _case(C=4, O=8, g=1, dg=2, seed=12)
    mesh = make_mesh((2, 4), ("data", "group"))

    def unsharded(x, off, mask, w, b):
        return modulated_deform_conv2d(x, off, mask, w, b, stride=1,
                                       padding=1, groups=1,
                                       deformable_groups=2)

    def sharded(x, off, mask, w, b):
        return sharded_modulated_deform_conv2d(
            x, off, mask, w, b, mesh=mesh, stride=1, padding=1, groups=1,
            deformable_groups=2, group_axis="group", spatial_axis=None)

    np.testing.assert_allclose(np.asarray(sharded(x, off, mask, w, b)),
                               np.asarray(unsharded(x, off, mask, w, b)),
                               rtol=2e-5, atol=2e-5)
    g0 = jax.grad(lambda *a: unsharded(*a).var(), argnums=(0, 1, 2, 3, 4))(
        x, off, mask, w, b)
    g1 = jax.grad(lambda *a: sharded(*a).var(), argnums=(0, 1, 2, 3, 4))(
        x, off, mask, w, b)
    for a, b_ in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4,
                                   atol=2e-5)


def test_group_plus_spatial_tp_matches():
    """3-way mesh: data x space x group with halo exchange composing with
    the group-aligned channel sharding."""
    x, off, mask, w, b = _case(C=8, O=8, g=2, dg=2, max_off=1.0, seed=13)
    want = modulated_deform_conv2d(x, off, mask, w, b, stride=1, padding=1,
                                   groups=2, deformable_groups=2)
    mesh = make_mesh((2, 2, 2), ("data", "space", "group"))
    got = sharded_modulated_deform_conv2d(
        x, off, mask, w, b, mesh=mesh, stride=1, padding=1, groups=2,
        deformable_groups=2, group_axis="group", max_offset=1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                               atol=2e-5)


def test_group_axis_invalid_raises():
    x, off, mask, w, b = _case(C=4, O=4, g=2, dg=2)
    mesh = make_mesh((1, 8), ("data", "group"))
    with pytest.raises(ValueError, match="group_axis"):
        sharded_modulated_deform_conv2d(
            x, off, mask, w, b, mesh=mesh, stride=1, padding=1, groups=2,
            deformable_groups=2, group_axis="group", spatial_axis=None)


def test_spatial_misalignment_raises():
    x, off, mask, w, b = _case(H=12)  # 12 % 8 != 0
    mesh = make_mesh((1, 8), ("data", "space"))
    with pytest.raises(ValueError, match="not divisible"):
        sharded_modulated_deform_conv2d(x, off, mask, w, b, mesh=mesh,
                                        stride=1, padding=1, groups=2,
                                        deformable_groups=2)


@pytest.mark.slow
def test_spatial_shiftblend_lead_matches():
    """The bounded-offset shift-blend kernel inside spatial shards (lead
    mode: halo-extended blocks, global-coordinate gates, traced origin)
    matches the unsharded op for outputs and all gradients."""
    x, off, mask, w, b = _case(C=16, O=16, g=2, dg=2)  # Cg=8: sb-eligible
    mesh = make_mesh((1, 4), ("data", "space"))
    kw = dict(stride=1, padding=1, groups=2, deformable_groups=2)

    def sharded(*a):
        return sharded_modulated_deform_conv2d(
            *a, mesh=mesh, max_offset=1.5, impl="shiftblend",
            precision="float32", **kw)

    def plain(*a):
        return modulated_deform_conv2d(*a, precision="float32", **kw)

    got = sharded(x, off, mask, w, b)
    want = plain(x, off, mask, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    def loss(f, *a):
        return jnp.sum(jnp.square(f(*a)))

    gs = jax.grad(lambda *a: loss(sharded, *a), argnums=(0, 1, 2, 3, 4))(
        x, off, mask, w, b)
    gp = jax.grad(lambda *a: loss(plain, *a), argnums=(0, 1, 2, 3, 4))(
        x, off, mask, w, b)
    for name, a_, b_ in zip(["gx", "goff", "gmask", "gw", "gb"], gs, gp):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=3e-4, atol=3e-4, err_msg=name)


def test_sharded_w_axis_matches_with_grads():
    """Non-leading spatial axis (W) sharding: spatial_axis=(None, "space")
    shards dim 1 with its own halo exchange; outputs and all five grads
    match the unsharded op (sampling contract deformable_conv.cu:76-77)."""
    x, off, mask, w, b = _case(H=8, W=16, seed=21)
    mesh = make_mesh((2, 4), ("data", "space"))
    kw = dict(stride=1, padding=1, groups=2, deformable_groups=2)

    def unsharded(*a):
        return modulated_deform_conv2d(*a, **kw)

    def sharded(*a):
        return sharded_modulated_deform_conv2d(
            *a, mesh=mesh, max_offset=1.5, spatial_axis=(None, "space"),
            **kw)

    np.testing.assert_allclose(np.asarray(sharded(x, off, mask, w, b)),
                               np.asarray(unsharded(x, off, mask, w, b)),
                               rtol=2e-5, atol=2e-5)
    g0 = jax.grad(lambda *a: unsharded(*a).var(), argnums=(0, 1, 2, 3, 4))(
        x, off, mask, w, b)
    g1 = jax.grad(lambda *a: sharded(*a).var(), argnums=(0, 1, 2, 3, 4))(
        x, off, mask, w, b)
    for name, a_, b_ in zip(["gx", "goff", "gmask", "gw", "gb"], g0, g1):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_sharded_2axis_spatial_mesh_matches_with_grads():
    """(H, W) sharding on a 2-axis spatial mesh: two ring halo exchanges
    (the second carries the first's halo rows, filling corner blocks);
    outputs and grads match the unsharded op."""
    x, off, mask, w, b = _case(H=16, W=8, seed=22)
    mesh = make_mesh((2, 2, 2), ("data", "sh", "sw"))
    kw = dict(stride=1, padding=1, groups=2, deformable_groups=2)

    def unsharded(*a):
        return modulated_deform_conv2d(*a, **kw)

    def sharded(*a):
        return sharded_modulated_deform_conv2d(
            *a, mesh=mesh, max_offset=1.5, spatial_axis=("sh", "sw"), **kw)

    np.testing.assert_allclose(np.asarray(sharded(x, off, mask, w, b)),
                               np.asarray(unsharded(x, off, mask, w, b)),
                               rtol=2e-5, atol=2e-5)
    g0 = jax.grad(lambda *a: unsharded(*a).var(), argnums=(0, 1, 2, 3, 4))(
        x, off, mask, w, b)
    g1 = jax.grad(lambda *a: sharded(*a).var(), argnums=(0, 1, 2, 3, 4))(
        x, off, mask, w, b)
    for name, a_, b_ in zip(["gx", "goff", "gmask", "gw", "gb"], g0, g1):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_sharded_3d_last_axis_matches():
    """3D op sharded on the LAST spatial dim (L) — the non-leading-axis
    contract at nd=3."""
    from modulated_deform_conv_tpu import deform_conv3d
    rng = np.random.default_rng(23)
    B, C, O, k = 2, 2, 2, 3
    S = (6, 6, 8)
    K = k ** 3
    x = jnp.asarray(rng.standard_normal((B, C) + S), jnp.float32)
    off = jnp.asarray(rng.uniform(-1.0, 1.0, (B, 3 * K) + S), jnp.float32)
    w = jnp.asarray(rng.standard_normal((O, C, k, k, k)) * 0.3, jnp.float32)
    want = deform_conv3d(x, off, w, None, stride=1, padding=1)
    mesh = make_mesh((1, 8), ("data", "space"))
    got = sharded_deform_conv3d(x, off, w, None, mesh=mesh, stride=1,
                                padding=1, max_offset=1.0,
                                spatial_axis=(None, None, "space"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                               atol=2e-5)


def test_spatial_axis_too_many_dims_raises():
    x, off, mask, w, b = _case()
    mesh = make_mesh((1, 8), ("data", "space"))
    with pytest.raises(ValueError, match="names 3 dims"):
        sharded_modulated_deform_conv2d(
            x, off, mask, w, b, mesh=mesh, stride=1, padding=1, groups=2,
            deformable_groups=2, max_offset=1.0,
            spatial_axis=(None, None, "space"))


def test_batch_sharded_offset_bound_dispatch():
    """With max_offset > 0 the batch-sharded path forwards the bound as
    the kernel dispatch's offset_bound; forcing impl="shiftblend" must
    produce the same results as the XLA path for in-bound offsets."""
    x, off, mask, w, b = _case(C=16, O=16, g=2, dg=2)
    mesh = make_mesh((4, 1), ("data", "space"))
    kw = dict(stride=1, padding=1, groups=2, deformable_groups=2)
    got = sharded_modulated_deform_conv2d(
        x, off, mask, w, b, mesh=mesh, max_offset=1.5, impl="shiftblend",
        precision="float32", **kw)
    want = modulated_deform_conv2d(x, off, mask, w, b, precision="float32",
                                   **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_sharded_zero_offset_edge_grads_match():
    """Zero offsets put boundary taps exactly at the reference gate's
    open-interval endpoint pos == -1 (deformable_conv.cu:78), where the
    subgradient is zero; a zero-filled halo row reproduces the value but
    not the zero offset-gradient.  The sharded path must pass the GLOBAL
    gate through (gate_bounds) so offset grads match the unsharded op."""
    x, off0, mask, w, b = _case(H=8, W=8, seed=31)
    off = jnp.zeros_like(off0)
    mesh = make_mesh((1, 8), ("data", "space"))
    kw = dict(stride=1, padding=1, groups=2, deformable_groups=2)

    def loss_un(x, off, mask, w, b):
        return jnp.mean(modulated_deform_conv2d(x, off, mask, w, b, **kw))

    def loss_sh(x, off, mask, w, b):
        return jnp.mean(sharded_modulated_deform_conv2d(
            x, off, mask, w, b, mesh=mesh, max_offset=1.0, **kw))

    want = jax.grad(loss_un, argnums=(0, 1, 2, 3, 4))(x, off, mask, w, b)
    got = jax.grad(loss_sh, argnums=(0, 1, 2, 3, 4))(x, off, mask, w, b)
    for name, gw, gg in zip(("x", "off", "mask", "w", "b"), want, got):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                   rtol=3e-5, atol=3e-6, err_msg=name)


def test_forced_shiftblend_non_lead_dim_raises():
    """Forced impl="shiftblend" must raise (not silently fall through to
    auto dispatch) when the shard layout is outside the lead-mode kernel's
    coverage: non-leading-dim or multi-axis spatial sharding (ADVICE r4).
    Cg = 8 here so the slab itself IS shiftblend-eligible — only the shard
    layout is not."""
    x, off, mask, w, b = _case(C=16, O=16, W=16, dg=2)
    mesh = make_mesh((1, 8), ("data", "space"))
    kw = dict(stride=1, padding=1, groups=2, deformable_groups=2,
              max_offset=1.0, impl="shiftblend")
    with pytest.raises(NotImplementedError, match="leading-dim"):
        sharded_modulated_deform_conv2d(x, off, mask, w, b, mesh=mesh,
                                        spatial_axis=(None, "space"), **kw)
