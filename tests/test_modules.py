"""Module-layer tests: the eight flax modules (4 explicit-offset + 4 Pack),
parameter shapes/init matching the reference (modulated_deform_conv.py:
375-392, 734-748), and the opt-in Pack fixes."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modulated_deform_conv_tpu.models.modules import (
    DeformConv2d, ModulatedDeformConv2d, DeformConv3d, ModulatedDeformConv3d,
    DeformConv2dPack, ModulatedDeformConv2dPack, DeformConv3dPack,
    ModulatedDeformConv3dPack)


def test_explicit_modules_2d():
    x = jnp.ones((2, 4, 6, 6))
    off = jnp.zeros((2, 18, 6, 6))
    mask = jnp.ones((2, 9, 6, 6))
    m = DeformConv2d(in_channels=4, out_channels=6, kernel_size=3, padding=1,
                     use_bias=True)
    p = m.init(jax.random.key(0), x, off)
    assert p["params"]["weight"].shape == (6, 4, 3, 3)
    assert p["params"]["bias"].shape == (6,)
    assert m.apply(p, x, off).shape == (2, 6, 6, 6)

    mm = ModulatedDeformConv2d(in_channels=4, out_channels=6, kernel_size=3,
                               padding=1)
    pm = mm.init(jax.random.key(0), x, off, mask)
    assert "bias" not in pm["params"]  # reference default bias=False (:355)
    assert mm.apply(pm, x, off, mask).shape == (2, 6, 6, 6)


def test_explicit_modules_3d():
    x = jnp.ones((1, 4, 4, 4, 4))
    off = jnp.zeros((1, 2 * 3 * 27, 4, 4, 4))
    mask = jnp.ones((1, 2 * 27, 4, 4, 4))
    m = DeformConv3d(in_channels=4, out_channels=4, kernel_size=3, padding=1,
                     deformable_groups=2)
    p = m.init(jax.random.key(0), x, off)
    assert m.apply(p, x, off).shape == (1, 4, 4, 4, 4)
    mm = ModulatedDeformConv3d(in_channels=4, out_channels=4, kernel_size=3,
                               padding=1, deformable_groups=2, groups=2)
    pm = mm.init(jax.random.key(0), x, off, mask)
    assert pm["params"]["weight"].shape == (4, 2, 3, 3, 3)
    assert mm.apply(pm, x, off, mask).shape == (1, 4, 4, 4, 4)


@pytest.mark.parametrize("cls,nd,modulated", [
    (DeformConv2dPack, 2, False), (ModulatedDeformConv2dPack, 2, True),
    (DeformConv3dPack, 3, False), (ModulatedDeformConv3dPack, 3, True)])
def test_pack_modules(cls, nd, modulated):
    C, O, dg, k = 4, 4, 2, 3
    K = k ** nd
    x = jnp.ones((1, C) + (5,) * nd)
    m = cls(in_channels=C, out_channels=O, kernel_size=k, padding=1,
            deformable_groups=dg, use_bias=True)
    p = m.init(jax.random.key(0), x)
    params = p["params"]
    # predictor convs exist with the right shapes (regression test: the
    # modulated Pack must own BOTH conv_offset and conv_mask)
    assert params["conv_offset"]["weight"].shape == \
        (dg * nd * K, C) + (k,) * nd
    assert ("conv_mask" in params) == modulated
    if modulated:
        assert params["conv_mask"]["weight"].shape == (dg * K, C) + (k,) * nd
    out = m.apply(p, x)
    assert out.shape == (1, O) + (5,) * nd
    assert np.isfinite(np.asarray(out)).all()


def test_init_matches_reference_distribution():
    """weight ~ U(-s, s), s = 1/sqrt(C*prod(k)); offset conv same; biases 0
    (reference reset_parameters :385-392, init_offset :741-748)."""
    C, k = 8, 3
    m = ModulatedDeformConv2dPack(in_channels=C, out_channels=16,
                                  kernel_size=k, padding=1, use_bias=True)
    p = m.init(jax.random.key(3), jnp.ones((1, C, 8, 8)))["params"]
    s = 1.0 / math.sqrt(C * k * k)
    for path in ["weight", ("conv_offset", "weight"), ("conv_mask", "weight")]:
        w = p[path[0]][path[1]] if isinstance(path, tuple) else p[path]
        w = np.asarray(w)
        assert np.abs(w).max() <= s + 1e-7
        assert np.abs(w).max() > 0.5 * s  # actually spread out
    assert np.all(np.asarray(p["bias"]) == 0)
    assert np.all(np.asarray(p["conv_offset"]["bias"]) == 0)
    assert np.all(np.asarray(p["conv_mask"]["bias"]) == 0)


def test_pack_optin_fixes():
    x = jnp.ones((1, 4, 6, 6))
    m = ModulatedDeformConv2dPack(in_channels=4, out_channels=4,
                                  kernel_size=3, padding=1,
                                  zero_init_offset=True, sigmoid_mask=True)
    p = m.init(jax.random.key(0), x)
    assert float(jnp.abs(p["params"]["conv_offset"]["weight"]).max()) == 0.0
    assert float(jnp.abs(p["params"]["conv_mask"]["weight"]).max()) == 0.0
    # zero offsets + sigmoid(0)=0.5 masks => output = 0.5 * plain conv
    out = m.apply(p, x)
    plain = DeformConv2dPack(in_channels=4, out_channels=4, kernel_size=3,
                             padding=1, zero_init_offset=True)
    pp = plain.init(jax.random.key(0), x)
    # share the main weight to compare
    pp = {"params": {**pp["params"], "weight": p["params"]["weight"]}}
    np.testing.assert_allclose(np.asarray(out),
                               0.5 * np.asarray(plain.apply(pp, x)),
                               rtol=1e-5, atol=1e-6)


def test_pack_matches_functional_composition():
    """Pack forward == predictor convs + explicit-offset op (call-stack 3.5
    in SURVEY.md)."""
    import numpy as np
    from modulated_deform_conv_tpu import modulated_deform_conv2d
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 4, 6, 6)), jnp.float32)
    m = ModulatedDeformConv2dPack(in_channels=4, out_channels=4,
                                  kernel_size=3, padding=1,
                                  deformable_groups=2)
    p = m.init(jax.random.key(1), x)
    out = m.apply(p, x)

    def conv(wb, ch):
        w, b = wb["weight"], wb["bias"]
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NCHW", "OIHW", "NCHW"))
        y = jax.lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                         dimension_numbers=dn)
        return y + b.reshape(1, -1, 1, 1)

    off = conv(p["params"]["conv_offset"], None)
    mask = conv(p["params"]["conv_mask"], None)  # NOTE: no sigmoid (reference :783)
    want = modulated_deform_conv2d(x, off, mask, p["params"]["weight"], None,
                                   stride=1, padding=1, deformable_groups=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_module_divisibility_errors():
    with pytest.raises(ValueError, match="divisible"):
        DeformConv2d(in_channels=5, out_channels=4, kernel_size=3,
                     groups=2).init(jax.random.key(0), jnp.ones((1, 5, 5, 5)),
                                    jnp.zeros((1, 18, 3, 3)))


def test_dcn_resnet_forward_and_grad():
    """DCNResNet (DCN in c3-c5) end-to-end: logits + gradient flow through
    every deformable block."""
    import jax
    import jax.numpy as jnp
    from modulated_deform_conv_tpu.models import DCNResNet

    model = DCNResNet(num_classes=10, depth=50, width=8,
                      deformable_groups=1)
    x = jnp.ones((2, 3, 32, 32), jnp.float32)
    params = model.init(jax.random.key(0), x)
    logits = jax.jit(model.apply)(params, x)
    assert logits.shape == (2, 10)
    # one grad step touches every DCN offset/mask predictor
    g = jax.jit(jax.grad(lambda p: jnp.sum(model.apply(p, x) ** 2)))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(jnp.all(jnp.isfinite(l)) for l in leaves)
    # feature-pyramid mode
    feats = jax.jit(lambda p, x: DCNResNet(
        num_classes=10, depth=50, width=8,
        features_only=True).apply(p, x))(params, x)
    assert len(feats) == 4 and feats[-1].shape[2] == 1


def test_dcn_video_net():
    """3D model family: init + forward + grads through the deformable 3D
    Pack blocks (NCTHW)."""
    from modulated_deform_conv_tpu.models import DCNVideoNet
    model = DCNVideoNet(num_classes=5, width=8, blocks=(1, 1),
                        deformable_groups=1)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 3, 4, 8, 8)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 5)
    # a deformable 3D Pack block exists with predictor convs
    flat = jax.tree_util.tree_leaves_with_path(params)
    names = {"/".join(str(k) for k in path) for path, _ in flat}
    assert any("dcn" in n and "conv_offset" in n for n in names), names
    g = jax.grad(lambda p: jnp.sum(model.apply(p, x) ** 2))(params)
    gnorm = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0
