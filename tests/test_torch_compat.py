"""PyTorch checkpoint interop (models/torch_compat.py).

Verifies that a reference-style state_dict (the parameter set of
/root/reference/modulated_deform_conv.py's modules) round-trips into the
flax modules, that shape/structure validation catches mismatches, and —
numerically — that a Pack module loaded from a torch checkpoint computes
the same offset/mask predictor outputs as torch's own nn.Conv2d (the
reference's conv_offset/conv_mask, modulated_deform_conv.py:734-738).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from modulated_deform_conv_tpu.models import modules as M
from modulated_deform_conv_tpu.models import torch_compat as tc

torch = pytest.importorskip("torch")


def _torch_sd_pack(C=8, O=8, k=3, dg=1, modulated=True, seed=0):
    """Reference-shaped Pack state_dict built with torch."""
    g = torch.Generator().manual_seed(seed)
    nd, K = 2, k * k
    sd = {
        "weight": torch.randn((O, C, k, k), generator=g) * 0.1,
        "bias": torch.randn((O,), generator=g) * 0.1,
        "conv_offset.weight": torch.randn((dg * nd * K, C, k, k),
                                          generator=g) * 0.1,
        "conv_offset.bias": torch.randn((dg * nd * K,), generator=g) * 0.1,
    }
    if modulated:
        sd["conv_mask.weight"] = torch.randn((dg * K, C, k, k),
                                             generator=g) * 0.1
        sd["conv_mask.bias"] = torch.randn((dg * K,), generator=g) * 0.1
    return sd


def test_roundtrip_pack():
    sd = _torch_sd_pack()
    variables = tc.from_torch_state_dict(sd)
    back = tc.to_torch_state_dict(variables)
    assert set(back) == set(sd)
    for key in sd:
        np.testing.assert_array_equal(back[key], sd[key].numpy())


def test_prefix_selection():
    sd = {"backbone.dcn.weight": torch.ones((4, 4, 3, 3)),
          "backbone.dcn.bias": torch.zeros((4,)),
          "backbone.other.weight": torch.ones((9, 9))}
    v = tc.from_torch_state_dict(sd, prefix="backbone.dcn.")
    assert set(v["params"]) == {"weight", "bias"}
    with pytest.raises(KeyError):
        tc.from_torch_state_dict(sd, prefix="nonexistent.")


def test_validate_shapes():
    sd = _torch_sd_pack(C=8, O=8, k=3)
    v = tc.from_torch_state_dict(sd)
    mod = M.ModulatedDeformConv2dPack(
        in_channels=8, out_channels=8, kernel_size=3, padding=1,
        use_bias=True)
    tc.validate_against_module(mod, v)
    # wrong out_channels -> shape mismatch
    bad = M.ModulatedDeformConv2dPack(
        in_channels=8, out_channels=16, kernel_size=3, padding=1,
        use_bias=True)
    with pytest.raises(ValueError):
        tc.validate_against_module(bad, v)
    # explicit-offset module (no predictor convs) -> structure mismatch
    plain = M.ModulatedDeformConv2d(
        in_channels=8, out_channels=8, kernel_size=3, padding=1,
        use_bias=True)
    with pytest.raises(ValueError):
        tc.validate_against_module(plain, v)


def test_validate_explicit_offset_module():
    mod = M.ModulatedDeformConv2d(in_channels=8, out_channels=8,
                                  kernel_size=3, padding=1, use_bias=True)
    sd = {"weight": torch.randn((8, 8, 3, 3)), "bias": torch.randn((8,))}
    tc.validate_against_module(mod, tc.from_torch_state_dict(sd))


def test_pack_predictor_matches_torch_conv():
    """The loaded conv_offset/conv_mask must equal torch's nn.Conv2d with
    the same weights (reference modulated_deform_conv.py:734-738): same
    stride/padding/dilation, bias included."""
    C, O, k, dg = 8, 8, 3, 2
    sd = _torch_sd_pack(C=C, O=O, k=k, dg=dg, seed=3)
    mod = M.ModulatedDeformConv2dPack(
        in_channels=C, out_channels=O, kernel_size=k, padding=1,
        deformable_groups=dg, use_bias=True, impl="xla")
    variables = tc.from_torch_state_dict(sd)
    tc.validate_against_module(mod, variables)

    x = np.random.RandomState(0).randn(2, C, 10, 10).astype(np.float32)

    # torch side: the reference's predictor convs
    tconv = torch.nn.Conv2d(C, dg * 2 * k * k, k, stride=1, padding=1)
    with torch.no_grad():
        tconv.weight.copy_(sd["conv_offset.weight"])
        tconv.bias.copy_(sd["conv_offset.bias"])
        t_off = tconv(torch.from_numpy(x)).numpy()

    # jax side: run the module's predictor via a bound module
    bound = mod.bind(variables)
    j_off = np.asarray(bound.conv_offset(jnp.asarray(x)))
    np.testing.assert_allclose(j_off, t_off, rtol=2e-5, atol=2e-5)

    # and the full Pack forward runs under jit with the loaded params
    out = jax.jit(lambda v, x: mod.apply(v, x))(variables, jnp.asarray(x))
    assert out.shape == (2, O, 10, 10)
    assert bool(jnp.all(jnp.isfinite(out)))
