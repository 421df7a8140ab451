"""Counter consistency (VERDICT r2 item 6): the analytic halo-traffic
counters (utils/profiling.halo_stats) must equal the bytes the sharded
forward actually moves — summed from the ppermute operands in its jaxpr."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modulated_deform_conv_tpu.parallel.sharding import (
    make_mesh, required_halo, sharded_modulated_deform_conv2d)
from modulated_deform_conv_tpu.utils import profiling
from modulated_deform_conv_tpu.utils.config import DeformConvSpec


def _ppermute_traffic(closed_jaxpr):
    """Total bytes all devices send through ppermute ops in the jaxpr:
    sum over ppermute eqns of (#pairs in the permutation) * operand bytes
    (inside shard_map the operand shape is per-shard)."""
    total = 0

    def walk(jaxpr):
        nonlocal total
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "ppermute":
                pairs = len(eqn.params["perm"])
                for v in eqn.invars:
                    total += pairs * int(np.prod(v.aval.shape)
                                         ) * v.aval.dtype.itemsize
            for sub in eqn.params.values():
                if hasattr(sub, "jaxpr"):
                    walk(sub.jaxpr)
                elif hasattr(sub, "eqns"):
                    walk(sub)
    walk(closed_jaxpr.jaxpr)
    return total


@pytest.mark.parametrize("n_shards,max_offset", [(4, 1.0), (2, 2.0)])
def test_halo_counter_matches_jaxpr_ppermute_bytes(n_shards, max_offset):
    B, C, H, W, k, g, dg = 2, 8, 8 * n_shards, 8, 3, 2, 2
    K = k * k
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, C, H, W)), jnp.float32)
    off = jnp.asarray(rng.uniform(-1, 1, (B, dg * 2 * K, H, W)), jnp.float32)
    m = jnp.asarray(rng.uniform(0, 1, (B, dg * K, H, W)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((C, C // g, k, k)) * 0.1, jnp.float32)
    mesh = make_mesh((1, n_shards), ("data", "space"))

    def fwd(x, off, m, w):
        return sharded_modulated_deform_conv2d(
            x, off, m, w, None, mesh=mesh, stride=1, padding=1, groups=g,
            deformable_groups=dg, max_offset=max_offset)

    spec = DeformConvSpec.make(2, k, 1, 1, 1, g, dg, modulated=True)
    halo = required_halo(spec, max_offset)
    want = profiling.halo_stats(spec, x.shape, halo, n_shards)

    jaxpr = jax.make_jaxpr(fwd)(x, off, m, w)
    got = _ppermute_traffic(jaxpr)
    assert got == int(want["halo_bytes_fwd"]), (
        f"analytic {want['halo_bytes_fwd']} != jaxpr ppermute bytes {got}")


def test_halo_counter_zero_without_spatial_sharding():
    B, C, H, W = 2, 8, 16, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, C, H, W)), jnp.float32)
    off = jnp.asarray(rng.uniform(-1, 1, (B, 18, H, W)), jnp.float32)
    m = jnp.asarray(rng.uniform(0, 1, (B, 9, H, W)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((C, C, 3, 3)) * 0.1, jnp.float32)
    mesh = make_mesh((2, 1), ("data", "space"))

    def fwd(x, off, m, w):
        return sharded_modulated_deform_conv2d(
            x, off, m, w, None, mesh=mesh, stride=1, padding=1,
            deformable_groups=1, max_offset=1.0)

    jaxpr = jax.make_jaxpr(fwd)(x, off, m, w)
    assert _ppermute_traffic(jaxpr) == 0
