#!/usr/bin/env python
"""On-chip shard_map evidence (VERDICT r1 weak item 5).

Runs the sharded op on the REAL TPU (the one chip behind the axon
tunnel) with a (data=1, space=1) mesh, twice: halo=0 (collective-free)
and an explicit halo override (3 rows) so the ppermute halo-exchange
machinery lowers and executes on real hardware with the fused Pallas
kernel inside the shard.  Asserts parity against the unsharded op and
records fwd+bwd step times next to the unsharded baseline in
benchmarks/scaling_results.json under "tpu_1chip_shardmap".

Real multi-chip is unavailable here; N>1 behavior is covered by the
8-device virtual-mesh tests and the analytic halo bounds (scaling.py).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import measure_amortized, log
from modulated_deform_conv_tpu import modulated_deform_conv2d
from modulated_deform_conv_tpu.parallel.sharding import (
    make_mesh, sharded_modulated_deform_conv2d)


def main():
    dev = jax.devices()[0]
    assert dev.platform == "tpu", f"needs the real chip, got {dev.platform}"
    B, C, O, H, W, k, g, dg = 8, 256, 256, 56, 56, 3, 4, 4
    K = k * k
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, C, H, W)), jnp.float32)
    off = jnp.asarray(rng.uniform(-2, 2, (B, dg * 2 * K, H, W)), jnp.float32)
    mask = jnp.asarray(rng.uniform(0, 1, (B, dg * K, H, W)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((O, C // g, k, k)) * 0.05,
                    jnp.float32)
    mesh = make_mesh((1, 1), ("data", "space"))
    kw = dict(stride=1, padding=1, groups=g, deformable_groups=dg)

    def plain(*a):
        return jnp.sum(jnp.square(modulated_deform_conv2d(*a, None, **kw)))

    def mk_sharded(halo):
        def f(*a):
            return jnp.sum(jnp.square(sharded_modulated_deform_conv2d(
                *a, None, mesh=mesh, max_offset=2.0, halo=halo, **kw)))
        return f

    results = {}
    ref = jax.jit(plain)(x, off, mask, w)
    for name, fn in [("plain", plain), ("shardmap_halo0", mk_sharded(0)),
                     ("shardmap_halo3", mk_sharded(3))]:
        got = jax.jit(fn)(x, off, mask, w)
        rel = abs(float(got - ref)) / abs(float(ref))
        assert rel < 1e-5, (name, rel)

        def fwdbwd(*a):
            gs = jax.grad(fn, argnums=(0, 1, 2, 3))(*a)
            return sum(jnp.sum(t) for t in gs)

        t_f = measure_amortized(fn, (x, off, mask, w), 3, n_lo=2, n_hi=12)
        t_fb = measure_amortized(fwdbwd, (x, off, mask, w), 3, n_lo=2,
                                 n_hi=12)
        results[name] = {"fwd_ms": t_f * 1e3, "fwdbwd_ms": t_fb * 1e3,
                         "loss_relerr_vs_plain": rel}
        log(f"{name:16s} fwd {t_f*1e3:7.3f} ms  fwd+bwd {t_fb*1e3:7.3f} ms"
            f"  relerr {rel:.1e}")

    for h in ("shardmap_halo0", "shardmap_halo3"):
        results[h]["overhead_vs_plain_fwdbwd"] = (
            results[h]["fwdbwd_ms"] / results["plain"]["fwdbwd_ms"] - 1)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "scaling_results.json")
    data = {}
    if os.path.exists(out):
        with open(out) as fh:
            data = json.load(fh)
    data["tpu_1chip_shardmap"] = {
        "config": "cfg2 shapes, mesh (data=1, space=1), impl=auto in-shard",
        "note": ("halo3 forces the ppermute halo-exchange graph through "
                 "Mosaic/XLA on real TPU; parity asserted vs the unsharded "
                 "op at <1e-5"),
        **results,
    }
    with open(out, "w") as fh:
        json.dump(data, fh, indent=2)
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
