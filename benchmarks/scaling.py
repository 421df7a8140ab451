#!/usr/bin/env python
"""Scaling-efficiency proxies for the sharded path (BASELINE.md >=85%
target; VERDICT r1 item 7).

Real multi-chip hardware is not available in this environment (one v5e
chip behind a tunnel), so this measures the two components of scaling
efficiency that CAN be measured here, with the methodology recorded in
the output:

1. **Virtual-mesh weak scaling (CPU).** An N-device CPU mesh runs on one
   physical core, so perfect weak scaling is t(N) == N * t(1); the
   efficiency proxy  eff(N) = N * t(1) / t(N)  isolates the *overhead
   added by partitioning + collectives* (halo ppermute, psum), which is
   exactly the term that separates real multi-chip scaling from 100%.
2. **Sharded-vs-unsharded on one device.** Same total work, spatial mesh
   of size N vs the plain op: overhead = t_sharded / t_unsharded - 1.
   On real hardware the halo ppermute rides ICI (~100GB/s/link) instead
   of being a local copy; the analytic halo bytes from
   utils.profiling.halo_stats are reported so the ICI time can be bounded:
   t_ici ~= halo_bytes / 1e11, a few microseconds per step for these
   shapes — scaling remains compute-dominated.

Writes benchmarks/scaling_results.json.
"""
import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from modulated_deform_conv_tpu.parallel.sharding import (  # noqa: E402
    make_mesh, required_halo, sharded_modulated_deform_conv2d)
from modulated_deform_conv_tpu import modulated_deform_conv2d  # noqa: E402
from modulated_deform_conv_tpu.utils import profiling  # noqa: E402
from modulated_deform_conv_tpu.utils.config import DeformConvSpec  # noqa: E402


def measure_round(fn, args, iters=1):
    """One timing round: min over `iters` back-to-back executions."""
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(out))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def measure_interleaved(cases, rounds=7, warmup=2):
    """Deterministic min-of-rounds timing over a dict of {key: (fn, args)}.

    Rounds interleave the cases (r2 VERDICT item 6: the single-core CPU
    proxies showed cross-case drift when each case was timed in its own
    contiguous block — ambient load during one block skews only that
    case).  Interleaving exposes every case to the same load profile and
    the per-case min discards contended rounds.
    """
    for fn, args in cases.values():
        for _ in range(warmup):
            out = fn(*args)
        float(np.asarray(out))
    best = {k: float("inf") for k in cases}
    for _ in range(rounds):
        for k, (fn, args) in cases.items():
            best[k] = min(best[k], measure_round(fn, args))
    return best


def _case(B, C, H, W, k=3, g=2, dg=2, seed=0):
    rng = np.random.default_rng(seed)
    K = k * k
    x = jnp.asarray(rng.standard_normal((B, C, H, W)), jnp.float32)
    off = jnp.asarray(rng.uniform(-1, 1, (B, dg * 2 * K, H, W)), jnp.float32)
    m = jnp.asarray(rng.uniform(0, 1, (B, dg * K, H, W)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((C, C // g, k, k)) * 0.1, jnp.float32)
    return x, off, m, w


def weak_scaling(results):
    """Per-device batch fixed at 2; grow the data axis."""
    per_dev_B, C, H, W = 2, 32, 32, 32
    cases = {}
    for n in (1, 2, 4, 8):
        x, off, m, w = _case(per_dev_B * n, C, H, W)
        mesh = make_mesh((n,), ("data",))

        def step(x, off, m, w, mesh=mesh):
            out = sharded_modulated_deform_conv2d(
                x, off, m, w, None, mesh=mesh, stride=1, padding=1, groups=2,
                deformable_groups=2, spatial_axis=None)
            return jnp.sum(out * out)

        cases[n] = (jax.jit(step), (x, off, m, w))
    rows = measure_interleaved(cases)
    for n, t in rows.items():
        print(f"weak n={n}: {t*1e3:8.2f} ms", file=sys.stderr)
    eff = {n: rows[1] * n / rows[n] for n in rows}
    monotone = all(rows[b] >= rows[a] * 0.98
                   for a, b in ((1, 2), (2, 4), (4, 8)))
    results["weak_scaling_cpu"] = {
        "step_ms": {n: rows[n] * 1e3 for n in rows},
        "efficiency_proxy": eff,
        "checks": {"monotone_step_ms": monotone,
                   "eff_n2_ge_0.9": eff[2] >= 0.9,
                   "min_eff": min(eff.values())},
        "note": ("one physical core: ideal weak scaling is t(N)=N*t(1); "
                 "eff(N)=N*t(1)/t(N) isolates partitioning+collective "
                 "overhead; interleaved min-of-7-rounds timing"),
    }


def spatial_overhead(results):
    """Same work, spatially sharded vs not (grad step included)."""
    B, C, H, W = 4, 32, 64, 32
    x, off, m, w = _case(B, C, H, W)
    spec = DeformConvSpec.make(2, 3, 1, 1, 1, 2, 2, modulated=True)
    halo = required_halo(spec, 1.0)

    def plain_loss(x, off, m, w):
        out = modulated_deform_conv2d(x, off, m, w, None, stride=1,
                                      padding=1, groups=2,
                                      deformable_groups=2)
        return jnp.sum(out * out)

    def plain_step(x, off, m, w):
        gs = jax.grad(plain_loss, argnums=(0, 1, 2, 3))(x, off, m, w)
        return sum(jnp.sum(q) for q in gs)

    cases = {"plain": (jax.jit(plain_step), (x, off, m, w))}
    locals_ = {}
    for n in (1, 2, 4, 8):
        mesh = make_mesh((1, n), ("data", "space"))

        def sh_loss(x, off, m, w, mesh=mesh):
            out = sharded_modulated_deform_conv2d(
                x, off, m, w, None, mesh=mesh, stride=1, padding=1, groups=2,
                deformable_groups=2, max_offset=1.0)
            return jnp.sum(out * out)

        def sh_step(x, off, m, w, sh_loss=sh_loss):
            gs = jax.grad(sh_loss, argnums=(0, 1, 2, 3))(x, off, m, w)
            return sum(jnp.sum(q) for q in gs)

        cases[n] = (jax.jit(sh_step), (x, off, m, w))

        # The per-shard IDEAL: the same local computation one shard runs
        # (halo-extended input block, shard-local output grid), times n.
        # Comparing the sharded step to n * t_local isolates the
        # partition/collective overhead from the cache nonlinearity that
        # made "overhead vs the H=64 plain op" go NEGATIVE in r2 (a 16-row
        # local block is cache-resident on this CPU; the 64-row plain op
        # is not — same FLOPs, different memory behavior).
        Hl = H // n
        xl, offl, ml, _ = _case(B, C, Hl + 2 * halo, W, seed=1)
        offl = offl[:, :, :Hl]
        ml = ml[:, :, :Hl]
        lspec = DeformConvSpec.make(2, 3, 1, (0, 1), 1, 2, 2, modulated=True)

        def local_loss(x, off, m, w, lspec=lspec, Hl=Hl):
            from modulated_deform_conv_tpu.ops import api as ops_api
            out = ops_api._dispatch(x, off, m, w, None, lspec, impl="xla",
                                    out_sizes=(Hl, W))
            return jnp.sum(out * out)

        def local_step(x, off, m, w, local_loss=local_loss):
            gs = jax.grad(local_loss, argnums=(0, 1, 2, 3))(x, off, m, w)
            return sum(jnp.sum(q) for q in gs)

        locals_[n] = (jax.jit(local_step), (xl, offl, ml, w))
        cases[f"local{n}"] = locals_[n]

    rows = measure_interleaved(cases)
    t_plain = rows.pop("plain")
    sharded = {n: rows[n] for n in (1, 2, 4, 8)}
    ideal = {n: rows[f"local{n}"] * n for n in (1, 2, 4, 8)}
    overhead = {n: sharded[n] / ideal[n] - 1 for n in sharded}
    for n in sharded:
        print(f"spatial n={n}: sharded {sharded[n]*1e3:8.2f} ms  ideal "
              f"{ideal[n]*1e3:8.2f} ms  overhead {overhead[n]:+.3f}",
              file=sys.stderr)
    hs = profiling.halo_stats(spec, x.shape, halo, 8)
    results["spatial_sharding_cpu"] = {
        "plain_ms": t_plain * 1e3,
        "sharded_ms": {n: sharded[n] * 1e3 for n in sharded},
        "ideal_ms_n_x_local": {n: ideal[n] * 1e3 for n in ideal},
        "overhead_vs_ideal": overhead,
        "checks": {"no_negative_overhead":
                   all(v >= -0.05 for v in overhead.values())},
        "halo": halo,
        "analytic_halo_bytes_fwdbwd_8shards": hs["halo_bytes_fwdbwd"],
        "est_ici_us_per_step_at_100GBps": hs["halo_bytes_fwdbwd"] / 1e11
        * 1e6,
        "note": ("one core; ideal(n) = n x the halo-extended local block's "
                 "unsharded step, so overhead_vs_ideal isolates halo "
                 "exchange + shard_map partitioning (r2's overhead-vs-plain "
                 "was dominated by the plain op's cache behavior). On real "
                 "chips the halo bytes ride ICI; the analytic byte count "
                 "bounds that term."),
    }
    results["counters"] = profiling.counters.snapshot()


def main():
    results = {}
    weak_scaling(results)
    spatial_overhead(results)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "scaling_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2, default=str)
    print(f"wrote {out}", file=sys.stderr)
    print(json.dumps({"weak_eff_8": results["weak_scaling_cpu"][
        "efficiency_proxy"][8],
        "weak_eff_2": results["weak_scaling_cpu"]["efficiency_proxy"][2],
        "spatial_overhead_8": results["spatial_sharding_cpu"][
        "overhead_vs_ideal"][8]}))


if __name__ == "__main__":
    main()
