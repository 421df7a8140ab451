#!/usr/bin/env python
"""Fast iteration driver for the 3D shift-blend kernels (cfg3 / cfg4-chunk).

Times shift_conv forward and forward+backward directly (no suite overhead)
so kernel variants can be A/B'd in one compile each.  Usage:

    python benchmarks/probe3d.py [--case cfg3|cfg4c|cfg2] [--fwd-only]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="cfg3")
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--bwd-only", action="store_true")
    ap.add_argument("--bound", type=float, default=2.0)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import measure_amortized, log
    from modulated_deform_conv_tpu.ops.pallas import shiftblend as sb
    from modulated_deform_conv_tpu.utils.config import DeformConvSpec

    if args.case == "cfg3":
        nd, B, C, S, g, dg, modulated = 3, 2, 64, (16, 32, 32), 1, 1, False
    elif args.case == "cfg4c":
        # one in_step=2 chunk of BASELINE cfg4 before lead chunking
        nd, B, C, S, g, dg, modulated = 3, 2, 128, (32, 64, 64), 1, 1, True
    elif args.case == "cfg2":
        nd, B, C, S, g, dg, modulated = 2, 8, 256, (56, 56), 4, 4, True
    else:
        raise SystemExit(f"unknown case {args.case}")

    k = 3
    spec = DeformConvSpec.make(nd, (k,) * nd, 1, k // 2, 1, g, dg, 64,
                               modulated=modulated)
    K = spec.tap_count
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, C) + S), jnp.float32)
    off = jnp.asarray(rng.uniform(-args.bound, args.bound, (B, dg * nd * K) + S), jnp.float32)
    m = (jnp.asarray(rng.uniform(0, 1, (B, dg * K) + S), jnp.float32)
         if modulated else jnp.zeros((0,), jnp.float32))
    w = jnp.asarray(rng.standard_normal((C, C // g) + (k,) * nd) * 0.05,
                    jnp.float32)
    zero = jnp.float32(0)

    def fwd(x, off, m, w):
        out = sb.shift_conv(x, off, m, w, zero, spec, "tensorfloat32", args.bound)
        return jnp.sum(jnp.square(out))

    def fwdbwd(x, off, m, w):
        gs = jax.grad(fwd, argnums=(0, 1, 2, 3))(x, off, m, w)
        return sum(jnp.sum(g) for g in gs)

    plan = sb.SBPlan(spec, B, C, S, spec.out_sizes(S), args.bound)
    log(f"case={args.case} n_pairs={plan.n_pairs} BLK={plan.BLK} "
        f"NT={plan.NT} unrolled={plan.unrolled} save_cols={plan.save_cols} "
        f"Cg={plan.Cg}")

    a = (x, off, m, w)
    if not args.bwd_only:
        t = measure_amortized(fwd, a, args.iters, n_lo=2, n_hi=8)
        log(f"fwd     {t*1e3:8.3f} ms   ({B/t:8.1f} samples/s)")
    if not args.fwd_only:
        t = measure_amortized(fwdbwd, a, args.iters, n_lo=2, n_hi=8)
        log(f"fwd+bwd {t*1e3:8.3f} ms   ({B/t:8.1f} samples/s)")


if __name__ == "__main__":
    main()
