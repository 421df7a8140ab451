#!/usr/bin/env python
"""A/B the forward window-sweep variants (FWD_SWEEP) on the real chip."""
import sys
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from modulated_deform_conv_tpu.utils.config import DeformConvSpec
from modulated_deform_conv_tpu.ops.pallas import shiftblend as sb
from benchmarks.profile_sb_cfg2 import amortized


def main():
    B, C, O, S, k, g, dg = 8, 256, 256, (56, 56), (3, 3), 4, 4
    nd, K = len(S), int(np.prod(k))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, C) + S), jnp.float32)
    off = jnp.asarray(rng.uniform(-2, 2, (B, dg * nd * K) + S), jnp.float32)
    mask = jnp.asarray(rng.uniform(0, 1, (B, dg * K) + S), jnp.float32)
    w = jnp.asarray(rng.standard_normal((O, C // g) + k) * 0.05, jnp.float32)
    spec = DeformConvSpec.make(nd, k, 1, 1, 1, g, dg, 64, modulated=True)
    OS = spec.out_sizes(x.shape[2:])
    plan = sb.SBPlan(spec, B, C, x.shape[2:], OS, 2.0)
    Og = O // g

    cf, co = jax.jit(lambda o, m: sb._coef_prep(o, m, spec, plan))(off, mask)
    xr = jax.jit(lambda x: sb._x_prep(x, plan))(x)
    w2 = jax.jit(lambda w: sb._w2_prep(w, plan, g))(w)

    outs = {}
    for mode in ("rmw", "direct", "regacc"):
        sb.FWD_SWEEP = mode
        for sc in (False, True):
            def fwd(cf, co, xr, w2, _sc=sc):
                outp, cols = sb._fwd_call(xr, cf, co, w2, plan, Og,
                                          "tensorfloat32", save_cols=_sc)
                s = jnp.sum(outp[0, 0, 0, 0])
                if cols is not None:
                    s = s + jnp.sum(cols[0, 0, 0, 0].astype(jnp.float32))
                return s
            t = amortized(fwd, (cf, co, xr, w2)) * 1e3
            print(f"{mode:8s} save_cols={sc}: {t:.4f} ms")
        outp, _ = jax.jit(
            lambda cf, co, xr, w2: sb._fwd_call(
                xr, cf, co, w2, plan, Og, "tensorfloat32", False))(
                    cf, co, xr, w2)
        outs[mode] = np.asarray(outp)
    sb.FWD_SWEEP = "direct"
    for mode in ("direct", "regacc"):
        d = np.abs(outs[mode] - outs["rmw"]).max()
        print(f"max |{mode} - rmw| = {d:.3e}")
        assert d < 1e-4, mode


if __name__ == "__main__":
    main()
