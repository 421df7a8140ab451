#!/usr/bin/env python
"""r5 per-phase re-trace of the cfg2 step (VERDICT r4 item 1).

The r2 trace (fwd kernel 1.06 / bwd kernel 2.23 / glue 0.7 ms) predates
the r4 in-kernel coefficient-row rework; this probe re-measures every
phase of the CURRENT 4.2 ms step with the LICM-proof chain-amortized
harness so the next attack targets the largest non-floor line.

Phases (all with pre-staged inputs where marked "kernel alone"):
  prep_ms        XLA prep glue: _off_prep/_mask_prep/_coords_prep/
                 _x_prep/_w2_prep (runs in fwd AND again in bwd)
  fwd_kernel_ms  forward Pallas call alone (unrolled path emits cols)
  finish_ms      _finish_out group-reduce + bias + reshape
  gout_prep_ms   cotangent prep
  bwd_kernel_ms  backward Pallas call alone (cols residual as input)
  unpack_ms      gx slice + gs unpack + _w2_unprep
  e2e_fwd_ms     public API forward
  e2e_fwdbwd_ms  public API jax.grad step (the bench.py quantity)

Usage: python benchmarks/probe_cfg2_r5.py [cfg2|cfg1]
"""
import sys

sys.path.insert(0, "/root/repo")

import functools
import json
import math

import jax
import jax.numpy as jnp
import numpy as np

from bench import measure_amortized
from modulated_deform_conv_tpu.utils.config import DeformConvSpec
from modulated_deform_conv_tpu.ops.pallas import shiftblend as sb


def main():
    cfg = sys.argv[1] if len(sys.argv) > 1 else "cfg2"
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)

    if cfg == "cfg2":
        B, C, O, S, k, g, dg = 8, 256, 256, (56, 56), (3, 3), 4, 4
    elif cfg == "cfg1":
        B, C, O, S, k, g, dg = 2, 32, 32, (64, 64), (3, 3), 1, 1
    else:
        raise SystemExit(f"unknown cfg {cfg}")
    nd = len(S)
    K = int(np.prod(k))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, C) + S), jnp.float32)
    off = jnp.asarray(rng.uniform(-2, 2, (B, dg * nd * K) + S), jnp.float32)
    mask = jnp.asarray(rng.uniform(0, 1, (B, dg * K) + S), jnp.float32)
    w = jnp.asarray(rng.standard_normal((O, C // g) + k) * 0.05, jnp.float32)

    spec = DeformConvSpec.make(nd, k, 1, 1, 1, g, dg, 64, modulated=True)
    OS = spec.out_sizes(x.shape[2:])
    plan = sb.SBPlan(spec, B, C, x.shape[2:], OS, 2.0)
    print(f"plan: W={plan.W} n_pairs={plan.n_pairs} "
          f"deltas={len(plan.deltas)} BLK={plan.BLK} NT={plan.NT} "
          f"grid_cells={plan.B * plan.dg * plan.NT} "
          f"unrolled={plan.unrolled} save_cols={plan.save_cols} "
          f"Cg={plan.Cg} cols_MB="
          f"{plan.B * plan.dg * plan.K * plan.Cg * plan.PPAD * 4 / 1e6:.0f}",
          file=sys.stderr)

    precision = "tensorfloat32"
    Og = O // g
    iters = 4
    res = {}

    # --- prep glue (runs twice per training step: fwd + bwd rebuild) ---
    def prep_only(x, off, mask, w):
        offr = sb._off_prep(off, plan)
        maskr = sb._mask_prep(mask, plan)
        co = sb._coords_prep(plan)
        xr = sb._x_prep(x, plan)
        w2 = sb._w2_prep(w, plan, g)
        return (jnp.sum(offr[0, 0, 0, 0]) + jnp.sum(maskr[0, 0, 0])
                + jnp.sum(co[0]) + jnp.sum(xr[0, 0, 0]) + jnp.sum(w2[0, 0]))
    res["prep_ms"] = measure_amortized(prep_only, (x, off, mask, w),
                                       iters) * 1e3

    # staged kernel inputs
    offr = jax.jit(lambda o: sb._off_prep(o, plan))(off)
    maskr = jax.jit(lambda m: sb._mask_prep(m, plan))(mask)
    co = jax.jit(lambda: sb._coords_prep(plan))()
    xr = jax.jit(lambda x: sb._x_prep(x, plan))(x)
    w2 = jax.jit(lambda w: sb._w2_prep(w, plan, g))(w)

    # --- forward kernel alone ---
    def fwd_kernel(offr, maskr, co, xr, w2):
        outp, cols = sb._fwd_call(xr, offr, maskr, co, w2, plan, Og,
                                  precision)
        s = jnp.sum(outp[0, 0, 0])
        if cols is not None:
            s = s + jnp.sum(cols[0, 0, 0, :8].astype(jnp.float32))
        return s
    res["fwd_kernel_ms"] = measure_amortized(
        fwd_kernel, (offr, maskr, co, xr, w2), iters) * 1e3

    # --- finish_out glue ---
    outp0, cols0 = jax.jit(functools.partial(
        sb._fwd_call, plan=plan, Og=Og, precision=precision))(
            xr, offr, maskr, co, w2)

    def finish(outp):
        out = sb._finish_out(outp, plan, O, g, None, jnp.float32)
        return jnp.sum(out[0, 0])
    res["finish_ms"] = measure_amortized(finish, (outp0,), iters) * 1e3

    # --- backward pieces ---
    gout = jnp.asarray(rng.standard_normal((B, O) + tuple(OS)), jnp.float32)

    def goutprep(gout):
        gp = sb._gout_prep(gout, plan, O, g)
        return jnp.sum(gp[0, 0, 0])
    res["gout_prep_ms"] = measure_amortized(goutprep, (gout,), iters) * 1e3

    goutp = jax.jit(lambda gg: sb._gout_prep(gg, plan, O, g))(gout)
    bwd_call = sb._bwd_call_unrolled if plan.unrolled else sb._bwd_call

    def bwd_kernel(offr, maskr, co, xr, w2, goutp, cols):
        gxp, gs, gw2 = bwd_call(xr, offr, maskr, co, w2, goutp, cols,
                                plan, Og, precision, g)
        return (jnp.sum(gxp[0, 0, 0, :64]) + jnp.sum(gs[0, 0, 0, 0, :64])
                + jnp.sum(gw2[0, 0, :64]))
    res["bwd_kernel_ms"] = measure_amortized(
        bwd_kernel, (offr, maskr, co, xr, w2, goutp, cols0), iters) * 1e3

    # --- unpack glue ---
    gxp_like = jnp.zeros((B, dg, plan.Cg, plan.QPAD), jnp.float32)
    gs_like = jnp.zeros((B, dg, K, plan.NRS, plan.PPAD), jnp.float32)
    gw2_like = jnp.zeros((dg, Og, K * plan.Cg), jnp.float32)

    def unpack(gxp, gs, gw2, off, mask):
        flat = math.prod(plan.S)
        left = plan.RPAD - plan.lead_R * plan.qstride[0]
        gx = gxp[:, :, :, left:left + flat].reshape((B, C) + plan.S)
        gsl = gs[..., :plan.P]
        goff = gsl[:, :, :, :nd].reshape(off.shape)
        gm = gsl[:, :, :, nd].reshape(mask.shape)
        gw = sb._w2_unprep(gw2, plan, O, g, spec.kernel)
        return (jnp.sum(gx[0, 0, 0]) + jnp.sum(goff[0, 0, 0])
                + jnp.sum(gm[0, 0, 0]) + jnp.sum(gw[0, 0]))
    res["unpack_ms"] = measure_amortized(
        unpack, (gxp_like, gs_like, gw2_like, off, mask), iters) * 1e3

    # --- end-to-end via public API (bench.py methodology) ---
    from modulated_deform_conv_tpu import modulated_deform_conv2d

    def loss(x, off, mask, w):
        out = modulated_deform_conv2d(
            x, off, mask, w, None, stride=1, padding=1, groups=g,
            deformable_groups=dg, impl="pallas", offset_bound=2.0,
            precision=precision)
        return jnp.sum(out * out)
    res["e2e_fwd_ms"] = measure_amortized(loss, (x, off, mask, w),
                                          iters) * 1e3

    def fwdbwd(x, off, mask, w):
        grads = jax.grad(loss, argnums=(0, 1, 2, 3))(x, off, mask, w)
        return sum(jnp.sum(gg) for gg in grads)
    res["e2e_fwdbwd_ms"] = measure_amortized(fwdbwd, (x, off, mask, w),
                                             iters) * 1e3

    acct = (res["prep_ms"] * 2 + res["fwd_kernel_ms"] + res["finish_ms"]
            + res["gout_prep_ms"] + res["bwd_kernel_ms"] + res["unpack_ms"])
    res["sum_of_phases_ms"] = acct
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
