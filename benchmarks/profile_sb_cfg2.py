#!/usr/bin/env python
"""Component-level profile of the shift-blend kernel on BASELINE config 2.

Times, with the LICM-proof chain-amortized harness:
  - _coef_prep (XLA compact-row build)
  - forward Pallas kernel alone (inputs pre-staged), with/without cols
  - backward Pallas kernel alone
  - ablations of the forward kernel (sweep removed / GEMM removed) to
    split fixed cost vs window-sweep cost vs MXU cost
  - end-to-end via the public API

Usage: python benchmarks/profile_sb_cfg2.py [cfg2|cfg3]
"""
import sys
sys.path.insert(0, "/root/repo")

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from modulated_deform_conv_tpu.utils.config import DeformConvSpec
from modulated_deform_conv_tpu.ops.pallas import shiftblend as sb


def measure(fn, args, iters=6, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    float(np.asarray(out))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(out))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def amortized(step, args, n_lo=2, n_hi=10, iters=6):
    def chain(n):
        @jax.jit
        def run(*a):
            def body(carry, _):
                pert = [x + carry * jnp.asarray(1e-30, x.dtype)
                        if jnp.issubdtype(x.dtype, jnp.floating) else x
                        for x in a]
                s = step(*pert)
                return s.astype(jnp.float32), ()
            s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                length=n)
            return s
        return run
    t_lo = measure(chain(n_lo), args, iters)
    t_hi = measure(chain(n_hi), args, iters)
    return max((t_hi - t_lo) / (n_hi - n_lo), 1e-9)


def main():
    cfg = sys.argv[1] if len(sys.argv) > 1 else "cfg2"
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)

    if cfg == "cfg2":
        B, C, O, S, k, g, dg = 8, 256, 256, (56, 56), (3, 3), 4, 4
    elif cfg == "cfg3":
        B, C, O, S, k, g, dg = 2, 64, 64, (16, 32, 32), (3, 3, 3), 1, 1
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
    print(f"plan: W={plan.W} n_pairs={plan.n_pairs} deltas={len(plan.deltas)} "
          f"BLK={plan.BLK} NT={plan.NT} RPAD={plan.RPAD} IPAD={plan.IPAD} "
          f"unrolled={plan.unrolled} save_cols={plan.save_cols} "
          f"Cg={plan.Cg}", file=sys.stderr)

    precision = "tensorfloat32"
    Og = O // g
    res = {}

    # 1. coefficient prep alone
    def prep_only(x, off, mask):
        cf, co = sb._coef_prep(off, mask, spec, plan)
        return jnp.sum(cf[0, 0, 0, 0]) + jnp.sum(co[0])
    res["coef_prep_ms"] = amortized(prep_only, (x, off, mask)) * 1e3

    # x/w prep alone
    def xprep_only(x, w):
        xr = sb._x_prep(x, plan)
        w2 = sb._w2_prep(w, plan, g)
        return jnp.sum(xr[0, 0, 0]) + jnp.sum(w2[0, 0])
    res["x_w_prep_ms"] = amortized(xprep_only, (x, w)) * 1e3

    # staged inputs
    cf, co = jax.jit(lambda o, m: sb._coef_prep(o, m, spec, plan))(off, mask)
    xr = jax.jit(lambda x: sb._x_prep(x, plan))(x)
    w2 = jax.jit(lambda w: sb._w2_prep(w, plan, g))(w)

    # 2. fwd kernel alone (unrolled: cols only; loop: fused out)
    def fwd_kernel(cf, co, xr, w2):
        outp, cols = sb._fwd_call(xr, cf, co, w2, plan, Og, precision)
        if outp is None:
            return jnp.sum(cols[0, 0, 0, 0].astype(jnp.float32))
        return jnp.sum(outp[0, 0, 0, 0])
    res["fwd_kernel_ms"] = amortized(fwd_kernel, (cf, co, xr, w2)) * 1e3

    def fwd_e2e_kern(cf, co, xr, w2):
        outp, cols = sb._fwd_call(xr, cf, co, w2, plan, Og, precision)
        if outp is None:
            outp = sb._cols_matmul(cols, w2, plan, Og, precision)
        return jnp.sum(outp[0, 0, 0, 0])
    res["fwd_kernel_plus_gemm_ms"] = amortized(
        fwd_e2e_kern, (cf, co, xr, w2)) * 1e3

    # 3. bwd kernel alone
    gout = jnp.asarray(rng.standard_normal((B, O) + tuple(OS)), jnp.float32)
    goutp = jax.jit(lambda gg: sb._gout_prep(gg, plan, O, g))(gout)
    cols = None
    if plan.save_cols:
        _, cols = jax.jit(functools.partial(
            sb._fwd_call, plan=plan, Og=Og, precision=precision,
            save_cols=True))(xr, cf, co, w2)
    bwd_call = sb._bwd_call_unrolled if plan.unrolled else sb._bwd_call

    def bwd_kernel(cf, co, xr, w2, goutp, *mc):
        c = mc[0] if mc else None
        gxp, gs, gw2 = bwd_call(xr, cf, co, w2, goutp, c, plan, Og,
                                precision, g)
        return (jnp.sum(gxp[0, 0, 0]) + jnp.sum(gs[0, 0, 0, 0, 0])
                + jnp.sum(gw2[0, 0]))
    bwd_args = (cf, co, xr, w2, goutp) + (
        (cols,) if cols is not None else ())
    res["bwd_kernel_ms"] = amortized(bwd_kernel, bwd_args) * 1e3

    # 4. backward glue: gout prep + gs unpack / gx slice / gw unprep
    def bwd_glue(gout, gs_like, gxp_like, gw2_like, off, mask):
        import math as _m
        goutp2 = sb._gout_prep(gout, plan, O, g)
        flat = _m.prod(plan.S)
        left = plan.RPAD - plan.lead_R * plan.qstride[0]
        gx = gxp_like[:, :, :, left:left + flat].reshape((B, C) + plan.S)
        gsl = gs_like[..., :plan.P]
        goff = gsl[:, :, :, :nd].reshape(off.shape)
        gm = gsl[:, :, :, nd].reshape(mask.shape)
        gw = sb._w2_unprep(gw2_like, plan, O, g, spec.kernel)
        return (jnp.sum(goutp2[0, 0, 0]) + jnp.sum(gx[0, 0, 0, 0])
                + jnp.sum(goff[0, 0, 0]) + jnp.sum(gm[0, 0, 0])
                + jnp.sum(gw[0, 0]))
    gxp_like = jnp.zeros((B, dg, plan.Cg, plan.QPAD), jnp.float32)
    gs_like = jnp.zeros((B, dg, K, 8, plan.PPAD), jnp.float32)
    gw2_like = jnp.zeros((dg, Og, K * plan.Cg), jnp.float32)
    res["bwd_glue_ms"] = amortized(
        bwd_glue, (gout, gs_like, gxp_like, gw2_like, off, mask)) * 1e3

    # 5. end-to-end via public API
    from modulated_deform_conv_tpu import modulated_deform_conv2d, \
        modulated_deform_conv3d
    opfn = modulated_deform_conv2d if nd == 2 else modulated_deform_conv3d

    def loss(x, off, mask, w):
        out = opfn(x, off, mask, w, None, stride=1, padding=1, groups=g,
                   deformable_groups=dg, impl="pallas", offset_bound=2.0)
        return jnp.sum(out * out)
    res["e2e_fwd_ms"] = amortized(loss, (x, off, mask, w)) * 1e3

    def fwdbwd(x, off, mask, w):
        grads = jax.grad(loss, argnums=(0, 1, 2, 3))(x, off, mask, w)
        return sum(jnp.sum(gg) for gg in grads)
    res["e2e_fwdbwd_ms"] = amortized(fwdbwd, (x, off, mask, w)) * 1e3

    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
