#!/usr/bin/env python
"""Ablation split of the unrolled shift-blend BACKWARD on cfg2 (r5).

Compiles variants of the backward kernel with one phase removed each and
interleaves timed rounds (min-differenced chains, like ab_cfg2_r5):
  full        the production _bwd_kernel
  no_sweep1   grad_x window sweep removed (gx left as zeros)
  no_sweep2   offset/mask gradient sweep removed (gs zeros)
  no_gwdot    grad_weight MXU dot removed
  dots_only   both sweeps removed (gcols + gw dots + DMA remain)
Phase cost ~= full - no_<phase>.  Not a parity tool - outputs of ablated
variants are wrong by construction.

Usage: python benchmarks/probe_bwd_ablate_r5.py [rounds]
"""
import sys

sys.path.insert(0, "/root/repo")

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from modulated_deform_conv_tpu.utils.config import DeformConvSpec
from modulated_deform_conv_tpu.ops.pallas import shiftblend as sb


def make_bwd_kernel(plan, prec, cd, do_sweep1=True, do_sweep2=True,
                    do_gwdot=True):
    p = plan

    def kernel(*refs):
        (off_ref, mask_ref, co_ref, x_ref, w2_ref, gout_ref, cols_ref,
         gx_ref, gs_ref, gw_ref, gcols_ref, gxw_ref, wr_ref, dwr_ref,
         cf_ref) = refs
        dgi, b, t = pl.program_id(0), pl.program_id(1), pl.program_id(2)

        @pl.when(t == 0)
        def _():
            gx_ref[...] = jnp.zeros_like(gx_ref)

        @pl.when((b == 0) & (t == 0))
        def _():
            gw_ref[...] = jnp.zeros_like(gw_ref)

        sb._build_cf(off_ref, mask_ref, co_ref, cf_ref, p)
        sb._expand_rows(cf_ref, co_ref, wr_ref, dwr_ref, p)
        xw = x_ref[0, 0, :, pl.ds(t * p.BLK, p.BLK + 2 * p.RPAD)]

        def xs_at(delta):
            return xw[:, p.RPAD + delta:p.RPAD + delta + p.BLK]

        gout = gout_ref[0, 0].astype(cd)
        gcols_ref[...] = jax.lax.dot_general(
            w2_ref[0].astype(cd), gout, (((0,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32)
        if do_gwdot:
            gw_ref[0] += jax.lax.dot_general(
                gout, cols_ref[0, 0].astype(cd), (((1,), (1,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32)

        if do_sweep1:
            gxw_ref[...] = jnp.zeros_like(gxw_ref)
            for delta, pairs in p.deltas.items():
                tmp = None
                for k, dyvec in pairs:
                    cm = sb._pair_row(wr_ref, cf_ref, k, dyvec, p,
                                      masked=True)
                    contrib = cm[None, :] * gcols_ref[pl.ds(k * p.Cg,
                                                            p.Cg), :]
                    tmp = contrib if tmp is None else tmp + contrib
                gxw_ref[:, p.RPAD + delta:p.RPAD + delta + p.BLK] += tmp
            gx_ref[0, 0, :, pl.ds(t * p.BLK, p.BLK + 2 * p.RPAD)] += \
                gxw_ref[...]

        gs_ref[...] = jnp.zeros_like(gs_ref)
        if do_sweep2:
            CB = 8
            for k in range(p.K):
                gcol = gcols_ref[pl.ds(k * p.Cg, p.Cg), :]
                mrow = cf_ref[p.cmask, k, :] if p.modulated else None
                goff = [jnp.zeros((CB, p.BLK), jnp.float32)
                        for _ in range(p.nd)]
                gm = (jnp.zeros((CB, p.BLK), jnp.float32)
                      if p.modulated else None)
                hoisted = []
                for rows, inner in sb._inner_combos(p, k):
                    arest = None
                    for r in rows:
                        rr = wr_ref[r, k, :]
                        arest = rr if arest is None else arest * rr
                    dvars = []
                    for d in range(len(rows)):
                        q = None
                        for e, r in enumerate(rows):
                            rr = (dwr_ref if e == d else wr_ref)[r, k, :]
                            q = rr if q is None else q * rr
                        dvars.append(q)
                    hoisted.append((inner, arest, dvars))
                for dy0 in range(p.W[0]):
                    lead = (p.tap_base[k][0] + p.lo[0] + dy0) * p.qstride[0]
                    s_a = None
                    s_q = [None] * (p.nd - 1)
                    for inner, arest, dvars in hoisted:
                        delta = lead + inner
                        xs = xs_at(delta)
                        r0p = sb._r0_partial(gcol, xs, p.Cg)
                        ta = arest[None, :] * r0p
                        s_a = ta if s_a is None else s_a + ta
                        for d, q in enumerate(dvars):
                            tq = q[None, :] * r0p
                            s_q[d] = tq if s_q[d] is None else s_q[d] + tq
                    a0 = wr_ref[p.row0[0] + dy0, k, :]
                    da0 = dwr_ref[p.row0[0] + dy0, k, :]
                    s_am = s_a * mrow[None, :] if p.modulated else s_a
                    goff[0] = goff[0] + da0[None, :] * s_am
                    for d in range(p.nd - 1):
                        sqm = s_q[d] * mrow[None, :] if p.modulated else s_q[d]
                        goff[1 + d] = goff[1 + d] + a0[None, :] * sqm
                    if p.modulated:
                        gm = gm + a0[None, :] * s_a
                for d in range(p.nd):
                    gs_ref[0, 0, k, d, :] = jnp.sum(goff[d], axis=0)
                if p.modulated:
                    gs_ref[0, 0, k, p.nd, :] = jnp.sum(gm, axis=0)

    return kernel


def bwd_call_variant(xr, offr, maskr, co, w2, goutp, cols, plan, Og,
                     precision, groups, **abl):
    p = plan
    cd = sb._cdtype(precision)
    prec = (jax.lax.Precision.HIGHEST if precision == "float32"
            else jax.lax.Precision.DEFAULT)
    spg = p.dg // groups
    coef_specs = sb._coef_in_specs(p, fwd_grid=False)
    coef_args = sb._coef_args(offr, maskr, co, p)
    grid_spec = pl.GridSpec(
        grid=(p.dg, p.B, p.NT),
        in_specs=coef_specs + [
            pl.BlockSpec((1, 1, p.Cg, p.QPAD), lambda d, b, t: (b, d, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Og, p.K * p.Cg), lambda d, b, t: (d, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Og, p.BLK),
                         lambda d, b, t: (b, d // spg, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p.K * p.Cg, p.BLK),
                         lambda d, b, t: (b, d, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, p.Cg, p.QPAD), lambda d, b, t: (b, d, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p.K, p.NRS, p.BLK),
                         lambda d, b, t: (b, d, 0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Og, p.K * p.Cg), lambda d, b, t: (d, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((p.K * p.Cg, p.BLK), jnp.float32),
            pltpu.VMEM((p.Cg, p.BLK + 2 * p.RPAD), jnp.float32),
            pltpu.VMEM((p.NW, p.K, p.BLK), jnp.float32),
            pltpu.VMEM((p.NW, p.K, p.BLK), jnp.float32),
            sb._cf_scratch(p),
        ],
    )
    out = pl.pallas_call(
        make_bwd_kernel(p, prec, cd, **abl),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((p.B, p.dg, p.Cg, p.QPAD), jnp.float32),
            jax.ShapeDtypeStruct((p.B, p.dg, p.K, p.NRS, p.PPAD),
                                 jnp.float32),
            jax.ShapeDtypeStruct((p.dg, Og, p.K * p.Cg), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=sb._vmem_limit()),
        interpret=sb._interpret(),
    )(*coef_args, xr, w2, goutp, cols)
    return out


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    B, C, O, S, k, g, dg = 8, 256, 256, (56, 56), (3, 3), 4, 4
    nd, K = 2, 9
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, C) + S), jnp.float32)
    off = jnp.asarray(rng.uniform(-2, 2, (B, dg * nd * K) + S), jnp.float32)
    mask = jnp.asarray(rng.uniform(0, 1, (B, dg * K) + S), jnp.float32)
    w = jnp.asarray(rng.standard_normal((O, C // g) + k) * 0.05, jnp.float32)

    spec = DeformConvSpec.make(nd, k, 1, 1, 1, g, dg, 64, modulated=True)
    OS = spec.out_sizes(x.shape[2:])
    plan = sb.SBPlan(spec, B, C, x.shape[2:], OS, 2.0)
    print(f"plan BLK={plan.BLK} NT={plan.NT} PPAD={plan.PPAD}",
          file=sys.stderr)
    precision = "tensorfloat32"
    Og = O // g

    offr = jax.jit(lambda o: sb._off_prep(o, plan))(off)
    maskr = jax.jit(lambda m: sb._mask_prep(m, plan))(mask)
    co = jax.jit(lambda: sb._coords_prep(plan))()
    xr = jax.jit(lambda x: sb._x_prep(x, plan))(x)
    w2 = jax.jit(lambda w: sb._w2_prep(w, plan, g))(w)
    gout = jnp.asarray(rng.standard_normal((B, O) + tuple(OS)), jnp.float32)
    goutp = jax.jit(lambda gg: sb._gout_prep(gg, plan, O, g))(gout)
    _, cols0 = jax.jit(functools.partial(
        sb._fwd_call, plan=plan, Og=Og, precision=precision,
        save_cols=True))(xr, offr, maskr, co, w2)
    args = (offr, maskr, co, xr, w2, goutp, cols0)

    variants = [
        ("full", {}),
        ("no_sweep1", {"do_sweep1": False}),
        ("no_sweep2", {"do_sweep2": False}),
        ("no_gwdot", {"do_gwdot": False}),
        ("dots_only", {"do_sweep1": False, "do_sweep2": False}),
    ]

    def chain(abl, n):
        @jax.jit
        def run(*a):
            def body(carry, _):
                # Perturb ONLY the (small) offsets array: perturbing every
                # arg would add ~0.6 ms/step of XLA elementwise traffic on
                # the 118MB cols residual and swamp the ablation deltas
                # (the original r5 run of this probe did exactly that AND
                # dropped **abl from this call, timing the full kernel
                # five times - both fixed).
                pert = ([a[0] + carry.astype(a[0].dtype) * 1e-30]
                        + list(a[1:]))
                gxp, gs, gw2 = bwd_call_variant(
                    pert[3], pert[0], pert[1], pert[2], pert[4], pert[5],
                    pert[6], plan, Og, precision, g, **abl)
                s = (jnp.sum(gxp[0, 0, 0, :64]) + jnp.sum(gs[0, 0, 0, 0, :64])
                     + jnp.sum(gw2[0, 0, :64]))
                return s.astype(a[0].dtype), ()
            s, _ = jax.lax.scan(body, jnp.zeros((), a[0].dtype), None,
                                length=n)
            return s
        return run

    n_lo, n_hi = 2, 10
    compiled = {}
    for name, abl in variants:
        lo, hi = chain(abl, n_lo), chain(abl, n_hi)
        float(np.asarray(lo(*args)))
        float(np.asarray(hi(*args)))
        compiled[name] = (lo, hi)
        print(f"compiled {name}", file=sys.stderr, flush=True)

    tlo = {n: [] for n, _ in variants}
    thi = {n: [] for n, _ in variants}
    for r in range(rounds):
        for name, _ in variants:
            lo, hi = compiled[name]
            t0 = time.perf_counter()
            float(np.asarray(lo(*args)))
            tlo[name].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(np.asarray(hi(*args)))
            thi[name].append(time.perf_counter() - t0)
        print(f"round {r} done", file=sys.stderr, flush=True)

    out = {}
    for name, _ in variants:
        step = (min(thi[name]) - min(tlo[name])) / (n_hi - n_lo) * 1e3
        out[name] = round(step, 4)
    full = out["full"]
    out["_sweep1_cost"] = round(full - out["no_sweep1"], 4)
    out["_sweep2_cost"] = round(full - out["no_sweep2"], 4)
    out["_gwdot_cost"] = round(full - out["no_gwdot"], 4)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
