#!/usr/bin/env python
"""cfg4 rolled-loop BACKWARD phase split (r5 ledger deepening).

The r5 cfg4 step is 526 ms with the backward at 2.98x the forward where
the sweep model predicts 2.25x (ANALYSIS 3e).  This probe splits the
394 ms backward by compiling ablated variants of the production
_bwd_kernel_loop (has_cols path) on ONE lead chunk's shapes and timing
them with min-differenced interleaved chains:

  full        production kernel body
  no_sweep2   offset/mask gradient fori-loop removed
  no_sweep1   grad_x fori-loop removed
  dots_only   both sweeps removed (gcols + gw dots + IO remain)

Chunk shapes mirror _choose_lead for cfg4 (nb=8, R=3: 10-plane input
blocks, 4-plane outputs); one chunk's backward x8 approximates the full
step's backward.  Ablated variants produce wrong outputs by design.

Usage: python benchmarks/probe_cfg4_bwd_r5.py [rounds]
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


def make_loop_bwd(p, prec, cd, do_sweep1=True, do_sweep2=True):
    """Ablated copy of the production _bwd_kernel_loop (has_cols path)."""

    def kernel(*refs):
        n_in = 5 if p.modulated else 4
        ins, rest = refs[:n_in], refs[n_in:]
        if p.modulated:
            off_ref, mask_ref, co_ref, x_ref, w2_ref = ins
        else:
            (off_ref, co_ref, x_ref, w2_ref), mask_ref = ins, None
        gout_ref = rest[0]
        rest = rest[1:]
        (cols_ref, gx_ref, gs_ref, gw_ref, gcols_ref, gwin_ref,
         wr_ref, dwr_ref, cp_ref, cf_ref) = rest
        dgi, b, t = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        qs0 = p.qstride[0]
        fps = sb._loop_pairs(p)

        @pl.when(t == 0)
        def _():
            gx_ref[...] = jnp.zeros_like(gx_ref)

        @pl.when((b == 0) & (t == 0))
        def _():
            gw_ref[...] = jnp.zeros_like(gw_ref)

        sb._build_cf(off_ref, mask_ref, co_ref, cf_ref, p)
        sb._expand_rows(cf_ref, co_ref, wr_ref, dwr_ref, p)
        sb._fill_cp_loop(cp_ref, wr_ref, cf_ref, p)
        gout = gout_ref[0, 0].astype(cd)
        gcols_ref[...] = jax.lax.dot_general(
            w2_ref[0].astype(cd), gout, (((0,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32)
        gw_ref[0] += jax.lax.dot_general(
            gout, cols_ref[0, 0].astype(cd), (((1,), (1,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32)

        lead_groups = {}
        for idx, k, rows, inner in fps:
            inner_map = lead_groups.setdefault(p.tap_base[k][0], {})
            inner_map.setdefault(inner, []).append((k, idx))

        if do_sweep1:
            def body(dz, carry):
                for g0, inner_map in lead_groups.items():
                    gwin_ref[...] = jnp.zeros_like(gwin_ref)
                    for inner, lst in sorted(inner_map.items()):
                        tmp = None
                        for k, idx in lst:
                            cm = (wr_ref[pl.ds(
                                p.row0k[0] + dz * p.K + k, 1), :]
                                * cp_ref[idx, :][None, :])
                            contrib = cm * gcols_ref[pl.ds(k * p.Cg,
                                                           p.Cg), :]
                            tmp = contrib if tmp is None else tmp + contrib
                        gwin_ref[:, p.IPAD + inner:p.IPAD + inner
                                 + p.BLK] += tmp
                    base = (t * p.BLK + p.RPAD - p.IPAD
                            + (g0 + p.lo[0]) * qs0 + dz * qs0)
                    gx_ref[0, 0, :, pl.ds(base, p.BLK + 2 * p.IPAD)] += \
                        gwin_ref[...]
                return carry

            jax.lax.fori_loop(0, p.W[0], body, 0)

        gs_ref[...] = jnp.zeros_like(gs_ref)
        if do_sweep2:
            CB = 8
            for k in range(p.K):
                gcol = gcols_ref[pl.ds(k * p.Cg, p.Cg), :]
                mrow = cf_ref[p.cmask, k, :] if p.modulated else None
                off_base = p.IPAD
                combos = sb._inner_combos(p, k)
                hoisted = []
                for rows, inner in combos:
                    arest = None
                    for r in rows:
                        rr = wr_ref[p.wrow_base[r] + k, :]
                        arest = rr if arest is None else arest * rr
                    dvars = []
                    for d in range(len(rows)):
                        q = None
                        for e, r in enumerate(rows):
                            rr = (dwr_ref if e == d else wr_ref)[
                                p.wrow_base[r] + k, :]
                            q = rr if q is None else q * rr
                        dvars.append(q)
                    hoisted.append((inner, arest, dvars))

                def body2(dz, rows_carry, k=k, gcol=gcol, mrow=mrow,
                          hoisted=hoisted):
                    base = (t * p.BLK + p.RPAD - p.IPAD
                            + (p.tap_base[k][0] + p.lo[0]) * qs0 + dz * qs0)
                    xw = x_ref[0, 0, :, pl.ds(base, p.BLK + 2 * p.IPAD)]
                    row = p.row0k[0] + dz * p.K + k
                    a0 = wr_ref[pl.ds(row, 1), :][0]
                    da0 = dwr_ref[pl.ds(row, 1), :][0]
                    goff = list(rows_carry[:p.nd])
                    gm = rows_carry[p.nd]
                    s_a = None
                    s_q = [None] * (p.nd - 1)
                    for inner, arest, dvars in hoisted:
                        xs = xw[:, off_base + inner:off_base + inner
                                + p.BLK]
                        r0p = sb._r0_partial(gcol, xs, p.Cg)
                        ta = arest[None, :] * r0p
                        s_a = ta if s_a is None else s_a + ta
                        for d, q in enumerate(dvars):
                            tq = q[None, :] * r0p
                            s_q[d] = tq if s_q[d] is None else s_q[d] + tq
                    s_am = s_a * mrow[None, :] if p.modulated else s_a
                    goff[0] = goff[0] + da0[None, :] * s_am
                    for d in range(p.nd - 1):
                        sqm = (s_q[d] * mrow[None, :] if p.modulated
                               else s_q[d])
                        goff[1 + d] = goff[1 + d] + a0[None, :] * sqm
                    if p.modulated:
                        gm = gm + a0[None, :] * s_a
                    return tuple(goff) + (gm,)

                init = tuple(jnp.zeros((CB, p.BLK), jnp.float32)
                             for _ in range(p.nd + 1))
                rows_out = jax.lax.fori_loop(0, p.W[0], body2, init)
                for d in range(p.nd):
                    gs_ref[0, 0, k, d, :] = jnp.sum(rows_out[d], axis=0)
                if p.modulated:
                    gs_ref[0, 0, k, p.nd, :] = jnp.sum(rows_out[p.nd],
                                                       axis=0)

    return kernel


def bwd_call_variant(xr, offr, maskr, co, w2, goutp, cols, p, Og,
                     precision, groups, **abl):
    cd = sb._cdtype(precision)
    prec = jax.lax.Precision.DEFAULT
    spg = p.dg // groups
    coef_specs = sb._coef_in_specs(p, fwd_grid=False)
    coef_args = sb._coef_args(offr, maskr, co, p)
    in_specs = coef_specs + [
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
    ]
    grid_spec = pl.GridSpec(
        grid=(p.dg, p.B, p.NT),
        in_specs=in_specs,
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
            pltpu.VMEM((p.Cg, p.BLK + 2 * p.IPAD), jnp.float32),
            pltpu.VMEM((p.NWK, p.BLK), jnp.float32),
            pltpu.VMEM((p.NWK, p.BLK), jnp.float32),
            pltpu.VMEM((sb._round_up(p.n_pairs // p.W[0], 8), p.BLK),
                       jnp.float32),
            sb._cf_scratch(p),
        ],
    )
    return pl.pallas_call(
        make_loop_bwd(p, prec, cd, **abl),
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


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    # one cfg4 lead chunk: nb=8, R=3 -> S=(10,64,64), OS=(4,64,64)
    B, C, O, g, dg = 4, 128, 128, 1, 1
    S, OS = (10, 64, 64), (4, 64, 64)
    nd, k, K = 3, 3, 27
    spec = DeformConvSpec.make(nd, k, 1, 1, 1, g, dg, 2, modulated=True)
    p = sb.SBPlan(spec, B, C, S, OS, 2.0, lead=(3, 32))
    assert not p.unrolled and p.save_cols, (p.unrolled, p.save_cols)
    print(f"chunk plan: BLK={p.BLK} NT={p.NT} P={p.P} n_pairs={p.n_pairs}",
          file=sys.stderr, flush=True)
    precision = "tensorfloat32"
    Og = O // g
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, C) + S), jnp.float32)
    off = jnp.asarray(rng.uniform(-2, 2, (B, dg * nd * K) + OS), jnp.float32)
    mask = jnp.asarray(rng.uniform(0, 1, (B, dg * K) + OS), jnp.float32)
    w = jnp.asarray(rng.standard_normal((O, C // g) + (k,) * nd) * 0.05,
                    jnp.float32)

    offr = jax.jit(lambda o: sb._off_prep(o, p))(off)
    maskr = jax.jit(lambda m: sb._mask_prep(m, p))(mask)
    co = jax.jit(lambda: sb._coords_prep(p, lead_origin=jnp.float32(0)))()
    xr = jax.jit(lambda xx: sb._x_prep(xx, p))(x)
    w2 = jax.jit(lambda ww: sb._w2_prep(ww, p, g))(w)
    gout = jnp.asarray(rng.standard_normal((B, O) + OS), jnp.float32)
    goutp = jax.jit(lambda gg: sb._gout_prep(gg, p, O, g))(gout)
    _, cols0 = jax.jit(functools.partial(
        sb._fwd_call, plan=p, Og=Og, precision=precision,
        save_cols=True))(xr, offr, maskr, co, w2)
    args = (offr, maskr, co, xr, w2, goutp, cols0)

    variants = [
        ("full", {}),
        ("no_sweep2", {"do_sweep2": False}),
        ("no_sweep1", {"do_sweep1": False}),
        ("dots_only", {"do_sweep1": False, "do_sweep2": False}),
    ]

    def chain(abl, n):
        @jax.jit
        def run(*a):
            def body(carry, _):
                pert = ([a[0] + carry.astype(a[0].dtype) * 1e-30]
                        + list(a[1:]))
                gxp, gs, gw2 = bwd_call_variant(
                    pert[3], pert[0], pert[1], pert[2], pert[4], pert[5],
                    pert[6], p, Og, precision, g, **abl)
                s = (jnp.sum(gxp[0, 0, 0, :64])
                     + jnp.sum(gs[0, 0, 0, 0, :64])
                     + jnp.sum(gw2[0, 0, :64]))
                return s.astype(a[0].dtype), ()
            s, _ = jax.lax.scan(body, jnp.zeros((), a[0].dtype), None,
                                length=n)
            return s
        return run

    n_lo, n_hi = 1, 4
    compiled = {}
    for name, abl in variants:
        t0 = time.perf_counter()
        lo, hi = chain(abl, n_lo), chain(abl, n_hi)
        float(np.asarray(lo(*args)))
        float(np.asarray(hi(*args)))
        compiled[name] = (lo, hi)
        print(f"compiled {name} in {time.perf_counter()-t0:.0f}s",
              file=sys.stderr, flush=True)

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
        ms = (min(thi[name]) - min(tlo[name])) / (n_hi - n_lo) * 1e3
        out[name] = round(ms, 3)
    out["_sweep1_ms"] = round(out["full"] - out["no_sweep1"], 3)
    out["_sweep2_ms"] = round(out["full"] - out["no_sweep2"], 3)
    out["_x8_chunks_full_ms"] = round(out["full"] * 8, 1)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
