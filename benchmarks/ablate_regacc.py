#!/usr/bin/env python
"""
NOTE: r2 experiment snapshot — pins kernel/layout details as they were
when the experiment ran; the production kernels in shiftblend.py have
since evolved (see benchmarks/ANALYSIS.md for the findings ledger).
Component ablation of the production (regacc) forward kernel and the
unrolled backward kernel on BASELINE config 2.

Each variant disables parts of the kernel so the chain-amortized deltas
give an intra-kernel cost breakdown the perfetto trace cannot (one Pallas
kernel = one trace slice).

Usage: python benchmarks/ablate_regacc.py
"""
import sys
sys.path.insert(0, "/root/repo")

import functools
import json

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from modulated_deform_conv_tpu.utils.config import DeformConvSpec
from modulated_deform_conv_tpu.ops.pallas import shiftblend as sb
from benchmarks.profile_sb_cfg2 import amortized


def make_fwd(plan, Og, parts):
    """parts: set of {'cp', 'sweep', 'mask', 'gemm', 'slice'}."""
    p = plan
    cd = jnp.float32
    prec = jax.lax.Precision.DEFAULT

    def kern(cf_ref, co_ref, x_ref, w2_ref, out_ref, acc2_ref, wr_ref,
             cp_ref):
        t = pl.program_id(2)
        sb._expand_rows(cf_ref, co_ref, wr_ref, None, p)
        flat_pairs = []
        for delta, pairs in p.deltas.items():
            for k, dyvec in pairs:
                flat_pairs.append((len(flat_pairs), delta, k, dyvec))
        if "cp" in parts:
            for idx, delta, k, dyvec in flat_pairs:
                c = wr_ref[p.row0[0] + dyvec[0], k, :]
                for d in range(1, p.nd):
                    c = c * wr_ref[p.row0[d] + dyvec[d], k, :]
                cp_ref[idx] = c
        CB = 8
        for cb in range(p.Cg // CB):
            xw = x_ref[0, 0, pl.ds(cb * CB, CB),
                       pl.ds(t * p.BLK, p.BLK + 2 * p.RPAD)].astype(cd)
            accs = [jnp.zeros((CB, p.BLK), cd) for _ in range(p.K)]
            if "sweep" in parts:
                for idx, delta, k, dyvec in flat_pairs:
                    xs = xw[:, p.RPAD + delta:p.RPAD + delta + p.BLK]
                    c = cp_ref[idx, :]
                    accs[k] = accs[k] + c[None, :].astype(cd) * xs
            elif "slice" in parts:
                # slices + adds only: no coefficient multiply
                for delta in p.deltas:
                    xs = xw[:, p.RPAD + delta:p.RPAD + delta + p.BLK]
                    accs[0] = accs[0] + xs
            for k in range(p.K):
                acc2_ref[pl.ds(k * p.Cg + cb * CB, CB), :] = accs[k]
        if "mask" in parts and p.modulated:
            for k in range(p.K):
                m = cf_ref[0, 0, p.cmask, k, :].astype(acc2_ref.dtype)
                acc2_ref[pl.ds(k * p.Cg, p.Cg), :] *= m[None, :]
        if "gemm" in parts:
            w2 = w2_ref[0].astype(cd)
            out_ref[0, 0, 0] = jax.lax.dot_general(
                w2, acc2_ref[...].astype(cd), (((1,), (0,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32)
        else:
            out_ref[0, 0, 0] = acc2_ref[:Og, :].astype(jnp.float32)

    grid_spec = pl.GridSpec(
        grid=(p.B, p.dg, p.NT),
        in_specs=[
            pl.BlockSpec((1, 1, p.NRC, p.K, p.BLK),
                         lambda b, d, t: (b, d, 0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, p.BLK), lambda b, d, t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p.Cg, p.QPAD),
                         lambda b, d, t: (b, d, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Og, p.K * p.Cg),
                         lambda b, d, t: (d, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, 1, 1, Og, p.BLK),
                                lambda b, d, t: (b, d, t, 0, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[
            pltpu.VMEM((p.K * p.Cg, p.BLK), jnp.float32),
            pltpu.VMEM((p.NW, p.K, p.BLK), jnp.float32),
            pltpu.VMEM((sb._round_up(p.n_pairs, 8), p.BLK), jnp.float32),
        ],
    )

    def call(cf, co, xr, w2):
        out = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct(
                (p.B, p.dg, p.NT, Og, p.BLK), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=sb._VMEM_LIMIT),
            interpret=sb._interpret(),
        )(cf, co, xr, w2)
        return jnp.sum(out[0][0, 0, 0, 0])
    return call


def make_bwd(plan, Og, parts, goutp, cols):
    """parts subset of {'kloop', 'sweep', 'r0', 'gsrows', 'gxacc'}."""
    p = plan
    cd = jnp.float32
    prec = jax.lax.Precision.DEFAULT
    NRS = 8

    def kern(cf_ref, co_ref, x_ref, w2_ref, gout_ref, cols_ref,
             gx_ref, gs_ref, gw_ref, gcols_ref, gxw_ref, wr_ref, dwr_ref):
        dgi, b, t = pl.program_id(0), pl.program_id(1), pl.program_id(2)

        @pl.when(t == 0)
        def _():
            gx_ref[...] = jnp.zeros_like(gx_ref)

        @pl.when((b == 0) & (t == 0))
        def _():
            gw_ref[...] = jnp.zeros_like(gw_ref)

        sb._expand_rows(cf_ref, co_ref, wr_ref, dwr_ref, p)
        xw = x_ref[0, 0, :, pl.ds(t * p.BLK, p.BLK + 2 * p.RPAD)]
        gout = gout_ref[0, 0].astype(cd)
        gcols_ref[...] = jax.lax.dot_general(
            w2_ref[0].astype(cd), gout, (((0,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32)

        if "kloop" in parts:
            for k in range(p.K):
                sl = pl.ds(k * p.Cg, p.Cg)
                colnm = cols_ref[0, 0, 0, sl, :].astype(jnp.float32)
                gcol = gcols_ref[sl, :]
                gs_ref[0, 0, 0, k, p.nd, :] = jnp.sum(
                    gcol * colnm, axis=0, keepdims=True)[0]
                if p.modulated:
                    m = cf_ref[0, 0, p.cmask, k, :]
                    col = colnm * m[None, :]
                    gcols_ref[sl, :] = gcol * m[None, :]
                else:
                    col = colnm
                gw_ref[0, :, sl] += jax.lax.dot_general(
                    gout, col.astype(cd), (((1,), (1,)), ((), ())),
                    precision=prec, preferred_element_type=jnp.float32)
                for r in range(p.nd):
                    gs_ref[0, 0, 0, k, r, :] = jnp.zeros((p.BLK,),
                                                         jnp.float32)
        else:
            gs_ref[...] = jnp.zeros_like(gs_ref)

        gxw_ref[...] = jnp.zeros_like(gxw_ref)
        if "sweep" in parts:
            for delta, pairs in p.deltas.items():
                xs = xw[:, p.RPAD + delta:p.RPAD + delta + p.BLK]
                tmp = None
                for k, dyvec in pairs:
                    arows = [wr_ref[p.row0[d] + dyvec[d], k, :]
                             for d in range(p.nd)]
                    ab = arows[0]
                    for d in range(1, p.nd):
                        ab = ab * arows[d]
                    gcoln = gcols_ref[pl.ds(k * p.Cg, p.Cg), :]
                    contrib = ab[None, :] * gcoln
                    tmp = contrib if tmp is None else tmp + contrib
                    if "r0" in parts:
                        r0 = jnp.sum(gcoln * xs, axis=0, keepdims=True)[0]
                        if "gsrows" in parts:
                            for d in range(p.nd):
                                dab = dwr_ref[p.row0[d] + dyvec[d], k, :]
                                for e in range(p.nd):
                                    if e != d:
                                        dab = dab * arows[e]
                                gs_ref[0, 0, 0, k, d, :] += dab * r0
                if "gxacc" in parts:
                    gxw_ref[:, p.RPAD + delta:p.RPAD + delta + p.BLK] += tmp
                else:
                    gxw_ref[:, p.RPAD:p.RPAD + p.BLK] += tmp
        gx_ref[0, 0, :, pl.ds(t * p.BLK, p.BLK + 2 * p.RPAD)] += gxw_ref[...]

    spg = p.dg  # groups folded: cfg2 dg==g so spg=1; keep simple
    in_specs = [
        pl.BlockSpec((1, 1, p.NRC, p.K, p.BLK),
                     lambda d, b, t: (b, d, 0, 0, t),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, p.BLK), lambda d, b, t: (0, t),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, p.Cg, p.QPAD), lambda d, b, t: (b, d, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Og, p.K * p.Cg), lambda d, b, t: (d, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Og, p.BLK), lambda d, b, t: (b, d, 0, t),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, p.K * p.Cg, p.BLK),
                     lambda d, b, t: (b, d, t, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    grid_spec = pl.GridSpec(
        grid=(p.dg, p.B, p.NT),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, p.Cg, p.QPAD), lambda d, b, t: (b, d, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, p.K, NRS, p.BLK),
                         lambda d, b, t: (b, d, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Og, p.K * p.Cg), lambda d, b, t: (d, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((p.K * p.Cg, p.BLK), jnp.float32),
            pltpu.VMEM((p.Cg, p.BLK + 2 * p.RPAD), jnp.float32),
            pltpu.VMEM((p.NW, p.K, p.BLK), jnp.float32),
            pltpu.VMEM((p.NW, p.K, p.BLK), jnp.float32),
        ],
    )

    def call(cf, co, xr, w2):
        out = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((p.B, p.dg, p.Cg, p.QPAD), jnp.float32),
                jax.ShapeDtypeStruct((p.B, p.dg, p.NT, p.K, NRS, p.BLK),
                                     jnp.float32),
                jax.ShapeDtypeStruct((p.dg, Og, p.K * p.Cg), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=sb._VMEM_LIMIT),
            interpret=sb._interpret(),
        )(cf, co, xr, w2, goutp, cols)
        return (jnp.sum(out[0][0, 0, 0]) + jnp.sum(out[1][0, 0, 0, 0, 0])
                + jnp.sum(out[2][0, 0]))
    return call


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

    res = {}
    fwd_variants = [
        ("base", set()),
        ("base+cp", {"cp"}),
        ("base+cp+slice", {"cp", "slice"}),
        ("base+cp+sweep", {"cp", "sweep"}),
        ("base+cp+sweep+mask", {"cp", "sweep", "mask"}),
        ("full", {"cp", "sweep", "mask", "gemm"}),
    ]
    for name, parts in fwd_variants:
        t = amortized(make_fwd(plan, Og, parts), (cf, co, xr, w2)) * 1e3
        res[f"fwd[{name}]"] = round(t, 4)
        print(f"fwd[{name}]: {t:.4f} ms", flush=True)

    gout = jnp.asarray(rng.standard_normal((B, O) + tuple(OS)), jnp.float32)
    goutp = jax.jit(lambda gg: sb._gout_prep(gg, plan, O, g))(gout)
    _, cols = jax.jit(functools.partial(
        sb._fwd_call, plan=plan, Og=Og, precision="tensorfloat32",
        save_cols=True))(xr, cf, co, w2)

    bwd_variants = [
        ("base", set()),
        ("base+kloop", {"kloop"}),
        ("base+kloop+sweep", {"kloop", "sweep"}),
        ("+gxacc", {"kloop", "sweep", "gxacc"}),
        ("+r0", {"kloop", "sweep", "gxacc", "r0"}),
        ("full", {"kloop", "sweep", "gxacc", "r0", "gsrows"}),
    ]
    for name, parts in bwd_variants:
        t = amortized(make_bwd(plan, Og, parts, goutp, cols),
                      (cf, co, xr, w2)) * 1e3
        res[f"bwd[{name}]"] = round(t, 4)
        print(f"bwd[{name}]: {t:.4f} ms", flush=True)

    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
