#!/usr/bin/env python
"""
NOTE: r2 experiment snapshot — pins kernel/layout details as they were
when the experiment ran; the production kernels in shiftblend.py have
since evolved (see benchmarks/ANALYSIS.md for the findings ledger).
Probes for the v3 kernels on cfg2:
  fwd: cols dtype f32 vs bf16, store chunk 8 vs 16 sublanes, no-mask-fold
  bwd: sweep2 via u-blend (reduces per tap, not per pair) vs per-pair r0
"""
import sys
sys.path.insert(0, "/root/repo")

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from modulated_deform_conv_tpu.utils.config import DeformConvSpec
from modulated_deform_conv_tpu.ops.pallas import shiftblend as sb
from benchmarks.profile_sb_cfg2 import amortized


def make_fwd(plan, *, cols_dtype, store_cb, fold_mask=True, write_out=True):
    p = plan
    cd = jnp.float32

    def kern(cf_ref, co_ref, x_ref, cols_ref, wr_ref, cp_ref):
        t = pl.program_id(2)
        sb._expand_rows(cf_ref, co_ref, wr_ref, None, p)
        fps = sb._flat_pairs(p)
        for idx, delta, k, dyvec in fps:
            cp_ref[idx] = sb._pair_row(wr_ref, cf_ref, k, dyvec, p,
                                       masked=fold_mask)
        CB = 8
        nstack = store_cb // CB
        pend = {}
        for cb in range(p.Cg // CB):
            xw = x_ref[0, 0, pl.ds(cb * CB, CB),
                       pl.ds(t * p.BLK, p.BLK + 2 * p.RPAD)].astype(cd)
            accs = [jnp.zeros((CB, p.BLK), cd) for _ in range(p.K)]
            for idx, delta, k, dyvec in fps:
                xs = xw[:, p.RPAD + delta:p.RPAD + delta + p.BLK]
                accs[k] = accs[k] + cp_ref[idx, :][None, :].astype(cd) * xs
            if not write_out:
                continue
            if nstack == 1:
                for k in range(p.K):
                    cols_ref[0, 0, 0, pl.ds(k * p.Cg + cb * CB, CB), :] = \
                        accs[k].astype(cols_ref.dtype)
            else:
                for k in range(p.K):
                    pend.setdefault(k, []).append(accs[k])
                if (cb + 1) % nstack == 0:
                    base_cb = cb + 1 - nstack
                    for k in range(p.K):
                        big = jnp.concatenate(pend[k], axis=0)
                        cols_ref[0, 0, 0,
                                 pl.ds(k * p.Cg + base_cb * CB, store_cb),
                                 :] = big.astype(cols_ref.dtype)
                    pend = {}
        if not write_out:
            cols_ref[0, 0, 0, 0:8, :] = accs[0].astype(cols_ref.dtype)

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
        ],
        out_specs=[pl.BlockSpec((1, 1, 1, p.K * p.Cg, p.BLK),
                                lambda b, d, t: (b, d, t, 0, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[
            pltpu.VMEM((p.NW, p.K, p.BLK), jnp.float32),
            pltpu.VMEM((sb._round_up(p.n_pairs, 8), p.BLK), jnp.float32),
        ],
    )

    def call(cf, co, xr):
        out = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct(
                (p.B, p.dg, p.NT, p.K * p.Cg, p.BLK), cols_dtype)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=sb._VMEM_LIMIT),
            interpret=sb._interpret(),
        )(cf, co, xr)
        return jnp.sum(out[0][0, 0, 0, 0].astype(jnp.float32))
    return call


def make_bwd(plan, Og, *, sweep2, with_dots=True, with_sweep1=True):
    """sweep2: 'r0' (per-pair reduce), 'ublend' (per-tap reduce), 'none'."""
    p = plan
    cd = jnp.float32
    prec = jax.lax.Precision.DEFAULT
    NRS = 8

    tap_windows = {k: [] for k in range(p.K)}
    for delta, pairs in p.deltas.items():
        for k, dyvec in pairs:
            tap_windows[k].append((delta, dyvec))

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
        if with_dots:
            gw_ref[0] += jax.lax.dot_general(
                gout, cols_ref[0, 0, 0].astype(cd), (((1,), (1,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32)

        gxw_ref[...] = jnp.zeros_like(gxw_ref)
        if with_sweep1:
            for delta, pairs in p.deltas.items():
                tmp = None
                for k, dyvec in pairs:
                    cm = sb._pair_row(wr_ref, cf_ref, k, dyvec, p,
                                      masked=True)
                    contrib = cm[None, :] * \
                        gcols_ref[pl.ds(k * p.Cg, p.Cg), :]
                    tmp = contrib if tmp is None else tmp + contrib
                gxw_ref[:, p.RPAD + delta:p.RPAD + delta + p.BLK] += tmp
        gx_ref[0, 0, :, pl.ds(t * p.BLK, p.BLK + 2 * p.RPAD)] += gxw_ref[...]

        gs_ref[...] = jnp.zeros_like(gs_ref)
        if sweep2 == "r0":
            for k in range(p.K):
                gcol = gcols_ref[pl.ds(k * p.Cg, p.Cg), :]
                mrow = cf_ref[0, 0, p.cmask, k, :] if p.modulated else None
                goff = [jnp.zeros((p.BLK,), jnp.float32)
                        for _ in range(p.nd)]
                gm = jnp.zeros((p.BLK,), jnp.float32)
                for delta, dyvec in tap_windows[k]:
                    xs = xw[:, p.RPAD + delta:p.RPAD + delta + p.BLK]
                    r0nm = jnp.sum(gcol * xs, axis=0, keepdims=True)[0]
                    r0m = r0nm * mrow if p.modulated else r0nm
                    arows = [wr_ref[p.row0[d] + dyvec[d], k, :]
                             for d in range(p.nd)]
                    for d in range(p.nd):
                        dab = dwr_ref[p.row0[d] + dyvec[d], k, :]
                        for e in range(p.nd):
                            if e != d:
                                dab = dab * arows[e]
                        goff[d] = goff[d] + dab * r0m
                    if p.modulated:
                        ab = arows[0]
                        for d in range(1, p.nd):
                            ab = ab * arows[d]
                        gm = gm + ab * r0nm
                for d in range(p.nd):
                    gs_ref[0, 0, 0, k, d, :] = goff[d]
                if p.modulated:
                    gs_ref[0, 0, 0, k, p.nd, :] = gm
        elif sweep2 == "ublend":
            CB = 8
            for k in range(p.K):
                raw = [jnp.zeros((1, p.BLK), jnp.float32)
                       for _ in range(p.nd + 1)]
                for cb in range(p.Cg // CB):
                    gcol = gcols_ref[pl.ds(k * p.Cg + cb * CB, CB), :]
                    xwcb = x_ref[0, 0, pl.ds(cb * CB, CB),
                                 pl.ds(t * p.BLK, p.BLK + 2 * p.RPAD)]
                    us = [jnp.zeros((CB, p.BLK), jnp.float32)
                          for _ in range(p.nd + 1)]
                    for delta, dyvec in tap_windows[k]:
                        xs = xwcb[:, p.RPAD + delta:p.RPAD + delta + p.BLK]
                        arows = [wr_ref[p.row0[d] + dyvec[d], k, :]
                                 for d in range(p.nd)]
                        for d in range(p.nd):
                            dab = dwr_ref[p.row0[d] + dyvec[d], k, :]
                            for e in range(p.nd):
                                if e != d:
                                    dab = dab * arows[e]
                            us[d] = us[d] + dab[None, :] * xs
                        if p.modulated:
                            ab = arows[0]
                            for d in range(1, p.nd):
                                ab = ab * arows[d]
                            us[p.nd] = us[p.nd] + ab[None, :] * xs
                    for i in range(p.nd + (1 if p.modulated else 0)):
                        raw[i] = raw[i] + jnp.sum(gcol * us[i], axis=0,
                                                  keepdims=True)
                mrow = cf_ref[0, 0, p.cmask, k, :] if p.modulated else None
                for d in range(p.nd):
                    row = raw[d][0]
                    gs_ref[0, 0, 0, k, d, :] = \
                        row * mrow if p.modulated else row
                if p.modulated:
                    gs_ref[0, 0, 0, k, p.nd, :] = raw[p.nd][0]

    spg = p.dg // 4  # cfg2: groups=4
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
        pl.BlockSpec((1, 1, Og, p.BLK),
                     lambda d, b, t: (b, d // max(spg, 1), 0, t),
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

    def call(cf, co, xr, w2, goutp, cols):
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
        return (jnp.sum(out[0][0, 0, 0]) + jnp.sum(out[1][0, 0, 0])
                + jnp.sum(out[2][0, 0])), out
    return call


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
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
    xr = jax.jit(lambda xx: sb._x_prep(xx, plan))(x)
    w2 = jax.jit(lambda ww: sb._w2_prep(ww, plan, g))(w)

    if which in ("all", "fwd"):
        for name, kw in [
            ("bf16 cb8", dict(cols_dtype=jnp.bfloat16, store_cb=8)),
            ("bf16 cb16", dict(cols_dtype=jnp.bfloat16, store_cb=16)),
            ("f32 cb8", dict(cols_dtype=jnp.float32, store_cb=8)),
            ("bf16 cb8 nowrite", dict(cols_dtype=jnp.bfloat16, store_cb=8,
                                      write_out=False)),
        ]:
            t = amortized(make_fwd(plan, **kw), (cf, co, xr)) * 1e3
            print(f"fwd[{name}]: {t:.4f} ms", flush=True)

    if which in ("all", "bwd"):
        gout = jnp.asarray(rng.standard_normal((B, O) + tuple(OS)),
                           jnp.float32)
        goutp = jax.jit(lambda gg: sb._gout_prep(gg, plan, O, g))(gout)
        _, cols = jax.jit(functools.partial(
            sb._fwd_call, plan=plan, Og=Og,
            precision="tensorfloat32"))(xr, cf, co, w2)
        ref = None
        for name, kw in [
            ("sweep2=none", dict(sweep2="none")),
            ("sweep2=r0", dict(sweep2="r0")),
            ("sweep2=ublend", dict(sweep2="ublend")),
        ]:
            fn = make_bwd(plan, Og, **kw)
            t = amortized(lambda *a: fn(*a)[0],
                          (cf, co, xr, w2, goutp, cols)) * 1e3
            _, outs = jax.jit(fn)(cf, co, xr, w2, goutp, cols)
            gs = np.asarray(outs[1])
            if kw["sweep2"] == "r0":
                ref = gs
            err = (float(np.max(np.abs(gs - ref)) /
                         (np.max(np.abs(ref)) + 1e-9))
                   if ref is not None and kw["sweep2"] == "ublend" else -1)
            print(f"bwd[{name}]: {t:.4f} ms  gs_err={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
