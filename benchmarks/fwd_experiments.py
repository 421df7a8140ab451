#!/usr/bin/env python
"""
NOTE: r2 experiment snapshot — pins kernel/layout details as they were
when the experiment ran; the production kernels in shiftblend.py have
since evolved (see benchmarks/ANALYSIS.md for the findings ledger).
Forward-kernel experiments on BASELINE config 2: GEMM dtype, tap-major
structure (per-tap GEMM overlapping the next tap's sweep), block size.

Usage: python benchmarks/fwd_experiments.py
"""
import sys
sys.path.insert(0, "/root/repo")

import json

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from modulated_deform_conv_tpu.utils.config import DeformConvSpec
from modulated_deform_conv_tpu.ops.pallas import shiftblend as sb
from benchmarks.profile_sb_cfg2 import amortized


def make_fwd(plan, Og, *, gemm_dtype, structure, save_cols=False,
             fold_mask=False):
    """structure: 'regacc' (delta-major, one end GEMM) or 'tapmajor'
    (per-tap sweep + per-tap GEMM accumulation)."""
    p = plan
    cd = jnp.float32
    gd = gemm_dtype
    prec = jax.lax.Precision.DEFAULT

    flat_pairs = []
    for delta, pairs in p.deltas.items():
        for k, dyvec in pairs:
            flat_pairs.append((len(flat_pairs), delta, k, dyvec))
    # tap-major orderings: pairs of tap k sorted by delta
    tap_pairs = {k: [] for k in range(p.K)}
    for idx, delta, k, dyvec in flat_pairs:
        tap_pairs[k].append((idx, delta, dyvec))

    def kern(cf_ref, co_ref, x_ref, w2_ref, out_ref, *rest):
        if save_cols:
            cols_ref = rest[0]
            rest = rest[1:]
        else:
            cols_ref = None
        t = pl.program_id(2)
        sb._expand_rows(cf_ref, co_ref, rest[-2], None, p)
        wr_ref, cp_ref = rest[-2], rest[-1]
        for idx, delta, k, dyvec in flat_pairs:
            c = wr_ref[p.row0[0] + dyvec[0], k, :]
            for d in range(1, p.nd):
                c = c * wr_ref[p.row0[d] + dyvec[d], k, :]
            if fold_mask and p.modulated:
                c = c * cf_ref[0, 0, p.cmask, k, :]
            cp_ref[idx] = c

        CB = 8
        if structure == "regacc":
            acc2_ref = rest[0]
            for cb in range(p.Cg // CB):
                xw = x_ref[0, 0, pl.ds(cb * CB, CB),
                           pl.ds(t * p.BLK, p.BLK + 2 * p.RPAD)].astype(cd)
                accs = [jnp.zeros((CB, p.BLK), cd) for _ in range(p.K)]
                for idx, delta, k, dyvec in flat_pairs:
                    xs = xw[:, p.RPAD + delta:p.RPAD + delta + p.BLK]
                    accs[k] = accs[k] + cp_ref[idx, :][None, :].astype(cd) * xs
                for k in range(p.K):
                    acc2_ref[pl.ds(k * p.Cg + cb * CB, CB), :] = accs[k]
            if save_cols:
                cols_ref[0, 0, 0] = acc2_ref[...].astype(cols_ref.dtype)
            if p.modulated and not fold_mask:
                for k in range(p.K):
                    m = cf_ref[0, 0, p.cmask, k, :].astype(acc2_ref.dtype)
                    acc2_ref[pl.ds(k * p.Cg, p.Cg), :] *= m[None, :]
            w2 = w2_ref[0].astype(gd)
            out_ref[0, 0, 0] = jax.lax.dot_general(
                w2, acc2_ref[...].astype(gd), (((1,), (0,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32)
        else:  # tapmajor
            acck_ref = rest[0]
            out = None
            for k in range(p.K):
                for cb in range(p.Cg // CB):
                    xw = x_ref[0, 0, pl.ds(cb * CB, CB),
                               pl.ds(t * p.BLK,
                                     p.BLK + 2 * p.RPAD)].astype(cd)
                    acc = jnp.zeros((CB, p.BLK), cd)
                    for idx, delta, dyvec in tap_pairs[k]:
                        xs = xw[:, p.RPAD + delta:p.RPAD + delta + p.BLK]
                        acc = acc + cp_ref[idx, :][None, :].astype(cd) * xs
                    acck_ref[pl.ds(cb * CB, CB), :] = acc
                if save_cols:
                    cols_ref[0, 0, 0, pl.ds(k * p.Cg, p.Cg), :] = \
                        acck_ref[...].astype(cols_ref.dtype)
                if p.modulated and not fold_mask:
                    m = cf_ref[0, 0, p.cmask, k, :].astype(acck_ref.dtype)
                    acck_ref[...] *= m[None, :]
                w2k = w2_ref[0, :, pl.ds(k * p.Cg, p.Cg)].astype(gd)
                contrib = jax.lax.dot_general(
                    w2k, acck_ref[...].astype(gd), (((1,), (0,)), ((), ())),
                    precision=prec, preferred_element_type=jnp.float32)
                out = contrib if out is None else out + contrib
            out_ref[0, 0, 0] = out

    out_shapes = [jax.ShapeDtypeStruct((p.B, p.dg, p.NT, Og, p.BLK),
                                       jnp.float32)]
    out_specs = [pl.BlockSpec((1, 1, 1, Og, p.BLK),
                              lambda b, d, t: (b, d, t, 0, 0),
                              memory_space=pltpu.VMEM)]
    if save_cols:
        out_shapes.append(jax.ShapeDtypeStruct(
            (p.B, p.dg, p.NT, p.K * p.Cg, p.BLK), jnp.bfloat16))
        out_specs.append(pl.BlockSpec((1, 1, 1, p.K * p.Cg, p.BLK),
                                      lambda b, d, t: (b, d, t, 0, 0),
                                      memory_space=pltpu.VMEM))
    scratch = []
    if structure == "regacc":
        scratch.append(pltpu.VMEM((p.K * p.Cg, p.BLK), jnp.float32))
    else:
        scratch.append(pltpu.VMEM((p.Cg, p.BLK), jnp.float32))
    scratch += [pltpu.VMEM((p.NW, p.K, p.BLK), jnp.float32),
                pltpu.VMEM((sb._round_up(p.n_pairs, 8), p.BLK),
                           jnp.float32)]
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
        out_specs=out_specs,
        scratch_shapes=scratch,
    )

    def call(cf, co, xr, w2):
        out = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=out_shapes,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=sb._VMEM_LIMIT),
            interpret=sb._interpret(),
        )(cf, co, xr, w2)
        s = jnp.sum(out[0][0, 0, 0, 0])
        if save_cols:
            s = s + jnp.sum(out[1][0, 0, 0, 0].astype(jnp.float32))
        return s, out[0]
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
    Og = O // g

    def planned(blk):
        plan = sb.SBPlan(spec, B, C, x.shape[2:], OS, 2.0)
        if blk is not None:
            plan.BLK = blk
            plan.PPAD = sb._round_up(plan.P, plan.BLK)
            plan.NT = plan.PPAD // plan.BLK
            plan.QPAD = plan.PPAD + 2 * plan.RPAD
        return plan

    results = {}
    ref_out = None
    cases = [
        ("regacc_f32gemm_512", dict(gemm_dtype=jnp.float32,
                                    structure="regacc"), 512),
        ("regacc_bf16gemm_512", dict(gemm_dtype=jnp.bfloat16,
                                     structure="regacc"), 512),
        ("tapmajor_f32gemm_512", dict(gemm_dtype=jnp.float32,
                                      structure="tapmajor"), 512),
        ("tapmajor_bf16gemm_512", dict(gemm_dtype=jnp.bfloat16,
                                       structure="tapmajor"), 512),
        ("tapmajor_bf16_foldmask_512", dict(gemm_dtype=jnp.bfloat16,
                                            structure="tapmajor",
                                            fold_mask=True), 512),
        ("tapmajor_bf16_896", dict(gemm_dtype=jnp.bfloat16,
                                   structure="tapmajor"), 896),
        ("tapmajor_bf16_1792", dict(gemm_dtype=jnp.bfloat16,
                                    structure="tapmajor"), 1792),
        ("tapmajor_bf16_savecols_512", dict(gemm_dtype=jnp.bfloat16,
                                            structure="tapmajor",
                                            save_cols=True), 512),
        ("regacc_bf16_savecols_512", dict(gemm_dtype=jnp.bfloat16,
                                          structure="regacc",
                                          save_cols=True), 512),
    ]
    for name, kw, blk in cases:
        plan = planned(blk)
        cf, co = jax.jit(
            lambda o, m: sb._coef_prep(o, m, spec, plan))(off, mask)
        xr = jax.jit(lambda x: sb._x_prep(x, plan))(x)
        w2 = jax.jit(lambda w: sb._w2_prep(w, plan, g))(w)
        fn = make_fwd(plan, Og, **kw)
        try:
            t = amortized(lambda *a: fn(*a)[0], (cf, co, xr, w2)) * 1e3
            _, outp = jax.jit(fn)(cf, co, xr, w2)
            outp = np.asarray(outp[:, :, :, :, :])
            # normalize across BLK: reshape to (B, dg, Og, PPAD)[:P]
            flat = outp.transpose(0, 1, 3, 2, 4).reshape(
                plan.B, plan.dg, Og, plan.PPAD)[..., :plan.P]
            if ref_out is None:
                ref_out = flat
                err = 0.0
            else:
                err = float(np.max(np.abs(flat - ref_out))
                            / (np.max(np.abs(ref_out)) + 1e-9))
            results[name] = {"ms": round(t, 4), "relerr_vs_first": err}
            print(f"{name:32s} {t:8.4f} ms  relerr={err:.2e}", flush=True)
        except Exception as e:
            results[name] = {"error": str(e)[:200]}
            print(f"{name:32s} ERROR {str(e)[:120]}", flush=True)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
