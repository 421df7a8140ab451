#!/usr/bin/env python
"""Microbenchmarks: in-kernel VPU FMA, dynamic_gather, and MXU matmul
throughput on the real chip.

Methodology: each fori_loop iteration issues G independent ops (hides
latency); the loop carries a cheap dependency so nothing folds; total work
is sized to tens of ms so the ~32ms dispatch latency differences out
between two chain lengths.
"""
import sys
sys.path.insert(0, "/root/repo")

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def measure(fn, args, iters=4, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    float(np.asarray(jnp.sum(out[0] if isinstance(out, (tuple, list)) else out)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(jnp.sum(out[0] if isinstance(out, (tuple, list)) else out)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def amortized(make_fn, args, n_lo, n_hi, iters=4):
    t_lo = measure(make_fn(n_lo), args, iters)
    t_hi = measure(make_fn(n_hi), args, iters)
    return max((t_hi - t_lo) / (n_hi - n_lo), 1e-12)


def pcall(kernel, out_shape, n_in):
    return lambda *a: pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*a)


results = {}


def report(name, t_per_iter, work_per_iter, unit):
    results[name] = {"per_iter_us": t_per_iter * 1e6,
                     unit + "_per_s": work_per_iter / t_per_iter}
    print(f"{name}: {t_per_iter*1e6:.3f} us/iter -> "
          f"{work_per_iter/t_per_iter/1e9:.2f} G{unit}/s", file=sys.stderr)


def safe(fn, *a, **kw):
    try:
        fn(*a, **kw)
    except Exception as e:
        lines = [ln for ln in str(e).splitlines() if ln.strip()]
        print(f"{fn.__name__}{a[:3]}: FAILED {lines[:2]}", file=sys.stderr)
        sys.stderr.flush()


# ---------------------------------------------------------------- VPU FMA
def fma_case(rows, cols, dtype, name, n_hi=65536):
    x = jnp.ones((rows, cols), dtype) * 0.5

    def make(n):
        def kernel(x_ref, o_ref):
            xv = x_ref[...]

            def body(i, accs):
                # 4 independent FMA chains per iteration
                return tuple(a * 0.9999 + xv for a in accs)
            accs = jax.lax.fori_loop(
                0, n, body, tuple(jnp.zeros((rows, cols), dtype)
                                  for _ in range(4)))
            o_ref[...] = sum(a.astype(jnp.float32) for a in accs)
        return jax.jit(pcall(
            kernel, jax.ShapeDtypeStruct((rows, cols), jnp.float32), 1))

    t = amortized(make, (x,), n_hi // 8, n_hi)
    report(name, t, 4 * rows * cols, "elem_fma")


# ---------------------------------------------------------- dynamic gather
def gather_case(rows, width, dtype, name, n_groups=8, n_hi=16384):
    """n_groups independent (rows,128) gathers from a (rows,width) source.
    Index depends on the loop counter (cannot fold)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((rows, width)), dtype)
    idt = jnp.int16 if dtype == jnp.bfloat16 else jnp.int32
    idx = jnp.asarray(rng.integers(0, width - 1, (rows, 128 * n_groups)),
                      jnp.int32)

    def make(n):
        def kernel(x_ref, idx_ref, o_ref):
            src = x_ref[...]
            iall = idx_ref[...].astype(idt)

            def body(i, acc):
                d = (i & 1).astype(idt)
                parts = []
                for g in range(n_groups):
                    ig = iall[:, g * 128:(g + 1) * 128] + d
                    parts.append(jnp.take_along_axis(src, ig, axis=1))
                s = parts[0]
                for p_ in parts[1:]:
                    s = s + p_
                return acc + s.astype(jnp.float32)
            o_ref[...] = jax.lax.fori_loop(
                0, n, body, jnp.zeros_like(o_ref))
        return jax.jit(pcall(
            kernel, jax.ShapeDtypeStruct((rows, 128), jnp.float32), 2))

    t = amortized(make, (x, idx), n_hi // 8, n_hi)
    nv = max(rows // 8, 1) * n_groups
    report(name, t, nv, "vreg_gather")
    results[name]["ns_per_vreg"] = t * 1e9 / nv


# --------------------------------------------------- gather+bilinear blend
def blend_case(rows, dtype, name, n_groups=4, n_hi=16384):
    """One fused bilinear sample per output elem: 4 gathers (2 from each of
    two row-planes) + 3 blends per 128-lane group."""
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((rows, 128)), dtype)
    x1 = jnp.asarray(rng.standard_normal((rows, 128)), dtype)
    idt = jnp.int16 if dtype == jnp.bfloat16 else jnp.int32
    idx = jnp.asarray(rng.integers(0, 126, (rows, 128 * n_groups)), jnp.int32)
    fw = jnp.asarray(rng.uniform(0, 1, (rows, 128 * n_groups)), dtype)

    def make(n):
        def kernel(x0_ref, x1_ref, idx_ref, fw_ref, o_ref):
            s0 = x0_ref[...]
            s1 = x1_ref[...]
            fw_all = fw_ref[...]
            iall = idx_ref[...].astype(idt)

            def body(i, acc):
                d = (i & 1).astype(idt)
                s = None
                for g in range(n_groups):
                    ig = iall[:, g * 128:(g + 1) * 128] + d
                    f = fw_all[:, g * 128:(g + 1) * 128]
                    a = jnp.take_along_axis(s0, ig, axis=1)
                    b = jnp.take_along_axis(s0, ig + 1, axis=1)
                    c = jnp.take_along_axis(s1, ig, axis=1)
                    e = jnp.take_along_axis(s1, ig + 1, axis=1)
                    lo = a * (1.0 - f) + b * f
                    hi = c * (1.0 - f) + e * f
                    v = lo * (1.0 - f) + hi * f
                    s = v if s is None else s + v
                return acc + s.astype(jnp.float32)
            o_ref[...] = jax.lax.fori_loop(
                0, n, body, jnp.zeros_like(o_ref))
        return jax.jit(pcall(
            kernel, jax.ShapeDtypeStruct((rows, 128), jnp.float32), 4))

    t = amortized(make, (x0, x1, idx, fw), n_hi // 8, n_hi)
    nsamp = rows * 128 * n_groups
    report(name, t, nsamp, "bilinear_samples")


# ------------------------------------------------------------ matmul rates
def mm_case(M, Kdim, N, dtype, name, n_hi=16384):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((M, Kdim)) * 0.1, dtype)
    b = jnp.asarray(rng.standard_normal((Kdim, N)) * 0.1, dtype)

    def make(n):
        def kernel(a_ref, b_ref, o_ref):
            bv = b_ref[...]
            av0 = a_ref[...]

            def body(i, accs):
                av = av0 * (0.9999 + accs[0][0, 0] * 1e-30)
                return tuple(
                    acc * 0.5 + jax.lax.dot_general(
                        av, bv, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    for acc in accs)
            accs = jax.lax.fori_loop(
                0, n, body, tuple(jnp.zeros((M, N), jnp.float32)
                                  for _ in range(2)))
            o_ref[...] = accs[0] + accs[1]
        return jax.jit(pcall(kernel, jax.ShapeDtypeStruct((M, N), jnp.float32), 2))

    t = amortized(make, (a, b), n_hi // 8, n_hi)
    report(name, t, 2 * 2 * M * Kdim * N, "flop")


if __name__ == "__main__":
    safe(fma_case, 64, 2048, jnp.float32, "fma_f32_64x2048")
    safe(fma_case, 64, 2048, jnp.bfloat16, "fma_bf16_64x2048")

    for rows in (8, 32, 64):
        safe(gather_case, rows, 128, jnp.float32, f"gather_f32_r{rows}w128")
    safe(gather_case, 64, 128, jnp.bfloat16, "gather_bf16_r64w128")

    safe(blend_case, 64, jnp.float32, "blend_f32_r64")
    safe(blend_case, 64, jnp.bfloat16, "blend_bf16_r64")

    safe(mm_case, 64, 56, 2048, jnp.bfloat16, "mm_bf16_64x56x2048")
    safe(mm_case, 64, 128, 2048, jnp.bfloat16, "mm_bf16_64x128x2048")
    safe(mm_case, 128, 128, 2048, jnp.bfloat16, "mm_bf16_128x128x2048")
    safe(mm_case, 64, 128, 2048, jnp.float32, "mm_f32_64x128x2048")
    safe(mm_case, 512, 512, 512, jnp.bfloat16, "mm_bf16_512x512x512")
    safe(mm_case, 8, 128, 2048, jnp.bfloat16, "mm_bf16_8x128x2048", n_hi=65536)

    print(json.dumps(results, indent=2))
