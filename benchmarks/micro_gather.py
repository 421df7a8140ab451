#!/usr/bin/env python
"""Microbenchmark: Mosaic dynamic lane-gather throughput inside a Pallas
kernel on the real chip.

Questions:
  1. cost per gathered (8,128)-vreg for take_along_axis along lanes
  2. scaling with source width (56 / 128 / 280 / 512 lanes)
  3. f32 vs bf16
  4. cost of the surrounding blend FMAs
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


def measure(fn, args, iters=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    float(np.asarray(jnp.sum(out)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(jnp.sum(out)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def amortized(make_fn, args, n_lo=64, n_hi=512, iters=5):
    t_lo = measure(make_fn(n_lo), args, iters)
    t_hi = measure(make_fn(n_hi), args, iters)
    return max((t_hi - t_lo) / (n_hi - n_lo), 1e-12)


def gather_kernel(x_ref, idx_ref, o_ref, *, iters, sw, blend):
    """Repeat: o += gather(x, idx + (i % 2)) so the loop can't fold."""
    def body(i, acc):
        idx = jnp.minimum(idx_ref[...] + (i % 2), sw - 1)
        g = jnp.take_along_axis(x_ref[...], idx, axis=1)
        if blend:
            g2 = jnp.take_along_axis(
                x_ref[...], jnp.minimum(idx + 1, sw - 1), axis=1)
            f = idx.astype(x_ref.dtype) * 0.001
            g = g * (1.0 - f) + g2 * f
        return acc + g.astype(jnp.float32)
    o_ref[...] = jax.lax.fori_loop(0, iters, body,
                                   jnp.zeros_like(o_ref)).astype(o_ref.dtype)


def run_case(name, rows, sw, nl, dtype, blend, results):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((rows, sw)), dtype)
    idx = jnp.asarray(rng.integers(0, sw, (rows, nl)), jnp.int32)

    def make_fn(iters):
        k = functools.partial(gather_kernel, iters=iters, sw=sw, blend=blend)
        return jax.jit(lambda x, idx: pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((rows, nl), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx))

    try:
        t = amortized(make_fn, (x, idx))
        nv = (rows // 8) * (-(-nl // 128))   # output vregs per gather op
        gathers = 2 if blend else 1
        results[name] = {
            "per_iter_us": t * 1e6,
            "out_vregs": nv,
            "ns_per_out_vreg": t * 1e9 / (nv * gathers),
        }
        print(f"{name}: {t*1e6:.2f}us/iter, {t*1e9/(nv*gathers):.1f} "
              f"ns/out-vreg ({nv} vregs x {gathers} gathers)", file=sys.stderr)
    except Exception as e:
        results[name] = {"error": str(e).split(chr(10))[0][:200]}
        print(f"{name}: FAILED {str(e).splitlines()[0][:200]}",
              file=sys.stderr)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)
    results = {}
    # source width sweep, f32, 64 sublanes, 2016 output lanes (cfg2's KP)
    for sw in (56, 128, 256, 512, 1024, 3136):
        run_case(f"f32_r64_sw{sw}_nl2016", 64, sw, 2016, jnp.float32,
                 False, results)
    # bf16
    run_case("bf16_r64_sw128_nl2016", 64, 128, 2016, jnp.bfloat16,
             False, results)
    # blend (2 gathers + FMA)
    run_case("f32_r64_sw128_nl2016_blend", 64, 128, 2016, jnp.float32,
             True, results)
    # narrow rows (8 sublanes)
    run_case("f32_r8_sw128_nl2016", 8, 128, 2016, jnp.float32,
             False, results)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
