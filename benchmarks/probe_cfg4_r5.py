#!/usr/bin/env python
"""cfg4 probe (r5): residual-budget fix + precision rows.

BASELINE config 4 (mDCN3d B=4 128ch 32x64x64) runs on shiftblend's
lead-chunked mode.  r4 shipped 6.1 samples/s with the backward at 4.0x
the forward - the per-chunk cols residual (453MB) sat just over the old
256MB budget, so the rolled-loop backward recomputed the columns.  This
probe measures fwd / fwd+bwd with the raised budget, plus the
precision="bfloat16" row (the rolled-loop path sweeps in the compute
dtype, so bf16 engages the 2.3x VPU rate - unlike the unrolled 2D path
where bf16 vector ops measured slower, ANALYSIS.md negative result b).

Usage: python benchmarks/probe_cfg4_r5.py [rounds] [n_hi]
"""
import sys

sys.path.insert(0, "/root/repo")

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from modulated_deform_conv_tpu import modulated_deform_conv3d


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_hi = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    B, C, O, S, k, g, dg = 4, 128, 128, (32, 64, 64), (3, 3, 3), 1, 1
    nd, K = 3, 27
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, C) + S), jnp.float32)
    off = jnp.asarray(rng.uniform(-2, 2, (B, dg * nd * K) + S), jnp.float32)
    mask = jnp.asarray(rng.uniform(0, 1, (B, dg * K) + S), jnp.float32)
    w = jnp.asarray(rng.standard_normal((O, C // g) + k) * 0.05,
                    jnp.float32)
    args = (x, off, mask, w)

    def make(precision, bwd):
        def loss(x, off, mask, w):
            out = modulated_deform_conv3d(
                x, off, mask, w, None, stride=1, padding=1, groups=g,
                deformable_groups=dg, in_step=2, impl="pallas",
                offset_bound=2.0, precision=precision)
            return jnp.sum(out * out)
        if not bwd:
            return loss

        def fwdbwd(x, off, mask, w):
            grads = jax.grad(loss, argnums=(0, 1, 2, 3))(x, off, mask, w)
            return sum(jnp.sum(gg) for gg in grads)
        return fwdbwd

    def chain(step, n):
        @jax.jit
        def run(*a):
            def body(carry, _):
                pert = [a[0] + carry.astype(a[0].dtype) * 1e-30] \
                    + list(a[1:])
                s = step(*pert)
                return s.astype(a[0].dtype), ()
            s, _ = jax.lax.scan(body, jnp.zeros((), a[0].dtype), None,
                                length=n)
            return s
        return run

    n_lo = 1
    variants = [
        ("tf32_fwd", "tensorfloat32", False),
        ("tf32_fwdbwd", "tensorfloat32", True),
        ("bf16_fwdbwd", "bfloat16", True),
    ]
    compiled = {}
    for name, prec, bwd in variants:
        step = make(prec, bwd)
        lo, hi = chain(step, n_lo), chain(step, n_hi)
        t0 = time.perf_counter()
        float(np.asarray(lo(*args)))
        float(np.asarray(hi(*args)))
        compiled[name] = (lo, hi)
        print(f"compiled {name} in {time.perf_counter()-t0:.0f}s",
              file=sys.stderr, flush=True)

    tlo = {n: [] for n, *_ in variants}
    thi = {n: [] for n, *_ in variants}
    for r in range(rounds):
        for name, *_ in variants:
            lo, hi = compiled[name]
            t0 = time.perf_counter()
            float(np.asarray(lo(*args)))
            tlo[name].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(np.asarray(hi(*args)))
            thi[name].append(time.perf_counter() - t0)
        print(f"round {r} done", file=sys.stderr, flush=True)

    out = {}
    for name, *_ in variants:
        ms = (min(thi[name]) - min(tlo[name])) / (n_hi - n_lo) * 1e3
        out[name] = {"step_ms": round(ms, 2),
                     "samples_per_s": round(B / (ms / 1e3), 2)}
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
