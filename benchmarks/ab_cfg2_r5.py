#!/usr/bin/env python
"""Interleaved A/B harness for cfg2 shift-blend variants (r5).

The axon tunnel drifts +-8% across minutes, so single-shot comparisons of
~10% effects are unreliable.  This harness compiles every variant's chain
pair once, then INTERLEAVES timed rounds across variants (A B C A B C ...)
so drift hits all variants equally, and reports per-variant min/median of
the chain-differenced per-step time.

Variants are (name, dict of shiftblend module overrides) — e.g. BLK=448
(exact-fit output blocks: P=3136 = 7*448, killing the 14% pad-lane waste
of BLK=512) vs the default.

Usage: python benchmarks/ab_cfg2_r5.py [rounds]
"""
import sys

sys.path.insert(0, "/root/repo")

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from modulated_deform_conv_tpu.utils.config import DeformConvSpec
from modulated_deform_conv_tpu.ops.pallas import shiftblend as sb
from modulated_deform_conv_tpu import modulated_deform_conv2d


def chain(step, n):
    @jax.jit
    def run(*a):
        def body(carry, _):
            pert = [q + carry.astype(q.dtype) * 1e-30
                    if jnp.issubdtype(q.dtype, jnp.floating) else q
                    for q in a]
            s = step(*pert)
            return s.astype(a[0].dtype), ()
        s, _ = jax.lax.scan(body, jnp.zeros((), a[0].dtype), None, length=n)
        return s
    return run


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    B, C, O, S, k, g, dg = 8, 256, 256, (56, 56), (3, 3), 4, 4
    nd, K = 2, 9
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, C) + S), jnp.float32)
    off = jnp.asarray(rng.uniform(-2, 2, (B, dg * nd * K) + S), jnp.float32)
    mask = jnp.asarray(rng.uniform(0, 1, (B, dg * K) + S), jnp.float32)
    w = jnp.asarray(rng.standard_normal((O, C // g) + k) * 0.05, jnp.float32)
    args = (x, off, mask, w)

    def loss(x, off, mask, w):
        out = modulated_deform_conv2d(
            x, off, mask, w, None, stride=1, padding=1, groups=g,
            deformable_groups=dg, impl="pallas", offset_bound=2.0,
            precision="tensorfloat32")
        return jnp.sum(out * out)

    def fwdbwd(x, off, mask, w):
        grads = jax.grad(loss, argnums=(0, 1, 2, 3))(x, off, mask, w)
        return sum(jnp.sum(gg) for gg in grads)

    variants = [
        ("BLK512_default", {}),
        ("BLK640", {"_BLK_OVERRIDE": 640}),
        ("BLK256", {"_BLK_OVERRIDE": 256}),
    ]
    if len(sys.argv) > 2:
        variants = [v for v in variants if v[0] in sys.argv[2:]] or variants

    n_lo, n_hi = 2, 12
    compiled = {}
    for name, ovr in variants:
        saved = {kk: getattr(sb, kk) for kk in ovr}
        for kk, vv in ovr.items():
            setattr(sb, kk, vv)
        try:
            lo, hi = chain(fwdbwd, n_lo), chain(fwdbwd, n_hi)
            # compile + 1 warmup execution each
            float(np.asarray(lo(*args)))
            float(np.asarray(hi(*args)))
            compiled[name] = (lo, hi)
        finally:
            for kk, vv in saved.items():
                setattr(sb, kk, vv)
        print(f"compiled {name}", file=sys.stderr, flush=True)

    # Collect raw lo/hi chain wall times interleaved across variants; the
    # per-step estimate is (min(t_hi) - min(t_lo)) / (n_hi - n_lo): minima
    # over many rounds are robust to the tunnel's multi-second slow
    # windows, and differencing minima (rather than taking the min of
    # per-round differences) avoids the negative-diff artifacts a slow
    # window inside one round produces.
    tlo = {name: [] for name, _ in variants}
    thi = {name: [] for name, _ in variants}
    for r in range(rounds):
        for name, _ in variants:
            if name not in compiled:
                continue
            lo, hi = compiled[name]
            t0 = time.perf_counter()
            float(np.asarray(lo(*args)))
            tlo[name].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(np.asarray(hi(*args)))
            thi[name].append(time.perf_counter() - t0)
        print(f"round {r}: " + "  ".join(
            f"{n}:lo={tlo[n][-1]*1e3:.1f} hi={thi[n][-1]*1e3:.1f}"
            for n in tlo if tlo[n]), file=sys.stderr, flush=True)

    out = {}
    for name, _ in variants:
        if not tlo[name]:
            continue
        step = (min(thi[name]) - min(tlo[name])) / (n_hi - n_lo) * 1e3
        k2 = sorted(thi[name])[:2], sorted(tlo[name])[:2]
        step2 = (sum(k2[0]) / 2 - sum(k2[1]) / 2) / (n_hi - n_lo) * 1e3
        out[name] = {"step_ms_mindiff": round(step, 4),
                     "step_ms_min2diff": round(step2, 4),
                     "lo_ms": [round(t * 1e3, 2) for t in sorted(tlo[name])],
                     "hi_ms": [round(t * 1e3, 2) for t in sorted(thi[name])]}
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
