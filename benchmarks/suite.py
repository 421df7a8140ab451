#!/usr/bin/env python
"""Benchmark suite over the BASELINE.md configs (single chip).

Runs every config forward and forward+backward, for both the XLA path and
the fused Pallas kernel, with dispatch-latency-amortized timing (see
bench.py: the axon tunnel adds ~30ms per call).  Writes
benchmarks/suite_results.json and prints a summary table to stderr.

Config 5's multi-host sharding axis is exercised separately by
tests/test_sharding.py on a CPU-simulated mesh and by
__graft_entry__.dryrun_multichip; here its per-stage single-chip shapes are
measured (DCN-in-ResNet-50 stages c3..c5 at batch 32).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import measure_amortized, log  # noqa: E402


def build_case(name, op, nd, B, C, O, S, k, g, dg, modulated, bias, in_step,
               off_scale=2.0, **kw):
    import numpy as np
    import jax.numpy as jnp
    K = k ** nd
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, C) + S), jnp.float32)
    off = jnp.asarray(rng.uniform(-off_scale, off_scale,
                                  (B, dg * nd * K) + S), jnp.float32)
    args = [x, off]
    if modulated:
        args.append(jnp.asarray(rng.uniform(0, 1, (B, dg * K) + S),
                                jnp.float32))
    w = jnp.asarray(rng.standard_normal((O, C // g, ) + (k,) * nd) * 0.05,
                    jnp.float32)
    args.append(w)
    args.append(jnp.zeros((O,), jnp.float32) if bias else None)
    kwargs = dict(stride=1, padding=k // 2, groups=g, deformable_groups=dg,
                  in_step=in_step, offset_bound=off_scale, **kw)
    return dict(name=name, op=op, args=args, kwargs=kwargs, batch=B)


def case_specs():
    return [
        # BASELINE config 1: my_test-style smoke at benchable scale
        lambda: build_case("cfg1_dcn2d_32ch_64x64", "deform_conv2d", 2,
                   2, 32, 32, (64, 64), 3, 1, 1, False, False, 64),
        # BASELINE config 2: the headline DCNv2 layer
        lambda: build_case("cfg2_mdcn2d_256ch_56x56_g4", "modulated_deform_conv2d",
                   2, 8, 256, 256, (56, 56), 3, 4, 4, True, True, 64),
        # BASELINE config 3: 3D video volume
        lambda: build_case("cfg3_dcn3d_64ch_16x32x32", "deform_conv3d", 3,
                   2, 64, 64, (16, 32, 32), 3, 1, 1, False, False, 64),
        # BASELINE config 4: large modulated 3D with in_step micro-batching
        lambda: build_case("cfg4_mdcn3d_128ch_32x64x64_instep2",
                   "modulated_deform_conv3d", 3,
                   4, 128, 128, (32, 64, 64), 3, 1, 1, True, False, 2),
        # BASELINE config 5: DCNv2 ResNet-50 stage shapes (B=32/chip)
        lambda: build_case("cfg5_r50_c3_512ch_28x28", "modulated_deform_conv2d", 2,
                   32, 512, 512, (28, 28), 3, 1, 1, True, True, 64),
        lambda: build_case("cfg5_r50_c4_1024ch_14x14", "modulated_deform_conv2d", 2,
                   32, 1024, 1024, (14, 14), 3, 1, 1, True, True, 64),
        lambda: build_case("cfg5_r50_c5_2048ch_7x7", "modulated_deform_conv2d", 2,
                   32, 2048, 2048, (7, 7), 3, 1, 1, True, True, 64),
    ]


def run_case(case, impl, iters, skip_slow_xla=False, tune=False):
    import jax
    import jax.numpy as jnp
    import modulated_deform_conv_tpu as mdc

    op = getattr(mdc, case["op"])
    args = [a for a in case["args"] if a is not None]
    has_bias = case["args"][-1] is not None
    kwargs = dict(case["kwargs"])

    def fwd(*a):
        bias = a[-1] if has_bias else None
        ins = a[:-1] if has_bias else a
        return jnp.sum(jnp.square(op(*ins, bias, **kwargs, impl=impl)))

    nargs = len(args)

    def fwdbwd(*a):
        gs = jax.grad(fwd, argnums=tuple(range(nargs)))(*a)
        return sum(jnp.sum(g) for g in gs)

    tuned = None
    if tune and impl not in ("xla",):
        # One-shot knob autotune (VERDICT r3 item 8): pick the plan-knob
        # variant on an amortized fwd+bwd chain (single dispatches drown
        # in the ~30ms tunnel latency), cache per (device_kind, case),
        # and leave the winner applied for the timed run below.
        from modulated_deform_conv_tpu.utils import autotune
        from modulated_deform_conv_tpu.ops.pallas import gathermm as gm
        from modulated_deform_conv_tpu.ops.pallas import shiftblend as sb

        def _runN(n):
            def run(*a):
                def body(c, _):
                    pert = [q + c.astype(q.dtype) * 1e-30 for q in a]
                    return fwdbwd(*pert).astype(a[0].dtype), ()
                s, _ = jax.lax.scan(body, jnp.zeros((), a[0].dtype), None,
                                    length=n)
                return s
            return run

        # One fresh jit per (variant, chain length), reused across timing
        # reps: jax's jit cache keys on shapes only, so a changed module
        # override must get a new jit object — but recreating it per rep
        # (as a naive closure would) re-traces and re-lowers the whole
        # fwd+bwd chain on the host every call, minutes per case.
        _jits = {}

        def chain_builder(n):
            key = (gm._SCH_OVERRIDE, gm._PT_OVERRIDE, gm._K0_OVERRIDE,
                   sb._BLK_OVERRIDE, n)
            if key not in _jits:
                _jits[key] = jax.jit(_runN(n))
            return lambda: _jits[key](*args)

        # r5: the autotuner times variants with chain-DIFFERENCED per-step
        # estimates (utils/autotune._time_differenced), which resolves the
        # ~10% deltas the old 2-rep whole-call timing could not — so the
        # r3 knob space is restored (SB_BLK/PT alongside SCH; uncompilable
        # variants are skipped inside autotune_sch).  Heavy cases (cfg4:
        # ~0.5s steps, minutes-long chain compiles) keep the 2-variant
        # set so suite wall time stays bounded.
        import math as _math
        work = case["batch"] * _math.prod(case["args"][0].shape[2:])
        if work > 4_000_000:
            variants = ({}, {"SCH": -2})
        else:
            # 4 variants x 2 chain lengths = 8 compiles per case; SCH=112
            # is the one knob with a recorded real win (+10.6% on c3,
            # sweep_cfg5 r3), SB_BLK=512 probes the pre-r5 block size
            variants = ({}, {"SCH": -2}, {"SCH": 112}, {"SB_BLK": 512})
        tuned = autotune.autotune_sch(None, key=f"{case['name']}_{impl}",
                                      variants=variants, reps=3,
                                      chain_builder=chain_builder,
                                      n_lo=1, n_hi=7)

    t_f = measure_amortized(fwd, tuple(args), iters, n_lo=2, n_hi=12)
    if t_f < 3e-4:
        # sub-0.3ms steps: a 10-step chain slope is below the tunnel's
        # timing noise (r3: cfg1 read 0.01-0.08 ms across runs) — use a
        # 72-step slope instead.
        t_f = measure_amortized(fwd, tuple(args), iters, n_lo=8, n_hi=80)
    t_fb = measure_amortized(fwdbwd, tuple(args), iters, n_lo=2, n_hi=12)
    if t_fb < 3e-4:
        t_fb = measure_amortized(fwdbwd, tuple(args), iters, n_lo=8,
                                 n_hi=80)
    row = {"fwd_ms": t_f * 1e3, "fwdbwd_ms": t_fb * 1e3,
           "samples_per_s_fwdbwd": case["batch"] / t_fb}
    if tuned is not None:
        row["tuned"] = tuned
        row["tune_key"] = f"{case['name']}_{impl}"
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--impls", default="xla,pallas")
    ap.add_argument("--only", default=None, help="substring filter")
    ap.add_argument("--no-tune", action="store_true",
                    help="skip the per-case knob autotune (tuning is the "
                         "default on TPU; tuned knobs are recorded in the "
                         "results JSON under 'tuned'/'tune_key')")
    args = ap.parse_args()

    import jax
    dev = jax.devices()[0]
    tune = (not args.no_tune) and jax.default_backend() == "tpu"
    iters = 2 if args.quick else 5
    results = {"device": f"{dev.platform}:{getattr(dev, 'device_kind', '?')}",
               "cases": {}}
    for make_case in case_specs():
        case = None
        row = {}
        for impl in args.impls.split(","):
            try:
                if case is None:
                    case = make_case()   # build args lazily
                if args.only and args.only not in case["name"]:
                    break
                t0 = time.time()
                row[impl] = run_case(case, impl, iters, tune=tune)
                row[impl]["wall_s"] = round(time.time() - t0, 1)
                log(f"{case['name']:38s} {impl:7s} "
                    f"fwd {row[impl]['fwd_ms']:8.2f} ms  "
                    f"fwd+bwd {row[impl]['fwdbwd_ms']:8.2f} ms  "
                    f"{row[impl]['samples_per_s_fwdbwd']:8.1f} samples/s")
            except Exception as e:  # keep going; record the failure
                row[impl] = {"error": f"{type(e).__name__}: {e}"[:300]}
                log(f"{case['name']:38s} {impl:7s} FAILED: {row[impl]['error'][:80]}")
        if case is None or (args.only and args.only not in case["name"]):
            continue
        if "xla" in row and "pallas" in row and "error" not in row["xla"] \
                and "error" not in row["pallas"]:
            row["speedup_fwdbwd"] = round(
                row["xla"]["fwdbwd_ms"] / row["pallas"]["fwdbwd_ms"], 2)
        results["cases"][case["name"]] = row
        if tune:
            # tuned overrides are module-global: reset between cases so a
            # winner for one shape never silently applies to the next
            from modulated_deform_conv_tpu.utils.autotune import _apply
            _apply({})
        del case["args"]          # release device buffers before next case
        case = None

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "suite_results.json")
    if (args.only or args.impls != "xla,pallas") and os.path.exists(out):
        # filtered runs merge per-impl into the existing results, so a
        # pallas-only rerun keeps the recorded XLA baselines
        with open(out) as f:
            prev = json.load(f)
        for name, row in results["cases"].items():
            prow = prev.setdefault("cases", {}).setdefault(name, {})
            prow.update(row)
            if "xla" in prow and "pallas" in prow \
                    and "error" not in prow["xla"] \
                    and "error" not in prow["pallas"]:
                prow["speedup_fwdbwd"] = round(
                    prow["xla"]["fwdbwd_ms"] / prow["pallas"]["fwdbwd_ms"],
                    2)
        prev["device"] = results["device"]
        results = prev
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    log(f"wrote {out}")
    print(json.dumps({k: v.get("speedup_fwdbwd") for k, v in
                      results["cases"].items()}))


if __name__ == "__main__":
    main()
