#!/usr/bin/env python
"""Headline benchmark: DCNv2 3x3 fwd+bwd samples/s per chip (BASELINE.md
config 2: B=8, 256->256ch, 56x56, groups=4, deformable_groups=4, bias).

Prints exactly ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "samples/s", "vs_baseline": N}

vs_baseline is measured samples/s divided by the BASELINE.json target of
70% of the chip's roofline samples/s, where the roofline is derived from a
measured on-chip peak matmul rate in the benchmark dtype and the op's GEMM
FLOPs (fwd + 2 backward GEMMs).  vs_baseline >= 1.0 means the north-star
per-chip target is met.  Details go to benchmarks/last_run.json and stderr.
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(fn, args, iters, warmup=2):
    """Time a jitted fn that returns a SCALAR.

    block_until_ready is not reliable on the experimental axon TPU tunnel
    platform (returns before execution completes), so we force a host
    readback of the scalar result — a true data dependency.
    """
    import numpy as np
    for _ in range(warmup):
        out = fn(*args)
    float(np.asarray(out))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(out))
        times.append(time.perf_counter() - t0)
    return min(times), times


def measure_amortized(step, args, iters, n_lo=2, n_hi=12):
    """Per-step time of `step(*args) -> scalar`, net of dispatch overhead.

    The axon tunnel adds ~30ms of fixed per-dispatch latency, which would
    swamp any millisecond-scale kernel.  We build two jitted chains that run
    `step` n_lo / n_hi times back-to-back on device (serialized through a
    scalar carry so XLA cannot CSE the iterations) and report
    (t_hi - t_lo) / (n_hi - n_lo): the marginal on-device cost of one step.
    """
    import jax
    import jax.numpy as jnp

    import time as _time

    import numpy as np

    def chain(n):
        @jax.jit
        def run(*a):
            def body(carry, _):
                # carry*1e-30 perturbs EVERY float arg by ~nothing but
                # forces a serial data dependency between iterations.
                # Perturbing only x would let XLA hoist the whole
                # offset/mask prep pipeline out of the chain (LICM) and
                # overstate throughput for training, where offsets change
                # every step.
                pert = [q + carry.astype(q.dtype) * 1e-30
                        if jnp.issubdtype(q.dtype, jnp.floating) else q
                        for q in a]
                s = step(*pert)
                return s.astype(a[0].dtype), ()
            s, _ = jax.lax.scan(body, jnp.zeros((), a[0].dtype), None, length=n)
            return s
        return run

    # Interleave the lo/hi chain reps (lo hi lo hi ...) and difference the
    # MINIMA: the tunnel drifts over multi-second windows, so timing all
    # lo reps then all hi reps let a drift between the two phases bias
    # the slope (r5; same estimator as utils/autotune._time_differenced).
    lo, hi = chain(n_lo), chain(n_hi)
    for f in (lo, hi):                       # compile + warm (forced)
        float(np.asarray(f(*args)))
    t_lo, t_hi = [], []
    for _ in range(iters):
        t0 = _time.perf_counter()
        float(np.asarray(lo(*args)))
        t_lo.append(_time.perf_counter() - t0)
        t0 = _time.perf_counter()
        float(np.asarray(hi(*args)))
        t_hi.append(_time.perf_counter() - t0)
    return max((min(t_hi) - min(t_lo)) / (n_hi - n_lo), 1e-9)


# Pinned roofline denominators per device kind (public spec-sheet figures;
# see the TPU chapters of jax-ml.github.io/scaling-book).  The r2/r3 runs
# derived the roofline from per-run microbenches, which swung the measured
# HBM bandwidth 577->780 GB/s round-over-round with no kernel change and
# made vs_baseline noise-driven (ADVICE r3).  The denominator is now a
# per-device-kind constant — measured microbench values are still recorded
# alongside for observability, and unknown device kinds fall back to them.
# matmul figure = bf16 MXU peak (what default-precision f32 matmuls lower
# to on TPU; the on-chip measured value here is 184-201 TF/s vs 197 spec).
_ROOFLINE_SPECS = {
    # kind substring: (matmul FLOP/s, HBM bytes/s)
    "v5 lite": (197e12, 819e9),   # v5e
    "v5e": (197e12, 819e9),
    "v5p": (459e12, 2765e9),
    "v6": (918e12, 1640e9),       # Trillium
    "v4": (275e12, 1228e9),
    "v3": (123e12, 900e9),
}


def pinned_roofline(device_kind: str):
    """(matmul FLOP/s, HBM B/s) for the device kind, or None if unknown."""
    norm = str(device_kind).lower().replace("tpu", "").strip()
    for sub, spec in _ROOFLINE_SPECS.items():
        if sub in norm:
            return spec
    return None


def peak_matmul_flops(dtype, iters=8):
    """Measured on-chip matmul rate (FLOP/s) in `dtype` — the compute
    roofline denominator.  Uses chain differencing so the fixed dispatch
    latency (~30ms on the axon tunnel) cancels; a single short chain would
    under-measure peak ~3x and flatter vs_baseline."""
    import jax
    import jax.numpy as jnp
    n = 4096
    a = jnp.full((n, n), 1.0 / n, dtype)  # ones/n: chain stays bounded
    b = jnp.full((n, n), 1.0 / n, dtype)

    def chain(reps):
        @jax.jit
        def f(a, b):
            x = a
            for _ in range(reps):
                x = x @ b
            return jnp.sum(x)
        return f

    t_lo, _ = measure(chain(4), (a, b), iters)
    t_hi, _ = measure(chain(36), (a, b), iters)
    t = max((t_hi - t_lo) / 32, 1e-12)
    return 2 * n * n * n / t


def peak_hbm_bandwidth(iters=6):
    """Measured HBM copy bandwidth (bytes/s moved: read+write), for the
    memory-roofline term."""
    import jax
    import jax.numpy as jnp
    buf = jnp.ones((64, 1024, 1024), jnp.float32)  # 256MB

    def chain(reps):
        @jax.jit
        def f(x):
            # scan carry round-trips HBM every step (a python loop of
            # multiplies would fuse into one pass and measure fiction)
            def body(c, s):
                return c * s, ()
            y, _ = jax.lax.scan(body, x, jnp.full((reps,), 1.000001))
            return jnp.sum(y[0, 0, :8])
        return f

    t_lo, _ = measure(chain(2), (buf,), iters)
    t_hi, _ = measure(chain(10), (buf,), iters)
    t = max((t_hi - t_lo) / 8, 1e-12)
    return 2 * buf.nbytes / t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="fewer iters")
    ap.add_argument("--impl", default="auto",
                    choices=["auto", "xla", "pallas", "shiftblend"])
    ap.add_argument("--offset-bound", type=float, default=2.0,
                    help="bounded-offset contract passed to the op (the "
                         "benchmark workload draws offsets in [-2, 2]); "
                         "0 disables the shift-blend fast path")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--precision", default="tensorfloat32",
                    choices=["float32", "tensorfloat32", "bfloat16"],
                    help="op compute-precision mode: float32 = exact f32 "
                         "sweeps + HIGHEST MXU; tensorfloat32 (default) = "
                         "f32 sweeps + single-pass MXU; bfloat16 = full "
                         "bf16 pipeline (~2x VPU rate, fp16-class error, "
                         "the analog of the reference's half dispatch)")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from modulated_deform_conv_tpu import modulated_deform_conv2d

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    dtype = jnp.float32 if args.dtype == "float32" else jnp.bfloat16

    # BASELINE.md config 2
    B, C, O, H, W, k, g, dg = 8, 256, 256, 56, 56, 3, 4, 4
    K = k * k
    OH, OW = H, W  # stride 1, pad 1
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, C, H, W)), dtype)
    off = jnp.asarray(rng.uniform(-2, 2, (B, dg * 2 * K, OH, OW)), dtype)
    mask = jnp.asarray(rng.uniform(0, 1, (B, dg * K, OH, OW)), dtype)
    w = jnp.asarray(rng.standard_normal((O, C // g, k, k)) * 0.05, dtype)
    bias = jnp.zeros((O,), dtype)

    ob = args.offset_bound if args.offset_bound > 0 else None

    def loss(x, off, mask, w, bias):
        out = modulated_deform_conv2d(x, off, mask, w, bias, stride=1,
                                      padding=1, groups=g,
                                      deformable_groups=dg, impl=args.impl,
                                      precision=args.precision,
                                      offset_bound=ob)
        return jnp.sum(out * out)

    def fwdbwd_step(x, off, mask, w, bias):
        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x, off, mask, w, bias)
        return sum(jnp.sum(g) for g in grads)

    iters = 3 if args.quick else 8
    t_fwd = measure_amortized(loss, (x, off, mask, w, bias), iters)
    t_fb = measure_amortized(fwdbwd_step, (x, off, mask, w, bias), iters)
    samples_s = B / t_fb
    samples_s_fwd = B / t_fwd

    # Roofline = tighter of compute and memory bounds per sample:
    #  - compute: GEMM FLOPs (fwd GEMM + dgrad GEMM + wgrad GEMM) at the
    #    measured peak matmul rate;
    #  - memory: the tensors any implementation must move for fwd+bwd
    #    (read x/offset/mask/out-cotangent, write out + 3 input-grads;
    #    weights amortize over the batch) at measured HBM bandwidth.
    gemm_flops_per_sample = 3 * 2 * OH * OW * O * (C // g) * K
    bytes_per_sample = 2 * 4 * (C * H * W + dg * 3 * K * OH * OW
                                + O * OH * OW)
    peak_meas = peak_matmul_flops(dtype, iters=3 if args.quick else 8)
    bw_meas = peak_hbm_bandwidth(iters=3 if args.quick else 6)
    # Denominator: pinned spec constants per device kind so vs_baseline is
    # comparable across rounds (the microbench values above swing ~±15%
    # run-to-run through the tunnel and are recorded for observability
    # only).  Unknown kinds fall back to the measured values.
    pinned = pinned_roofline(getattr(dev, "device_kind", ""))
    if pinned is not None and not args.cpu:
        peak, bw = pinned
        roofline_method = "pinned device-kind spec constants"
    else:
        peak, bw = peak_meas, bw_meas
        roofline_method = "measured microbench (unknown device kind)"
    t_compute = gemm_flops_per_sample / peak
    t_memory = bytes_per_sample / bw
    roofline_samples_s = 1.0 / max(t_compute, t_memory)
    target = 0.70 * roofline_samples_s
    vs_baseline = samples_s / target

    details = {
        "device": f"{dev.platform}:{getattr(dev, 'device_kind', '?')}",
        "config": "DCNv2 B=8 256ch 56x56 g=dg=4 bias (BASELINE config 2)",
        "dtype": args.dtype,
        "precision": args.precision,
        "impl": args.impl,
        "offset_bound": args.offset_bound,
        "fwd_ms": t_fwd * 1e3,
        "fwdbwd_ms": t_fb * 1e3,
        "samples_per_s_fwd": samples_s_fwd,
        "samples_per_s_fwdbwd": samples_s,
        "measured_peak_matmul_tflops": peak_meas / 1e12,
        "measured_hbm_bw_gbs": bw_meas / 1e9,
        "roofline_peak_matmul_tflops": peak / 1e12,
        "roofline_hbm_bw_gbs": bw / 1e9,
        "roofline_method": roofline_method,
        "gemm_flops_per_sample": gemm_flops_per_sample,
        "min_bytes_per_sample": bytes_per_sample,
        "roofline_samples_per_s": roofline_samples_s,
        "roofline_fraction": samples_s / roofline_samples_s,
        "target_fraction": 0.70,
    }
    log(json.dumps(details, indent=2))
    os.makedirs("benchmarks", exist_ok=True)
    with open("benchmarks/last_run.json", "w") as f:
        json.dump(details, f, indent=2)
        f.write("\n")

    print(json.dumps({
        "metric": "DCNv2 3x3 fwd+bwd samples/s/chip (B=8 256ch 56^2 g=dg=4)",
        "value": round(samples_s, 2),
        "unit": "samples/s",
        "vs_baseline": round(vs_baseline, 4),
    }))


if __name__ == "__main__":
    main()
