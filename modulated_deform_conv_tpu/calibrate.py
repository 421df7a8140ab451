"""One-shot device calibration: measure a NEW chip kind's primitive rates
and derive the plan constants utils/device.py needs (VERDICT r4 item 7 —
what makes the per-device-kind plan table portable beyond the v5e it was
tuned on).

    python -m modulated_deform_conv_tpu.calibrate [--out PATH]

measures, with LICM-proof chain differencing (the tunnel's ~30ms dispatch
latency cancels between two chain lengths):

  * MXU matmul peak (bf16 operands, f32 accumulation — what DEFAULT
    precision lowers to on TPU),
  * VPU f32 elementwise FMA rate,
  * HBM copy bandwidth,

then derives and writes a JSON profile keyed by device kind:

  * ``sb_crossover_cg`` — the shiftblend/gathermm dispatch crossover.
    On v5e it measured 128 with this script's MXU/VPU ≈ 18.6; the
    crossover is where the VPU window sweep (∝ Cg) overtakes the MXU
    swept contraction (∝ Cg at ~1/ratio the per-element cost), so it
    scales linearly with the measured ratio (rounded to a multiple of 8,
    clamped to [32, 512]).
  * ``lane_budget`` — gathermm KP lanes per matmul; VMEM-capacity-bound
    (4608 on a 128MB-VMEM v5e), scaled by the kind's VMEM ratio.
  * ``vmem_bytes`` — taken from the built-in kind table (or
    MDC_VMEM_BYTES); VMEM is a spec constant, not measurable from JAX.

`utils/device.py` loads the profile when ``MDC_PROFILE=<path>`` is set
(explicit env overrides still win).  The measured raw rates ride along
for observability, like the cached autotune winners in
MDC_AUTOTUNE_CACHE.
"""
from __future__ import annotations

import argparse
import json
import os
import time

# v5e reference points the derivations scale from — measured BY THIS
# SCRIPT on the round-5 v5e chip, so a new kind's ratio is
# like-for-like.  (These are XLA-fused rates; the in-kernel effective
# VPU rate the sweeps see is ~2.26e12, ANALYSIS.md §1 — the gap is the
# unaligned-VMEM access throttle, which moves with the same hardware
# generation, so the RATIO is the portable quantity.)
_V5E_MXU_FLOPS = 209e12
_V5E_VPU_ELEMS = 11.25e12
_V5E_CROSSOVER = 128
_V5E_LANE_BUDGET = 4608
_V5E_VMEM = 128 * 1024 * 1024


def _measure(fn, args, iters=4, warmup=1):
    import numpy as np
    for _ in range(warmup):
        out = fn(*args)
    float(np.asarray(out))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(out))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _chain(step, n):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*a):
        def body(c, _):
            out = step(*[q + c * 1e-30 for q in a])
            return out, ()
        s, _ = jax.lax.scan(body, jnp.zeros((), a[0].dtype), None, length=n)
        return s
    return run


def _amortized(step, args, n_lo=2, n_hi=10, iters=4):
    t_lo = _measure(_chain(step, n_lo), args, iters)
    t_hi = _measure(_chain(step, n_hi), args, iters)
    return max((t_hi - t_lo) / (n_hi - n_lo), 1e-12)


def measure_mxu_flops() -> float:
    import jax
    import jax.numpy as jnp
    n = 4096
    import numpy as np
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)

    def step(a, b):
        c = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        # consume the FULL result: slicing before the reduce lets XLA
        # compute only the sliced output rows (DCE) and fakes the rate
        return (jnp.sum(c) * 1e-12).astype(jnp.bfloat16)
    t = _amortized(step, (a, b))
    return 2 * n ** 3 / t


def measure_vpu_elems() -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np
    shape = (2048, 4096)
    reps = 256                             # FMAs per element: compute-
    rng = np.random.default_rng(0)         # dominated (HBM pass ~0.15ms
    x = jnp.asarray(rng.standard_normal(shape) * 1e-3, jnp.float32)
    y = jnp.asarray(rng.standard_normal(shape) * 1e-3, jnp.float32)

    def step(x, y):
        a = x
        for _ in range(reps):
            a = a * y + x                  # fused FMA chain (not
        return jnp.sum(a) * 1e-12          # algebraically foldable)
    t = _amortized(step, (x, y), n_lo=1, n_hi=21, iters=5)
    return reps * shape[0] * shape[1] / t


def measure_hbm_bw() -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np
    n = 64 * 1024 * 1024                   # 256MB f32
    x = jnp.asarray(np.ones((n,), np.float32))

    def step(x):
        y = x * jnp.float32(1.0000001)     # full HBM read + write
        return y[0] + y[n // 2]
    t = _amortized(step, (x,))
    return 2 * 4 * n / t                   # read + write bytes


def derive(kind: str, mxu_flops: float, vpu_elems: float,
           vmem_bytes: int) -> dict:
    ratio = (mxu_flops / vpu_elems) / (_V5E_MXU_FLOPS / _V5E_VPU_ELEMS)
    crossover = int(round(_V5E_CROSSOVER * ratio / 8)) * 8
    crossover = max(32, min(512, crossover))
    lane_budget = int(_V5E_LANE_BUDGET * (vmem_bytes / _V5E_VMEM) // 128
                      ) * 128
    return {
        "kind": kind,
        "vmem_bytes": int(vmem_bytes),
        "sb_crossover_cg": crossover,
        "lane_budget": max(1152, lane_budget),
        "measured": {
            "mxu_bf16_flops": mxu_flops,
            "vpu_f32_elems_per_s": vpu_elems,
        },
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="Measure this chip and write an MDC_PROFILE json.")
    ap.add_argument("--out", default=os.environ.get(
        "MDC_PROFILE", "mdc_profile.json"))
    args = ap.parse_args(argv)

    import jax
    dev = jax.devices()[0]
    kind = str(getattr(dev, "device_kind", dev.platform))
    if dev.platform != "tpu":
        print(f"note: calibrating on platform {dev.platform!r} "
              "(results describe this host, not a TPU)")

    from .utils.device import _lookup_vmem
    vmem = int(os.environ.get("MDC_VMEM_BYTES", 0)) or _lookup_vmem(kind)

    print(f"device kind: {kind}  (vmem {vmem // (1024 * 1024)}MB)")
    mxu = measure_mxu_flops()
    print(f"MXU bf16 matmul: {mxu / 1e12:.1f} TFLOP/s")
    vpu = measure_vpu_elems()
    print(f"VPU f32 FMA:     {vpu / 1e12:.2f} T elem/s")
    bw = measure_hbm_bw()
    print(f"HBM copy BW:     {bw / 1e9:.0f} GB/s")

    prof = derive(kind, mxu, vpu, vmem)
    prof["measured"]["hbm_bytes_per_s"] = bw

    existing = {}
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                existing = json.load(f)
        except Exception:
            existing = {}
    existing[kind] = prof
    tmp = args.out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(existing, f, indent=2, sort_keys=True)
    os.replace(tmp, args.out)
    print(f"derived: sb_crossover_cg={prof['sb_crossover_cg']} "
          f"lane_budget={prof['lane_budget']}")
    print(f"wrote {args.out}; activate with MDC_PROFILE={args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
