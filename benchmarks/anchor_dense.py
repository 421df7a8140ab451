#!/usr/bin/env python
"""Independent perf anchor: dense `lax.conv_general_dilated` at the
BASELINE-config shapes (VERDICT r3 item 5).

The per-config roofline fractions in ANALYSIS §3b price the bilinear
sampling at zero FLOPs (the naive roofline counts only the GEMM), which
makes every DCN number look far from "peak".  This measures what XLA's own
dense convolution — the same GEMM, zero sampling — achieves on this chip
at the same shapes, fwd and fwd+bwd.  The DCN-overhead factor
(dcn_ms / dense_ms) is then an externally-anchored measure of what the
deformable sampling actually costs, independent of this repo's kernels and
of the naive roofline's assumptions.

Writes benchmarks/anchor_results.json and prints a table to stderr.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import measure_amortized, log  # noqa: E402


CASES = [
    # name, nd, B, C, O, S, k, groups  (matches suite.py case_specs)
    ("cfg2_mdcn2d_256ch_56x56_g4", 2, 8, 256, 256, (56, 56), 3, 4),
    ("cfg3_dcn3d_64ch_16x32x32", 3, 2, 64, 64, (16, 32, 32), 3, 1),
    ("cfg5_r50_c3_512ch_28x28", 2, 32, 512, 512, (28, 28), 3, 1),
    ("cfg5_r50_c4_1024ch_14x14", 2, 32, 1024, 1024, (14, 14), 3, 1),
    ("cfg5_r50_c5_2048ch_7x7", 2, 32, 2048, 2048, (7, 7), 3, 1),
]


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    results = {"device": f"{dev.platform}:{getattr(dev, 'device_kind', '?')}",
               "note": "dense lax.conv_general_dilated at the BASELINE "
                       "shapes; same GEMM as the DCN op, zero sampling",
               "cases": {}}
    rng = np.random.default_rng(0)
    for name, nd, B, C, O, S, k, g in CASES:
        x = jnp.asarray(rng.standard_normal((B, C) + S), jnp.float32)
        w = jnp.asarray(rng.standard_normal((O, C // g) + (k,) * nd) * 0.05,
                        jnp.float32)

        def fwd(x, w):
            out = jax.lax.conv_general_dilated(
                x, w, window_strides=(1,) * nd,
                padding=[(k // 2, k // 2)] * nd,
                feature_group_count=g)
            return jnp.sum(jnp.square(out))

        def fwdbwd(x, w):
            gs = jax.grad(fwd, argnums=(0, 1))(x, w)
            return sum(jnp.sum(q) for q in gs)

        t_f = measure_amortized(fwd, (x, w), 5)
        t_fb = measure_amortized(fwdbwd, (x, w), 5)
        results["cases"][name] = {"dense_fwd_ms": t_f * 1e3,
                                  "dense_fwdbwd_ms": t_fb * 1e3,
                                  "dense_samples_per_s_fwdbwd": B / t_fb}
        log(f"{name:38s} dense fwd {t_f*1e3:8.3f} ms  "
            f"fwd+bwd {t_fb*1e3:8.3f} ms  {B/t_fb:8.1f} samples/s")

    # DCN-overhead factors against the recorded suite numbers, when present.
    suite_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "suite_results.json")
    if os.path.exists(suite_path):
        with open(suite_path) as f:
            suite = json.load(f)
        for name, row in results["cases"].items():
            srow = suite.get("cases", {}).get(name, {})
            best = None
            for impl in ("pallas", "shiftblend"):
                r = srow.get(impl)
                if r and "fwdbwd_ms" in r:
                    best = min(best or 1e9, r["fwdbwd_ms"])
            if best is not None:
                row["dcn_best_fwdbwd_ms"] = best
                row["dcn_overhead_factor"] = round(
                    best / row["dense_fwdbwd_ms"], 2)
                log(f"{name:38s} DCN overhead factor "
                    f"{row['dcn_overhead_factor']}x")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "anchor_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
        f.write("\n")
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
