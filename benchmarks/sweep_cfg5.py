#!/usr/bin/env python
"""Knob sweep for the gathermm fused kernel on cfg5 c3/c4 (VERDICT r2
item 2): P_tile / tap-group / chunk-size overrides and precision, timed
fwd+bwd with the LICM-proof chain.  Usage:

    python benchmarks/sweep_cfg5.py c3 "PT=512,K0=1" "PT=256,K0=3" ...
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from bench import measure_amortized, log
    import modulated_deform_conv_tpu as mdc
    from modulated_deform_conv_tpu.ops.pallas import gathermm as gm
    from modulated_deform_conv_tpu.utils.config import DeformConvSpec

    which = sys.argv[1] if len(sys.argv) > 1 else "c3"
    variants = sys.argv[2:] or ["base"]
    if which == "c3":
        B, C, S = 32, 512, (28, 28)
    elif which == "c4":
        B, C, S = 32, 1024, (14, 14)
    else:
        B, C, S = 32, 2048, (7, 7)
    k, g, dg = 3, 1, 1
    K = k * k
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, C) + S), jnp.float32)
    off = jnp.asarray(rng.uniform(-2, 2, (B, dg * 2 * K) + S), jnp.float32)
    m = jnp.asarray(rng.uniform(0, 1, (B, dg * K) + S), jnp.float32)
    w = jnp.asarray(rng.standard_normal((C, C // g, k, k)) * 0.05,
                    jnp.float32)
    b = jnp.zeros((C,), jnp.float32)

    for var in variants:
        gm._PT_OVERRIDE = gm._K0_OVERRIDE = gm._SCH_OVERRIDE = 0
        precision = "tensorfloat32"
        if var != "base":
            for kv in var.split(","):
                key, val = kv.split("=")
                if key == "PT":
                    gm._PT_OVERRIDE = int(val)
                elif key == "K0":
                    gm._K0_OVERRIDE = int(val)
                elif key == "SCH":
                    gm._SCH_OVERRIDE = int(val)
                elif key == "prec":
                    precision = val
        spec = DeformConvSpec.make(2, (k, k), 1, 1, 1, g, dg, 64, True)
        plan = gm._Plan(spec, B, C, S, spec.out_sizes(S), x.dtype)
        pr = precision

        def fwd(x, off, m, w, b):
            out = mdc.modulated_deform_conv2d(
                x, off, m, w, b, stride=1, padding=1, groups=g,
                deformable_groups=dg, impl="pallas", precision=pr)
            return jnp.sum(jnp.square(out))

        def fwdbwd(x, off, m, w, b):
            gs = jax.grad(fwd, argnums=(0, 1, 2, 3, 4))(x, off, m, w, b)
            return sum(jnp.sum(q) for q in gs)

        try:
            t_f = measure_amortized(fwd, (x, off, m, w, b), 3, n_lo=2,
                                    n_hi=8)
            t_fb = measure_amortized(fwdbwd, (x, off, m, w, b), 3, n_lo=2,
                                     n_hi=8)
            log(f"{which} {var:24s} PT={plan.PT} K0={plan.K0} SCH={plan.SCH}"
                f" NT={plan.NT}  fwd {t_f*1e3:7.3f} ms  fwd+bwd "
                f"{t_fb*1e3:7.3f} ms ({B/t_fb:7.1f} samples/s)")
        except Exception as e:
            log(f"{which} {var:24s} FAILED {type(e).__name__}: "
                f"{str(e).splitlines()[0][:120]}")
        finally:
            gm._PT_OVERRIDE = gm._K0_OVERRIDE = gm._SCH_OVERRIDE = 0


if __name__ == "__main__":
    main()
