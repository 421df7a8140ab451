"""On-TPU numerical parity: Mosaic-lowered kernels vs the XLA oracle.

Interpreter-mode tests (tests/test_pallas_kernel.py etc.) validate the
kernel *logic*; this file validates the actual Mosaic lowering on real TPU
hardware — forward and all five gradients, across 2D/3D, groups, dg,
dilation, modulated/plain, and both Pallas kernels (structured-sparse
gathermm and shift-blend).  Skipped off-TPU; the recorded run lives in
benchmarks/tpu_parity_r05.txt.

Run directly on the chip:  python tests/test_tpu_parity.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest

try:  # under pytest, conftest forces CPU — detect and skip
    import jax
    _ON_TPU = jax.default_backend() == "tpu"
except Exception:  # pragma: no cover
    _ON_TPU = False

pytestmark = pytest.mark.skipif(not _ON_TPU, reason="needs real TPU")


def _run_all(report=print):
    import jax
    import jax.numpy as jnp
    import modulated_deform_conv_tpu as mdc

    rng = np.random.default_rng(0)
    failures = []

    def case(label, op_name, nd, B, C, O, S, k, g, dg, modulated, dil,
             impls, offscale=1.9, dtype=jnp.float32, tol=2e-5):
        op = getattr(mdc, op_name)
        K = k ** nd
        pad = (dil * (k - 1)) // 2
        x = jnp.asarray(rng.standard_normal((B, C) + S), dtype)
        off = jnp.asarray(rng.uniform(-offscale, offscale,
                                      (B, dg * nd * K) + S), dtype)
        args = [x, off]
        if modulated:
            args.append(jnp.asarray(rng.uniform(0, 1, (B, dg * K) + S),
                                    dtype))
        w = jnp.asarray(rng.standard_normal((O, C // g) + (k,) * nd) * 0.1,
                        dtype)
        args.append(w)
        args.append(jnp.asarray(rng.standard_normal((O,)), dtype))
        args = tuple(args)

        def outputs(impl, kw):
            def f(*a):
                return op(*a, stride=1, padding=pad, dilation=dil, groups=g,
                          deformable_groups=dg, impl=impl,
                          precision="float32", **kw)
            out = jax.jit(f)(*args)

            def loss(*a):
                return jnp.sum(jnp.square(f(*a).astype(jnp.float32)))
            grads = jax.jit(jax.grad(loss, argnums=tuple(
                range(len(args)))))(*args)
            return [out] + list(grads)

        ref = outputs("xla", {})
        names = ["out", "gx", "goff"] + (["gmask"] if modulated else []) \
            + ["gw", "gb"]
        for impl, kw in impls:
            try:
                got = outputs(impl, kw)
            except Exception as e:
                failures.append(f"{label} {impl}: EXCEPTION {e}")
                report(f"{label:34s} {impl:10s} EXCEPTION: "
                       f"{str(e).splitlines()[0][:90]}")
                continue
            errs = []
            for name, a, b in zip(names, got, ref):
                scale = float(jnp.max(jnp.abs(b.astype(jnp.float32)))) + 1e-9
                err = float(jnp.max(jnp.abs(
                    a.astype(jnp.float32) - b.astype(jnp.float32)))) / scale
                errs.append(f"{name}={err:.2e}")
                if err > tol:
                    failures.append(f"{label} {impl} {name}: {err:.2e}")
            report(f"{label:34s} {impl:10s} " + " ".join(errs))

    both = [("pallas", {}), ("shiftblend", {"offset_bound": 2.0})]
    case("2d_plain_g1", "deform_conv2d", 2, 2, 32, 32, (24, 20), 3, 1, 1,
         False, 1, both)
    case("2d_mod_g4_dg4", "modulated_deform_conv2d", 2, 2, 64, 64, (28, 28),
         3, 4, 4, True, 1, both)
    case("2d_mod_dil2", "modulated_deform_conv2d", 2, 1, 16, 16, (21, 21),
         3, 1, 2, True, 2, both)
    # 3D shapes with 128-aligned plane stride so the shift-blend
    # rolled-loop kernels are eligible on TPU.
    case("3d_plain", "deform_conv3d", 3, 1, 16, 16, (6, 8, 16), 3, 1, 1,
         False, 1, both)
    case("3d_mod_dg2", "modulated_deform_conv3d", 3, 1, 16, 16, (6, 8, 16),
         3, 1, 2, True, 1, both)
    # bf16 storage: sampling still runs in f32; bf16 rounding of the inputs
    # themselves dominates the tolerance.
    case("2d_mod_bf16", "modulated_deform_conv2d", 2, 1, 32, 32, (16, 16),
         3, 1, 1, True, 1, both, dtype=jnp.bfloat16, tol=3e-2)
    # fp16 (VERDICT r2 item 7): inputs upcast to f32 on the kernel paths
    # (ops/api.py dtype policy) — STRICTLY more accurate than the
    # reference's native-half arithmetic (deformable_conv.cu:99 computes
    # the bilinear blend and column accumulation in half, ~1e-3 relative;
    # here only the fp16 quantization of inputs/outputs remains, so the
    # oracle gap is ~fp16 eps ~ 5e-4).
    case("2d_mod_fp16", "modulated_deform_conv2d", 2, 1, 32, 32, (16, 16),
         3, 1, 1, True, 1, both, dtype=jnp.float16, tol=4e-3)
    case("3d_plain_fp16", "deform_conv3d", 3, 1, 16, 16, (6, 8, 16), 3, 1,
         1, False, 1, both, dtype=jnp.float16, tol=4e-3)
    # stride-2: gathermm only (shiftblend is stride-1 by design)
    case("2d_mod_stride2_viaK5", "modulated_deform_conv2d", 2, 1, 16, 16,
         (17, 17), 5, 1, 1, True, 1, [("pallas", {})], offscale=1.5)
    # Leading-axis chunked mode (the cfg4-style path): force it by
    # shrinking the VMEM residency budget so _choose_lead splits the
    # volume into halo-extended blocks on real TPU.
    from modulated_deform_conv_tpu.ops.pallas import shiftblend as _sb
    saved = _sb._X_RESIDENT_BUDGET
    _sb._X_RESIDENT_BUDGET = 1 * 1024 * 1024
    try:
        case("3d_mod_leadchunk", "modulated_deform_conv3d", 3, 1, 16, 16,
             (8, 8, 16), 3, 1, 1, True, 1,
             [("shiftblend", {"offset_bound": 2.0})])
    finally:
        _sb._X_RESIDENT_BUDGET = saved
    return failures


def test_tpu_parity():
    failures = _run_all(report=lambda *a: print(*a, file=sys.stderr))
    assert not failures, failures


if __name__ == "__main__":
    fails = _run_all()
    print("FAILURES:" if fails else "ALL PASS")
    for f in fails:
        print(" ", f)
    sys.exit(1 if fails else 0)
