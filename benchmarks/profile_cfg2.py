#!/usr/bin/env python
"""Component-level profile of BASELINE config 2 on the real chip.

Breaks the fwd and fwd+bwd step into:
  - _prep (XLA factor-row/bounds pipeline)
  - forward fused Pallas kernel (columns+GEMM)
  - backward fused Pallas kernel
  - pure grouped GEMM cost for reference

Chain-amortized timing (see bench.py measure_amortized): the axon tunnel
adds ~32ms fixed dispatch latency per call.
"""
import sys
sys.path.insert(0, "/root/repo")

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from modulated_deform_conv_tpu.utils.config import DeformConvSpec
from modulated_deform_conv_tpu.ops.pallas import gathermm as gm


def measure(fn, args, iters=6, warmup=2):
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


def amortized(step, args, n_lo=2, n_hi=10, iters=6):
    """step(*args) -> scalar; perturbs EVERY float arg with the carry so
    no stage can be hoisted out of the chain (LICM-proof)."""
    def chain(n):
        @jax.jit
        def run(*a):
            def body(carry, _):
                pert = [x + carry * 1e-30 if jnp.issubdtype(x.dtype, jnp.floating)
                        else x for x in a]
                s = step(*pert)
                return s.astype(jnp.float32), ()
            s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=n)
            return s
        return run
    t_lo = measure(chain(n_lo), args, iters)
    t_hi = measure(chain(n_hi), args, iters)
    return max((t_hi - t_lo) / (n_hi - n_lo), 1e-9)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)

    B, C, O, H, W, k, g, dg = 8, 256, 256, 56, 56, 3, 4, 4
    K = k * k
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, C, H, W)), jnp.float32)
    off = jnp.asarray(rng.uniform(-2, 2, (B, dg * 2 * K, H, W)), jnp.float32)
    mask = jnp.asarray(rng.uniform(0, 1, (B, dg * K, H, W)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((O, C // g, k, k)) * 0.05, jnp.float32)

    spec = DeformConvSpec.make(2, (k, k), 1, 1, 1, g, dg, 64, modulated=True)
    OS = spec.out_sizes(x.shape[2:])
    plan = gm._Plan(spec, B, C, x.shape[2:], OS, x.dtype)
    print(f"plan: PT={plan.PT} K0={plan.K0} KI={plan.KI} KP={plan.KP} "
          f"NT={plan.NT} SCH={plan.SCH} NCH={plan.NCH} NCP={plan.NCP} "
          f"CgP={plan.CgP} save_cols={plan.save_cols}", file=sys.stderr)

    precision = "tensorfloat32"
    cd, prec = gm._resolve(precision)

    res = {}

    # 1. prep alone
    def prep_only(x, off, mask):
        xp, pr, bnd = gm._prep(x, off, mask, spec, plan)
        return jnp.sum(xp[0, 0, 0]) + jnp.sum(pr[0, 0, 0]) + jnp.sum(bnd)
    res["prep_ms"] = amortized(prep_only, (x, off, mask)) * 1e3

    # 2. fwd fused kernel alone (prep precomputed)
    xp, pr, bnd = jax.jit(lambda *a: gm._prep(*a, spec, plan))(x, off, mask)
    w2 = jax.jit(lambda w: gm._w2_prep(w.astype(jnp.float32), plan, g))(w)
    Og = O // g

    def fwd_kernel_only(xp, pr, bnd, w2):
        outp, cols2 = gm._fused_conv_call(xp, pr, bnd, w2, plan, Og, cd, prec)
        s = jnp.sum(outp[0, 0, 0, 0])
        if cols2 is not None:
            s = s + jnp.sum(cols2[0, 0, 0, 0, 0, 0].astype(jnp.float32))
        return s
    res["fwd_kernel_ms"] = amortized(fwd_kernel_only, (xp, pr, bnd, w2)) * 1e3

    # 3. bwd fused kernel alone
    gout = jnp.asarray(rng.standard_normal((B, O) + tuple(OS)), jnp.float32)
    gout_t = jax.jit(lambda go: gm._gout_tiles(go, plan, O, g))(gout)
    cols2 = None
    if plan.save_cols:
        _, cols2 = jax.jit(functools.partial(
            gm._fused_conv_call, plan=plan, Og=Og, cd=cd, prec=prec))(
                xp, pr, bnd, w2)

    def bwd_kernel_only(xp, pr, bnd, w2, gout_t, *maybe_cols):
        c2 = maybe_cols[0] if maybe_cols else None
        gxp, gs, gw = gm._fused_conv_bwd_call(xp, pr, bnd, w2, gout_t, c2,
                                              plan, Og, cd, prec, g)
        return (jnp.sum(gxp[0, 0, 0, 0]) + jnp.sum(gs[0, 0, 0, 0])
                + jnp.sum(gw[0, 0, 0]))
    bwd_args = (xp, pr, bnd, w2, gout_t) + ((cols2,) if cols2 is not None else ())
    res["bwd_kernel_ms"] = amortized(bwd_kernel_only, bwd_args) * 1e3

    # 4. pure grouped GEMM (dense cols) for scale: what the GEMM alone costs
    cols_dense = jnp.asarray(
        rng.standard_normal((B, H * W, g, C // g * K)), jnp.bfloat16)
    wg = jnp.asarray(rng.standard_normal((g, C // g * K, Og)), jnp.bfloat16)

    def gemm_only(cols_dense, wg):
        out = jnp.einsum("bpgc,gco->bpgo", cols_dense, wg,
                         preferred_element_type=jnp.float32)
        return jnp.sum(out[0, 0])
    res["gemm_only_ms"] = amortized(gemm_only, (cols_dense, wg)) * 1e3

    # 5. end-to-end via public API (honest, LICM-proof)
    from modulated_deform_conv_tpu import modulated_deform_conv2d

    def loss(x, off, mask, w):
        out = modulated_deform_conv2d(x, off, mask, w, None, stride=1,
                                      padding=1, groups=g,
                                      deformable_groups=dg, impl="pallas")
        return jnp.sum(out * out)
    res["e2e_fwd_ms"] = amortized(loss, (x, off, mask, w)) * 1e3

    def fwdbwd(x, off, mask, w):
        grads = jax.grad(loss, argnums=(0, 1, 2, 3))(x, off, mask, w)
        return sum(jnp.sum(gg) for gg in grads)
    res["e2e_fwdbwd_ms"] = amortized(fwdbwd, (x, off, mask, w)) * 1e3

    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
