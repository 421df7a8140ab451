#!/usr/bin/env python
"""Micro: cost of the (Og x K*Cg)@(K*Cg x BLK) dot inside a Pallas kernel,
f32 vs bf16 operands, with and without a VPU phase in the same kernel —
isolates whether the 0.7ms GEMM increment is pass-count or scheduling.
"""
import sys
sys.path.insert(0, "/root/repo")

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benchmarks.profile_sb_cfg2 import amortized

GRID = 224
Og, KC, BLK = 64, 576, 512


def make(dtype, vpu_iters, algorithm=None):
    def kern(a_ref, b_ref, o_ref, s_ref):
        # optional VPU busywork writing s_ref (no dep with the dot)
        if vpu_iters:
            acc = jnp.zeros((8, BLK), jnp.float32)
            base = s_ref[0:8, :]
            for i in range(vpu_iters):
                acc = acc + base * (1.0 + i)
            s_ref[0:8, :] = acc
        a = a_ref[...]
        b = b_ref[...]
        if algorithm is not None:
            o_ref[...] = jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                precision=algorithm,
                preferred_element_type=jnp.float32)
        else:
            o_ref[...] = jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)

    def call(a, b):
        out = pl.pallas_call(
            kern,
            grid=(GRID,),
            in_specs=[
                pl.BlockSpec((Og, KC), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((KC, BLK), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((Og, BLK), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Og, BLK), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, BLK), jnp.float32)],
        )(a.astype(dtype), b.astype(dtype))
        return jnp.sum(out)
    return call


def main():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((Og, KC)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((KC, BLK)), jnp.float32)

    ref = np.asarray(jnp.einsum("ij,jk->ik", a, b,
                                precision=jax.lax.Precision.HIGHEST))

    for name, dtype, vpu in [
        ("f32 dot only", jnp.float32, 0),
        ("bf16 dot only", jnp.bfloat16, 0),
        ("f32 dot + vpu200", jnp.float32, 200),
        ("bf16 dot + vpu200", jnp.bfloat16, 200),
        ("vpu200 only (no dot: f32 empty)", None, 200),
    ]:
        if dtype is None:
            # no-dot baseline: reuse f32 kernel but zero-size dot? just time vpu
            def kern(a_ref, b_ref, o_ref, s_ref):
                acc = jnp.zeros((8, BLK), jnp.float32)
                base = s_ref[0:8, :]
                for i in range(200):
                    acc = acc + base * (1.0 + i)
                s_ref[0:8, :] = acc
                o_ref[...] = jnp.zeros((Og, BLK), jnp.float32)
            def call(a, b):
                out = pl.pallas_call(
                    kern, grid=(GRID,),
                    in_specs=[pl.BlockSpec((Og, KC), lambda t: (0, 0),
                                           memory_space=pltpu.VMEM),
                              pl.BlockSpec((KC, BLK), lambda t: (0, 0),
                                           memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec((Og, BLK), lambda t: (0, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((Og, BLK), jnp.float32),
                    scratch_shapes=[pltpu.VMEM((8, BLK), jnp.float32)],
                )(a, b)
                return jnp.sum(out)
            fn = call
        else:
            fn = make(dtype, vpu)
        t = amortized(fn, (a, b)) * 1e3
        # numerics of one dot
        if dtype is not None:
            def one(a, b, _d=dtype):
                out = pl.pallas_call(
                    lambda ar, br, orf: orf.__setitem__(
                        ..., jax.lax.dot_general(
                            ar[...], br[...], (((1,), (0,)), ((), ())),
                            precision=jax.lax.Precision.DEFAULT,
                            preferred_element_type=jnp.float32)),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((Og, BLK), jnp.float32),
                )(a.astype(_d), b.astype(_d))
                return out
            got = np.asarray(jax.jit(one)(a, b))
            err = float(np.max(np.abs(got - ref)) / np.max(np.abs(ref)))
        else:
            err = float("nan")
        print(f"{name:34s} {t*1e3/GRID:8.3f} us/cell  total {t:7.4f} ms  "
              f"dot_relerr={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
