#!/usr/bin/env python
"""Semantics probe for tpu.dynamic_gather via jnp.take_along_axis.

Q: do lane indices address the full row (cross-vreg) or only within each
128-lane group?
"""
import sys
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(x_ref, idx_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(x_ref[...], idx_ref[...], axis=1)


def run(R, L):
    x = jnp.broadcast_to(jnp.arange(L, dtype=jnp.float32)[None, :], (R, L))
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, L, (R, L)), jnp.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)
    out = np.asarray(out)
    idx = np.asarray(idx)
    full = np.array_equal(out, idx.astype(np.float32))
    mod = np.array_equal(
        out, (idx % 128 + (np.arange(L)[None, :] // 128) * 128).astype(np.float32))
    print(f"R={R} L={L}: full-row gather={full}, per-vreg(mod128)={mod}")
    if not full and not mod:
        print("  sample out[0,:8] =", out[0, :8], " idx[0,:8] =", idx[0, :8])


for L in (128, 256, 512, 2048):
    try:
        run(8, L)
    except Exception as e:
        print(f"L={L}: FAILED {type(e).__name__}: {str(e)[:200]}")
