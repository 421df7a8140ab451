#!/usr/bin/env python
"""Does the TPU toolchain still crash on indexed make_async_copy? (r5)

gathermm's HBM-streaming path (the would-be cfg4-class kernel) is gated
off on TPU because the r3/r4 AOT compiler crashed on any indexed
`pltpu.make_async_copy` (gathermm.py ineligible_reason).  This probe
compiles three minimal kernels of increasing similarity to the streaming
path and reports which compile and run:

  1. static-slice DMA  ANY->VMEM (no dynamic index)
  2. dynamic-chunk DMA ANY->VMEM (`.at[0, pl.ds(ci*SCH, SCH), :]`)
  3. dynamic-chunk read-modify-write (the streaming backward's accum_gx)

Usage: python benchmarks/probe_async_copy_r5.py
"""
import sys

sys.path.insert(0, "/root/repo")

import functools
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SCH = 256
N = 2048
C = 128


def k_static(x_ref, o_ref, buf, sem):
    dma = pltpu.make_async_copy(x_ref.at[0, pl.ds(0, SCH), :], buf, sem)
    dma.start()
    dma.wait()
    o_ref[...] = buf[...] * 2.0


def k_dynamic(x_ref, o_ref, buf, sem):
    def body(ci, acc):
        dma = pltpu.make_async_copy(
            x_ref.at[0, pl.ds(ci * SCH, SCH), :], buf, sem)
        dma.start()
        dma.wait()
        return acc + jnp.sum(buf[...])
    s = jax.lax.fori_loop(0, N // SCH, body, jnp.float32(0))
    o_ref[...] = jnp.full_like(o_ref, s)


def k_rmw(x_ref, gx_ref, o_ref, buf, gbuf, sem, gsem):
    def body(ci, acc):
        sl = pl.ds(ci * SCH, SCH)
        dma = pltpu.make_async_copy(x_ref.at[0, sl, :], buf, sem)
        dma.start()
        dma.wait()
        rd = pltpu.make_async_copy(gx_ref.at[0, sl, :], gbuf, gsem)
        rd.start()
        rd.wait()
        gbuf[...] += buf[...]
        wr = pltpu.make_async_copy(gbuf, gx_ref.at[0, sl, :], gsem)
        wr.start()
        wr.wait()
        return acc
    jax.lax.fori_loop(0, N // SCH, body, jnp.float32(0))
    o_ref[...] = jnp.zeros_like(o_ref)


def try_case(name, build):
    try:
        out = build()
        print(f"{name}: OK  (checksum {float(np.asarray(out).sum()):.3f})",
              flush=True)
        return True
    except Exception as e:
        msg = traceback.format_exc().splitlines()[-1][:160]
        print(f"{name}: FAIL  {msg}", flush=True)
        return False


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, N, C)), jnp.float32)

    def run_static():
        return jax.jit(lambda x: pl.pallas_call(
            k_static,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((SCH, C), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((SCH, C), jnp.float32),
            scratch_shapes=[pltpu.VMEM((SCH, C), jnp.float32),
                            pltpu.SemaphoreType.DMA(())],
        )(x))(x)

    def run_dynamic():
        return jax.jit(lambda x: pl.pallas_call(
            k_dynamic,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((SCH, C), jnp.float32),
                            pltpu.SemaphoreType.DMA(())],
        )(x))(x)

    def run_rmw():
        return jax.jit(lambda x: pl.pallas_call(
            k_rmw,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                       pl.BlockSpec((8, 128), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((1, N, C), jnp.float32),
                       jax.ShapeDtypeStruct((8, 128), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((SCH, C), jnp.float32),
                            pltpu.VMEM((SCH, C), jnp.float32),
                            pltpu.SemaphoreType.DMA(()),
                            pltpu.SemaphoreType.DMA(())],
        )(x)[1])(x)

    ok = [try_case("static_dma", run_static),
          try_case("dynamic_chunk_dma", run_dynamic),
          try_case("dynamic_rmw_dma", run_rmw)]
    print("VERDICT:", "toolchain supports indexed make_async_copy"
          if all(ok) else "still gated (see FAIL lines)")


if __name__ == "__main__":
    main()
