"""Public functional API: the four deformable-convolution ops.

Signatures mirror the reference's functional aliases
(/root/reference/modulated_deform_conv.py:349-352 → Function.apply arg order
:11, :95, :177, :264): positional (input, offset, [mask,] weight, bias),
then stride/padding/dilation/groups/deformable_groups/in_step.

All functions are jit-able, differentiable in every tensor argument
(input/offset/mask/weight/bias), and accept NCHW/NCDHW layout for parity
with the reference.  `impl` selects the compute path:

* "xla"    — pure-JAX formulation (ops/core.py); always available.
* "pallas" — fused Pallas TPU kernels (ops/pallas/); falls back to "xla"
             where unsupported.
* "auto"   — pallas on TPU when eligible, else xla.

Dtype policy (vs the reference's AT_DISPATCH_FLOATING_TYPES_AND_HALF,
deformable_conv.cu:99): fp32 and bf16 run natively end to end.  fp16
inputs are upcast to fp32 on the kernel paths — strictly more accurate
than the reference's native-half arithmetic at fp32 cost; for half-class
throughput with fp16 storage pass `precision="bfloat16"` (bf16 compute,
fp32 accumulation).  fp64 requires `jax.enable_x64` and runs on the XLA
path only: impl="auto" falls back to it, impl="pallas"/"shiftblend"
raises NotImplementedError (never a silent downcast; tested in
tests/test_behavior.py::test_float64_pallas_raises_auto_falls_back).
Sampling coordinates always accumulate in >= fp32.
"""
from __future__ import annotations

from typing import Optional

import jax

from ..utils.config import DeformConvSpec
from . import core

_IMPLS = ("auto", "xla", "pallas", "shiftblend")


def _dispatch(x, offset, mask, weight, bias, spec: DeformConvSpec, impl: str,
              precision: str = "tensorfloat32", out_sizes=None,
              offset_bound=None, gate_bounds=None,
              debug_check_bounds: bool = False):
    if impl not in _IMPLS:
        raise ValueError(f"impl must be one of {_IMPLS}, got {impl!r}")
    if debug_check_bounds and offset_bound is not None:
        # Opt-in runtime guard for the bounded-offset contract: the
        # shift-blend kernel silently ZEROES tap contributions whose
        # offsets exceed the declared bound (shiftblend.py window-miss
        # semantics, mirroring the sharding layer's out-of-halo
        # contract).  jax.debug.print survives jit, so training code can
        # catch contract violations without a host sync.
        from .pallas import shiftblend as _sb
        ok = _sb.offsets_within_bound(offset, offset_bound)
        mx = jax.numpy.max(jax.numpy.abs(offset))
        jax.lax.cond(
            ok, lambda: None,
            lambda: jax.debug.print(
                "WARNING modulated_deform_conv_tpu: max |offset| = {m} "
                "exceeds the declared offset_bound = {b}; out-of-bound "
                "tap contributions are dropped (bounded-offset "
                "contract)", m=mx, b=offset_bound))
    if out_sizes is None:
        spec.validate(x.shape, offset.shape, weight.shape,
                      None if mask is None else mask.shape,
                      None if bias is None else bias.shape)
    if impl in ("auto", "pallas", "shiftblend"):
        from . import pallas as _pl
        fn = _pl.maybe_pallas(x, offset, mask, weight, bias, spec,
                              require=(impl in ("pallas", "shiftblend")),
                              precision=precision, out_sizes=out_sizes,
                              offset_bound=offset_bound, impl=impl,
                              gate_bounds=gate_bounds)
        if fn is not None:
            return fn
    return core.deform_conv_nd(x, offset, mask, weight, bias, spec,
                               out_sizes=out_sizes, precision=precision,
                               gate_bounds=gate_bounds)


def deform_conv2d(input: jax.Array, offset: jax.Array, weight: jax.Array,
                  bias: Optional[jax.Array] = None, stride=1, padding=0,
                  dilation=1, groups: int = 1, deformable_groups: int = 1,
                  in_step: int = 64, *, impl: str = "auto",
                  precision: str = "tensorfloat32",
                  offset_bound=None,
                  debug_check_bounds: bool = False) -> jax.Array:
    """DCNv1 2D forward (reference deform_conv2d, modulated_deform_conv.py:349).

    input (B,C,H,W); offset (B, dg*2*kh*kw, OH, OW); weight (O, C/g, kh, kw);
    bias (O,) or None.  Returns (B, O, OH, OW).
    """
    spec = DeformConvSpec.make(2, weight.shape[2:], stride, padding, dilation,
                               groups, deformable_groups, in_step,
                               modulated=False)
    return _dispatch(input, offset, None, weight, bias, spec, impl,
                     precision, offset_bound=offset_bound,
                     debug_check_bounds=debug_check_bounds)


def modulated_deform_conv2d(input: jax.Array, offset: jax.Array,
                            mask: jax.Array, weight: jax.Array,
                            bias: Optional[jax.Array] = None, stride=1,
                            padding=0, dilation=1, groups: int = 1,
                            deformable_groups: int = 1, in_step: int = 64,
                            *, impl: str = "auto",
                            precision: str = "tensorfloat32",
                            offset_bound=None,
                            debug_check_bounds: bool = False) -> jax.Array:
    """DCNv2 2D forward (reference modulated_deform_conv2d,
    modulated_deform_conv.py:350).  mask (B, dg*kh*kw, OH, OW)."""
    spec = DeformConvSpec.make(2, weight.shape[2:], stride, padding, dilation,
                               groups, deformable_groups, in_step,
                               modulated=True)
    return _dispatch(input, offset, mask, weight, bias, spec, impl,
                     precision, offset_bound=offset_bound,
                     debug_check_bounds=debug_check_bounds)


def deform_conv3d(input: jax.Array, offset: jax.Array, weight: jax.Array,
                  bias: Optional[jax.Array] = None, stride=1, padding=0,
                  dilation=1, groups: int = 1, deformable_groups: int = 1,
                  in_step: int = 64, *, impl: str = "auto",
                  precision: str = "tensorfloat32",
                  offset_bound=None,
                  debug_check_bounds: bool = False) -> jax.Array:
    """3D deformable conv (reference deform_conv3d, modulated_deform_conv.py:351).

    input (B,C,H,W,L); offset (B, dg*3*kh*kw*kl, OH, OW, OL);
    weight (O, C/g, kh, kw, kl)."""
    spec = DeformConvSpec.make(3, weight.shape[2:], stride, padding, dilation,
                               groups, deformable_groups, in_step,
                               modulated=False)
    return _dispatch(input, offset, None, weight, bias, spec, impl,
                     precision, offset_bound=offset_bound,
                     debug_check_bounds=debug_check_bounds)


def modulated_deform_conv3d(input: jax.Array, offset: jax.Array,
                            mask: jax.Array, weight: jax.Array,
                            bias: Optional[jax.Array] = None, stride=1,
                            padding=0, dilation=1, groups: int = 1,
                            deformable_groups: int = 1, in_step: int = 64,
                            *, impl: str = "auto",
                            precision: str = "tensorfloat32",
                            offset_bound=None,
                            debug_check_bounds: bool = False) -> jax.Array:
    """Modulated 3D deformable conv (reference modulated_deform_conv3d,
    modulated_deform_conv.py:352).  mask (B, dg*kh*kw*kl, OH, OW, OL)."""
    spec = DeformConvSpec.make(3, weight.shape[2:], stride, padding, dilation,
                               groups, deformable_groups, in_step,
                               modulated=True)
    return _dispatch(input, offset, mask, weight, bias, spec, impl,
                     precision, offset_bound=offset_bound,
                     debug_check_bounds=debug_check_bounds)
