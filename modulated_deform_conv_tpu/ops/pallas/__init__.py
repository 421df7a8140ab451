"""Fused Pallas TPU kernels for the deformable-convolution hot path.

`maybe_pallas` is the dispatch hook used by ops/api.py: it returns the
fused-kernel result when the configuration is supported on the current
backend, or None to fall back to the pure-XLA path (ops/core.py).
"""
from __future__ import annotations

from typing import Optional

import jax

from ...utils.config import DeformConvSpec
from .gathermm import PRECISIONS  # noqa: F401  (public)


def _prefer_shiftblend(x, spec: DeformConvSpec, plan) -> bool:
    """Measured dispatch policy (v5e, benchmarks/suite_results.json r2,
    updated r4): shift-blend wins across 2D (cfg1 ~15x-over-XLA, cfg2 25x)
    for narrow channel slabs; the structured-sparse MXU kernel (gathermm)
    wins for wide channel slabs (C/dg > 128, cfg5 shapes), which amortize
    its window sweep on the MXU — and the register sweep is a compile bomb
    past C/dg ~256 anyway (see SBPlan.ineligible_reason).  For 3D, the r4
    planar gathermm mode (two-level lead-plane x in-plane chunk bounds)
    wins at wide offset bounds — cfg3 at +-2: 16.2 ms fwd+bwd vs
    shift-blend's 22.7 (its W^3 window grows cubically in the bound) —
    while shift-blend keeps sub-pixel bounds (+-1: 0.92 ms fwd) and every
    config gathermm cannot run (cfg4's VMEM-exceeding planes, via
    leading-axis chunking).  The channel crossover resolves through the
    device profile (utils/device.py): 128 as measured on v5e,
    overridable via MDC_SB_CROSSOVER for other chips."""
    from ...utils.device import current_profile
    Cg = x.shape[1] // spec.deformable_groups
    if Cg > current_profile().sb_crossover_cg:
        return False
    if spec.ndim == 3 and plan is not None and max(plan.bounds) >= 1.5:
        # Wide-bound 3D: planar gathermm's data-adaptive rectangle bounds
        # beat the static cubic window (measured crossover between +-1
        # and +-2 on v5e, benchmarks/ANALYSIS.md §3c r4).
        from .gathermm import _Plan
        gp = _Plan(spec, x.shape[0], x.shape[1], x.shape[2:],
                   plan.OS, x.dtype)
        if gp.planar:
            return False
    return True


def maybe_pallas(x, offset, mask, weight, bias, spec: DeformConvSpec,
                 require: bool = False,
                 precision: str = "tensorfloat32",
                 out_sizes=None, offset_bound=None, impl: str = "auto",
                 gate_bounds=None):
    """Return the Pallas-kernel output, or None if unsupported.

    With require=True (impl="pallas"/"shiftblend"), raises instead of
    silently falling back when the config is ineligible.  `offset_bound`
    enables the shift-blend kernel (bounded-offset contract; see
    shiftblend.py docstring).  `gate_bounds` (per-dim traced (lo, hi)
    gate override, from the sharding layer) routes to the gathermm kernel
    only — the shift-blend kernel carries its own global-gate mechanism
    (the sharded lead mode), which the sharding layer calls directly.
    """
    from . import gathermm, shiftblend
    on_tpu = jax.default_backend() == "tpu"

    sb_reason = shiftblend.ineligible_reason(x, spec, offset_bound,
                                             out_sizes)
    if gate_bounds is not None:
        sb_reason = sb_reason or "gate_bounds override not supported"
    if impl == "shiftblend":
        if sb_reason is not None:
            if require:
                raise NotImplementedError(
                    f"shiftblend path unavailable: {sb_reason}")
            return None
        return shiftblend.deform_conv_shift(x, offset, mask, weight, bias,
                                            spec, precision, offset_bound)

    reason = gathermm.ineligible_reason(x, spec, out_sizes)
    if not require and not on_tpu:
        # Off-TPU the kernels only run in the (slow) interpreter; "auto"
        # prefers the compiled XLA path there.  impl="pallas" still forces
        # a kernel (interpret mode) for correctness testing.
        return None
    if sb_reason is None:
        plan = shiftblend.SBPlan(spec, x.shape[0], x.shape[1], x.shape[2:],
                                 spec.out_sizes(x.shape[2:]), offset_bound)
        if reason is not None or _prefer_shiftblend(x, spec, plan):
            return shiftblend.deform_conv_shift(
                x, offset, mask, weight, bias, spec, precision, offset_bound)
    if reason is None:
        return gathermm.deform_conv_fused(x, offset, mask, weight, bias,
                                          spec, precision, out_sizes,
                                          gate_bounds)
    if require:
        raise NotImplementedError(
            f"pallas path unavailable for this config: {reason}"
            + (f"; shiftblend: {sb_reason}" if sb_reason else ""))
    return None
