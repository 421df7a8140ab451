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


def maybe_pallas(x, offset, mask, weight, bias, spec: DeformConvSpec,
                 require: bool = False,
                 precision: str = "tensorfloat32",
                 out_sizes=None):
    """Return the Pallas-kernel output, or None if unsupported.

    With require=True (impl="pallas"), raises instead of silently falling
    back when the config is ineligible.
    """
    from . import gathermm
    reason = gathermm.ineligible_reason(x, spec, out_sizes)
    if reason is None and not require and jax.default_backend() != "tpu":
        # Off-TPU the kernel only runs in the (slow) interpreter; "auto"
        # prefers the compiled XLA path there.  impl="pallas" still forces
        # the kernel (interpret mode) for correctness testing.
        reason = "auto prefers XLA off-TPU"
    if reason is None:
        return gathermm.deform_conv_fused(x, offset, mask, weight, bias,
                                          spec, precision, out_sizes)
    if require:
        raise NotImplementedError(
            f"pallas path unavailable for this config: {reason}")
    return None
