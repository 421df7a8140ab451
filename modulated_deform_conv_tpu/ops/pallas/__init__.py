"""Fused Pallas TPU kernels for the deformable-convolution hot path.

`maybe_pallas` is the dispatch hook used by ops/api.py: it returns the
fused-kernel result when the configuration is supported on the current
backend, or None to fall back to the pure-XLA path (ops/core.py).
"""
from __future__ import annotations

from typing import Optional

import jax

from ...utils.config import DeformConvSpec


def maybe_pallas(x, offset, mask, weight, bias, spec: DeformConvSpec,
                 require: bool = False):
    """Return the Pallas-kernel output, or None if unsupported.

    With require=True (impl="pallas"), raises instead of silently falling
    back when the config is ineligible.
    """
    from . import fwd2d
    reason = fwd2d.ineligible_reason(x, spec)
    if reason is None:
        return fwd2d.deform_conv2d_fused(x, offset, mask, weight, bias, spec)
    if require:
        raise NotImplementedError(
            f"pallas path unavailable for this config: {reason}")
    return None
