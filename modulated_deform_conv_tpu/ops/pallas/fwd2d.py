"""Fused 2D deformable-conv forward Pallas kernel (gather + MXU matmul).

Replaces the reference's two-step im2col-materialize + cuBLAS GEMM
(deformable_conv.cu:168-182) with a single kernel that keeps the column
tile in VMEM.  Under construction — `ineligible_reason` gates dispatch.
"""
from __future__ import annotations

from typing import Optional

import jax

from ...utils.config import DeformConvSpec


def ineligible_reason(x, spec: DeformConvSpec) -> Optional[str]:
    """Return None if the fused kernel supports this config, else a reason."""
    return "fused pallas forward not yet enabled"


def deform_conv2d_fused(x, offset, mask, weight, bias, spec: DeformConvSpec):
    raise NotImplementedError
