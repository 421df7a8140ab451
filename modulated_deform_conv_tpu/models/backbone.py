"""DCN backbone blocks — the model-family layer built on the deformable ops.

The reference ships no models (SURVEY.md overview); its Pack modules are the
composition pattern real DCN backbones use (offset/mask predictor conv +
deformable conv, reference modulated_deform_conv.py:781-785).  This module
provides that next layer up: ResNet-style bottleneck blocks with DCNv2 3x3
convs (the classic "DCN in ResNet stages 3-5" recipe of the DCN papers) —
also the shapes of benchmark config 5 (BASELINE.md).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .modules import ModulatedDeformConv2dPack


class ConvBN(nn.Module):
    """1x1 or 3x3 conv + GroupNorm + optional ReLU (NCHW)."""
    out_channels: int
    kernel: int = 1
    stride: int = 1
    relu: bool = True

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        y = nn.Conv(self.out_channels, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=pad, use_bias=False)(jnp.moveaxis(x, 1, -1))
        y = nn.GroupNorm(num_groups=min(32, self.out_channels))(y)
        if self.relu:
            y = jax.nn.relu(y)
        return jnp.moveaxis(y, -1, 1)


class DCNBottleneck(nn.Module):
    """ResNet bottleneck with the 3x3 conv replaced by DCNv2 Pack
    (zero-init offsets + sigmoid mask, the stable training configuration)."""
    channels: int           # bottleneck width
    out_channels: int
    deformable_groups: int = 1

    @nn.compact
    def __call__(self, x):
        identity = x
        y = ConvBN(self.channels, kernel=1)(x)
        y = ModulatedDeformConv2dPack(
            in_channels=self.channels, out_channels=self.channels,
            kernel_size=3, padding=1,
            deformable_groups=self.deformable_groups,
            zero_init_offset=True, sigmoid_mask=True, name="dcn")(y)
        y = jax.nn.relu(y)
        y = ConvBN(self.out_channels, kernel=1, relu=False)(y)
        if x.shape[1] != self.out_channels:
            identity = ConvBN(self.out_channels, kernel=1, relu=False,
                              name="proj")(x)
        return jax.nn.relu(y + identity)


class DCNStage(nn.Module):
    """A stack of DCN bottleneck blocks (one ResNet stage)."""
    blocks: int
    channels: int
    out_channels: int
    deformable_groups: int = 1

    @nn.compact
    def __call__(self, x):
        for i in range(self.blocks):
            x = DCNBottleneck(self.channels, self.out_channels,
                              self.deformable_groups, name=f"block{i}")(x)
        return x
