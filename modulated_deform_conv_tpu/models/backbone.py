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
    (zero-init offsets + sigmoid mask, the stable training configuration),
    or a plain 3x3 conv when `deformable=False`."""
    channels: int           # bottleneck width
    out_channels: int
    deformable_groups: int = 1
    stride: int = 1
    deformable: bool = True
    # Mesh-sharded execution (see models/modules.py): forwarded to the DCN.
    mesh: object = None
    max_offset: float = 0.0
    batch_axis: str = "data"
    spatial_axis: str = "space"

    @nn.compact
    def __call__(self, x):
        identity = x
        y = ConvBN(self.channels, kernel=1)(x)
        if self.deformable:
            y = ModulatedDeformConv2dPack(
                in_channels=self.channels, out_channels=self.channels,
                kernel_size=3, stride=self.stride, padding=1,
                deformable_groups=self.deformable_groups,
                zero_init_offset=True, sigmoid_mask=True, name="dcn",
                mesh=self.mesh, max_offset=self.max_offset,
                batch_axis=self.batch_axis,
                spatial_axis=self.spatial_axis)(y)
        else:
            y = ConvBN(self.channels, kernel=3, stride=self.stride,
                       name="conv2")(y)
        y = jax.nn.relu(y)
        y = ConvBN(self.out_channels, kernel=1, relu=False)(y)
        if x.shape[1] != self.out_channels or self.stride != 1:
            identity = ConvBN(self.out_channels, kernel=1, relu=False,
                              stride=self.stride, name="proj")(x)
        return jax.nn.relu(y + identity)


class DCNStage(nn.Module):
    """A stack of DCN bottleneck blocks (one ResNet stage)."""
    blocks: int
    channels: int
    out_channels: int
    deformable_groups: int = 1
    stride: int = 1
    deformable: bool = True
    mesh: object = None
    max_offset: float = 0.0
    batch_axis: str = "data"
    spatial_axis: str = "space"

    @nn.compact
    def __call__(self, x):
        for i in range(self.blocks):
            x = DCNBottleneck(self.channels, self.out_channels,
                              self.deformable_groups,
                              stride=self.stride if i == 0 else 1,
                              deformable=self.deformable,
                              mesh=self.mesh, max_offset=self.max_offset,
                              batch_axis=self.batch_axis,
                              spatial_axis=self.spatial_axis,
                              name=f"block{i}")(x)
        return x


class DCNResNet(nn.Module):
    """ResNet-D with DCNv2 in stages c3-c5 — the flagship configuration of
    the DCN papers (Dai et al. 2017 §4.1; Zhu et al. 2018 §5.1: "apply
    deformable convolution in all the 3x3 conv layers in stages conv3-5").

    depth 50 -> blocks (3, 4, 6, 3).  NCHW in, class logits out (or the
    c2..c5 feature pyramid with `features_only=True`).
    """
    num_classes: int = 1000
    depth: int = 50
    deformable_groups: int = 1
    width: int = 64
    features_only: bool = False

    _BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}

    @nn.compact
    def __call__(self, x):
        blocks = self._BLOCKS[self.depth]
        w = self.width
        # stem: 7x7/2 conv + 3x3/2 max pool
        y = ConvBN(w, kernel=7, stride=2, name="stem")(x)
        y = jnp.moveaxis(nn.max_pool(jnp.moveaxis(y, 1, -1), (3, 3),
                                     strides=(2, 2), padding=((1, 1),) * 2),
                         -1, 1)
        feats = []
        for i, n in enumerate(blocks):
            y = DCNStage(blocks=n, channels=w * 2 ** i,
                         out_channels=w * 4 * 2 ** i,
                         deformable_groups=self.deformable_groups,
                         stride=1 if i == 0 else 2,
                         deformable=(i >= 1),   # DCN in c3..c5
                         name=f"c{i + 2}")(y)
            feats.append(y)
        if self.features_only:
            return tuple(feats)
        y = jnp.mean(y, axis=(2, 3))
        return nn.Dense(self.num_classes, name="fc")(y)


class ConvBN3d(nn.Module):
    """1x1x1 or 3x3x3 conv + GroupNorm + optional ReLU (NCTHW)."""
    out_channels: int
    kernel: int = 1
    stride: int = 1
    relu: bool = True

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        y = nn.Conv(self.out_channels, (self.kernel,) * 3,
                    strides=(self.stride,) * 3,
                    padding=pad, use_bias=False)(jnp.moveaxis(x, 1, -1))
        y = nn.GroupNorm(num_groups=min(32, self.out_channels))(y)
        if self.relu:
            y = jax.nn.relu(y)
        return jnp.moveaxis(y, -1, 1)


class DCN3dBottleneck(nn.Module):
    """3D bottleneck with the 3x3x3 conv replaced by modulated 3D DCN Pack
    (the video analog of DCNBottleneck; reference op
    mdeformable_conv3d.cu:54-127 in the Pack composition of
    modulated_deform_conv.py:811-839)."""
    channels: int
    out_channels: int
    deformable_groups: int = 1
    deformable: bool = True

    @nn.compact
    def __call__(self, x):
        from .modules import ModulatedDeformConv3dPack
        identity = x
        y = ConvBN3d(self.channels, kernel=1)(x)
        if self.deformable:
            y = ModulatedDeformConv3dPack(
                in_channels=self.channels, out_channels=self.channels,
                kernel_size=3, stride=1, padding=1,
                deformable_groups=self.deformable_groups,
                zero_init_offset=True, sigmoid_mask=True, name="dcn")(y)
        else:
            y = ConvBN3d(self.channels, kernel=3, name="conv2")(y)
        y = jax.nn.relu(y)
        y = ConvBN3d(self.out_channels, kernel=1, relu=False)(y)
        if x.shape[1] != self.out_channels:
            identity = ConvBN3d(self.out_channels, kernel=1, relu=False,
                                name="proj")(x)
        return jax.nn.relu(y + identity)


class DCNVideoNet(nn.Module):
    """Small video-classification backbone with deformable 3D convs —
    the model-family exercise of the 3D op pair (BASELINE configs 3-4
    shapes).  NCTHW in (T = frames), class logits out."""
    num_classes: int = 400
    width: int = 32
    blocks: Sequence[int] = (1, 1, 1)
    deformable_groups: int = 1

    @nn.compact
    def __call__(self, x):
        w = self.width
        y = ConvBN3d(w, kernel=3, stride=1, name="stem")(x)
        for i, n in enumerate(self.blocks):
            for j in range(n):
                y = DCN3dBottleneck(
                    channels=w * 2 ** i, out_channels=w * 2 * 2 ** i,
                    deformable_groups=self.deformable_groups,
                    deformable=(i >= 1),     # DCN in the deeper stages
                    name=f"s{i}b{j}")(y)
            if i < len(self.blocks) - 1:
                y = jnp.moveaxis(nn.max_pool(
                    jnp.moveaxis(y, 1, -1), (1, 2, 2), strides=(1, 2, 2)),
                    -1, 1)
        y = jnp.mean(y, axis=(2, 3, 4))
        return nn.Dense(self.num_classes, name="fc")(y)
