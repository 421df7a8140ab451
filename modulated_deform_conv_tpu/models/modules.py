"""Module layer: the eight user-facing deformable-conv modules.

Flax.linen equivalents of the reference's nn.Modules
(/root/reference/modulated_deform_conv.py:354-537, 730-839):

explicit-offset modules (forward takes x + offset [+ mask]):
  DeformConv2d, ModulatedDeformConv2d, DeformConv3d, ModulatedDeformConv3d
"Pack" modules (learn the offset/mask predictor convs internally):
  DeformConv2dPack, ModulatedDeformConv2dPack,
  DeformConv3dPack, ModulatedDeformConv3dPack

Parameter initialization matches the reference exactly:
* weight ~ U(-s, s) with s = 1/sqrt(C_in * prod(kernel)); bias = 0
  (reset_parameters, modulated_deform_conv.py:385-392);
* Pack predictor convs use the same uniform init with zero bias
  (init_offset, modulated_deform_conv.py:741-748) — the reference does NOT
  zero-init the offset-conv weights, and does NOT pass the mask through a
  sigmoid (modulated_deform_conv.py:781-785).  Both deviations from standard
  DCN practice are reproduced by default and fixable via the documented
  opt-in flags `zero_init_offset=True` / `sigmoid_mask=True`.

Layout: NCHW / NCDHW, matching the reference API.
"""
from __future__ import annotations

import math
from typing import ClassVar, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import api as ops_api
from ..utils.config import ntuple

IntOrSeq = Union[int, Sequence[int]]


def _fan_in_uniform(fan_in: int):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) initializer
    (reference modulated_deform_conv.py:385-392)."""
    stdv = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -stdv, stdv)
    return init


class _DeformConvBase(nn.Module):
    """Shared plumbing for the eight modules."""
    in_channels: int
    out_channels: int
    kernel_size: IntOrSeq
    stride: IntOrSeq = 1
    padding: IntOrSeq = 0
    dilation: IntOrSeq = 1
    groups: int = 1
    deformable_groups: int = 1
    use_bias: bool = False            # reference default bias=False (:355)
    in_step: int = 64
    impl: str = "auto"
    # Bounded-offset contract enabling the shift-blend fast path
    # (ops/pallas/shiftblend.py); None keeps the general kernels.  With a
    # Pack module trained with clip_offset (or small learned offsets),
    # offset_bound is the matching inference-time declaration.
    offset_bound: Optional[float] = None
    param_dtype: jnp.dtype = jnp.float32
    # Mesh-sharded execution (r3): with `mesh` set, the op routes through
    # parallel/sharding.py (batch sharding, spatial halo exchange, group
    # TP) instead of the single-device dispatch — the model layer the
    # reference lacks becomes mesh-aware end to end (SURVEY §2.3).
    # `max_offset` is the sharding layer's bounded-offset contract.
    mesh: Optional[object] = None            # jax.sharding.Mesh
    batch_axis: Optional[str] = "data"
    spatial_axis: Optional[str] = "space"
    group_axis: Optional[str] = None
    max_offset: float = 0.0

    # ClassVar, not dataclass fields: subclasses override these statically.
    _ndim: ClassVar[int] = 2
    _modulated: ClassVar[bool] = False

    def _kernel(self) -> Tuple[int, ...]:
        return ntuple(self.kernel_size, self._ndim)

    def setup(self):
        if self.in_channels % self.groups:
            raise ValueError("in_channels not divisible by groups")
        if self.out_channels % self.groups:
            raise ValueError("out_channels not divisible by groups")
        if self.in_channels % self.deformable_groups:
            raise ValueError("in_channels not divisible by deformable_groups")
        k = self._kernel()
        fan_in = self.in_channels * math.prod(k)
        self.weight = self.param(
            "weight", _fan_in_uniform(fan_in),
            (self.out_channels, self.in_channels // self.groups) + k,
            self.param_dtype)
        if self.use_bias:
            self.bias = self.param("bias", nn.initializers.zeros,
                                   (self.out_channels,), self.param_dtype)
        else:
            self.bias = None

    def _conv(self, x, offset, mask):
        k = self._kernel()
        if self.mesh is not None:
            from ..parallel import sharding as _sh
            from ..utils.config import DeformConvSpec
            spec = DeformConvSpec.make(
                self._ndim, k, ntuple(self.stride, self._ndim),
                ntuple(self.padding, self._ndim),
                ntuple(self.dilation, self._ndim), self.groups,
                self.deformable_groups, self.in_step,
                modulated=self._modulated)
            return _sh.sharded_deform_conv(
                x, offset, mask if self._modulated else None, self.weight,
                self.bias, spec, self.mesh, batch_axis=self.batch_axis,
                spatial_axis=self.spatial_axis, max_offset=self.max_offset,
                group_axis=self.group_axis, impl=self.impl)
        kwargs = dict(stride=ntuple(self.stride, self._ndim),
                      padding=ntuple(self.padding, self._ndim),
                      dilation=ntuple(self.dilation, self._ndim),
                      groups=self.groups,
                      deformable_groups=self.deformable_groups,
                      in_step=self.in_step, impl=self.impl,
                      offset_bound=self.offset_bound)
        if self._ndim == 2:
            if self._modulated:
                return ops_api.modulated_deform_conv2d(
                    x, offset, mask, self.weight, self.bias, **kwargs)
            return ops_api.deform_conv2d(x, offset, self.weight, self.bias,
                                         **kwargs)
        if self._modulated:
            return ops_api.modulated_deform_conv3d(
                x, offset, mask, self.weight, self.bias, **kwargs)
        return ops_api.deform_conv3d(x, offset, self.weight, self.bias,
                                     **kwargs)


class DeformConv2d(_DeformConvBase):
    """Explicit-offset DCNv1 2D (reference modulated_deform_conv.py:354-396)."""
    _ndim = 2
    _modulated = False

    def __call__(self, x, offset):
        return self._conv(x, offset, None)


class ModulatedDeformConv2d(_DeformConvBase):
    """Explicit-offset DCNv2 2D (reference modulated_deform_conv.py:401-443)."""
    _ndim = 2
    _modulated = True

    def __call__(self, x, offset, mask):
        return self._conv(x, offset, mask)


class DeformConv3d(_DeformConvBase):
    """Explicit-offset 3D (reference modulated_deform_conv.py:448-490)."""
    _ndim = 3
    _modulated = False

    def __call__(self, x, offset):
        return self._conv(x, offset, None)


class ModulatedDeformConv3d(_DeformConvBase):
    """Explicit-offset modulated 3D (reference modulated_deform_conv.py:495-537)."""
    _ndim = 3
    _modulated = True

    def __call__(self, x, offset, mask):
        return self._conv(x, offset, mask)


class _PredictorConv(nn.Module):
    """Ordinary conv predicting offsets/masks on the output grid — the
    nn.Conv2d/3d `conv_offset`/`conv_mask` of the Pack modules
    (reference modulated_deform_conv.py:734-738, 759-768, 791-794, 815-822).

    NCHW in/out.  Init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) weights + zero
    bias (reference init_offset :741-748), or zero weights with
    zero_init=True (the DCN-paper convention the reference omits).
    """
    ndim: int
    in_channels: int
    out_channels: int
    kernel: Tuple[int, ...]
    stride: Tuple[int, ...]
    padding: Tuple[int, ...]
    dilation: Tuple[int, ...]
    zero_init: bool = False
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = self.in_channels * math.prod(self.kernel)
        w_init = (nn.initializers.zeros if self.zero_init
                  else _fan_in_uniform(fan_in))
        w = self.param("weight", w_init,
                       (self.out_channels, self.in_channels) + self.kernel,
                       self.param_dtype)
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,),
                       self.param_dtype)
        nd = self.ndim
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w.shape,
            ("NCHW", "OIHW", "NCHW") if nd == 2 else
            ("NCDHW", "OIDHW", "NCDHW"))
        pad = [(p, p) for p in self.padding]
        out = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=self.stride, padding=pad,
            rhs_dilation=self.dilation, dimension_numbers=dn)
        return out + b.astype(out.dtype).reshape((1, -1) + (1,) * nd)


class _PackBase(_DeformConvBase):
    """Pack variant: offset (and mask) come from learned predictor convs
    applied to x, sharing the main conv's stride/padding/dilation so they
    live on the output grid (reference :734-738)."""
    zero_init_offset: bool = False   # opt-in fix (reference does not zero-init)
    sigmoid_mask: bool = False       # opt-in fix (reference applies no sigmoid)

    def _predictor(self, name: str, out_ch: int, zero_init: bool):
        nd = self._ndim
        return _PredictorConv(
            ndim=nd, in_channels=self.in_channels, out_channels=out_ch,
            kernel=self._kernel(), stride=ntuple(self.stride, nd),
            padding=ntuple(self.padding, nd),
            dilation=ntuple(self.dilation, nd), zero_init=zero_init,
            param_dtype=self.param_dtype, name=name)

    def setup(self):
        super().setup()
        nd = self._ndim
        K = math.prod(self._kernel())
        self.conv_offset = self._predictor(
            "conv_offset", self.deformable_groups * nd * K,
            self.zero_init_offset)
        if self._modulated:
            self.conv_mask = self._predictor(
                "conv_mask", self.deformable_groups * K,
                self.zero_init_offset)

    def __call__(self, x):
        offset = self.conv_offset(x)
        if self._modulated:
            mask = self.conv_mask(x)
            if self.sigmoid_mask:
                mask = jax.nn.sigmoid(mask)
            return self._conv(x, offset, mask)
        return self._conv(x, offset, None)


class DeformConv2dPack(_PackBase):
    """Learned-offset DCNv1 2D (reference modulated_deform_conv.py:730-753)."""
    _ndim = 2
    _modulated = False


class ModulatedDeformConv2dPack(_PackBase):
    """Learned offset+mask DCNv2 2D (reference modulated_deform_conv.py:755-785)."""
    _ndim = 2
    _modulated = True


class DeformConv3dPack(_PackBase):
    """Learned-offset 3D (reference modulated_deform_conv.py:787-809)."""
    _ndim = 3
    _modulated = False


class ModulatedDeformConv3dPack(_PackBase):
    """Learned offset+mask 3D (reference modulated_deform_conv.py:811-839)."""
    _ndim = 3
    _modulated = True
