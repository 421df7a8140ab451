"""Mesh sharding + halo exchange for deformable convolutions.

The reference is a single-GPU kernel library with no distributed layer at
all (SURVEY.md §2.3) — its only "parallelism" is the in_step micro-batch
chunk loop (deformable_conv.cu:168).  This module is the TPU-native scaling
layer it lacks:

* batch axis  — embarrassingly parallel data sharding,
* spatial axis — the first spatial dim (H) is sharded across chips with a
  ring **halo exchange** (`jax.lax.ppermute` neighbor shifts) so the
  offset-displaced bilinear/trilinear taps near shard boundaries can read
  their out-of-shard corners (overlap-save style).  This is the project's
  sequence-parallel analog: each shard needs `pad + (k-1)*dilation + 1 - s`
  boundary rows plus ceil(max|offset_h|) because sample positions are
  offset-displaced (sampling math deformable_conv.cu:76-77).

Offsets are unbounded in principle, so spatial sharding has a documented
bounded-offset contract: out-of-halo samples are zeroed (as if out of
image).  Two escape hatches: pass a larger `max_offset`, or shard batch
only.  Gradients come from JAX autodiff of the shard_mapped forward —
the ppermute transposes back and replicated-weight cotangents are psummed
across the mesh automatically.

Everything here also runs multi-host: the mesh may span hosts (ICI/DCN),
XLA emits the collectives.  See parallel/runtime.py for
jax.distributed.initialize plumbing.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.config import DeformConvSpec
from ..ops import core
from ..ops import api as ops_api

try:  # JAX >= 0.4.35 exposes shard_map at top level
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        # check_vma=False: the varying-across-mesh-axes checker cannot see
        # through pallas_call outputs (jax 0.9 raises "vma ... must not be
        # None"), and the fused TPU kernels run inside every shard.  Our
        # per-axis replication/psum structure is fixed by the in/out specs
        # and covered by the mesh parity tests.
        try:
            return _shard_map(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_vma=False)
        except TypeError:  # older jax without check_vma
            return _shard_map(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_rep=False)


def make_mesh(shape: Sequence[int],
              axis_names: Sequence[str] = ("data", "space"),
              devices=None) -> Mesh:
    """Build a named device mesh (defaults to all visible devices)."""
    if devices is None:
        n = math.prod(shape)
        devices = jax.devices()[:n]
        if len(devices) < n:
            raise ValueError(f"need {n} devices, have {len(devices)}")
    devs = np.asarray(devices).reshape(tuple(shape))
    return Mesh(devs, tuple(axis_names))


def required_halo(spec: DeformConvSpec, max_offset: float) -> int:
    """Halo rows needed on each side of a spatial shard.

    Upper side needs `pad + ceil(max_offset)` rows; lower side needs the
    kernel-footprint overshoot `(k-1)*dil + 1 - stride - pad` (can be
    negative) plus `ceil(max_offset)`.  We exchange the max of both.
    """
    k, s, p, d = (spec.kernel[0], spec.stride[0], spec.padding[0],
                  spec.dilation[0])
    m = int(math.ceil(max(0.0, float(max_offset))))
    up = p + m
    dn = max(0, (k - 1) * d + 1 - s - p) + m
    return max(up, dn, 0)


def _halo_exchange(x_local: jax.Array, halo: int, axis: int,
                   axis_name: str, n_shards: int) -> jax.Array:
    """Ring halo exchange along `axis`: prepend the previous shard's last
    `halo` rows and append the next shard's first `halo` rows.  Boundary
    shards receive zeros (== global zero padding beyond the image, which is
    exact for the out-of-image-corners-are-zero sampling semantics)."""
    if halo == 0:
        return x_local
    ndim = x_local.ndim
    hs = x_local.shape[axis]

    def sl(a, b):
        s = [slice(None)] * ndim
        s[axis] = slice(a, b)
        return tuple(s)

    if halo <= hs:
        # common case: single neighbor hop, exchange only the halo rows
        up = jax.lax.ppermute(x_local[sl(hs - halo, None)], axis_name,
                              [(j, j + 1) for j in range(n_shards - 1)])
        dn = jax.lax.ppermute(x_local[sl(0, halo)], axis_name,
                              [(j + 1, j) for j in range(n_shards - 1)])
        return jnp.concatenate([up, x_local, dn], axis=axis)

    # halo wider than a shard: multi-hop exchange of whole blocks
    hops = min(-(-halo // hs), n_shards - 1)
    blocks = []
    for j in range(hops, 0, -1):      # blocks from shard i-j (zeros at edges)
        blocks.append(jax.lax.ppermute(
            x_local, axis_name, [(i, i + j) for i in range(n_shards - j)]))
    blocks.append(x_local)
    for j in range(1, hops + 1):      # blocks from shard i+j
        blocks.append(jax.lax.ppermute(
            x_local, axis_name, [(i + j, i) for i in range(n_shards - j)]))
    ext = jnp.concatenate(blocks, axis=axis)
    avail = hops * hs
    if avail < halo:                  # remaining rows are past the ring: zeros
        pad = [(0, 0)] * ndim
        pad[axis] = (halo - avail, halo - avail)
        ext = jnp.pad(ext, pad)
        avail = halo
    return ext[sl(avail - halo, avail + hs + halo)]


def _local_conv(x_l, off_l, mask_l, weight, bias, spec: DeformConvSpec,
                halo: int, spatial_axis_name: str, n_shards: int,
                out_h_local: int, in_h_local: int,
                max_offset: float = 0.0, impl: str = "auto",
                precision: str = "tensorfloat32"):
    """Per-shard computation inside shard_map (2D or 3D; shards dim H =
    first spatial dim)."""
    nd = spec.ndim
    x_ext = _halo_exchange(x_l, halo, axis=2, axis_name=spatial_axis_name,
                           n_shards=n_shards)

    # Bounded-offset fast path: the shift-blend kernel's lead mode was
    # built for exactly this halo-extended-block shape (global-coordinate
    # gates, out-of-halo contributions zeroed — the same contract this
    # layer documents for max_offset).  Dispatch mirrors
    # ops/pallas/_prefer_shiftblend: narrow channel slabs only, on TPU
    # (interpret mode off-TPU is test-only), unless forced.
    if max_offset > 0 and impl in ("auto", "shiftblend"):
        from ..ops.pallas import shiftblend as _sb
        Cg = x_l.shape[1] // spec.deformable_groups
        S0_global = out_h_local * n_shards
        reason = _sb.sharded_lead_reason(x_ext.shape, x_ext.dtype, spec,
                                         float(max_offset), halo, S0_global)
        prefer = Cg <= 128 or impl == "shiftblend"
        on_tpu = jax.default_backend() == "tpu"
        if reason is None and prefer and (on_tpu or impl == "shiftblend"):
            i_shard = jax.lax.axis_index(spatial_axis_name)
            origin = (i_shard * out_h_local).astype(jnp.float32)
            return _sb.deform_conv_shift_sharded(
                x_ext, off_l, mask_l, weight, bias, spec,
                precision, float(max_offset), halo, S0_global, origin)
        if impl == "shiftblend":
            raise NotImplementedError(
                f"shiftblend shard path unavailable: {reason}")

    # Fold the global->local coordinate change into the h-offset channels.
    # Global sample row: h_g = oh_g*s - pad + i*dil + off_h with
    # oh_g = shard*OHs + oh_l.  Local row h_l = h_g - (shard*Hs - halo).
    # Running the core op on the local block with padding_h=0 gives base
    # oh_l*s + i*dil, so the residual shift is:
    #   delta = shard*(OHs*s - Hs) - pad + halo   (== halo - pad when the
    # alignment contract OHs*s == Hs holds; kept general for safety).
    i_shard = jax.lax.axis_index(spatial_axis_name)
    s0, p0 = spec.stride[0], spec.padding[0]
    delta = (i_shard * (out_h_local * s0 - in_h_local) - p0 + halo
             ).astype(off_l.dtype)
    c_off = off_l.shape[1]
    is_h_channel = (jnp.arange(c_off) % nd) == 0  # layout nd*f + d, d=0 is h
    shift = jnp.where(is_h_channel, delta, jnp.zeros_like(delta))
    off_shifted = off_l + shift.reshape((1, c_off) + (1,) * nd)

    local_spec = DeformConvSpec(
        ndim=nd, kernel=spec.kernel,
        stride=spec.stride,
        padding=(0,) + spec.padding[1:],
        dilation=spec.dilation, groups=spec.groups,
        deformable_groups=spec.deformable_groups, in_step=spec.in_step,
        modulated=spec.modulated)
    # The local output grid is fixed by the offset shard, not derivable from
    # the halo-extended input block.  Dispatch through the api so each shard
    # uses the fused Pallas kernel on TPU.
    local_os = (out_h_local,) + tuple(off_l.shape[2 + 1:])
    return ops_api._dispatch(x_ext, off_shifted, mask_l, weight, bias,
                             local_spec, impl="auto", precision=precision,
                             out_sizes=local_os)


def sharded_deform_conv(x: jax.Array, offset: jax.Array,
                        mask: Optional[jax.Array], weight: jax.Array,
                        bias: Optional[jax.Array], spec: DeformConvSpec,
                        mesh: Mesh, batch_axis: Optional[str] = "data",
                        spatial_axis: Optional[str] = "space",
                        max_offset: float = 0.0,
                        halo: Optional[int] = None,
                        group_axis: Optional[str] = None,
                        impl: str = "auto",
                        precision: str = "tensorfloat32") -> jax.Array:
    """Deformable conv over a (batch, spatial, group) sharded mesh.

    `impl`: per-shard compute path ("auto"/"xla"/"pallas"/"shiftblend").
    With a positive `max_offset` the contract doubles as the
    bounded-offset declaration, so "auto" shards use the fused
    shift-blend kernel on TPU where eligible (spatial shards through its
    halo-extended lead mode; batch/group shards directly).

    x (B,C,H,W[,L]) is sharded (batch_axis, [group_axis], spatial_axis,
    None[, None]); offset/mask shard the same way on their output grid;
    weight/bias are replicated unless `group_axis` is given.  Returns output
    sharded like the input (out channels on `group_axis` when set).

    `max_offset` is the bounded-offset contract: samples displaced beyond
    ceil(max_offset) rows past the shard's halo are treated as out-of-image
    (zero).  `halo` overrides the computed exchange width.

    `group_axis` is the tensor-parallel analog of the reference's per-group
    GEMM split (deformable_conv.cu:163-180 runs one addmm_ per group — the
    GEMM is block-diagonal over groups, so it shards cleanly):

    * **group-aligned** (mesh axis size divides both `groups` and
      `deformable_groups`): input channels, offset/mask channels, weight
      output channels, and the output all shard; the local op runs with
      groups/n and dg/n and NO collectives (the backward needs none
      either — every gradient is channel-local).
    * **within-group TP** (groups == 1, O divisible by the axis): weight
      and output shard along O; x/offset/mask are replicated on the axis;
      shard_map's transpose psums grad_x/grad_offset/grad_mask across the
      axis automatically.
    """
    spec.validate(x.shape, offset.shape, weight.shape,
                  None if mask is None else mask.shape,
                  None if bias is None else bias.shape)
    nd = spec.ndim
    B, C, H = x.shape[0], x.shape[1], x.shape[2]
    O = weight.shape[0]
    OS = spec.out_sizes(x.shape[2:])
    OH = OS[0]
    g, dg = spec.groups, spec.deformable_groups

    n_b = mesh.shape[batch_axis] if batch_axis else 1
    n_s = mesh.shape[spatial_axis] if spatial_axis else 1
    n_g = mesh.shape[group_axis] if group_axis else 1
    if B % n_b:
        raise ValueError(f"batch {B} not divisible by mesh axis {n_b}")
    if n_s > 1:
        if H % n_s or OH % n_s:
            raise ValueError(f"H={H}/OH={OH} not divisible by spatial mesh "
                             f"axis {n_s}")
        if (OH // n_s) * spec.stride[0] != H // n_s:
            raise ValueError(
                "spatial sharding requires OH_local*stride == H_local "
                f"(got OH/n={OH // n_s}, stride={spec.stride[0]}, "
                f"H/n={H // n_s}); use batch-only sharding for this config")
    if halo is None:
        halo = required_halo(spec, max_offset) if n_s > 1 else 0

    # Observability (SURVEY §5): record analytic halo traffic and GEMM
    # FLOPs for this traced call — bench harnesses divide by wall time
    # for achieved-rate reporting.
    from ..utils import profiling as _prof
    if n_s > 1:
        hs = _prof.halo_stats(spec, x.shape, halo, n_s)
        _prof.counters.add("halo_bytes_fwd", hs["halo_bytes_fwd"])
        _prof.counters.add("halo_rows", hs["halo_rows"])
    _prof.counters.add("gemm_flops_fwd",
                       _prof.op_stats(spec, x.shape,
                                      weight.shape[0])["gemm_flops"])
    _prof.counters.add("sharded_calls", 1)

    # Group/channel (TP-analog) sharding mode.
    lspec = spec
    group_aligned = False
    if n_g > 1:
        if g % n_g == 0 and dg % n_g == 0:
            group_aligned = True
            if O % n_g:
                raise ValueError(f"out channels {O} not divisible by "
                                 f"group mesh axis {n_g}")
            lspec = DeformConvSpec(
                ndim=nd, kernel=spec.kernel, stride=spec.stride,
                padding=spec.padding, dilation=spec.dilation,
                groups=g // n_g, deformable_groups=dg // n_g,
                in_step=spec.in_step, modulated=spec.modulated)
        elif g == 1 and O % n_g == 0:
            group_aligned = False
        else:
            raise ValueError(
                f"group_axis size {n_g} must divide groups={g} and "
                f"deformable_groups={dg} (group-aligned mode), or groups "
                f"must be 1 with O % {n_g} == 0 (within-group TP)")

    bspec = batch_axis if n_b > 1 else None
    sspec = spatial_axis if n_s > 1 else None
    gspec = group_axis if n_g > 1 else None
    cin_spec = gspec if group_aligned else None
    x_ps = P(bspec, cin_spec, sspec, *([None] * (nd - 1)))
    off_ps = P(bspec, cin_spec, sspec, *([None] * (nd - 1)))
    mask_ps = off_ps
    out_ps = P(bspec, gspec, sspec, *([None] * (nd - 1)))
    w_ps = P(gspec, *([None] * (nd + 1)))
    b_ps = P(gspec)

    in_specs = [x_ps, off_ps] + ([mask_ps] if mask is not None else []) + \
        [w_ps] + ([b_ps] if bias is not None else [])

    def fn(*args):
        if mask is not None:
            x_l, off_l, mask_l = args[0], args[1], args[2]
            rest = args[3:]
        else:
            x_l, off_l, mask_l = args[0], args[1], None
            rest = args[2:]
        w_l = rest[0]
        b_l = rest[1] if len(rest) > 1 else None
        if n_s > 1:
            return _local_conv(x_l, off_l, mask_l, w_l, b_l, lspec, halo,
                               spatial_axis, n_s, OH // n_s, H // n_s,
                               max_offset=max_offset, impl=impl,
                               precision=precision)
        return ops_api._dispatch(
            x_l, off_l, mask_l, w_l, b_l, lspec, impl=impl,
            precision=precision,
            offset_bound=(float(max_offset) if max_offset > 0 else None))

    args = (x, offset) + ((mask,) if mask is not None else ()) + (weight,) \
        + ((bias,) if bias is not None else ())
    return shard_map(fn, mesh, in_specs=tuple(in_specs),
                     out_specs=out_ps)(*args)


def sharded_deform_conv2d(x, offset, weight, bias=None, *, mesh, stride=1,
                          padding=0, dilation=1, groups=1,
                          deformable_groups=1, in_step=64, batch_axis="data",
                          spatial_axis="space", max_offset=0.0, halo=None,
                          group_axis=None, impl="auto",
                          precision="tensorfloat32"):
    spec = DeformConvSpec.make(2, weight.shape[2:], stride, padding, dilation,
                               groups, deformable_groups, in_step, False)
    return sharded_deform_conv(x, offset, None, weight, bias, spec, mesh,
                               batch_axis, spatial_axis, max_offset, halo,
                               group_axis, impl, precision)


def sharded_modulated_deform_conv2d(x, offset, mask, weight, bias=None, *,
                                    mesh, stride=1, padding=0, dilation=1,
                                    groups=1, deformable_groups=1, in_step=64,
                                    batch_axis="data", spatial_axis="space",
                                    max_offset=0.0, halo=None,
                                    group_axis=None, impl="auto",
                          precision="tensorfloat32"):
    spec = DeformConvSpec.make(2, weight.shape[2:], stride, padding, dilation,
                               groups, deformable_groups, in_step, True)
    return sharded_deform_conv(x, offset, mask, weight, bias, spec, mesh,
                               batch_axis, spatial_axis, max_offset, halo,
                               group_axis, impl, precision)


def sharded_deform_conv3d(x, offset, weight, bias=None, *, mesh, stride=1,
                          padding=0, dilation=1, groups=1,
                          deformable_groups=1, in_step=64, batch_axis="data",
                          spatial_axis="space", max_offset=0.0, halo=None,
                          group_axis=None, impl="auto",
                                    precision="tensorfloat32"):
    spec = DeformConvSpec.make(3, weight.shape[2:], stride, padding, dilation,
                               groups, deformable_groups, in_step, False)
    return sharded_deform_conv(x, offset, None, weight, bias, spec, mesh,
                               batch_axis, spatial_axis, max_offset, halo,
                               group_axis, impl, precision)


def sharded_modulated_deform_conv3d(x, offset, mask, weight, bias=None, *,
                                    mesh, stride=1, padding=0, dilation=1,
                                    groups=1, deformable_groups=1, in_step=64,
                                    batch_axis="data", spatial_axis="space",
                                    max_offset=0.0, halo=None,
                                    group_axis=None, impl="auto",
                                    precision="tensorfloat32"):
    spec = DeformConvSpec.make(3, weight.shape[2:], stride, padding, dilation,
                               groups, deformable_groups, in_step, True)
    return sharded_deform_conv(x, offset, mask, weight, bias, spec, mesh,
                               batch_axis, spatial_axis, max_offset, halo,
                               group_axis, impl, precision)
