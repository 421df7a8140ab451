"""Mesh sharding + halo exchange for deformable convolutions.

The reference is a single-GPU kernel library with no distributed layer at
all (SURVEY.md §2.3) — its only "parallelism" is the in_step micro-batch
chunk loop (deformable_conv.cu:168).  This module is the TPU-native scaling
layer it lacks:

* batch axis  — embarrassingly parallel data sharding,
* spatial axes — ANY spatial dim (H, W, or L for 3D) can be sharded
  across chips with a ring **halo exchange** (`jax.lax.ppermute` neighbor
  shifts) so the offset-displaced bilinear/trilinear taps near shard
  boundaries can read their out-of-shard corners (overlap-save style).
  Two spatial dims may be sharded at once on a 2-axis spatial mesh
  ((H, W) sharding with two halo exchanges; the second exchange carries
  the first's halo rows, so corner blocks are filled exactly).  This is
  the project's sequence-parallel analog: each shard needs
  `pad + (k-1)*dilation + 1 - s` boundary rows plus ceil(max|offset_d|)
  along each sharded dim, because sample positions are offset-displaced
  (sampling math deformable_conv.cu:76-77).

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


def required_halo(spec: DeformConvSpec, max_offset: float,
                  dim: int = 0) -> int:
    """Halo rows needed on each side of a shard of spatial dim `dim`.

    Upper side needs `pad + ceil(max_offset)` rows; lower side needs the
    kernel-footprint overshoot `(k-1)*dil + 1 - stride - pad` (can be
    negative) plus `ceil(max_offset)`.  We exchange the max of both.
    """
    k, s, p, d = (spec.kernel[dim], spec.stride[dim], spec.padding[dim],
                  spec.dilation[dim])
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


class _SpatialShard:
    """Per-spatial-dim shard descriptor inside the shard_map body."""

    def __init__(self, dim: int, axis_name: str, n_shards: int, halo: int,
                 out_local: int, in_local: int):
        self.dim = dim                  # spatial dim index (0 = H)
        self.axis_name = axis_name      # mesh axis name
        self.n_shards = n_shards
        self.halo = halo
        self.out_local = out_local      # output rows per shard along dim
        self.in_local = in_local        # input rows per shard along dim


def _local_conv(x_l, off_l, mask_l, weight, bias, spec: DeformConvSpec,
                shards, max_offset: float = 0.0, impl: str = "auto",
                precision: str = "tensorfloat32", on_tpu=None):
    """Per-shard computation inside shard_map (2D or 3D).

    `shards` is a list of _SpatialShard, one per sharded spatial dim.  The
    halo exchanges run in dim order; the second (and later) exchange
    operates on the already-extended block, so its ppermute payload carries
    the earlier dims' halo rows and the corner blocks are filled exactly.
    """
    nd = spec.ndim
    x_ext = x_l
    for sh in shards:
        x_ext = _halo_exchange(x_ext, sh.halo, axis=2 + sh.dim,
                               axis_name=sh.axis_name, n_shards=sh.n_shards)

    # Bounded-offset fast path: the shift-blend kernel's lead mode was
    # built for exactly this halo-extended-block shape (global-coordinate
    # gates, out-of-halo contributions zeroed — the same contract this
    # layer documents for max_offset).  It handles the leading spatial dim
    # only, so it applies to single-dim H sharding.  Dispatch mirrors
    # ops/pallas/_prefer_shiftblend: narrow channel slabs only, on TPU
    # (interpret mode off-TPU is test-only), unless forced.
    if (max_offset > 0 and impl in ("auto", "shiftblend")
            and len(shards) == 1 and shards[0].dim == 0):
        sh = shards[0]
        from ..ops.pallas import shiftblend as _sb
        Cg = x_l.shape[1] // spec.deformable_groups
        S0_global = sh.out_local * sh.n_shards
        reason = _sb.sharded_lead_reason(x_ext.shape, x_ext.dtype, spec,
                                         float(max_offset), sh.halo,
                                         S0_global)
        prefer = Cg <= 128 or impl == "shiftblend"
        if on_tpu is None:
            # Fallback only: callers pass the MESH devices' platform — the
            # process default backend can be TPU (axon tunnel) while the
            # mesh is virtual CPU devices (dryrun), where the compiled
            # kernel path must not be taken.
            on_tpu = jax.default_backend() == "tpu"
        if reason is None and prefer and (on_tpu or impl == "shiftblend"):
            i_shard = jax.lax.axis_index(sh.axis_name)
            origin = (i_shard * sh.out_local).astype(jnp.float32)
            return _sb.deform_conv_shift_sharded(
                x_ext, off_l, mask_l, weight, bias, spec,
                precision, float(max_offset), sh.halo, S0_global, origin)
        if impl == "shiftblend":
            raise NotImplementedError(
                f"shiftblend shard path unavailable: {reason}")
    elif impl == "shiftblend":
        # Honor the forced-impl contract (require -> raise) for the shard
        # layouts the lead-mode kernel does not cover (non-leading dim or
        # multi-axis spatial sharding), instead of silently falling through
        # to the general path (ADVICE r4).
        raise NotImplementedError(
            "shiftblend shard path covers single-axis leading-dim spatial "
            f"sharding only (got dims {[s.dim for s in shards]}); use "
            "impl='auto' or 'gathermm'")

    # Fold the global->local coordinate change into each sharded dim's
    # offset channels.  Along dim d, global sample coord:
    #   s_g = o_g*stride - pad + i*dil + off_d  with  o_g = shard*OSl + o_l.
    # Local coord s_l = s_g - (shard*Sl - halo).  Running the core op on
    # the local block with padding_d=0 gives base o_l*stride + i*dil, so
    # the residual shift folded into off_d is:
    #   delta_d = shard*(OSl*stride - Sl) - pad + halo   (== halo - pad
    # when the alignment contract OSl*stride == Sl holds; kept general).
    c_off = off_l.shape[1]
    chan = jnp.arange(c_off)            # offset layout nd*f + d, d=0 is h
    shift = jnp.zeros((c_off,), off_l.dtype)
    local_padding = list(spec.padding)
    # The reference tap gate pos in (-1, S) (deformable_conv.cu:78) zeroes
    # value AND subgradient exactly at the open-interval endpoints; a
    # zero-filled halo row reproduces the zero value but gives the offset
    # gradient a one-sided x[edge] subgradient instead of zero (hit
    # systematically by zero-initialized offsets, where boundary taps land
    # exactly on pos == -1).  Pass the global gate, translated to local
    # coordinates and intersected with the extended-block gate (which
    # implements the bounded-offset out-of-halo zeroing contract).
    gate_bounds = [(-1.0, float(s)) for s in x_ext.shape[2:]]
    for sh in shards:
        s_d, p_d = spec.stride[sh.dim], spec.padding[sh.dim]
        i_shard = jax.lax.axis_index(sh.axis_name)
        delta = (i_shard * (sh.out_local * s_d - sh.in_local) - p_d
                 + sh.halo).astype(off_l.dtype)
        shift = shift + jnp.where(chan % nd == sh.dim, delta,
                                  jnp.zeros_like(delta))
        local_padding[sh.dim] = 0
        origin = i_shard * sh.in_local - sh.halo        # local 0 in global
        s_ext = x_ext.shape[2 + sh.dim]
        gate_bounds[sh.dim] = (
            jnp.maximum(jnp.float32(-1.0), -1.0 - origin),
            jnp.minimum(jnp.float32(s_ext),
                        sh.in_local * sh.n_shards - origin))
    off_shifted = off_l + shift.reshape((1, c_off) + (1,) * nd)

    local_spec = DeformConvSpec(
        ndim=nd, kernel=spec.kernel,
        stride=spec.stride,
        padding=tuple(local_padding),
        dilation=spec.dilation, groups=spec.groups,
        deformable_groups=spec.deformable_groups, in_step=spec.in_step,
        modulated=spec.modulated)
    # The local output grid is fixed by the offset shard, not derivable from
    # the halo-extended input block.  Dispatch through the api so each shard
    # uses the fused Pallas kernel on TPU.
    local_os = tuple(off_l.shape[2:])
    return ops_api._dispatch(x_ext, off_shifted, mask_l, weight, bias,
                             local_spec, impl="auto", precision=precision,
                             out_sizes=local_os, gate_bounds=gate_bounds)


def sharded_deform_conv(x: jax.Array, offset: jax.Array,
                        mask: Optional[jax.Array], weight: jax.Array,
                        bias: Optional[jax.Array], spec: DeformConvSpec,
                        mesh: Mesh, batch_axis: Optional[str] = "data",
                        spatial_axis="space",
                        max_offset: float = 0.0,
                        halo=None,
                        group_axis: Optional[str] = None,
                        impl: str = "auto",
                        precision: str = "tensorfloat32") -> jax.Array:
    """Deformable conv over a (batch, spatial..., group) sharded mesh.

    `impl`: per-shard compute path ("auto"/"xla"/"pallas"/"shiftblend").
    With a positive `max_offset` the contract doubles as the
    bounded-offset declaration, so "auto" shards use the fused
    shift-blend kernel on TPU where eligible (H-sharded shards through its
    halo-extended lead mode; batch/group shards directly).

    `spatial_axis` selects the sharded spatial dim(s):

    * a string names the mesh axis sharding the FIRST spatial dim (H);
    * a sequence of optional strings names one mesh axis per spatial dim,
      e.g. ``(None, "space")`` shards W only, ``("sh", "sw")`` shards H
      and W on a 2-axis spatial mesh (two ring halo exchanges; the second
      carries the first's halo rows so corner blocks are exact).

    x (B,C,H,W[,L]) is sharded (batch_axis, [group_axis], *spatial axes);
    offset/mask shard the same way on their output grid; weight/bias are
    replicated unless `group_axis` is given.  Returns output sharded like
    the input (out channels on `group_axis` when set).

    `max_offset` is the bounded-offset contract: samples displaced beyond
    ceil(max_offset) rows past the shard's halo are treated as out-of-image
    (zero).  `halo` overrides the computed exchange width (int, or one per
    sharded spatial dim in dim order).

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
    B, C = x.shape[0], x.shape[1]
    O = weight.shape[0]
    OS = spec.out_sizes(x.shape[2:])
    g, dg = spec.groups, spec.deformable_groups

    n_b = mesh.shape[batch_axis] if batch_axis else 1
    n_g = mesh.shape[group_axis] if group_axis else 1
    if B % n_b:
        raise ValueError(f"batch {B} not divisible by mesh axis {n_b}")

    # Normalize spatial_axis: str -> shard dim 0; sequence -> one optional
    # mesh-axis name per spatial dim.
    if spatial_axis is None:
        dim_names = [None] * nd
    elif isinstance(spatial_axis, str):
        dim_names = [spatial_axis] + [None] * (nd - 1)
    else:
        dim_names = list(spatial_axis) + [None] * (nd - len(spatial_axis))
        if len(dim_names) > nd:
            raise ValueError(f"spatial_axis names {len(dim_names)} dims, "
                             f"op has {nd}")
    sharded_dims = [d for d, name in enumerate(dim_names)
                    if name is not None and mesh.shape[name] > 1]
    if halo is None:
        halos = {d: required_halo(spec, max_offset, dim=d)
                 for d in sharded_dims}
    elif isinstance(halo, int):
        halos = {d: halo for d in sharded_dims}
    else:
        if len(halo) != len(sharded_dims):
            raise ValueError(f"halo sequence has {len(halo)} entries for "
                             f"{len(sharded_dims)} sharded spatial dims")
        halos = dict(zip(sharded_dims, halo))

    shards = []
    for d in sharded_dims:
        n_d = mesh.shape[dim_names[d]]
        S_d, OS_d = x.shape[2 + d], OS[d]
        if S_d % n_d or OS_d % n_d:
            raise ValueError(
                f"spatial dim {d}: size {S_d}/out {OS_d} not divisible by "
                f"mesh axis {dim_names[d]}={n_d}")
        if (OS_d // n_d) * spec.stride[d] != S_d // n_d:
            raise ValueError(
                f"spatial sharding of dim {d} requires OS_local*stride == "
                f"S_local (got OS/n={OS_d // n_d}, stride={spec.stride[d]}, "
                f"S/n={S_d // n_d}); use batch-only sharding for this "
                "config")
        shards.append(_SpatialShard(d, dim_names[d], n_d, halos[d],
                                    OS_d // n_d, S_d // n_d))

    # Observability (SURVEY §5): record analytic halo traffic and GEMM
    # FLOPs for this traced call — bench harnesses divide by wall time
    # for achieved-rate reporting.
    from ..utils import profiling as _prof
    ext_shape = list(x.shape)
    for sh in shards:
        hs = _prof.halo_stats(spec, tuple(ext_shape), sh.halo, sh.n_shards,
                              dim=sh.dim)
        _prof.counters.add("halo_bytes_fwd", hs["halo_bytes_fwd"])
        _prof.counters.add("halo_rows", hs["halo_rows"])
        # Later exchanges carry the earlier dims' halo rows.  halo_stats
        # totals bytes using GLOBAL sizes for the non-exchanged dims (each
        # shard along those axes repeats the exchange), so fold the halo in
        # at global scale: every one of the n_shards blocks grows by 2*halo.
        ext_shape[2 + sh.dim] += 2 * sh.halo * sh.n_shards
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
    gspec = group_axis if n_g > 1 else None
    cin_spec = gspec if group_aligned else None
    shard_of = {sh.dim: sh.axis_name for sh in shards}
    dim_specs = [shard_of.get(d) for d in range(nd)]
    x_ps = P(bspec, cin_spec, *dim_specs)
    off_ps = P(bspec, cin_spec, *dim_specs)
    mask_ps = off_ps
    out_ps = P(bspec, gspec, *dim_specs)
    w_ps = P(gspec, *([None] * (nd + 1)))
    b_ps = P(gspec)

    in_specs = [x_ps, off_ps] + ([mask_ps] if mask is not None else []) + \
        [w_ps] + ([b_ps] if bias is not None else [])

    # The MESH devices' platform gates the compiled-kernel fast path (the
    # process default backend may be a live TPU tunnel while the mesh is
    # virtual CPU devices, e.g. __graft_entry__.dryrun_multichip).
    mesh_on_tpu = all(d.platform == "tpu"
                      for d in np.asarray(mesh.devices).flat)

    def fn(*args):
        if mask is not None:
            x_l, off_l, mask_l = args[0], args[1], args[2]
            rest = args[3:]
        else:
            x_l, off_l, mask_l = args[0], args[1], None
            rest = args[2:]
        w_l = rest[0]
        b_l = rest[1] if len(rest) > 1 else None
        if shards:
            return _local_conv(x_l, off_l, mask_l, w_l, b_l, lspec, shards,
                               max_offset=max_offset, impl=impl,
                               precision=precision, on_tpu=mesh_on_tpu)
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
