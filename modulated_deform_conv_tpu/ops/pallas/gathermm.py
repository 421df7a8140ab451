"""Fused N-d deformable-columns Pallas TPU kernel (structured-sparse MXU).

Covers the 2D (bilinear) and 3D (trilinear) deformable convolutions of the
reference (deformable_conv.cu:36-85, mdeformable_conv.cu:37-87,
deformable_conv3d.cu:54-119, mdeformable_conv3d.cu:54-127).  The reference
launches one CUDA thread per column element; a TPU-native design instead
expresses the whole gather as a matmul against a structured-sparse matrix:

    cols[kp, c] = sum_q A[q, kp] * x[q, c]

with q over the flattened input plane of one (batch, deformable-group) and
A holding the 2^nd multilinear corner weights.  A is separable per spatial
dim:

    A[q, kp] = prod_d F_d[q_d, kp]
    F_0 = (q_0 == l_0) * svl + (q_0 == l_0 + 1) * svh     (mask+gate folded)
    F_d = (q_d == l_d) * (1 - f_d) + (q_d == l_d + 1) * f_d   (d > 0)

where l_d = floor(sample position), f_d the fractional part.  Factors are
built on the VPU from iota comparisons; the contraction runs on the MXU.
The comparisons reproduce the reference's edge semantics exactly: the open
interval tap gate pos in (-1, S) (deformable_conv.cu:78) folds into
svl/svh, and out-of-image corners contribute zero (deformable_conv.cu:17-28,
deformable_conv3d.cu:21-45) because an out-of-range l_d never matches the
[0, S_d) iota.

The input plane is processed in flat chunks of SCH positions; per output
tile only chunks inside data-dependent [lo, hi) bounds (computed from the
actual offsets, scalar-prefetched) are visited, so cost tracks the true
receptive field for small learned offsets while arbitrary offsets remain
correct.  When K*P_tile exceeds the lane budget (3D 3x3x3 kernels), taps
are split along the leading kernel axis and processed in an inner loop.

The backward pass reuses the same factors with transposed contractions —
grad_x = A @ gcols on the MXU (replacing the reference's atomicAdd scatter,
deformable_conv.cu:268-283: deterministic, bitwise reproducible), and
grad_offset / grad_mask from the correlation matrix M = x @ gcols^T reduced
against the analytic dA/dpos factors (deformable_conv.cu:281-283,
mdeformable_conv.cu:295-315, deformable_conv3d.cu:380-385).

Precision modes: "float32" (HIGHEST MXU passes, ~1e-7 of the f32 oracle),
"tensorfloat32" (f32 storage, one bf16 MXU pass — XLA's DEFAULT, like
torch's TF32 conv default), "bfloat16".
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.config import DeformConvSpec
from ...utils.device import current_profile

PRECISIONS = ("float32", "tensorfloat32", "bfloat16")

# VMEM budgets for the tiling heuristic / eligibility gate resolve through
# utils/device.py per device kind (r3, VERDICT item 5); the module names
# remain as None-able OVERRIDES for tests/benchmarks (r2 v5e values:
# A-chunk 2MB, x-plane 40MB, vmem limit 100MB, lane budget 4608).
_A_CHUNK_BUDGET = None                  # one (SCH, KP) f32 A-chunk
_X_PLANE_BUDGET = None                  # one (S_pad, Cg) input plane
_VMEM_LIMIT = None
_LANE_BUDGET = None                     # target KP lanes per matmul
_PT_OVERRIDE = 0                        # nonzero: force P_tile (tuning)
_K0_OVERRIDE = 0                        # nonzero: force tap-group count
_SCH_OVERRIDE = 0                       # nonzero: force input chunk size


def _a_chunk_budget() -> int:
    return (_A_CHUNK_BUDGET if _A_CHUNK_BUDGET
            else current_profile().gm_a_chunk_budget)


def _x_plane_budget() -> int:
    return (_X_PLANE_BUDGET if _X_PLANE_BUDGET
            else current_profile().gm_x_plane_budget)


def _vmem_limit() -> int:
    return _VMEM_LIMIT if _VMEM_LIMIT else current_profile().gm_vmem_limit


def _lane_budget() -> int:
    return _LANE_BUDGET if _LANE_BUDGET else current_profile().lane_budget


_INTERPRET_OVERRIDE = None


def _interpret() -> bool:
    """Run the kernel in interpreter mode off-TPU (CPU tests).

    `_INTERPRET_OVERRIDE` forces the choice for callers that target CPU
    devices from inside a live TPU-backend process (e.g.
    __graft_entry__.dryrun_multichip building a virtual CPU mesh while
    the axon tunnel owns the default backend)."""
    if _INTERPRET_OVERRIDE is not None:
        return _INTERPRET_OVERRIDE
    return jax.default_backend() != "tpu"


class _Plan:
    """Static tiling plan for one op configuration."""

    def __init__(self, spec: DeformConvSpec, B: int, C: int, S, OS, dtype):
        self.nd = spec.ndim
        self.B, self.C = B, C
        self.S = tuple(S)                       # input spatial sizes
        self.OS = tuple(OS)                     # output spatial sizes
        self.dg = spec.deformable_groups
        self.Cg = C // self.dg
        self.K = spec.tap_count
        self.kernel0_extent = (spec.kernel[0] - 1) * spec.dilation[0] + 1
        self.P = math.prod(self.OS)
        self.Sflat = math.prod(self.S)
        self.dtype = dtype

        # Row-stride (flat) per spatial dim.
        st = [1] * self.nd
        for d in range(self.nd - 2, -1, -1):
            st[d] = st[d + 1] * self.S[d + 1]
        self.qstride = tuple(st)

        # Tap split: prefer a large P_tile (MXU efficiency, fewer tiles)
        # by splitting taps along the leading kernel axis when K*P_tile
        # would blow the lane budget.  Tap groups also get tighter chunk
        # bounds (taps in a group share the leading-dim kernel index).
        divisors = [d for d in range(1, self.K + 1) if self.K % d == 0]
        pmax = -(-self.P // 8) * 8
        run = self.OS[-1]                 # contiguous output run length
        cands = set()
        for tgt in (512, 384, 256, 128):
            cands.add(min(tgt, pmax))
            # row-aligned candidate: multiple of the last output dim near
            # tgt (tighter leading-dim windows -> fewer input chunks)
            if run <= tgt:
                cands.add(min(max(tgt // run, 1) * run, pmax))
        halo = self.kernel0_extent + 4    # leading-dim window slack guess
        best = None
        for pt in sorted(cands):
            pt = -(-pt // 8) * 8          # sublane-align cols block
            if _PT_OVERRIDE and pt != _PT_OVERRIDE:
                continue
            for k0 in divisors:
                if _K0_OVERRIDE and k0 != _K0_OVERRIDE:
                    continue
                ki = self.K // k0
                if ki * pt > _lane_budget():
                    continue
                lanes = -(-ki * pt // 128) * 128
                rows = pt / run + (0 if pt % run == 0 else 1)
                # A-work per output position plus a per-tile fixed cost
                # (pipeline/bounds/acc overhead), calibrated on v5e.
                cost = (lanes * (rows + halo) + 8192.0) / pt
                if best is None or cost < best[0]:
                    best = (cost, k0, ki, pt)
                break                      # smallest k0 that fits
        if best is None:                   # override matched nothing: retry
            for k0 in divisors:
                ki = self.K // k0
                if ki * (_PT_OVERRIDE or 128) <= _lane_budget():
                    best = (0, k0, ki, _PT_OVERRIDE or 128)
                    break
        _, k0, ki, pt = best
        self.PT = pt
        self.K0, self.KI = k0, ki
        self.KP = self.KI * self.PT
        self.NT = -(-self.P // self.PT)
        self.PPAD = self.NT * self.PT

        # Input chunk: ~1/6 of the expected per-tile input window (chunk
        # bounds quantize to SCH, so smaller chunks track the true window
        # more tightly; below ~window/8 the per-chunk fixed cost dominates
        # — measured on v5e), capped by the f32 A-chunk VMEM budget, and
        # aligned to the last spatial dim's period when affordable so
        # periodic A-factors hoist out of the chunk loop.
        in_row = self.qstride[0] if self.nd > 1 else 1   # input row size
        win_rows = (self.PT / run) * spec.stride[0] + 1 + halo
        window = int(win_rows * in_row)
        sch = max(8, min(int(window / 6), _a_chunk_budget() // (self.KP * 4))
                  // 8 * 8)
        last = self.S[-1]
        unit = (last * 8) // math.gcd(last, 8)   # lcm(S_last, 8)
        if unit <= 2 * sch or (unit * self.KP * 4 <= _a_chunk_budget()
                               and unit <= 2 * window):
            # Align to (at least) one full last-dim period so periodic
            # A-factors hoist out of the chunk loop — r3: also round UP
            # to one period when affordable (tiny heuristic chunks on
            # small planes, e.g. the 7x7 ResNet c5 stage, +3% measured).
            sch = max(unit, sch // unit * unit)
        if _SCH_OVERRIDE == -2:
            # autotune sentinel: double the heuristic chunk (capped by the
            # A-chunk budget) — measured +10% fwd+bwd on the ResNet c3
            # stage, neutral-to-negative elsewhere (benchmarks/
            # sweep_cfg5.py r3), hence opt-in via utils/autotune.py.
            sch = min(2 * sch,
                      _a_chunk_budget() // (self.KP * 4) // 8 * 8)
        elif _SCH_OVERRIDE:
            sch = _SCH_OVERRIDE // 8 * 8
        self.SCH = min(sch, -(-self.Sflat // 8) * 8)
        self.SPAD = -(-self.Sflat // self.SCH) * self.SCH
        self.NCH = self.SPAD // self.SCH
        # Dims whose factor pattern repeats every SCH (hoistable): dim d's
        # pattern has period S[d] * qstride[d] (= qstride[d-1]).
        self.hoist = [False] + [self.SCH % (self.S[d] * self.qstride_of(d))
                                == 0 for d in range(1, self.nd)]

        # Factor rows in pr: 5 + 2*(nd-1), padded to a sublane multiple.
        self.NR = 8 if self.nd == 2 else 16

        # ---- 3D planar mode: two-level (lead-plane x in-plane) chunk
        # bounds.  For nd == 3 the flat [lo, hi) window spans every
        # intermediate lead plane WHOLE (flat q mixes the lead index with
        # the in-plane index), so the sweep visits ~z_window * plane
        # elements per (tile, tap-group).  Planar mode stores a
        # [z_lo, z_hi) x [c_lo, c_hi) rectangle instead (bnd last dim 4)
        # and the kernels loop in-plane chunks OUTER (dim-1/2 factor rows
        # built once per chunk) and lead planes INNER (two cheap (1, KP)
        # row selects per plane) — the r3 ANALYSIS §3c "2-level bound
        # tables" idea.  The reference's 3D gather visits exactly 8
        # corners per tap (deformable_conv3d.cu:54-119); this narrows the
        # dense sweep toward that set without losing the MXU form.
        self.planar = False
        # Snapshot the flat-path tiling before the planar block mutates it:
        # if the stream computation below vetoes planar, the flat/stream
        # path must run with flat-derived tiling, not tiling sized against
        # planar's relaxed 2x A-chunk budget (ADVICE r4).
        _flat_tiling = (self.PT, self.K0, self.KI, self.KP, self.NT,
                        self.PPAD, self.SCH, self.SPAD, self.NCH,
                        list(self.hoist))
        if self.nd == 3:
            plane = self.qstride[0]
            oplane = math.prod(self.OS[1:])
            run = self.OS[-1]
            # In-plane chunk: a divisor of the input plane (multiple of 8)
            # near plane/8, so the c-range tracks the dim-1 window.
            cands = [d for d in range(8, plane + 1, 8) if plane % d == 0]
            if cands and plane >= 2 * min(cands):
                tgt = _SCH_OVERRIDE if _SCH_OVERRIDE > 0 else max(
                    128, plane // 8)
                sch = min(cands, key=lambda d: abs(d - tgt))
                # Output tile: whole dim-1 output rows of one lead plane
                # (PT | oplane keeps tiles inside a single output plane, so
                # each (tile, group) sees one z-window).
                rdiv = [r for r in range(1, self.OS[1] + 1)
                        if self.OS[1] % r == 0]
                ptgt = _PT_OVERRIDE if _PT_OVERRIDE > 0 else 256
                rows = min(rdiv, key=lambda r: abs(r * run - ptgt))
                pt = rows * run
                pt8 = -(-pt // 8) * 8
                # Tap grouping: prefer groups sharing the lead kernel
                # index (tight z-windows); KI divides K/kernel0.
                ki_inner = self.K // spec.kernel[0]
                kis = [d for d in range(1, ki_inner + 1) if ki_inner % d == 0]
                if _K0_OVERRIDE:
                    kis = [d for d in kis
                           if self.K // d == _K0_OVERRIDE] or kis
                ki = max((d for d in kis if d * pt8 <= _lane_budget()),
                         default=1)
                if pt8 == pt and ki * pt * sch * 4 <= 2 * _a_chunk_budget():
                    self.planar = True
                    self.PT = pt
                    self.K0, self.KI = self.K // ki, ki
                    self.KP = self.KI * self.PT
                    self.NT = -(-self.P // self.PT)
                    self.PPAD = self.NT * self.PT
                    self.SCH = sch
                    self.SPAD = self.Sflat       # SCH | plane | Sflat
                    self.NCH = self.SPAD // self.SCH
                    self.NCHP = plane // self.SCH     # chunks per plane
                    self.hoist = [False] + [
                        self.SCH % (self.S[d] * self.qstride_of(d)) == 0
                        for d in range(1, self.nd)]

        # Channel-part split: when the (SPAD, Cg) plane exceeds the VMEM
        # residency budget, split channels across a grid dimension (the
        # gather is channel-independent).  Streaming (HBM chunk DMA) is the
        # last resort when even an 8-channel slice doesn't fit.
        self.NCP = 1
        plane = self.SPAD * self.Cg * 4
        while (self.SPAD * (self.Cg // self.NCP) * 4 > _x_plane_budget()
               and self.Cg % (self.NCP * 2) == 0
               and self.Cg // (self.NCP * 2) >= 8):
            self.NCP *= 2
        self.CgP = self.Cg // self.NCP
        self.stream = self.SPAD * self.CgP * 4 > _x_plane_budget()
        if self.stream:
            self.NCP, self.CgP = 1, self.Cg
            # Streaming DMA loads are flat-chunk-indexed; the planar
            # nested loop is not wired for them (stream configs are
            # TPU-gated anyway, see ineligible_reason).
            if self.planar:
                self.planar = False
                (self.PT, self.K0, self.KI, self.KP, self.NT, self.PPAD,
                 self.SCH, self.SPAD, self.NCH, self.hoist) = _flat_tiling
                if hasattr(self, "NCHP"):
                    del self.NCHP

        # Save bf16 columns as a forward residual when affordable: the
        # backward then skips its column-recompute matmul (1 of 3).  The
        # reference always recomputes (deformable_conv.cu:285); here it is
        # a memory/compute tradeoff decided by residual size.
        cols_bytes = self.B * self.dg * self.NCP * self.PPAD * self.K * 2
        self.save_cols = cols_bytes <= 512 * 1024 * 1024

        # Bound-table width: flat [lo, hi) vs planar rectangle.
        self.BW = 4 if self.planar else 2

    def qstride_of(self, d):
        return self.qstride[d]

    def ineligible_reason(self) -> Optional[str]:
        if self.KP > 2 * _lane_budget():
            return "K*P_tile too large for the lane budget"
        if self.SCH * self.KP * 4 > 2 * _a_chunk_budget():
            return "A chunk exceeds VMEM budget"
        if self.Cg < 8:
            return "too few channels per deformable group for the MXU"
        return None


def _resolve(precision: str):
    if precision == "float32":
        return jnp.float32, jax.lax.Precision.HIGHEST
    if precision == "tensorfloat32":
        return jnp.float32, jax.lax.Precision.DEFAULT
    if precision == "bfloat16":
        return jnp.bfloat16, jax.lax.Precision.DEFAULT
    raise ValueError(f"precision must be one of {PRECISIONS}")


def _base_grid(spec: DeformConvSpec, OS):
    """(nd, K, P) sample-grid base: o*stride - pad + i*dilation
    (reference deformable_conv.cu:76-77, deformable_conv3d.cu:101-103).

    Built from on-device iotas — a host constant would embed nd*K*P floats
    into the program (tens of MB for 3D volumes)."""
    nd = spec.ndim
    K = spec.tap_count
    P = math.prod(OS)
    taps = np.stack(np.meshgrid(*[np.arange(k) for k in spec.kernel],
                                indexing="ij"), 0).reshape(nd, K)
    ostride = [1] * nd
    for d in range(nd - 2, -1, -1):
        ostride[d] = ostride[d + 1] * OS[d + 1]
    flat = jax.lax.iota(jnp.int32, P)
    rows = []
    for d in range(nd):
        out_d = ((flat // ostride[d]) % OS[d]).astype(jnp.float32)
        tap_d = jnp.asarray(taps[d], jnp.float32)
        rows.append(out_d[None, :] * spec.stride[d] - spec.padding[d]
                    + tap_d[:, None] * spec.dilation[d])
    return jnp.stack(rows)


# pr row indices (16 rows; 2D uses the first 7).
_R_L0, _R_SVL, _R_SVH, _R_GL, _R_GH = 0, 1, 2, 3, 4


def _row_l(d):   # low-corner index row for dim d >= 1
    return 5 + 2 * (d - 1)


def _row_f(d):   # fraction row for dim d >= 1
    return 6 + 2 * (d - 1)


def _prep(x, offset, mask, spec: DeformConvSpec, plan: _Plan, gates=None):
    """XLA-side prep.

    `gates` optionally overrides the open-interval tap gate with per-dim
    (lo, hi) scalars, as an (nd, 2) f32 array (entries may be traced).
    Used by the sharding layer, whose halo-extended local blocks must gate
    taps at the GLOBAL image border (deformable_conv.cu:78 zeroes value
    AND subgradient exactly at pos == -1 / pos == S; a zero-filled halo
    row reproduces the value but not the zero offset-gradient).

    Returns:
      xp  (B, dg, SPAD, Cg)          channels-last plane, zero-padded
      pr  (B, dg, NT, K0, NR, KP)    f32 factor rows (see _R_* / _row_*)
      bnd (B, dg, NT, K0, 2)         i32 [lo, hi) flat-chunk bounds
    """
    p = plan
    nd, B, dg, K = p.nd, p.B, p.dg, p.K
    base = _base_grid(spec, p.OS)                          # (nd, K, P)

    off = offset.reshape((B, dg, K, nd) + p.OS).reshape(
        B, dg, K, nd, p.P).astype(jnp.float32)
    pos = base[None, None] + jnp.moveaxis(off, 3, 2)      # (B, dg, nd, K, P)

    gate = jnp.ones((B, dg, K, p.P), jnp.bool_)
    for d in range(nd):
        lo = -1.0 if gates is None else gates[d, 0]
        hi = float(p.S[d]) if gates is None else gates[d, 1]
        gate &= (pos[:, :, d] > lo) & (pos[:, :, d] < hi)
    low = jnp.floor(pos)
    frac = pos - low

    gatef = gate.astype(jnp.float32)
    gl = gatef * (1.0 - frac[:, :, 0])
    gh = gatef * frac[:, :, 0]
    if mask is not None:
        m = mask.reshape(B, dg, K, p.P).astype(jnp.float32)
        svl, svh = gl * m, gh * m
    else:
        svl, svh = gl, gh

    rows = [low[:, :, 0], svl, svh, gl, gh]
    for d in range(1, nd):
        rows += [low[:, :, d], frac[:, :, d]]
    rows += [jnp.zeros_like(svl)] * (p.NR - len(rows))
    pr = jnp.stack(rows, axis=2)                          # (B, dg, NR, K, P)

    # -> (B, dg, NT, K0, NR, KI*PT): pad P, split taps along leading axis.
    pr = jnp.pad(pr, ((0, 0),) * 4 + ((0, p.PPAD - p.P),))
    pr = pr.reshape(B, dg, p.NR, p.K0, p.KI, p.NT, p.PT)
    pr = pr.transpose(0, 1, 5, 3, 2, 4, 6).reshape(
        B, dg, p.NT, p.K0, p.NR, p.KP)

    # Flat-q chunk bounds per (tile, tap-group): q = sum_d l_d * qstride_d
    # lower-bounds any matched corner; + sum(qstride) upper-bounds it.
    # Activity comes from the gate-only rows (gl/gh), NOT the mask-folded
    # svl/svh: a tap with mask exactly 0 still needs its chunks visited in
    # the backward, where grad_mask = sum grad_col * unmasked value is
    # nonzero (reference mdeformable_conv.cu:315).
    act = (gl != 0.0) | (gh != 0.0)                       # (B, dg, K, P)
    big = jnp.float32(3e38)

    def _minmax(vlow, span):
        """Per-(tile, tap-group) [min(vlow), max(vlow + span)] over active
        lanes: (B, dg, K, P) -> two (B, dg, NT, K0)."""
        vmin = jnp.where(act, vlow, big)
        vmax = jnp.where(act, vlow + float(span), -big)
        vmin = jnp.pad(vmin.reshape(B, dg, p.K0, p.KI, p.P),
                       ((0, 0),) * 4 + ((0, p.PPAD - p.P),),
                       constant_values=3e38)
        vmax = jnp.pad(vmax.reshape(B, dg, p.K0, p.KI, p.P),
                       ((0, 0),) * 4 + ((0, p.PPAD - p.P),),
                       constant_values=-3e38)
        vmin = vmin.reshape(B, dg, p.K0, p.KI, p.NT, p.PT).min(axis=(3, 5))
        vmax = vmax.reshape(B, dg, p.K0, p.KI, p.NT, p.PT).max(axis=(3, 5))
        return vmin.transpose(0, 1, 3, 2), vmax.transpose(0, 1, 3, 2)

    if p.planar:
        # Two-level rectangle: lead-plane range x in-plane chunk range.
        # Corners per sample: lead z in {l0, l0+1}; in-plane flat m in
        # [l1*S2 + l2, l1*S2 + l2 + S2 + 1] (the 4 in-plane corners).
        plane = p.qstride[0]
        zmin, zmax = _minmax(low[:, :, 0], 1)
        mlow = low[:, :, 1] * float(p.S[2]) + low[:, :, 2]
        mmin, mmax = _minmax(mlow, p.S[2] + 1)
        empty = zmax < -1e38
        z_lo = jnp.clip(zmin, 0.0, float(p.S[0] - 1)).astype(jnp.int32)
        z_hi = jnp.clip(zmax, 0.0, float(p.S[0] - 1)).astype(jnp.int32) + 1
        c_lo = (jnp.clip(mmin, 0.0, float(plane - 1)).astype(jnp.int32)
                // p.SCH)
        c_hi = (jnp.clip(mmax, 0.0, float(plane - 1)).astype(jnp.int32)
                // p.SCH) + 1
        zero = jnp.zeros_like(z_lo)
        bnd = jnp.stack([jnp.where(empty, zero, z_lo),
                         jnp.where(empty, zero, z_hi),
                         jnp.where(empty, zero, c_lo),
                         jnp.where(empty, zero, c_hi)], axis=-1)
    else:
        qlow = sum(low[:, :, d] * float(p.qstride[d]) for d in range(nd))
        qmin, qmax = _minmax(qlow, sum(p.qstride))
        lo = (jnp.clip(qmin, 0.0, float(p.SPAD - 1)).astype(jnp.int32)
              // p.SCH)
        hi = (jnp.clip(qmax, 0.0, float(p.SPAD - 1)).astype(jnp.int32)
              // p.SCH) + 1
        empty = qmax < -1e38
        lo = jnp.where(empty, 0, lo)
        hi = jnp.where(empty, 0, jnp.minimum(hi, p.NCH))
        bnd = jnp.stack([lo, hi], axis=-1)

    x_cl = x.reshape(B, dg, p.Cg, p.Sflat)
    x_cl = jnp.moveaxis(x_cl, 2, 3)
    x_cl = jnp.pad(x_cl, ((0, 0), (0, 0), (0, p.SPAD - p.Sflat), (0, 0)))
    # Explicit channel-part axis (c = cp*CgP + cg) so part blocks satisfy
    # the Pallas block-shape rule (last dim equals the array dim).
    x_cl = x_cl.reshape(B, dg, p.SPAD, p.NCP, p.CgP).transpose(0, 1, 3, 2, 4)
    return x_cl, pr, bnd


def _factor0(pr_k, q0):
    """Leading-dim factor with mask+gate folded (and its grad variants)."""
    l0 = pr_k[_R_L0:_R_L0 + 1]
    ev0 = jnp.where(q0 == l0, 1.0, 0.0)
    ev1 = jnp.where(q0 == l0 + 1.0, 1.0, 0.0)
    return ev0, ev1


def _factor_d(pr_k, qd, d):
    ld = pr_k[_row_l(d):_row_l(d) + 1]
    fd = pr_k[_row_f(d):_row_f(d) + 1]
    e0 = jnp.where(qd == ld, 1.0, 0.0)
    e1 = jnp.where(qd == ld + 1.0, 1.0, 0.0)
    F = e0 * (1.0 - fd) + e1 * fd
    dF = e1 - e0
    return F, dF


def _planar_f12(pr_k, qm, p, grads=False):
    """Planar mode: in-plane (dims 1, 2) factor products at in-plane flat
    positions qm (SCH, 1).  Returns F1*F2 and, with grads, the per-dim
    derivative products dF1*F2 and F1*dF2 (all (SCH, KP) f32) — built once
    per in-plane chunk and reused across the lead-plane loop."""
    q1 = ((qm // p.qstride[1]) % p.S[1]).astype(jnp.float32)
    q2 = (qm % p.S[2]).astype(jnp.float32)
    F1, dF1 = _factor_d(pr_k, q1, 1)
    F2, dF2 = _factor_d(pr_k, q2, 2)
    if grads:
        return F1 * F2, dF1 * F2, F1 * dF2
    return F1 * F2, None, None


def _fwd_kernel(bnd_ref, pr_ref, x_ref, cols_ref, acc_ref, *scratch,
                plan, cd, prec):
    p = plan
    b, dgi, t = pl.program_id(0), pl.program_id(1), pl.program_id(3)
    if p.stream:
        xbuf, xsem = scratch

        def load_x(ci):
            dma = pltpu.make_async_copy(
                x_ref.at[b, dgi, 0, pl.ds(ci * p.SCH, p.SCH), :], xbuf,
                xsem)
            dma.start()
            dma.wait()
            return xbuf[...].astype(cd)
    else:
        def load_x(ci):
            return x_ref[0, 0, 0, pl.ds(ci * p.SCH, p.SCH), :].astype(cd)

    qi = jax.lax.broadcasted_iota(jnp.int32, (p.SCH, 1), 0)

    for kg in range(p.K0):
        pr_k = pr_ref[0, 0, 0, kg]
        svl = pr_k[_R_SVL:_R_SVL + 1]
        svh = pr_k[_R_SVH:_R_SVH + 1]
        l0 = pr_k[_R_L0:_R_L0 + 1]
        lo = bnd_ref[0, 0, 0, kg, 0]
        hi = bnd_ref[0, 0, 0, kg, 1]

        if p.planar:
            plane = p.qstride[0]
            c_lo = bnd_ref[0, 0, 0, kg, 2]
            c_hi = bnd_ref[0, 0, 0, kg, 3]
            acc_ref[...] = jnp.zeros_like(acc_ref)

            def mbody(ci, _, pr_k=pr_k, svl=svl, svh=svh, l0=l0,
                      lo=lo, hi=hi):
                qm = qi + ci * p.SCH
                F12, _, _ = _planar_f12(pr_k, qm, p)

                def zbody(z, _, F12=F12, l0=l0, ci=ci):
                    # Corner weights collapse to a (1, KP) row per plane
                    # (all rows of an in-plane chunk share q0 == z), so
                    # the A build is ONE broadcast multiply — not two
                    # full-size selects (same trick as the backward).
                    zf = z.astype(jnp.float32)
                    zr = jnp.zeros((), jnp.float32)
                    sel0 = (jnp.where(l0 == zf, svl, zr)
                            + jnp.where(l0 + 1.0 == zf, svh, zr))
                    A = (sel0 * F12).astype(cd)
                    xc = x_ref[0, 0, 0,
                               pl.ds(z * plane + ci * p.SCH, p.SCH),
                               :].astype(cd)
                    acc_ref[...] += jax.lax.dot_general(
                        A, xc, (((0,), (0,)), ((), ())),
                        precision=prec,
                        preferred_element_type=jnp.float32)
                    return 0

                jax.lax.fori_loop(lo, hi, zbody, 0)
                return 0

            jax.lax.fori_loop(c_lo, c_hi, mbody, 0)
            cols_ref[0, 0, 0, 0, kg] = acc_ref[...].astype(cols_ref.dtype)
            continue

        # Chunk-invariant factor product, pre-scaled by the two vertical
        # corner weights (see _fwd_fused_kernel).
        hp = None
        for d in range(1, p.nd):
            if p.hoist[d]:
                qd = ((qi // p.qstride[d]) % p.S[d]).astype(jnp.float32)
                Fd = _factor_d(pr_k, qd, d)[0]
                hp = Fd if hp is None else hp * Fd
        AL = (svl * hp if hp is not None else
              jnp.broadcast_to(svl, (p.SCH, p.KP))).astype(cd)
        AH = (svh * hp if hp is not None else
              jnp.broadcast_to(svh, (p.SCH, p.KP))).astype(cd)
        acc_ref[...] = jnp.zeros_like(acc_ref)

        def body(ci, _, pr_k=pr_k, l0=l0, AL=AL, AH=AH):
            qflat = qi + ci * p.SCH
            q0 = (qflat // p.qstride[0]).astype(jnp.float32)
            zero = jnp.zeros((), cd)
            A = (jnp.where(q0 == l0, AL, zero)
                 + jnp.where(q0 == l0 + 1.0, AH, zero))
            for d in range(1, p.nd):
                if not p.hoist[d]:
                    qd = ((qflat // p.qstride[d]) % p.S[d]).astype(
                        jnp.float32)
                    A = A * _factor_d(pr_k, qd, d)[0].astype(cd)
            xc = load_x(ci)
            acc_ref[...] += jax.lax.dot_general(
                A, xc, (((0,), (0,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(lo, hi, body, 0)
        cols_ref[0, 0, 0, 0, kg] = acc_ref[...].astype(cols_ref.dtype)


def _bwd_kernel(bnd_ref, pr_ref, x_ref, gcols_ref, gx_ref, gs_ref,
                sh_ref, *scratch, plan, cd, prec):
    """grad_x via A @ gcols (MXU, deterministic); grad_offset/grad_mask via
    M = x @ gcols^T reduced against analytic dA/dpos factors."""
    p = plan
    b, dgi, t = pl.program_id(0), pl.program_id(1), pl.program_id(3)
    qi = jax.lax.broadcasted_iota(jnp.int32, (p.SCH, 1), 0)

    if p.stream:
        xbuf, gbuf, xsem, gsem = scratch

        def load_x(ci):
            dma = pltpu.make_async_copy(
                x_ref.at[b, dgi, 0, pl.ds(ci * p.SCH, p.SCH), :], xbuf,
                xsem)
            dma.start()
            dma.wait()
            return xbuf[...].astype(cd)

        def accum_gx(ci, gxc):
            sl = pl.ds(ci * p.SCH, p.SCH)
            rd = pltpu.make_async_copy(gx_ref.at[b, dgi, 0, sl, :], gbuf,
                                       gsem)
            rd.start()
            rd.wait()
            gbuf[...] += gxc
            wr = pltpu.make_async_copy(gbuf, gx_ref.at[b, dgi, 0, sl, :],
                                       gsem)
            wr.start()
            wr.wait()

        # Zero this (b, dg) plane on the tile-loop's first visit.
        @pl.when(t == 0)
        def _():
            gbuf[...] = jnp.zeros_like(gbuf)

            def zero_chunk(ci, _):
                wr = pltpu.make_async_copy(
                    gbuf,
                    gx_ref.at[b, dgi, 0, pl.ds(ci * p.SCH, p.SCH), :],
                    gsem)
                wr.start()
                wr.wait()
                return 0

            jax.lax.fori_loop(0, p.NCH, zero_chunk, 0)
    else:
        def load_x(ci):
            return x_ref[0, 0, 0, pl.ds(ci * p.SCH, p.SCH), :].astype(cd)

        def accum_gx(ci, gxc):
            gx_ref[0, 0, 0, pl.ds(ci * p.SCH, p.SCH), :] += gxc

        @pl.when(t == 0)
        def _():
            gx_ref[...] = jnp.zeros_like(gx_ref)

    for kg in range(p.K0):
        pr_k = pr_ref[0, 0, 0, kg]
        svl = pr_k[_R_SVL:_R_SVL + 1]
        svh = pr_k[_R_SVH:_R_SVH + 1]
        gl = pr_k[_R_GL:_R_GL + 1]
        gh = pr_k[_R_GH:_R_GH + 1]
        gcols = gcols_ref[0, 0, 0, 0, kg].astype(cd)     # (KP, CgP)
        lo = bnd_ref[0, 0, 0, kg, 0]
        hi = bnd_ref[0, 0, 0, kg, 1]

        if p.planar:
            plane = p.qstride[0]
            c_lo = bnd_ref[0, 0, 0, kg, 2]
            c_hi = bnd_ref[0, 0, 0, kg, 3]
            sh_ref[...] = jnp.zeros_like(sh_ref)
            sv = svl + svh

            def mbody(ci, _, pr_k=pr_k, svl=svl, svh=svh, sv=sv, gl=gl,
                      gh=gh, gcols=gcols, lo=lo, hi=hi):
                qm = qi + ci * p.SCH
                F12, P1, P2 = _planar_f12(pr_k, qm, p, grads=True)
                l0 = pr_k[_R_L0:_R_L0 + 1]

                def zbody(z, _, F12=F12, P1=P1, P2=P2, l0=l0, ci=ci):
                    zf = z.astype(jnp.float32)
                    m0 = l0 == zf
                    m1 = l0 + 1.0 == zf
                    zr = jnp.zeros((), jnp.float32)
                    sel0 = jnp.where(m0, svl, zr) + jnp.where(m1, svh, zr)
                    A = sel0 * F12
                    sl = pl.ds(z * plane + ci * p.SCH, p.SCH)
                    gxc = jax.lax.dot_general(
                        A.astype(cd), gcols, (((1,), (0,)), ((), ())),
                        precision=prec,
                        preferred_element_type=jnp.float32)
                    xc = x_ref[0, 0, 0, sl, :].astype(cd)
                    gx_ref[0, 0, 0, sl, :] += gxc
                    M = jax.lax.dot_general(
                        xc, gcols, (((1,), (1,)), ((), ())),
                        precision=prec,
                        preferred_element_type=jnp.float32)
                    T = jnp.sum(F12 * M, axis=0, keepdims=True)
                    dsel = jnp.where(m1, sv, zr) - jnp.where(m0, sv, zr)
                    sh_ref[0:1] += dsel * T
                    gsel = jnp.where(m0, gl, zr) + jnp.where(m1, gh, zr)
                    sh_ref[p.nd:p.nd + 1] += gsel * T
                    sh_ref[1:2] += sel0 * jnp.sum(P1 * M, axis=0,
                                                  keepdims=True)
                    sh_ref[2:3] += sel0 * jnp.sum(P2 * M, axis=0,
                                                  keepdims=True)
                    return 0

                jax.lax.fori_loop(lo, hi, zbody, 0)
                return 0

            jax.lax.fori_loop(c_lo, c_hi, mbody, 0)
            gs_ref[0, 0, 0, 0, kg] = sh_ref[...]
            continue

        hoisted = {}
        for d in range(1, p.nd):
            if p.hoist[d]:
                qd = ((qi // p.qstride[d]) % p.S[d]).astype(jnp.float32)
                hoisted[d] = _factor_d(pr_k, qd, d)
        sh_ref[...] = jnp.zeros_like(sh_ref)

        def body(ci, _, pr_k=pr_k, svl=svl, svh=svh, gl=gl, gh=gh,
                 gcols=gcols, hoisted=hoisted):
            qflat = qi + ci * p.SCH
            q0 = (qflat // p.qstride[0]).astype(jnp.float32)
            ev0, ev1 = _factor0(pr_k, q0)
            F0 = ev0 * svl + ev1 * svh
            dF0 = (ev1 - ev0) * (svl + svh)
            F0g = ev0 * gl + ev1 * gh                   # unmasked, gated
            Fs, dFs = [F0], [dF0]
            for d in range(1, p.nd):
                if d in hoisted:
                    Fd, dFd = hoisted[d]
                else:
                    qd = ((qflat // p.qstride[d]) % p.S[d]).astype(
                        jnp.float32)
                    Fd, dFd = _factor_d(pr_k, qd, d)
                Fs.append(Fd)
                dFs.append(dFd)
            Frest = Fs[1]
            for d in range(2, p.nd):
                Frest = Frest * Fs[d]
            A = F0 * Frest

            gxc = jax.lax.dot_general(
                A.astype(cd), gcols, (((1,), (0,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32)
            xc = load_x(ci)
            accum_gx(ci, gxc)

            M = jax.lax.dot_general(
                xc, gcols, (((1,), (1,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32)

            # d/dpos_0 and grad_mask share Frest * M.
            t0 = Frest * M
            sh_ref[0:1] += jnp.sum(dF0 * t0, axis=0, keepdims=True)
            sh_ref[p.nd:p.nd + 1] += jnp.sum(
                F0g * t0, axis=0, keepdims=True)
            for d in range(1, p.nd):
                prod = F0 * dFs[d]
                for e in range(1, p.nd):
                    if e != d:
                        prod = prod * Fs[e]
                sh_ref[d:d + 1] += jnp.sum(prod * M, axis=0, keepdims=True)
            return 0

        jax.lax.fori_loop(lo, hi, body, 0)
        gs_ref[0, 0, 0, 0, kg] = sh_ref[...]


def _fwd_call(xp, pr, bnd, plan: _Plan, cd, prec):
    p = plan
    xdt = jnp.float32 if xp.dtype == jnp.float32 else xp.dtype
    if p.stream:
        x_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        scratch = [pltpu.VMEM((p.KP, p.CgP), jnp.float32),
                   pltpu.VMEM((p.SCH, p.CgP), xdt),
                   pltpu.SemaphoreType.DMA(())]
    else:
        x_spec = pl.BlockSpec((1, 1, 1, p.SPAD, p.CgP),
                              lambda b, d, cp, t, *_: (b, d, cp, 0, 0),
                              memory_space=pltpu.VMEM)
        scratch = [pltpu.VMEM((p.KP, p.CgP), jnp.float32)]
    grid_spec = pl.GridSpec(
        grid=(p.B, p.dg, p.NCP, p.NT),
        in_specs=[
            # [lo, hi) chunk bounds live in SMEM per tile — NOT scalar
            # prefetch: prefetched arrays must fit SMEM whole, which caps
            # the grid at ~3k tiles (compile crash beyond).
            pl.BlockSpec((1, 1, 1, p.K0, p.BW),
                         lambda b, d, cp, t: (b, d, t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, p.K0, p.NR, p.KP),
                         lambda b, d, cp, t, *_: (b, d, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            x_spec,
        ],
        out_specs=pl.BlockSpec((1, 1, 1, 1, p.K0, p.KP, p.CgP),
                               lambda b, d, cp, t, *_: (b, d, cp, t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    cols_dtype = jnp.float32 if cd == jnp.float32 else jnp.bfloat16
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, plan=p, cd=cd, prec=prec),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (p.B, p.dg, p.NCP, p.NT, p.K0, p.KP, p.CgP), cols_dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit()),
        interpret=_interpret(),
    )(bnd, pr, xp)
    # (B, dg, NCP, NT, K0, KP, CgP) -> (B, dg, NT, K0, KP, Cg)
    out = out.transpose(0, 1, 3, 4, 5, 2, 6)
    return out.reshape(p.B, p.dg, p.NT, p.K0, p.KP, p.Cg)


def _bwd_call(xp, pr, bnd, gcols_t, plan: _Plan, cd, prec):
    p = plan
    xdt = jnp.float32 if xp.dtype == jnp.float32 else xp.dtype
    if p.stream:
        x_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        gx_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        scratch = [pltpu.VMEM((p.NR, p.KP), jnp.float32),
                   pltpu.VMEM((p.SCH, p.CgP), xdt),
                   pltpu.VMEM((p.SCH, p.CgP), jnp.float32),
                   pltpu.SemaphoreType.DMA(()),
                   pltpu.SemaphoreType.DMA(())]
    else:
        x_spec = pl.BlockSpec((1, 1, 1, p.SPAD, p.CgP),
                              lambda b, d, cp, t, *_: (b, d, cp, 0, 0),
                              memory_space=pltpu.VMEM)
        gx_spec = pl.BlockSpec((1, 1, 1, p.SPAD, p.CgP),
                               lambda b, d, cp, t, *_: (b, d, cp, 0, 0),
                               memory_space=pltpu.VMEM)
        scratch = [pltpu.VMEM((p.NR, p.KP), jnp.float32)]
    # gcols with explicit part dim, matching xp's channel split.
    gcols_t = gcols_t.reshape(p.B, p.dg, p.NT, p.K0, p.KP, p.NCP, p.CgP)
    gcols_t = gcols_t.transpose(0, 1, 5, 2, 3, 4, 6)
    grid_spec = pl.GridSpec(
        grid=(p.B, p.dg, p.NCP, p.NT),
        in_specs=[
            # [lo, hi) chunk bounds live in SMEM per tile — NOT scalar
            # prefetch: prefetched arrays must fit SMEM whole, which caps
            # the grid at ~3k tiles (compile crash beyond).
            pl.BlockSpec((1, 1, 1, p.K0, p.BW),
                         lambda b, d, cp, t: (b, d, t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, p.K0, p.NR, p.KP),
                         lambda b, d, cp, t, *_: (b, d, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            x_spec,
            pl.BlockSpec((1, 1, 1, 1, p.K0, p.KP, p.CgP),
                         lambda b, d, cp, t, *_: (b, d, cp, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            gx_spec,
            pl.BlockSpec((1, 1, 1, 1, p.K0, p.NR, p.KP),
                         lambda b, d, cp, t, *_: (b, d, cp, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch,
    )
    gxp, gs = pl.pallas_call(
        functools.partial(_bwd_kernel, plan=p, cd=cd, prec=prec),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((p.B, p.dg, p.NCP, p.SPAD, p.CgP),
                                 jnp.float32),
            jax.ShapeDtypeStruct((p.B, p.dg, p.NCP, p.NT, p.K0, p.NR, p.KP),
                                 jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit()),
        interpret=_interpret(),
    )(bnd, pr, xp, gcols_t)
    # (B, dg, NCP, SPAD, CgP) -> (B, dg, SPAD, Cg)
    gxp = gxp.transpose(0, 1, 3, 2, 4).reshape(p.B, p.dg, p.SPAD, p.Cg)
    return gxp, gs


def _untile(cols_t, plan: _Plan):
    """(B, dg, NT, K0, KP, Cg) -> (B, dg, K, P, Cg)."""
    p = plan
    c = cols_t.reshape(p.B, p.dg, p.NT, p.K0, p.KI, p.PT, p.Cg)
    c = c.transpose(0, 1, 3, 4, 2, 5, 6).reshape(
        p.B, p.dg, p.K, p.PPAD, p.Cg)
    return c[:, :, :, :p.P]


def _retile(g, plan: _Plan):
    """(B, dg, K, P, Cg) -> (B, dg, NT, K0, KP, Cg): inverse of _untile."""
    p = plan
    g = jnp.pad(g, ((0, 0),) * 3 + ((0, p.PPAD - p.P), (0, 0)))
    g = g.reshape(p.B, p.dg, p.K0, p.KI, p.NT, p.PT, p.Cg)
    return g.transpose(0, 1, 4, 2, 3, 5, 6).reshape(
        p.B, p.dg, p.NT, p.K0, p.KP, p.Cg)


def _unpack_s(gs, plan: _Plan):
    """(B, dg, NT, K0, NR, KP) s-rows -> list of nd+1 (B, dg, K, P):
    grad wrt pos_0..pos_{nd-1} and grad_mask."""
    p = plan
    g = gs.reshape(p.B, p.dg, p.NT, p.K0, p.NR, p.KI, p.PT)
    g = g.transpose(0, 1, 4, 3, 5, 2, 6).reshape(
        p.B, p.dg, p.NR, p.K, p.PPAD)[:, :, :, :, :p.P]
    return [g[:, :, r] for r in range(p.nd + 1)]


def _plan_for(x, spec, out_sizes):
    OS = spec.out_sizes(x.shape[2:]) if out_sizes is None else tuple(out_sizes)
    return _Plan(spec, x.shape[0], x.shape[1], x.shape[2:], OS, x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_columns(x, offset, mask, gates, spec: DeformConvSpec,
                  precision: str, out_sizes=None):
    """Deformable columns (B, dg, K, P, Cg) via the fused Pallas kernel.

    Differentiable in x / offset / mask with hand-written Pallas VJPs.
    `mask` may be a zero-size placeholder for the plain (DCNv1) ops;
    `gates` is a zero-size placeholder or an (nd, 2) f32 gate-bounds
    override (see _prep) — a primal arg because its entries may be traced
    (shard-index-dependent), with an identically-zero cotangent.
    `out_sizes` overrides the inferred output grid (used by the sharding
    layer, whose halo-extended local blocks are larger than the local
    output grid implies).
    """
    return _fused_columns_impl(x, offset, mask, gates, spec, precision,
                               out_sizes)


def _fused_columns_impl(x, offset, mask, gates, spec, precision,
                        out_sizes=None):
    cd, prec = _resolve(precision)
    plan = _plan_for(x, spec, out_sizes)
    m = mask if (mask is not None and mask.size) else None
    xp, pr, bnd = _prep(x, offset, m, spec, plan,
                        gates if gates.size else None)
    cols_t = _fwd_call(xp, pr, bnd, plan, cd, prec)
    return _untile(cols_t, plan)


def _fused_columns_fwd(x, offset, mask, gates, spec, precision,
                       out_sizes=None):
    return _fused_columns_impl(x, offset, mask, gates, spec, precision,
                               out_sizes), (x, offset, mask, gates)


def _fused_columns_bwd(spec, precision, out_sizes, res, g):
    x, offset, mask, gates = res
    cd, prec = _resolve(precision)
    plan = _plan_for(x, spec, out_sizes)
    p = plan
    m = mask if (mask is not None and mask.size) else None
    xp, pr, bnd = _prep(x, offset, m, spec, plan,
                        gates if gates.size else None)
    gcols_t = _retile(g.astype(jnp.float32), plan)
    gxp, gs = _bwd_call(xp, pr, bnd, gcols_t, plan, cd, prec)
    gs = gs.sum(axis=2)                   # reduce channel parts

    gx = gxp[:, :, :p.Sflat].reshape((p.B, p.dg) + p.S + (p.Cg,))
    gx = jnp.moveaxis(gx, -1, 2).reshape((p.B, p.C) + p.S)
    gx = gx.astype(x.dtype)

    s = _unpack_s(gs, plan)                    # nd pos-grads + mask-grad
    goff = jnp.stack(s[:p.nd], axis=3)         # (B, dg, K, nd, P)
    goff = goff.reshape(offset.shape).astype(offset.dtype)
    if m is None:
        gmask = jnp.zeros_like(mask) if mask is not None else None
    else:
        gmask = s[p.nd].reshape(mask.shape).astype(mask.dtype)
    return gx, goff, gmask, jnp.zeros_like(gates)


fused_columns.defvjp(_fused_columns_fwd, _fused_columns_bwd)


def ineligible_reason(x, spec: DeformConvSpec,
                      out_sizes=None) -> Optional[str]:
    """None if the fused kernel supports this config, else a reason."""
    if spec.ndim not in (2, 3):
        return "pallas kernel supports 2D and 3D only"
    if x.dtype not in (jnp.float32, jnp.bfloat16, jnp.float16):
        return f"unsupported dtype {x.dtype}"
    if x.shape[1] % spec.deformable_groups:
        return "channels not divisible by deformable_groups"
    plan = _plan_for(x, spec, out_sizes)
    if (plan.NCP > 1 and plan.SPAD >= 98304
            and jax.default_backend() == "tpu"):
        # Empirical AOT-toolchain bug: channel-part grids over planes with
        # >= ~98k flat positions crash the compiler (any block size, any
        # part count); single-part blocks up to 50MB are fine.  Re-tested
        # r5: still a hard tpu_compile_helper subprocess crash (exit 1),
        # not a reportable Mosaic error.
        return ("channel-part split over a large plane crashes the current "
                "TPU toolchain")
    if plan.stream and jax.default_backend() == "tpu":
        # The HBM-streaming path (chunk DMA) is implemented and verified
        # in interpreter mode.  r5 root-caused the TPU failure
        # (benchmarks/probe_async_copy_r5.py: indexed make_async_copy
        # itself compiles and runs fine now): Mosaic requires HBM memref
        # slices to be 128-aligned on the LANE dim, and the stream layout
        # puts CgP channels there — stream configs exist precisely
        # because Cg is small (< 128), so every chunk slice trips
        # "Slice shape along dimension 4 must be aligned to tiling (128),
        # but is <CgP>".  A lane-padded layout would amplify the HBM
        # traffic 128/CgP-fold on a path that is traffic-bound by
        # definition; such configs are better served by the shift-blend
        # lead-chunked mode or the XLA fallback.
        return ("input plane exceeds VMEM residency budget (stream chunk "
                "slices need 128 lane-aligned channels; Cg < 128 here)")
    return plan.ineligible_reason()


def deform_conv_fused(x, offset, mask, weight, bias, spec: DeformConvSpec,
                      precision: str = "tensorfloat32", out_sizes=None,
                      gate_bounds=None):
    """Full fused N-d deformable conv: Pallas columns + grouped MXU GEMM.

    Matches the reference host pipeline (deformable_conv.cu:117-196,
    deformable_conv3d.cu:160-256): per-group GEMM out[g] = W[g] @ cols[g]
    plus bias broadcast.  `gate_bounds` optionally overrides the tap gate
    with per-dim (lo, hi) scalars (may be traced; see _prep)."""
    B, C = x.shape[0], x.shape[1]
    if gate_bounds is None:
        gates = jnp.zeros((0,), jnp.float32)
    else:
        gates = jnp.stack([
            jnp.stack([jnp.asarray(lo, jnp.float32),
                       jnp.asarray(hi, jnp.float32)])
            for lo, hi in gate_bounds])
    OS = (spec.out_sizes(x.shape[2:]) if out_sizes is None
          else tuple(out_sizes))
    P = math.prod(OS)
    K, g = spec.tap_count, spec.groups
    O = weight.shape[0]
    in_dtype = x.dtype

    if x.dtype == jnp.float16:
        x = x.astype(jnp.float32)
    mask_arr = mask if mask is not None else jnp.zeros((0,), x.dtype)
    plan = _Plan(spec, B, C, x.shape[2:], OS, x.dtype)
    if _fuse_ok(plan, C, g, O):
        osz = OS
        # Chunk the batch so the per-slab output partials stay under the
        # ~2GB XLA buffer limit (pure memory measure, results invariant).
        per_sample = plan.dg * plan.NCP * plan.PPAD * (O // g) * 4
        bstep = max(1, (1 << 30) // max(per_sample, 1))
        while B % bstep:
            bstep -= 1
        chunks = []
        for i in range(0, B, bstep):
            sl = slice(i, i + bstep)
            m_sl = mask_arr[sl] if mask_arr.size else mask_arr
            chunks.append(fused_conv(x[sl], offset[sl], m_sl, weight,
                                     gates, spec, precision, g, osz))
        out = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, 0)
        if bias is not None:
            out = out + bias.astype(out.dtype).reshape(
                (1, -1) + (1,) * spec.ndim)
        return out.astype(in_dtype)
    cols = fused_columns(x, offset, mask_arr, gates, spec, precision, OS)
    # (B, dg, K, P, Cg) -> (B, P, g, C/g, K); channel c = d*Cg + cg.
    cols = cols.transpose(0, 3, 1, 4, 2).reshape(B, P, C, K)
    cols = cols.reshape(B, P, g, C // g, K)
    w = weight.reshape(g, O // g, C // g, K).astype(cols.dtype)
    gemm_prec = (jax.lax.Precision.HIGHEST if precision == "float32"
                 else jax.lax.Precision.DEFAULT)
    out = jnp.einsum("bpgck,gock->bpgo", cols, w, precision=gemm_prec,
                     preferred_element_type=jnp.float32)
    out = out.reshape(B, P, O)
    if bias is not None:
        out = out + bias.astype(jnp.float32)[None, None, :]
    out = out.astype(in_dtype).reshape((B,) + OS + (O,))
    return jnp.moveaxis(out, -1, 1)


# ---------------------------------------------------------------------------
# Fully fused path: gather + grouped GEMM in one kernel (columns never
# materialize in HBM).  Replaces the reference's two-step im2col + cuBLAS
# addmm_ pipeline (deformable_conv.cu:168-182) with a single pass.  Active
# when each (deformable-group, channel-part) slab lies inside one conv
# group, i.e. (C/groups) % CgP == 0; otherwise the columns path runs.
# ---------------------------------------------------------------------------


def _fuse_ok(plan: _Plan, C: int, groups: int, O: int) -> bool:
    if (C // groups) % plan.CgP:
        return False
    p = plan
    Og = O // groups
    # Full VMEM footprint of the fused backward (the larger of the two):
    # double-buffered blocks (x, pr, w2, gout) + scratch accumulators.
    blocks = 2 * 4 * (p.SPAD * p.CgP + p.K0 * p.NR * p.KP
                      + p.K0 * Og * p.KI * p.CgP + Og * p.PT)
    scratch = 4 * (2 * p.CgP * p.KP + p.KI * p.CgP * p.PT + Og * p.PT
                   + p.NR * p.KP)
    return blocks + scratch <= 80 * 1024 * 1024


def _w2_prep(weight, plan: _Plan, groups: int):
    """weight (O, C/g, *kernel) -> (dg, NCP, K0, Og, KI*CgP).

    Slab s = d*NCP + cp covers input channels [s*CgP, (s+1)*CgP) which live
    in conv group gi = s // spg (spg slabs per group); w2 columns are
    ki-major to match the kernel's acc2 layout."""
    p = plan
    O = weight.shape[0]
    g = groups
    Og = O // g
    spg = (p.dg * p.NCP) // g
    w = weight.reshape(g, Og, spg, p.CgP, p.K0, p.KI)
    # -> (g, spg, K0, Og, KI, CgP) -> (slabs, K0, Og, KI*CgP)
    w = w.transpose(0, 2, 4, 1, 5, 3).reshape(
        g * spg, p.K0, Og, p.KI * p.CgP)
    return w.reshape(p.dg, p.NCP, p.K0, Og, p.KI * p.CgP)


def _w2_unprep(gw, plan: _Plan, O: int, groups: int, kernel):
    """Inverse of _w2_prep for grad_weight: (dg, NCP, K0, Og, KI*CgP) ->
    (O, C/g, *kernel)."""
    p = plan
    g = groups
    Og = O // g
    spg = (p.dg * p.NCP) // g
    w = gw.reshape(g, spg, p.K0, Og, p.KI, p.CgP)
    w = w.transpose(0, 3, 1, 5, 2, 4)          # (g, Og, spg, CgP, K0, KI)
    return w.reshape((O, p.C // g) + tuple(kernel))


def _gi_index(plan: _Plan, groups: int, d, cp):
    """Conv-group index of slab (d, cp) for index_maps."""
    spg = (plan.dg * plan.NCP) // groups
    return (d * plan.NCP + cp) // spg


def _fwd_fused_kernel(bnd_ref, pr_ref, x_ref, w2_ref, out_ref, *rest,
                      plan, cd, prec):
    p = plan
    if p.save_cols:
        cols2_ref, acc_ref, acc2_ref, oacc_ref, *scratch = rest
    else:
        cols2_ref = None
        acc_ref, acc2_ref, oacc_ref, *scratch = rest
    b, dgi, t = pl.program_id(0), pl.program_id(1), pl.program_id(3)
    if p.stream:
        xbuf, xsem = scratch

        def load_x(ci):
            dma = pltpu.make_async_copy(
                x_ref.at[b, dgi, 0, pl.ds(ci * p.SCH, p.SCH), :], xbuf,
                xsem)
            dma.start()
            dma.wait()
            return xbuf[...].astype(cd)
    else:
        def load_x(ci):
            return x_ref[0, 0, 0, pl.ds(ci * p.SCH, p.SCH), :].astype(cd)

    qi = jax.lax.broadcasted_iota(jnp.int32, (p.SCH, 1), 0)
    oacc_ref[...] = jnp.zeros_like(oacc_ref)

    for kg in range(p.K0):
        pr_k = pr_ref[0, 0, 0, kg]
        svl = pr_k[_R_SVL:_R_SVL + 1]
        svh = pr_k[_R_SVH:_R_SVH + 1]
        l0 = pr_k[_R_L0:_R_L0 + 1]
        lo = bnd_ref[0, 0, 0, kg, 0]
        hi = bnd_ref[0, 0, 0, kg, 1]

        if p.planar:
            plane = p.qstride[0]
            c_lo = bnd_ref[0, 0, 0, kg, 2]
            c_hi = bnd_ref[0, 0, 0, kg, 3]
            acc_ref[...] = jnp.zeros_like(acc_ref)

            def mbody(ci, _, pr_k=pr_k, svl=svl, svh=svh, l0=l0,
                      lo=lo, hi=hi):
                qm = qi + ci * p.SCH
                F12, _, _ = _planar_f12(pr_k, qm, p)

                def zbody(z, _, F12=F12, l0=l0, ci=ci):
                    # (1, KP) corner-weight row per plane -> one
                    # broadcast multiply (see _fwd_kernel planar).
                    zf = z.astype(jnp.float32)
                    zr = jnp.zeros((), jnp.float32)
                    sel0 = (jnp.where(l0 == zf, svl, zr)
                            + jnp.where(l0 + 1.0 == zf, svh, zr))
                    A = (sel0 * F12).astype(cd)
                    xc = x_ref[0, 0, 0,
                               pl.ds(z * plane + ci * p.SCH, p.SCH),
                               :].astype(cd)
                    acc_ref[...] += jax.lax.dot_general(
                        xc, A, (((0,), (0,)), ((), ())),
                        precision=prec,
                        preferred_element_type=jnp.float32)
                    return 0

                jax.lax.fori_loop(lo, hi, zbody, 0)
                return 0

            jax.lax.fori_loop(c_lo, c_hi, mbody, 0)
            for ki in range(p.KI):
                acc2_ref[pl.ds(ki * p.CgP, p.CgP), :] = \
                    acc_ref[:, pl.ds(ki * p.PT, p.PT)]
            if p.save_cols:
                cols2_ref[0, 0, 0, 0, kg] = acc2_ref[...].astype(
                    cols2_ref.dtype)
            w2k = w2_ref[0, 0, kg].astype(cd)           # (Og, KI*CgP)
            oacc_ref[...] += jax.lax.dot_general(
                w2k, acc2_ref[...].astype(cd), (((1,), (0,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32)
            continue

        # Pre-scale the chunk-invariant factor product by the two vertical
        # corner weights (one rounding, fewer per-chunk VPU passes; selects
        # below run in the compute dtype directly).
        hp = None
        for d in range(1, p.nd):
            if p.hoist[d]:
                qd = ((qi // p.qstride[d]) % p.S[d]).astype(jnp.float32)
                Fd = _factor_d(pr_k, qd, d)[0]
                hp = Fd if hp is None else hp * Fd
        AL = (svl * hp if hp is not None else
              jnp.broadcast_to(svl, (p.SCH, p.KP))).astype(cd)
        AH = (svh * hp if hp is not None else
              jnp.broadcast_to(svh, (p.SCH, p.KP))).astype(cd)
        acc_ref[...] = jnp.zeros_like(acc_ref)

        def body(ci, _, pr_k=pr_k, l0=l0, AL=AL, AH=AH):
            qflat = qi + ci * p.SCH
            q0 = (qflat // p.qstride[0]).astype(jnp.float32)
            zero = jnp.zeros((), cd)
            A = (jnp.where(q0 == l0, AL, zero)
                 + jnp.where(q0 == l0 + 1.0, AH, zero))
            for d in range(1, p.nd):
                if not p.hoist[d]:
                    qd = ((qflat // p.qstride[d]) % p.S[d]).astype(
                        jnp.float32)
                    A = A * _factor_d(pr_k, qd, d)[0].astype(cd)
            xc = load_x(ci)
            # cols accumulated channels-major: (CgP, KP) = x^T @ A — this
            # orientation makes the acc->acc2 relayout a pure slice copy
            # (in-kernel transposes do not lower on TPU).
            acc_ref[...] += jax.lax.dot_general(
                xc, A, (((0,), (0,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(lo, hi, body, 0)
        # (CgP, KI*PT) -> (KI*CgP, PT) by slice copies, then the grouped
        # GEMM on the MXU.
        for ki in range(p.KI):
            acc2_ref[pl.ds(ki * p.CgP, p.CgP), :] = \
                acc_ref[:, pl.ds(ki * p.PT, p.PT)]
        if p.save_cols:
            cols2_ref[0, 0, 0, 0, kg] = acc2_ref[...].astype(
                cols2_ref.dtype)
        w2k = w2_ref[0, 0, kg].astype(cd)               # (Og, KI*CgP)
        oacc_ref[...] += jax.lax.dot_general(
            w2k, acc2_ref[...].astype(cd), (((1,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32)

    out_ref[0, 0, 0, 0] = oacc_ref[...]


def _bwd_fused_kernel(bnd_ref, pr_ref, x_ref, w2_ref, gout_ref, *rest,
                      plan, cd, prec):
    p = plan
    if p.save_cols:
        cols2_ref, gx_ref, gs_ref, gw_ref, sh_ref, gcols_ref, *scratch = rest
        acc_ref = acc2_ref = None
    else:
        gx_ref, gs_ref, gw_ref, sh_ref, acc_ref, acc2_ref, gcols_ref, \
            *scratch = rest
    b, dgi, t = pl.program_id(0), pl.program_id(1), pl.program_id(3)
    qi = jax.lax.broadcasted_iota(jnp.int32, (p.SCH, 1), 0)

    if p.stream:
        xbuf, gbuf, xsem, gsem = scratch

        def load_x(ci):
            dma = pltpu.make_async_copy(
                x_ref.at[b, dgi, 0, pl.ds(ci * p.SCH, p.SCH), :], xbuf,
                xsem)
            dma.start()
            dma.wait()
            return xbuf[...].astype(cd)

        def accum_gx(ci, gxc):
            sl = pl.ds(ci * p.SCH, p.SCH)
            rd = pltpu.make_async_copy(gx_ref.at[b, dgi, 0, sl, :], gbuf,
                                       gsem)
            rd.start()
            rd.wait()
            gbuf[...] += gxc
            wr = pltpu.make_async_copy(gbuf, gx_ref.at[b, dgi, 0, sl, :],
                                       gsem)
            wr.start()
            wr.wait()

        @pl.when(t == 0)
        def _():
            gbuf[...] = jnp.zeros_like(gbuf)

            def zero_chunk(ci, _):
                wr = pltpu.make_async_copy(
                    gbuf,
                    gx_ref.at[b, dgi, 0, pl.ds(ci * p.SCH, p.SCH), :],
                    gsem)
                wr.start()
                wr.wait()
                return 0

            jax.lax.fori_loop(0, p.NCH, zero_chunk, 0)
    else:
        def load_x(ci):
            return x_ref[0, 0, 0, pl.ds(ci * p.SCH, p.SCH), :].astype(cd)

        def accum_gx(ci, gxc):
            gx_ref[0, 0, 0, pl.ds(ci * p.SCH, p.SCH), :] += gxc

        @pl.when(t == 0)
        def _():
            gx_ref[...] = jnp.zeros_like(gx_ref)

    @pl.when(t == 0)
    def _():
        gw_ref[...] = jnp.zeros_like(gw_ref)

    gout = gout_ref[0, 0, 0].astype(cd)                 # (Og, PT)

    for kg in range(p.K0):
        pr_k = pr_ref[0, 0, 0, kg]
        svl = pr_k[_R_SVL:_R_SVL + 1]
        svh = pr_k[_R_SVH:_R_SVH + 1]
        gl = pr_k[_R_GL:_R_GL + 1]
        gh = pr_k[_R_GH:_R_GH + 1]
        lo = bnd_ref[0, 0, 0, kg, 0]
        hi = bnd_ref[0, 0, 0, kg, 1]
        hoisted = {}
        for d in range(1, p.nd):
            if p.hoist[d]:
                qd = ((qi // p.qstride[d]) % p.S[d]).astype(jnp.float32)
                hoisted[d] = _factor_d(pr_k, qd, d)

        # gcols for this tap group: w2^T @ gout, relayout channels-major
        # (CgP, KP) via slice copies (in-kernel transposes don't lower).
        w2k = w2_ref[0, 0, kg].astype(cd)               # (Og, KI*CgP)
        gcols2 = jax.lax.dot_general(
            w2k, gout, (((0,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32)
        for ki in range(p.KI):
            gcols_ref[:, pl.ds(ki * p.PT, p.PT)] = \
                gcols2[ki * p.CgP:(ki + 1) * p.CgP, :]
        gcols = gcols_ref[...].astype(cd)               # (CgP, KP)

        sh_ref[...] = jnp.zeros_like(sh_ref)
        if not p.save_cols:
            acc_ref[...] = jnp.zeros_like(acc_ref)

        if p.planar:
            plane = p.qstride[0]
            c_lo = bnd_ref[0, 0, 0, kg, 2]
            c_hi = bnd_ref[0, 0, 0, kg, 3]
            sv = svl + svh
            l0p = pr_k[_R_L0:_R_L0 + 1]

            def mbody(ci, _, pr_k=pr_k, svl=svl, svh=svh, sv=sv, gl=gl,
                      gh=gh, gcols=gcols, l0=l0p, lo=lo, hi=hi):
                qm = qi + ci * p.SCH
                F12, P1, P2 = _planar_f12(pr_k, qm, p, grads=True)

                def zbody(z, _, F12=F12, P1=P1, P2=P2, l0=l0, ci=ci,
                          gcols=gcols):
                    zf = z.astype(jnp.float32)
                    m0 = l0 == zf
                    m1 = l0 + 1.0 == zf
                    zr = jnp.zeros((), jnp.float32)
                    sel0 = (jnp.where(m0, svl, zr)
                            + jnp.where(m1, svh, zr))
                    A = (sel0 * F12).astype(cd)
                    sl = pl.ds(z * plane + ci * p.SCH, p.SCH)
                    xc = x_ref[0, 0, 0, sl, :].astype(cd)
                    if not p.save_cols:
                        acc_ref[...] += jax.lax.dot_general(
                            xc, A, (((0,), (0,)), ((), ())),
                            precision=prec,
                            preferred_element_type=jnp.float32)
                    gxc = jax.lax.dot_general(
                        A, gcols, (((1,), (1,)), ((), ())),
                        precision=prec,
                        preferred_element_type=jnp.float32)
                    gx_ref[0, 0, 0, sl, :] += gxc
                    M = jax.lax.dot_general(
                        xc, gcols, (((1,), (0,)), ((), ())),
                        precision=prec,
                        preferred_element_type=jnp.float32)
                    T = jnp.sum(F12 * M, axis=0, keepdims=True)
                    dsel = (jnp.where(m1, sv, zr)
                            - jnp.where(m0, sv, zr))
                    sh_ref[0:1] += dsel * T
                    gsel = jnp.where(m0, gl, zr) + jnp.where(m1, gh, zr)
                    sh_ref[p.nd:p.nd + 1] += gsel * T
                    sh_ref[1:2] += sel0 * jnp.sum(P1 * M, axis=0,
                                                  keepdims=True)
                    sh_ref[2:3] += sel0 * jnp.sum(P2 * M, axis=0,
                                                  keepdims=True)
                    return 0

                jax.lax.fori_loop(lo, hi, zbody, 0)
                return 0

            jax.lax.fori_loop(c_lo, c_hi, mbody, 0)
            gs_ref[0, 0, 0, 0, kg] = sh_ref[...]
            if p.save_cols:
                cols2 = cols2_ref[0, 0, 0, 0, kg].astype(cd)
            else:
                for ki in range(p.KI):
                    acc2_ref[pl.ds(ki * p.CgP, p.CgP), :] = \
                        acc_ref[:, pl.ds(ki * p.PT, p.PT)]
                cols2 = acc2_ref[...].astype(cd)
            gw_ref[0, 0, 0, kg] += jax.lax.dot_general(
                gout, cols2, (((1,), (1,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32)
            continue

        all_hoisted = all(p.hoist[1:]) and p.nd >= 2
        # Reductions run in the compute dtype; in exact mode cd is f32.
        rd = cd
        if all_hoisted:
            # Pre-scale every chunk-invariant product once per tile: the
            # chunk body is then two compares + selects + reductions.
            Frest = hoisted[1][0]
            for d in range(2, p.nd):
                Frest = Frest * hoisted[d][0]
            l0 = pr_k[_R_L0:_R_L0 + 1]
            FL = (svl * Frest).astype(cd)
            FH = (svh * Frest).astype(cd)
            SF = ((svl + svh) * Frest).astype(rd)       # dF0 * Frest
            GLr = (gl * Frest).astype(rd)
            GHr = (gh * Frest).astype(rd)
            Wd = []                                     # F0-scaled dF_d
            for d in range(1, p.nd):
                pr_d = hoisted[d][1]
                for e in range(1, p.nd):
                    if e != d:
                        pr_d = pr_d * hoisted[e][0]
                Wd.append(((svl * pr_d).astype(rd),
                           (svh * pr_d).astype(rd)))

            def body(ci, _, l0=l0, FL=FL, FH=FH, SF=SF, GLr=GLr, GHr=GHr,
                     Wd=Wd, gcols=gcols):
                qflat = qi + ci * p.SCH
                q0 = (qflat // p.qstride[0]).astype(jnp.float32)
                eq0 = q0 == l0
                eq1 = q0 == l0 + 1.0
                zc = jnp.zeros((), cd)
                zr = jnp.zeros((), rd)
                A = jnp.where(eq0, FL, zc) + jnp.where(eq1, FH, zc)
                xc = load_x(ci)

                if not p.save_cols:
                    acc_ref[...] += jax.lax.dot_general(
                        xc, A, (((0,), (0,)), ((), ())),
                        precision=prec, preferred_element_type=jnp.float32)

                gxc = jax.lax.dot_general(
                    A, gcols, (((1,), (1,)), ((), ())),
                    precision=prec, preferred_element_type=jnp.float32)
                accum_gx(ci, gxc)

                M = jax.lax.dot_general(
                    xc, gcols, (((1,), (0,)), ((), ())),
                    precision=prec,
                    preferred_element_type=jnp.float32).astype(rd)
                dF0r = jnp.where(eq1, SF, zr) - jnp.where(eq0, SF, zr)
                sh_ref[0:1] += jnp.sum(dF0r * M, axis=0,
                                       keepdims=True).astype(jnp.float32)
                F0g = jnp.where(eq0, GLr, zr) + jnp.where(eq1, GHr, zr)
                sh_ref[p.nd:p.nd + 1] += jnp.sum(
                    F0g * M, axis=0, keepdims=True).astype(jnp.float32)
                for d in range(1, p.nd):
                    WdL, WdH = Wd[d - 1]
                    pd = jnp.where(eq0, WdL, zr) + jnp.where(eq1, WdH, zr)
                    sh_ref[d:d + 1] += jnp.sum(
                        pd * M, axis=0, keepdims=True).astype(jnp.float32)
                return 0
        else:
            def body(ci, _, pr_k=pr_k, svl=svl, svh=svh, gl=gl, gh=gh,
                     gcols=gcols, hoisted=hoisted):
                qflat = qi + ci * p.SCH
                q0 = (qflat // p.qstride[0]).astype(jnp.float32)
                ev0, ev1 = _factor0(pr_k, q0)
                F0 = ev0 * svl + ev1 * svh
                dF0 = (ev1 - ev0) * (svl + svh)
                F0g = ev0 * gl + ev1 * gh
                Fs, dFs = [F0], [dF0]
                for d in range(1, p.nd):
                    if d in hoisted:
                        Fd, dFd = hoisted[d]
                    else:
                        qd = ((qflat // p.qstride[d]) % p.S[d]).astype(
                            jnp.float32)
                        Fd, dFd = _factor_d(pr_k, qd, d)
                    Fs.append(Fd)
                    dFs.append(dFd)
                Frest = Fs[1]
                for d in range(2, p.nd):
                    Frest = Frest * Fs[d]
                A = F0 * Frest
                Acd = A.astype(cd)
                xc = load_x(ci)

                if not p.save_cols:
                    # columns recompute for grad_weight (reference
                    # deformable_conv.cu:285 makes the same tradeoff)
                    acc_ref[...] += jax.lax.dot_general(
                        xc, Acd, (((0,), (0,)), ((), ())),
                        precision=prec, preferred_element_type=jnp.float32)

                gxc = jax.lax.dot_general(
                    Acd, gcols, (((1,), (1,)), ((), ())),
                    precision=prec, preferred_element_type=jnp.float32)
                accum_gx(ci, gxc)

                M = jax.lax.dot_general(
                    xc, gcols, (((1,), (0,)), ((), ())),
                    precision=prec, preferred_element_type=jnp.float32)
                t0 = Frest * M
                sh_ref[0:1] += jnp.sum(dF0 * t0, axis=0, keepdims=True)
                sh_ref[p.nd:p.nd + 1] += jnp.sum(F0g * t0, axis=0,
                                                 keepdims=True)
                for d in range(1, p.nd):
                    prod = F0 * dFs[d]
                    for e in range(1, p.nd):
                        if e != d:
                            prod = prod * Fs[e]
                    sh_ref[d:d + 1] += jnp.sum(prod * M, axis=0,
                                               keepdims=True)
                return 0

        jax.lax.fori_loop(lo, hi, body, 0)
        gs_ref[0, 0, 0, 0, kg] = sh_ref[...]
        if p.save_cols:
            cols2 = cols2_ref[0, 0, 0, 0, kg].astype(cd)
        else:
            for ki in range(p.KI):
                acc2_ref[pl.ds(ki * p.CgP, p.CgP), :] = \
                    acc_ref[:, pl.ds(ki * p.PT, p.PT)]
            cols2 = acc2_ref[...].astype(cd)
        gw_ref[0, 0, 0, kg] += jax.lax.dot_general(
            gout, cols2, (((1,), (1,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32)


def _fused_conv_call(xp, pr, bnd, w2, plan: _Plan, Og, cd, prec):
    p = plan
    xdt = xp.dtype
    if p.stream:
        x_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        extra = [pltpu.VMEM((p.SCH, p.CgP), xdt),
                 pltpu.SemaphoreType.DMA(())]
    else:
        x_spec = pl.BlockSpec((1, 1, 1, p.SPAD, p.CgP),
                              lambda b, d, cp, t, *_: (b, d, cp, 0, 0),
                              memory_space=pltpu.VMEM)
        extra = []
    grid_spec = pl.GridSpec(
        grid=(p.B, p.dg, p.NCP, p.NT),
        in_specs=[
            # [lo, hi) chunk bounds live in SMEM per tile — NOT scalar
            # prefetch: prefetched arrays must fit SMEM whole, which caps
            # the grid at ~3k tiles (compile crash beyond).
            pl.BlockSpec((1, 1, 1, p.K0, p.BW),
                         lambda b, d, cp, t: (b, d, t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, p.K0, p.NR, p.KP),
                         lambda b, d, cp, t, *_: (b, d, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            x_spec,
            pl.BlockSpec((1, 1, p.K0, Og, p.KI * p.CgP),
                         lambda b, d, cp, t, *_: (d, cp, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, 1, 1, 1, Og, p.PT),
                                lambda b, d, cp, t: (b, d, cp, t, 0, 0),
                                memory_space=pltpu.VMEM)] + (
            [pl.BlockSpec((1, 1, 1, 1, p.K0, p.KI * p.CgP, p.PT),
                          lambda b, d, cp, t: (b, d, cp, t, 0, 0, 0),
                          memory_space=pltpu.VMEM)] if p.save_cols else []),
        scratch_shapes=[pltpu.VMEM((p.CgP, p.KP), jnp.float32),
                        pltpu.VMEM((p.KI * p.CgP, p.PT), jnp.float32),
                        pltpu.VMEM((Og, p.PT), jnp.float32)] + extra,
    )
    out_shapes = [jax.ShapeDtypeStruct(
        (p.B, p.dg, p.NCP, p.NT, Og, p.PT), jnp.float32)]
    if p.save_cols:
        # the residual keeps full precision in exact mode; bf16 otherwise
        cdt = (jnp.float32 if prec == jax.lax.Precision.HIGHEST
               else jnp.bfloat16)
        out_shapes.append(jax.ShapeDtypeStruct(
            (p.B, p.dg, p.NCP, p.NT, p.K0, p.KI * p.CgP, p.PT), cdt))
    res = pl.pallas_call(
        functools.partial(_fwd_fused_kernel, plan=p, cd=cd, prec=prec),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit()),
        interpret=_interpret(),
    )(bnd, pr, xp, w2)
    return res if p.save_cols else (res[0], None)


def _fused_conv_bwd_call(xp, pr, bnd, w2, gout_t, cols2, plan: _Plan, Og,
                         cd, prec, groups):
    p = plan
    xdt = xp.dtype
    if p.stream:
        x_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        gx_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        extra = [pltpu.VMEM((p.SCH, p.CgP), xdt),
                 pltpu.VMEM((p.SCH, p.CgP), jnp.float32),
                 pltpu.SemaphoreType.DMA(()),
                 pltpu.SemaphoreType.DMA(())]
    else:
        x_spec = pl.BlockSpec((1, 1, 1, p.SPAD, p.CgP),
                              lambda b, d, cp, t, *_: (b, d, cp, 0, 0),
                              memory_space=pltpu.VMEM)
        gx_spec = pl.BlockSpec((1, 1, 1, p.SPAD, p.CgP),
                               lambda b, d, cp, t, *_: (b, d, cp, 0, 0),
                               memory_space=pltpu.VMEM)
        extra = []
    spg = (p.dg * p.NCP) // groups
    in_specs = [
        # [lo, hi) chunk bounds live in SMEM per tile — NOT scalar
        # prefetch: prefetched arrays must fit SMEM whole, which caps
        # the grid at ~3k tiles (compile crash beyond).
        pl.BlockSpec((1, 1, 1, p.K0, p.BW),
                     lambda b, d, cp, t: (b, d, t, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, 1, p.K0, p.NR, p.KP),
                     lambda b, d, cp, t: (b, d, t, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        x_spec,
        pl.BlockSpec((1, 1, p.K0, Og, p.KI * p.CgP),
                     lambda b, d, cp, t: (d, cp, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, Og, p.PT),
                     lambda b, d, cp, t:
                     (b, (d * p.NCP + cp) // spg, t, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [bnd, pr, xp, w2, gout_t]
    if p.save_cols:
        in_specs.append(
            pl.BlockSpec((1, 1, 1, 1, p.K0, p.KI * p.CgP, p.PT),
                         lambda b, d, cp, t: (b, d, cp, t, 0, 0, 0),
                         memory_space=pltpu.VMEM))
        args.append(cols2)
        scratch = [pltpu.VMEM((p.NR, p.KP), jnp.float32),
                   pltpu.VMEM((p.CgP, p.KP), jnp.float32)] + extra
    else:
        scratch = [pltpu.VMEM((p.NR, p.KP), jnp.float32),
                   pltpu.VMEM((p.CgP, p.KP), jnp.float32),
                   pltpu.VMEM((p.KI * p.CgP, p.PT), jnp.float32),
                   pltpu.VMEM((p.CgP, p.KP), jnp.float32)] + extra
    grid_spec = pl.GridSpec(
        grid=(p.B, p.dg, p.NCP, p.NT),
        in_specs=in_specs,
        out_specs=[
            gx_spec,
            pl.BlockSpec((1, 1, 1, 1, p.K0, p.NR, p.KP),
                         lambda b, d, cp, t: (b, d, cp, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, p.K0, Og, p.KI * p.CgP),
                         lambda b, d, cp, t: (b, d, cp, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        functools.partial(_bwd_fused_kernel, plan=p, cd=cd, prec=prec),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((p.B, p.dg, p.NCP, p.SPAD, p.CgP),
                                 jnp.float32),
            jax.ShapeDtypeStruct((p.B, p.dg, p.NCP, p.NT, p.K0, p.NR,
                                  p.KP), jnp.float32),
            jax.ShapeDtypeStruct((p.B, p.dg, p.NCP, p.K0, Og,
                                  p.KI * p.CgP), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit()),
        interpret=_interpret(),
    )(*args)


def _out_from_partials(outp, plan: _Plan, O, groups, OS):
    """(B, dg, NCP, NT, Og, PT) partials -> (B, O, *OS)."""
    p = plan
    g = groups
    Og = O // g
    spg = (p.dg * p.NCP) // g
    o = outp.reshape(p.B, g, spg, p.NT, Og, p.PT).sum(axis=2)
    o = o.transpose(0, 1, 3, 2, 4)              # (B, g, Og, NT, PT)
    o = o.reshape(p.B, O, p.PPAD)[:, :, :p.P]
    return o.reshape((p.B, O) + tuple(OS))


def _gout_tiles(g_out, plan: _Plan, O, groups):
    """(B, O, *OS) cotangent -> (B, g, NT, Og, PT) tiles."""
    p = plan
    g = groups
    Og = O // g
    go = g_out.reshape(p.B, O, p.P).astype(jnp.float32)
    go = jnp.pad(go, ((0, 0), (0, 0), (0, p.PPAD - p.P)))
    go = go.reshape(p.B, g, Og, p.NT, p.PT)
    return go.transpose(0, 1, 3, 2, 4)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def fused_conv(x, offset, mask, weight, gates, spec: DeformConvSpec,
               precision: str, groups: int, out_sizes=None):
    """Whole fused deformable conv (no bias): gather + grouped GEMM in one
    Pallas kernel, hand-written VJPs for x/offset/mask/weight.  When the
    plan's `save_cols` holds, the forward also emits the bf16 column tensor
    as a residual so the backward skips its recompute matmul.  `gates` is
    a zero-size placeholder or an (nd, 2) f32 gate-bounds override (see
    _prep; zero cotangent)."""
    return _fused_conv_impl(x, offset, mask, weight, gates, spec, precision,
                            groups, out_sizes)[0]


def _fused_conv_impl(x, offset, mask, weight, gates, spec, precision,
                     groups, out_sizes=None):
    cd, prec = _resolve(precision)
    OS = (spec.out_sizes(x.shape[2:]) if out_sizes is None
          else tuple(out_sizes))
    plan = _Plan(spec, x.shape[0], x.shape[1], x.shape[2:], OS, x.dtype)
    O = weight.shape[0]
    m = mask if (mask is not None and mask.size) else None
    xp, pr, bnd = _prep(x, offset, m, spec, plan,
                        gates if gates.size else None)
    w2 = _w2_prep(weight.astype(jnp.float32), plan, groups)
    outp, cols2 = _fused_conv_call(xp, pr, bnd, w2, plan, O // groups, cd,
                                   prec)
    return _out_from_partials(outp, plan, O, groups, OS), cols2


def _fused_conv_fwd(x, offset, mask, weight, gates, spec, precision,
                    groups, out_sizes=None):
    out, cols2 = _fused_conv_impl(x, offset, mask, weight, gates, spec,
                                  precision, groups, out_sizes)
    return out, (x, offset, mask, weight, gates, cols2)


def _fused_conv_bwd(spec, precision, groups, out_sizes, res, g_out):
    x, offset, mask, weight, gates, cols2 = res
    cd, prec = _resolve(precision)
    OS = (spec.out_sizes(x.shape[2:]) if out_sizes is None
          else tuple(out_sizes))
    plan = _Plan(spec, x.shape[0], x.shape[1], x.shape[2:], OS, x.dtype)
    p = plan
    O = weight.shape[0]
    m = mask if (mask is not None and mask.size) else None
    xp, pr, bnd = _prep(x, offset, m, spec, plan,
                        gates if gates.size else None)
    w2 = _w2_prep(weight.astype(jnp.float32), plan, groups)
    gout_t = _gout_tiles(g_out, plan, O, groups)
    gxp, gs, gw = _fused_conv_bwd_call(xp, pr, bnd, w2, gout_t, cols2,
                                       plan, O // groups, cd, prec, groups)

    gxp = gxp.transpose(0, 1, 3, 2, 4).reshape(p.B, p.dg, p.SPAD, p.Cg)
    gx = gxp[:, :, :p.Sflat].reshape((p.B, p.dg) + p.S + (p.Cg,))
    gx = jnp.moveaxis(gx, -1, 2).reshape((p.B, p.C) + p.S).astype(x.dtype)

    gs = gs.sum(axis=2)
    s = _unpack_s(gs, plan)
    goff = jnp.stack(s[:p.nd], axis=3).reshape(offset.shape)
    goff = goff.astype(offset.dtype)
    if m is None:
        gmask = jnp.zeros_like(mask) if mask is not None else None
    else:
        gmask = s[p.nd].reshape(mask.shape).astype(mask.dtype)

    gweight = _w2_unprep(gw.sum(axis=0), plan, O, groups, spec.kernel)
    gweight = gweight.astype(weight.dtype)
    return gx, goff, gmask, gweight, jnp.zeros_like(gates)


fused_conv.defvjp(_fused_conv_fwd, _fused_conv_bwd)
