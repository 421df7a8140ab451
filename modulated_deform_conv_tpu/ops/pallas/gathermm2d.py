"""Fused 2D deformable-columns Pallas TPU kernel (structured-sparse MXU matmul).

The reference implements the deformable gather as a CUDA im2col kernel with
one thread per column element (deformable_conv.cu:36-85,
mdeformable_conv.cu:37-87).  A literal port would be a scalar gather — the
worst possible TPU program.  Instead this kernel exploits the algebraic
structure of bilinear sampling:

    cols[kp, c] = sum_q A[q, kp] * x[q, c]

where q ranges over the flattened input plane of one (batch, deformable
group) and A is a sparse matrix with (at most) 4 nonzeros per column — the
bilinear corner weights.  A is *separable*:

    A[(qh, qw), kp] = Av[qh, kp] * Ah[qw, kp]
    Av[qh, kp] = [ (qh == hl)*(1-fh) + (qh == hl+1)*fh ] * mask * gate
    Ah[qw, kp] = [ (qw == wl)*(1-fw) + (qw == wl+1)*fw ]

built on the VPU from iota comparisons, and the contraction runs on the
MXU.  The comparisons implement the reference's boundary semantics exactly:

* the open-interval tap gate pos in (-1, S) (deformable_conv.cu:78) folds
  into `gate`;
* out-of-image corners contribute zero (deformable_conv.cu:17-28) because
  qh/qw iotas only cover [0, H)x[0, W) — an out-of-range hl/wl simply never
  matches;
* mask modulation (mdeformable_conv.cu:83) folds into Av.

The input plane is chunked by rows; per output tile the kernel loops only
over the chunks its samples can touch, using per-tile [lo, hi) chunk bounds
computed from the actual offsets and passed via scalar prefetch.  For small
learned offsets (the practical regime) this makes cost proportional to the
true receptive field, while arbitrary large offsets stay correct — the loop
just covers more chunks.  There is no atomics-based scatter anywhere; the
backward pass (same A, transposed contractions) is bitwise deterministic.

Precision modes (`precision`):
* "float32"       — HIGHEST-precision MXU passes; matches the f32 oracle to
                    ~1e-7 relative.
* "tensorfloat32" — f32 storage, one bf16x1 MXU pass (JAX/XLA's DEFAULT
                    matmul precision, same as the XLA einsum path and
                    torch's TF32 conv default); ~5e-3 relative.
* "bfloat16"      — bf16 storage and compute; fp32 accumulation.
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

PRECISIONS = ("float32", "tensorfloat32", "bfloat16")


def _interpret() -> bool:
    """Run the kernel in interpreter mode off-TPU (CPU tests)."""
    return jax.default_backend() != "tpu"


# VMEM budgets (bytes) used by the tiling heuristic / eligibility gate.
_A_CHUNK_BUDGET = 4 * 1024 * 1024       # one (SCH, KP) A-chunk
_X_PLANE_BUDGET = 10 * 1024 * 1024      # one (HPAD*W, Cg) input plane
_VMEM_LIMIT = 100 * 1024 * 1024         # v5e has 128MB physical VMEM


class _Plan:
    """Static tiling plan for one op configuration."""

    def __init__(self, spec: DeformConvSpec, B: int, C: int,
                 S: Tuple[int, int], OS: Tuple[int, int], dtype):
        self.B, self.C = B, C
        self.H, self.W = S
        self.OH, self.OW = OS
        self.dg = spec.deformable_groups
        self.Cg = C // self.dg
        self.K = spec.tap_count
        # Output-row tile T: target ~4k lanes for the A matmul.
        kow = self.K * self.OW
        self.T = max(1, min(self.OH, 4096 // max(kow, 1)))
        self.NT = -(-self.OH // self.T)
        self.OHP = self.NT * self.T
        self.KP = self.K * self.T * self.OW
        # Input-row chunk CH: SCH=CH*W must be a sublane multiple of 8 and
        # the f32 A-chunk must fit the budget.
        lcm8 = 8 // math.gcd(self.W, 8)
        ch = max(1, _A_CHUNK_BUDGET // (self.W * self.KP * 4))
        self.CH = max(lcm8, (ch // lcm8) * lcm8)
        self.SCH = self.CH * self.W
        self.HPAD = -(-self.H // self.CH) * self.CH
        self.NCH = self.HPAD // self.CH
        self.dtype = dtype

    def ineligible_reason(self) -> Optional[str]:
        if self.K * self.OW > 8192:
            return "K*OW too large for one lane tile"
        if self.SCH * self.KP * 4 > 2 * _A_CHUNK_BUDGET:
            return "A chunk exceeds VMEM budget"
        if self.HPAD * self.W * self.Cg * 4 > _X_PLANE_BUDGET:
            return "input plane per (batch, dg) exceeds VMEM budget"
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


def _base_grid(spec: DeformConvSpec, OS, S) -> Tuple[np.ndarray, np.ndarray]:
    """Static integer sample-grid base per (tap, output position).

    base_d = o_d*stride_d - pad_d + i_d*dilation_d
    (reference deformable_conv.cu:59-60, 76-77)."""
    OH, OW = OS
    kh, kw = spec.kernel
    oh = np.arange(OH)[None, :, None]
    ow = np.arange(OW)[None, None, :]
    ki, kj = np.meshgrid(np.arange(kh), np.arange(kw), indexing="ij")
    K = kh * kw
    ki = ki.reshape(K, 1, 1)
    kj = kj.reshape(K, 1, 1)
    bh = oh * spec.stride[0] - spec.padding[0] + ki * spec.dilation[0]
    bw = ow * spec.stride[1] - spec.padding[1] + kj * spec.dilation[1]
    bh = np.broadcast_to(bh, (K, OH, OW)).astype(np.float32)
    bw = np.broadcast_to(bw, (K, OH, OW)).astype(np.float32)
    return bh, bw


def _prep(x, offset, mask, spec: DeformConvSpec, plan: _Plan):
    """XLA-side prep: sampling factors, tiled layouts, chunk bounds.

    Returns (xp, pr, bnd):
      xp  (B, dg, HPAD*W, Cg)   channels-last input plane, rows zero-padded
      pr  (B, dg, NT, 8, KP)    f32 rows: hl, svl, svh, wl, fw, gl, gh
                                where svl/svh = mask*gate*(1-fh)/fh (the
                                vertical corner weights with modulation and
                                the tap gate folded in) and gl/gh are the
                                same without the mask (for grad_mask)
      bnd (B, dg, NT, 2)        i32 per-tile [lo, hi) input-row-chunk bounds
    """
    p = plan
    B, dg, K = p.B, p.dg, p.K
    bh, bw = _base_grid(spec, (p.OH, p.OW), (p.H, p.W))
    bh = jnp.asarray(bh)
    bw = jnp.asarray(bw)

    off = offset.reshape(B, dg, K, 2, p.OH, p.OW).astype(jnp.float32)
    pos_h = bh[None, None] + off[:, :, :, 0]
    pos_w = bw[None, None] + off[:, :, :, 1]
    # Open-interval tap gate (deformable_conv.cu:78).
    gate = ((pos_h > -1.0) & (pos_h < float(p.H))
            & (pos_w > -1.0) & (pos_w < float(p.W)))
    hl = jnp.floor(pos_h)
    wl = jnp.floor(pos_w)
    fh = pos_h - hl
    fw = pos_w - wl
    gatef = gate.astype(jnp.float32)
    gl = gatef * (1.0 - fh)
    gh = gatef * fh
    if mask is not None:
        m = mask.reshape(B, dg, K, p.OH, p.OW).astype(jnp.float32)
        svl = gl * m
        svh = gh * m
    else:
        svl, svh = gl, gh

    def tile(a):  # (B, dg, K, OH, OW) -> (B, dg, NT, K*T*OW), OH padded
        a = jnp.pad(a, ((0, 0),) * 3 + ((0, p.OHP - p.OH), (0, 0)))
        a = a.reshape(B, dg, K, p.NT, p.T * p.OW)
        return a.transpose(0, 1, 3, 2, 4).reshape(B, dg, p.NT, p.KP)

    hl_t, svl_t, svh_t, wl_t, fw_t, gl_t, gh_t = map(
        tile, (hl, svl, svh, wl, fw, gl, gh))
    zero = jnp.zeros_like(hl_t)
    pr = jnp.stack([hl_t, svl_t, svh_t, wl_t, fw_t, gl_t, gh_t, zero],
                   axis=3)

    # Per-tile chunk bounds from the rows actually sampled (a tap is active
    # iff its gate passes and, for modulated ops, its mask is nonzero).
    act = (svl_t != 0.0) | (svh_t != 0.0)
    big = jnp.float32(1e9)
    row_lo = jnp.min(jnp.where(act, hl_t, big), axis=-1)
    row_hi = jnp.max(jnp.where(act, hl_t + 1.0, -big), axis=-1)
    lo = jnp.clip(row_lo, 0.0, float(p.HPAD - 1)).astype(jnp.int32) // p.CH
    hi = (jnp.clip(row_hi, 0.0, float(p.HPAD - 1)).astype(jnp.int32)
          // p.CH) + 1
    hi = jnp.minimum(hi, p.NCH)
    empty = ~jnp.any(act, axis=-1)
    lo = jnp.where(empty, 0, lo)
    hi = jnp.where(empty, 0, hi)
    bnd = jnp.stack([lo, hi], axis=-1)

    x_cl = x.reshape(B, dg, p.Cg, p.H, p.W).transpose(0, 1, 3, 4, 2)
    x_cl = jnp.pad(x_cl, ((0, 0), (0, 0), (0, p.HPAD - p.H), (0, 0), (0, 0)))
    xp = x_cl.reshape(B, dg, p.HPAD * p.W, p.Cg)
    return xp, pr, bnd


def _fwd_kernel(bnd_ref, pr_ref, x_ref, cols_ref, acc_ref, *, plan, cd, prec):
    p = plan
    b, d, t = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    lo = bnd_ref[b, d, t, 0]
    hi = bnd_ref[b, d, t, 1]
    pr = pr_ref[0, 0, 0]
    hl = pr[0:1]; svl = pr[1:2]; svh = pr[2:3]; wl = pr[3:4]; fw = pr[4:5]

    qi = jax.lax.broadcasted_iota(jnp.int32, (p.SCH, 1), 0)
    lqh = (qi // p.W).astype(jnp.float32)
    qw = (qi % p.W).astype(jnp.float32)
    # Horizontal factor is chunk-invariant: build once per tile.
    Ah = (jnp.where(qw == wl, 1.0 - fw, 0.0)
          + jnp.where(qw == wl + 1.0, fw, 0.0)).astype(cd)

    acc_ref[...] = jnp.zeros_like(acc_ref)

    def body(ci, _):
        q0r = ci * p.CH
        qh = lqh + q0r.astype(jnp.float32)
        Av = (jnp.where(qh == hl, svl, 0.0)
              + jnp.where(qh == hl + 1.0, svh, 0.0))
        A = Av.astype(cd) * Ah
        xc = x_ref[0, 0, pl.ds(q0r * p.W, p.SCH), :].astype(cd)
        acc_ref[...] += jax.lax.dot_general(
            A, xc, (((0,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(lo, hi, body, 0)
    cols_ref[0, 0, 0] = acc_ref[...].astype(cols_ref.dtype)


def _bwd_kernel(bnd_ref, pr_ref, x_ref, gcols_ref, gx_ref, gs_ref,
                sh_ref, *, plan, cd, prec):
    """Deterministic backward: grad_x via the transposed A contraction on
    the MXU (replaces the reference's atomicAdd scatter,
    deformable_conv.cu:268-283), grad_offset/grad_mask via the correlation
    matrix M = x @ gcols^T reduced against the analytic dA/dpos factors
    (deformable_conv.cu:281-283, mdeformable_conv.cu:295-315)."""
    p = plan
    b, d, t = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    lo = bnd_ref[b, d, t, 0]
    hi = bnd_ref[b, d, t, 1]
    pr = pr_ref[0, 0, 0]
    hl = pr[0:1]; svl = pr[1:2]; svh = pr[2:3]; wl = pr[3:4]; fw = pr[4:5]
    gl = pr[5:6]; gh = pr[6:7]

    qi = jax.lax.broadcasted_iota(jnp.int32, (p.SCH, 1), 0)
    lqh = (qi // p.W).astype(jnp.float32)
    qw = (qi % p.W).astype(jnp.float32)
    gcols = gcols_ref[0, 0, 0].astype(cd)            # (KP, Cg)

    # Chunk-invariant horizontal factors.
    eh0 = jnp.where(qw == wl, 1.0, 0.0)
    eh1 = jnp.where(qw == wl + 1.0, 1.0, 0.0)
    Ah = eh0 * (1.0 - fw) + eh1 * fw
    dAh = eh1 - eh0                                  # dA/dpos_w factor

    # Zero the full grad_x plane on this tile-loop's first visit.
    @pl.when(t == 0)
    def _():
        gx_ref[...] = jnp.zeros_like(gx_ref)

    sh_ref[...] = jnp.zeros_like(sh_ref)

    def body(ci, _):
        q0r = ci * p.CH
        qh = lqh + q0r.astype(jnp.float32)
        ev0 = jnp.where(qh == hl, 1.0, 0.0)
        ev1 = jnp.where(qh == hl + 1.0, 1.0, 0.0)
        Av = ev0 * svl + ev1 * svh                   # masked+gated vertical
        A = Av * Ah

        # grad_x[chunk] += A @ gcols      (deterministic MXU scatter)
        gxc = jax.lax.dot_general(
            A.astype(cd), gcols, (((1,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32)
        sl = pl.ds(q0r * p.W, p.SCH)
        gx_ref[0, 0, sl, :] += gxc

        # M[q, kp] = sum_c x[q, c] * gcols[kp, c]
        xc = x_ref[0, 0, sl, :].astype(cd)
        M = jax.lax.dot_general(
            xc, gcols, (((1,), (1,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32)

        t1 = Ah * M
        dAv = (ev1 - ev0) * (svl + svh)              # dA/dpos_h factor
        Avg = ev0 * gl + ev1 * gh                    # unmasked, gated
        sh_ref[0:1] += jnp.sum(dAv * t1, axis=0, keepdims=True)
        sh_ref[1:2] += jnp.sum(Av * dAh * M, axis=0, keepdims=True)
        sh_ref[2:3] += jnp.sum(Avg * t1, axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(lo, hi, body, 0)
    gs_ref[0, 0, 0] = sh_ref[...]


def _fwd_call(xp, pr, bnd, plan: _Plan, cd, prec):
    p = plan
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(p.B, p.dg, p.NT),
        in_specs=[
            pl.BlockSpec((1, 1, 1, 8, p.KP),
                         lambda b, d, t, *_: (b, d, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p.HPAD * p.W, p.Cg),
                         lambda b, d, t, *_: (b, d, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, p.KP, p.Cg),
                               lambda b, d, t, *_: (b, d, t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((p.KP, p.Cg), jnp.float32)],
    )
    cols_dtype = jnp.float32 if cd == jnp.float32 else jnp.bfloat16
    return pl.pallas_call(
        functools.partial(_fwd_kernel, plan=p, cd=cd, prec=prec),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((p.B, p.dg, p.NT, p.KP, p.Cg),
                                       cols_dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(bnd, pr, xp)


def _bwd_call(xp, pr, bnd, gcols_t, plan: _Plan, cd, prec):
    p = plan
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(p.B, p.dg, p.NT),
        in_specs=[
            pl.BlockSpec((1, 1, 1, 8, p.KP),
                         lambda b, d, t, *_: (b, d, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p.HPAD * p.W, p.Cg),
                         lambda b, d, t, *_: (b, d, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, p.KP, p.Cg),
                         lambda b, d, t, *_: (b, d, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, p.HPAD * p.W, p.Cg),
                         lambda b, d, t, *_: (b, d, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 8, p.KP),
                         lambda b, d, t, *_: (b, d, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((8, p.KP), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, plan=p, cd=cd, prec=prec),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((p.B, p.dg, p.HPAD * p.W, p.Cg),
                                 jnp.float32),
            jax.ShapeDtypeStruct((p.B, p.dg, p.NT, 8, p.KP), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(bnd, pr, xp, gcols_t)


def _untile(cols_t, plan: _Plan):
    """(B, dg, NT, KP, Cg) -> (B, dg, K, P, Cg), OH padding sliced off."""
    p = plan
    c = cols_t.reshape(p.B, p.dg, p.NT, p.K, p.T * p.OW, p.Cg)
    c = c.transpose(0, 1, 3, 2, 4, 5).reshape(
        p.B, p.dg, p.K, p.OHP, p.OW, p.Cg)
    return c[:, :, :, :p.OH].reshape(p.B, p.dg, p.K, p.OH * p.OW, p.Cg)


def _retile(g, plan: _Plan):
    """(B, dg, K, P, Cg) -> (B, dg, NT, KP, Cg): inverse of _untile."""
    p = plan
    g = g.reshape(p.B, p.dg, p.K, p.OH, p.OW, p.Cg)
    g = jnp.pad(g, ((0, 0),) * 3 + ((0, p.OHP - p.OH), (0, 0), (0, 0)))
    g = g.reshape(p.B, p.dg, p.K, p.NT, p.T * p.OW, p.Cg)
    return g.transpose(0, 1, 3, 2, 4, 5).reshape(
        p.B, p.dg, p.NT, p.KP, p.Cg)


def _unpack_s(gs, plan: _Plan):
    """(B, dg, NT, 8, KP) backward s-rows -> (B,dg,K,OH,OW) h/w/m grads."""
    p = plan

    def untile_row(r):
        a = gs[:, :, :, r].reshape(p.B, p.dg, p.NT, p.K, p.T * p.OW)
        a = a.transpose(0, 1, 3, 2, 4).reshape(p.B, p.dg, p.K, p.OHP, p.OW)
        return a[:, :, :, :p.OH]

    return untile_row(0), untile_row(1), untile_row(2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_columns(x, offset, mask, spec: DeformConvSpec, precision: str):
    """Deformable columns (B, dg, K, P, Cg) via the fused Pallas kernel.

    Differentiable in x / offset / mask with hand-written Pallas VJPs.
    `mask` may be a zero-size placeholder for the plain (DCNv1) op.
    """
    return _fused_columns_impl(x, offset, mask, spec, precision)


def _fused_columns_impl(x, offset, mask, spec, precision):
    cd, prec = _resolve(precision)
    plan = _Plan(spec, x.shape[0], x.shape[1], x.shape[2:],
                 spec.out_sizes(x.shape[2:]), x.dtype)
    m = mask if (mask is not None and mask.size) else None
    xp, pr, bnd = _prep(x, offset, m, spec, plan)
    cols_t = _fwd_call(xp, pr, bnd, plan, cd, prec)
    return _untile(cols_t, plan)


def _fused_columns_fwd(x, offset, mask, spec, precision):
    return _fused_columns_impl(x, offset, mask, spec, precision), \
        (x, offset, mask)


def _fused_columns_bwd(spec, precision, res, g):
    x, offset, mask = res
    cd, prec = _resolve(precision)
    plan = _Plan(spec, x.shape[0], x.shape[1], x.shape[2:],
                 spec.out_sizes(x.shape[2:]), x.dtype)
    p = plan
    m = mask if (mask is not None and mask.size) else None
    xp, pr, bnd = _prep(x, offset, m, spec, plan)
    gcols_t = _retile(g.astype(jnp.float32), plan)
    gxp, gs = _bwd_call(xp, pr, bnd, gcols_t, plan, cd, prec)

    # grad_x: un-pad, back to NCHW.
    gx = gxp.reshape(p.B, p.dg, p.HPAD, p.W, p.Cg)[:, :, :p.H]
    gx = gx.transpose(0, 1, 4, 2, 3).reshape(p.B, p.dg * p.Cg, p.H, p.W)
    gx = gx.astype(x.dtype)

    s_h, s_w, s_m = _unpack_s(gs, plan)
    goff = jnp.stack([s_h, s_w], axis=3).reshape(offset.shape)
    goff = goff.astype(offset.dtype)
    if m is None:
        gmask = jnp.zeros_like(mask) if mask is not None else None
    else:
        gmask = s_m.reshape(mask.shape).astype(mask.dtype)
    return gx, goff, gmask


fused_columns.defvjp(_fused_columns_fwd, _fused_columns_bwd)


def ineligible_reason(x, spec: DeformConvSpec) -> Optional[str]:
    """None if the fused kernel supports this config, else a reason."""
    if spec.ndim != 2:
        return "pallas kernel currently 2D-only"
    if x.dtype not in (jnp.float32, jnp.bfloat16, jnp.float16):
        return f"unsupported dtype {x.dtype}"
    if x.shape[1] % spec.deformable_groups:
        return "channels not divisible by deformable_groups"
    plan = _Plan(spec, x.shape[0], x.shape[1], x.shape[2:],
                 spec.out_sizes(x.shape[2:]), x.dtype)
    return plan.ineligible_reason()


def deform_conv2d_fused(x, offset, mask, weight, bias, spec: DeformConvSpec,
                        precision: str = "tensorfloat32"):
    """Full fused 2D deformable conv: Pallas columns + grouped MXU GEMM.

    Output matches the reference host pipeline (deformable_conv.cu:117-196):
    per-group GEMM out[g] = W[g] @ cols[g] plus bias broadcast."""
    B, C = x.shape[0], x.shape[1]
    OS = spec.out_sizes(x.shape[2:])
    P = math.prod(OS)
    K, g = spec.tap_count, spec.groups
    O = weight.shape[0]
    in_dtype = x.dtype

    if x.dtype == jnp.float16:
        x = x.astype(jnp.float32)
    mask_arr = mask if mask is not None else jnp.zeros((0,), x.dtype)
    cols = fused_columns(x, offset, mask_arr, spec, precision)
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
