"""Core N-d deformable convolution in pure JAX/XLA (TPU-native formulation).

This is the canonical implementation of all four ops of the reference
(deform_conv2d / modulated_deform_conv2d / deform_conv3d /
modulated_deform_conv3d — /root/reference/src/*.cu), re-designed for TPU:

* channels-last internally (channels on the 128-lane axis),
* the offset-driven bilinear/trilinear gather is a batched `take_along_axis`
  over a flattened spatial axis (XLA gather, deterministic),
* mask modulation and corner weighting are fused elementwise ops,
* the grouped contraction is a single `dot_general` (einsum) that XLA tiles
  onto the MXU — there is no host-side chunk loop and no atomics,
* the backward pass is JAX autodiff of this forward: the VJP of the gather
  is a deterministic scatter-add, and the analytic ∂bilinear/∂offset and
  grad_mask = Σ grad_col·val forms (reference deformable_conv.cu:281-283,
  mdeformable_conv.cu:315) fall out exactly.

Semantics contract reproduced from the reference (SURVEY.md §2.4):

* sample position per output point o, tap f=(i..), dim d:
    pos_d = o_d*stride_d - pad_d + i_d*dilation_d + offset[d, f]
  (reference deformable_conv.cu:76-77);
* the whole tap is zeroed iff any pos_d <= -1 or pos_d >= S_d — the open
  interval gate (deformable_conv.cu:78);
* otherwise multilinear interpolation where out-of-image corners contribute
  zero (per-corner guards, deformable_conv.cu:17-28);
* modulated variants multiply the sampled value by a per-tap mask
  (mdeformable_conv.cu:83);
* input channel c uses deformable group c // (C / deformable_groups)
  (deformable_conv.cu:58, 96);
* offset channel layout per deformable group: ndim*f + d for tap f
  (deformable_conv.cu:70-73; deformable_conv3d.cu:101-103);
* grouped GEMM out[g] = W[g] @ cols[g] (deformable_conv.cu:174-180).
"""
from __future__ import annotations

import itertools
import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import DeformConvSpec

# Per-buffer budget for column intermediates (XLA buffers above ~2GB crash
# the TPU compiler); tests lower this to exercise the chunked paths.
_COL_BYTES_CAP = 1 << 30


def _base_positions(spec: DeformConvSpec, out_sizes: Tuple[int, ...]):
    """Sampling-grid base: (ndim, K, P) float32.

    base[d, f, p] = o_d(p)*stride_d - pad_d + i_d(f)*dilation_d  — the
    integer part of the sample position before the learned offset is added
    (reference deformable_conv.cu:59-60, 76-77).  Built from on-device
    iotas: a host constant would embed ndim*K*P floats into the compiled
    program (tens of MB for 3D volumes).
    """
    nd = spec.ndim
    K = spec.tap_count
    P = math.prod(out_sizes)
    taps = np.stack(np.meshgrid(*[np.arange(k) for k in spec.kernel],
                                indexing="ij"), axis=0).reshape(nd, K)
    ostride = [1] * nd
    for d in range(nd - 2, -1, -1):
        ostride[d] = ostride[d + 1] * out_sizes[d + 1]
    flat = jax.lax.iota(jnp.int32, P)
    rows = []
    for d in range(nd):
        out_d = ((flat // ostride[d]) % out_sizes[d]).astype(jnp.float32)
        tap_d = jnp.asarray(taps[d], jnp.float32)
        rows.append(out_d[None, :] * spec.stride[d] - spec.padding[d]
                    + tap_d[:, None] * spec.dilation[d])
    return jnp.stack(rows)


def deform_conv_columns(x: jax.Array, offset: jax.Array,
                        mask: Optional[jax.Array],
                        spec: DeformConvSpec,
                        out_sizes: Optional[Tuple[int, ...]] = None,
                        gate_bounds=None) -> jax.Array:
    """Offset-driven gather producing the (virtual) column tensor.

    Args:
      x:      (B, C, *S) input, NCHW-style layout at the API boundary.
      offset: (B, dg*ndim*K, *OS) learned fractional offsets.
      mask:   (B, dg*K, *OS) modulation scalars, or None.
      spec:   static op configuration.
      gate_bounds: optional per-dim (lo, hi) scalars (may be traced)
        replacing the default open-interval tap gate (-1, S_d).  Used by
        the sharding layer: its halo-extended local blocks must gate taps
        at the GLOBAL image border — the reference gate's subgradient is
        zero exactly at pos == -1 / pos == S (deformable_conv.cu:78),
        whereas a zero-filled halo row reproduces the value (zero) but
        not the zero offset-gradient.

    Returns:
      columns (B, P, C, K) in fp32 sampling precision cast back to x.dtype,
      where P = prod(OS).  Equivalent information to the reference's
      [C*K, step*OH*OW] scratch (deformable_conv.cu:157-158) but laid out
      channels-innermost-but-one for the TPU MXU contraction.
    """
    nd, dg = spec.ndim, spec.deformable_groups
    B, C = x.shape[0], x.shape[1]
    S = x.shape[2:]
    # out_sizes override: used by the sharding layer, whose halo-extended
    # local blocks are larger than the local output grid implies.
    OS = spec.out_sizes(S) if out_sizes is None else tuple(out_sizes)
    K, P = spec.tap_count, math.prod(OS)
    Cg = C // dg
    compute_dtype = x.dtype
    # Sampling precision: fp32, or the input precision if higher (x64 mode).
    acc = jnp.promote_types(jnp.float32, x.dtype)

    # Sample positions: base grid + offset, in fp32.
    base = _base_positions(spec, OS).transpose(1, 0, 2)   # (K, nd, P)
    off = offset.reshape(B, dg, K, nd, P).astype(acc)
    pos = base[None, None] + off                              # (B, dg, K, nd, P)

    # Open-interval tap gate (-1, S_d) per dim (deformable_conv.cu:78),
    # overridable per dim by the sharding layer (global-coordinate gate).
    gate = jnp.ones(pos.shape[:3] + pos.shape[4:], jnp.bool_)  # (B, dg, K, P)
    for d in range(nd):
        lo = -1.0 if gate_bounds is None else gate_bounds[d][0]
        hi = float(S[d]) if gate_bounds is None else gate_bounds[d][1]
        gate &= (pos[:, :, :, d] > lo) & (pos[:, :, :, d] < hi)

    low = jnp.floor(pos)
    frac = pos - low                                          # in [0, 1)
    ilow = low.astype(jnp.int32)

    # Flattened-spatial gather source: (B, S_flat, dg, Cg); channel c maps to
    # deformable group c // Cg, preserved by this contiguous split
    # (deformable_conv.cu:58).
    s_flat = math.prod(S)
    x_cl = jnp.moveaxis(x, 1, -1).reshape(B, s_flat, C).reshape(B, s_flat, dg, Cg)

    spatial_stride = np.ones(nd, np.int64)
    for d in range(nd - 2, -1, -1):
        spatial_stride[d] = spatial_stride[d + 1] * S[d + 1]

    val = jnp.zeros((B, K * P, dg, Cg), acc)
    # Static loop over the 2^nd interpolation corners (4 bilinear / 8
    # trilinear; reference deformable_conv.cu:17-28, deformable_conv3d.cu:21-45).
    for corner in itertools.product((0, 1), repeat=nd):
        w = jnp.ones(pos.shape[:3] + pos.shape[4:], acc)  # (B,dg,K,P)
        valid = jnp.ones_like(w, jnp.bool_)
        flat_idx = jnp.zeros_like(w, jnp.int32)
        for d in range(nd):
            idx_d = ilow[:, :, :, d] + corner[d]
            valid &= (idx_d >= 0) & (idx_d <= S[d] - 1)
            w = w * jnp.where(corner[d], frac[:, :, :, d], 1.0 - frac[:, :, :, d])
            flat_idx = flat_idx + jnp.clip(idx_d, 0, S[d] - 1) * int(spatial_stride[d])
        w = jnp.where(valid & gate, w, 0.0)
        # (B, dg, K, P) -> (B, K*P, dg) gather indices.
        gidx = flat_idx.transpose(0, 2, 3, 1).reshape(B, K * P, dg)
        v = jnp.take_along_axis(x_cl, gidx[..., None], axis=1)    # (B,K*P,dg,Cg)
        wq = w.transpose(0, 2, 3, 1).reshape(B, K * P, dg)[..., None]
        val = val + wq * v.astype(acc)

    if mask is not None:
        m = mask.reshape(B, dg, K, P).astype(acc)
        val = val * m.transpose(0, 2, 3, 1).reshape(B, K * P, dg)[..., None]

    # (B, K*P, dg, Cg) -> (B, P, C, K)
    cols = val.reshape(B, K, P, dg, Cg).transpose(0, 2, 3, 4, 1)
    cols = cols.reshape(B, P, C, K)
    return cols.astype(compute_dtype)


def _deform_conv_nd(x: jax.Array, offset: jax.Array, mask: Optional[jax.Array],
                    weight: jax.Array, bias: Optional[jax.Array],
                    spec: DeformConvSpec,
                    out_sizes: Optional[Tuple[int, ...]] = None,
                    precision: str = "tensorfloat32",
                    gate_bounds=None) -> jax.Array:
    """One un-chunked forward pass: columns gather + grouped MXU contraction."""
    B, C = x.shape[0], x.shape[1]
    OS = spec.out_sizes(x.shape[2:]) if out_sizes is None else tuple(out_sizes)
    P = math.prod(OS)
    K, g = spec.tap_count, spec.groups
    O = weight.shape[0]

    cols = deform_conv_columns(x, offset, mask, spec, OS,
                               gate_bounds=gate_bounds)    # (B, P, C, K)
    cols = cols.reshape(B, P, g, C // g, K)
    w = weight.reshape(g, O // g, C // g, K).astype(cols.dtype)
    # Grouped contraction == reference per-group addmm_ (deformable_conv.cu:176-180)
    # expressed as one batched dot_general for the MXU.
    acc = jnp.promote_types(jnp.float32, x.dtype)
    # precision="float32" forces exact fp32 MXU passes; the TPU default is
    # one bf16-multiply pass (torch-TF32-like).  Keeps the XLA path usable
    # as a float32 oracle on TPU.
    prec = (jax.lax.Precision.HIGHEST if precision == "float32"
            else jax.lax.Precision.DEFAULT)
    out = jnp.einsum("bpgck,gock->bpgo", cols, w, precision=prec,
                     preferred_element_type=acc)
    out = out.reshape(B, P, O)
    if bias is not None:
        out = out + bias.astype(acc)[None, None, :]
    out = out.astype(x.dtype)
    out = out.reshape((B,) + OS + (O,))
    return jnp.moveaxis(out, -1, 1)                        # (B, O, *OS)


def _row_chunked(x, offset, mask, weight, bias, spec: DeformConvSpec,
                 OS, nb0: int, precision: str = "tensorfloat32",
                 gate_bounds=None) -> jax.Array:
    """Evaluate the op in blocks of the leading output dim.

    Keeps the per-block column intermediate bounded for very large volumes
    (the reference's in_step chunking only helps along batch).  The block's
    local output grid is mapped to global coordinates by folding the block
    origin into the dim-0 offset channels (pos = o*s - pad + i*dil + off),
    exactly like the sharding layer's halo-block coordinate change.
    """
    nd = spec.ndim
    B = x.shape[0]
    blk0 = OS[0] // nb0
    blk_os = (blk0,) + tuple(OS[1:])
    K = spec.tap_count
    dg = spec.deformable_groups

    off_r = offset.reshape((B, dg * K, nd) + OS)
    ch_shift = jnp.zeros((dg * K, nd), offset.dtype).at[:, 0].set(1.0)
    ch_shift = ch_shift.reshape((1, dg * K, nd) + (1,) * nd)
    if mask is not None:
        mask_r = mask.reshape((B, dg * K) + OS)

    def block(i):
        o0 = i * blk0
        off_blk = jax.lax.dynamic_slice_in_dim(off_r, o0, blk0, axis=3)
        # Add the block-origin shift in float32: with bf16/f16 offsets the
        # shift (tens of rows) would otherwise quantize the sample position
        # (bf16 ulp is 0.25 at 32), diverging from the unchunked path.
        off_blk = (off_blk.astype(jnp.float32)
                   + ch_shift.astype(jnp.float32)
                   * jnp.float32(o0 * spec.stride[0]))
        off_blk = off_blk.reshape((B, dg * spec.ndim * K) + blk_os)
        m_blk = (jax.lax.dynamic_slice_in_dim(mask_r, o0, blk0, axis=2)
                 .reshape((B, dg * K) + blk_os) if mask is not None else None)
        # The block origin is folded into the offsets, so sample positions
        # stay GLOBAL — gate bounds pass through unshifted.
        return _deform_conv_nd(x, off_blk, m_blk, weight, bias, spec,
                               out_sizes=blk_os, precision=precision,
                               gate_bounds=gate_bounds)

    out = jax.lax.map(jax.checkpoint(block), jnp.arange(nb0))
    # (nb0, B, O, blk0, *rest) -> (B, O, OS0, *rest)
    out = jnp.moveaxis(out, 0, 2)
    return out.reshape((B, weight.shape[0]) + tuple(OS))


def deform_conv_nd(x: jax.Array, offset: jax.Array, mask: Optional[jax.Array],
                   weight: jax.Array, bias: Optional[jax.Array],
                   spec: DeformConvSpec,
                   out_sizes: Optional[Tuple[int, ...]] = None,
                   precision: str = "tensorfloat32",
                   gate_bounds=None) -> jax.Array:
    """Full forward with optional `in_step` micro-batch chunking.

    `in_step` is a pure memory knob: the effective chunk is
    gcd(batch, in_step) (reference config.h:43-60) and results are
    independent of it.  On TPU we express the chunk loop as `lax.map`
    over reshaped batch chunks, bounding the live column/gather
    intermediates the same way the reference bounds its `columns` scratch
    (deformable_conv.cu:157-158).
    """
    B = x.shape[0]
    step = math.gcd(B, spec.in_step) if spec.in_step > 0 else B
    # Cap the chunk so the per-chunk column intermediate stays well under
    # the ~2GB XLA buffer limit (in_step is a pure memory knob — results
    # are invariant, reference config.h:43-60).
    OS = spec.out_sizes(x.shape[2:]) if out_sizes is None else tuple(out_sizes)
    bytes_per_sample = (spec.tap_count * math.prod(OS) * x.shape[1]
                        * max(4, jnp.dtype(x.dtype).itemsize))
    cap = max(1, _COL_BYTES_CAP // bytes_per_sample)
    if bytes_per_sample > _COL_BYTES_CAP and out_sizes is None:
        # Even one sample's columns exceed the buffer budget: chunk the
        # leading output dim instead (covers very large 3D volumes).  The
        # whole batch runs per block, so size blocks for B*bytes.
        total = B * bytes_per_sample
        for nb0 in range(2, OS[0] + 1):
            if OS[0] % nb0 == 0 and total // nb0 <= _COL_BYTES_CAP:
                return _row_chunked(x, offset, mask, weight, bias, spec,
                                    OS, nb0, precision, gate_bounds)
        if bytes_per_sample // OS[0] > _COL_BYTES_CAP:
            # Even a single output row's columns exceed the buffer budget:
            # batch chunking below cannot help, and proceeding would hit
            # the compiler crash the cap guards against.  Fail fast.
            raise ValueError(
                "deformable-conv column intermediate too large even with "
                f"row chunking ({bytes_per_sample // OS[0]} bytes per "
                "output row); reduce the spatial extent or channel count")
    while step > cap or B % step:
        step -= 1
    if step >= B or step <= 0:
        return _deform_conv_nd(x, offset, mask, weight, bias, spec, out_sizes,
                               precision, gate_bounds)
    nb = B // step

    # Rematerialize per-chunk columns in the backward instead of saving
    # them — the reference makes the same tradeoff by recomputing columns
    # inside its gradient kernel (deformable_conv.cu:285).
    @jax.checkpoint
    def chunk(args):
        xc, oc, mc = args
        return _deform_conv_nd(xc, oc, mc, weight, bias, spec, out_sizes,
                               precision, gate_bounds)

    xs = x.reshape((nb, step) + x.shape[1:])
    offs = offset.reshape((nb, step) + offset.shape[1:])
    if mask is not None:
        ms = mask.reshape((nb, step) + mask.shape[1:])
    else:
        ms = jnp.zeros((nb, step, 0), x.dtype)  # placeholder, unused

    if mask is not None:
        out = jax.lax.map(chunk, (xs, offs, ms))
    else:
        out = jax.lax.map(
            jax.checkpoint(lambda a: _deform_conv_nd(
                a[0], a[1], None, weight, bias, spec, out_sizes, precision,
                gate_bounds)),
            (xs, offs))
    return out.reshape((B,) + out.shape[2:])
