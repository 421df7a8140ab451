"""Independent numpy scalar-loop oracle for deformable convolution.

Written directly from the semantics contract (SURVEY.md §2.4 / reference
deformable_conv.cu:36-85, deformable_conv3d.cu:54-119): explicit Python
loops over every output element and tap, no vectorization shared with the
package implementation.  Intentionally slow — use tiny shapes only.
"""
import itertools
import math

import numpy as np


def _multilinear(x_c, pos, sizes):
    """Sample one channel plane x_c (shape `sizes`) at fractional `pos`
    with out-of-range corners contributing zero."""
    nd = len(sizes)
    low = [int(math.floor(p)) for p in pos]
    frac = [p - l for p, l in zip(pos, low)]
    val = 0.0
    for corner in itertools.product((0, 1), repeat=nd):
        idx = tuple(l + c for l, c in zip(low, corner))
        if any(i < 0 or i > s - 1 for i, s in zip(idx, sizes)):
            continue
        w = 1.0
        for d in range(nd):
            w *= frac[d] if corner[d] else 1.0 - frac[d]
        val += w * x_c[idx]
    return val


def deform_conv_nd_np(x, offset, mask, weight, bias, stride, padding,
                      dilation, groups, deformable_groups):
    """x (B,C,*S); offset (B, dg*nd*K, *OS); mask (B, dg*K, *OS) or None;
    weight (O, C/g, *k); bias (O,) or None.  Returns (B, O, *OS) float64."""
    x = np.asarray(x, np.float64)
    offset = np.asarray(offset, np.float64)
    weight = np.asarray(weight, np.float64)
    B, C = x.shape[:2]
    S = x.shape[2:]
    nd = len(S)
    kernel = weight.shape[2:]
    K = int(np.prod(kernel))
    O = weight.shape[0]
    g, dg = groups, deformable_groups
    OS = tuple((S[d] + 2 * padding[d] - (dilation[d] * (kernel[d] - 1) + 1))
               // stride[d] + 1 for d in range(nd))
    off = offset.reshape((B, dg, K, nd) + OS)
    m = None if mask is None else np.asarray(mask, np.float64).reshape(
        (B, dg, K) + OS)

    cols = np.zeros((B, C, K) + OS)  # sampled (and modulated) values
    taps = list(itertools.product(*[range(k) for k in kernel]))
    for b in range(B):
        for c in range(C):
            dgi = c // (C // dg)
            for f, tap in enumerate(taps):
                for out_idx in itertools.product(*[range(o) for o in OS]):
                    pos = [out_idx[d] * stride[d] - padding[d]
                           + tap[d] * dilation[d]
                           + off[(b, dgi, f, d) + out_idx]
                           for d in range(nd)]
                    # open-interval tap gate (-1, S_d)
                    if any(p <= -1 or p >= S[d] for d, p in enumerate(pos)):
                        v = 0.0
                    else:
                        v = _multilinear(x[b, c], pos, S)
                    if m is not None:
                        v *= m[(b, dgi, f) + out_idx]
                    cols[(b, c, f) + out_idx] = v

    out = np.zeros((B, O) + OS)
    Cg, Og = C // g, O // g
    w = weight.reshape((g, Og, Cg, K))
    for b in range(B):
        for gi in range(g):
            for oi in range(Og):
                acc = np.zeros(OS)
                for ci in range(Cg):
                    for f in range(K):
                        acc += w[gi, oi, ci, f] * cols[b, gi * Cg + ci, f]
                out[b, gi * Og + oi] = acc
    if bias is not None:
        out += np.asarray(bias, np.float64).reshape((1, O) + (1,) * nd)
    return out
