#!/usr/bin/env python
"""Would per-z-plane c-bounds shrink the cfg3 planar sweep? (r5, VERDICT
r4 item 3b.)

The planar gathermm mode stores ONE [c_lo, c_hi) in-plane chunk range per
(tile, tap-group) applied across its whole [z_lo, z_hi) lead-plane range.
A per-z table (NCHP rectangles) would let each plane visit only its own
in-plane reach.  This probe computes BOTH sweep volumes exactly, in
numpy, from the same bounds math as gathermm._prep, on cfg3's benchmark
offset distribution (uniform +-2) and on sub-pixel offsets (uniform
+-0.75, the production regime) - measuring the best case for the
per-z idea before building it.

Output: swept (z, chunk) iteration counts, single-rectangle vs per-z.
"""
import sys

sys.path.insert(0, "/root/repo")

import json
import math

import numpy as np


def analyze(S, OS, kernel, off_scale, PT_rows, SCH, KI, seed=0):
    nd = 3
    S0, S1, S2 = S
    plane = S1 * S2
    K = int(np.prod(kernel))
    rng = np.random.default_rng(seed)
    P = int(np.prod(OS))

    taps = np.stack(np.meshgrid(*[np.arange(k) for k in kernel],
                                indexing="ij"), 0).reshape(nd, K)
    ostride = [OS[1] * OS[2], OS[2], 1]
    flat = np.arange(P)
    base = np.stack([(flat // ostride[d]) % OS[d] - kernel[d] // 2
                     + taps[d][:, None] for d in range(nd)])  # (nd, K, P)
    off = rng.uniform(-off_scale, off_scale, (K, nd, P))
    pos = base + np.moveaxis(off, 1, 0)
    gate = np.ones((K, P), bool)
    for d in range(nd):
        gate &= (pos[d] > -1.0) & (pos[d] < S[d])
    low = np.floor(pos)

    # tiles: PT_rows whole dim-1 rows of one lead plane
    PT = PT_rows * OS[2]
    NT = P // PT
    K0 = K // KI
    NCHP = plane // SCH

    single = 0
    perz = 0
    for t in range(NT):
        sl = slice(t * PT, (t + 1) * PT)
        for kg in range(K0):
            ks = slice(kg * KI, (kg + 1) * KI)
            act = gate[ks, sl]
            if not act.any():
                continue
            l0 = low[0, ks, sl]
            lm = low[1, ks, sl] * S2 + low[2, ks, sl]
            z_lo = int(np.clip(l0[act].min(), 0, S0 - 1))
            z_hi = int(np.clip(l0[act].max() + 1, 0, S0 - 1)) + 1
            c_lo = int(np.clip(lm[act].min(), 0, plane - 1)) // SCH
            c_hi = int(np.clip(lm[act].max() + S2 + 1,
                               0, plane - 1)) // SCH + 1
            single += (z_hi - z_lo) * (c_hi - c_lo)
            # per-z: a lane's corners touch planes floor(z) and
            # floor(z)+1; its in-plane reach is the same for both.
            for z in range(z_lo, z_hi):
                zact = act & ((l0 == z) | (l0 == z - 1))
                if not zact.any():
                    continue
                czl = int(np.clip(lm[zact].min(), 0, plane - 1)) // SCH
                czh = int(np.clip(lm[zact].max() + S2 + 1,
                                  0, plane - 1)) // SCH + 1
                perz += czh - czl
    return single, perz


def main():
    out = {}
    for name, scale in (("bench_pm2", 2.0), ("subpixel_pm075", 0.75)):
        single, perz = analyze((16, 32, 32), (16, 32, 32), (3, 3, 3),
                               scale, PT_rows=8, SCH=128, KI=9)
        out[name] = {
            "single_rect_iters": single,
            "per_z_iters": perz,
            "reduction_pct": round(100 * (1 - perz / single), 1),
        }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
