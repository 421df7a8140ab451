"""One-shot micro-autotune for the gathermm plan knobs (VERDICT r2 item 5
— the runtime analog of the reference's edit-config.h-and-reinstall
CUDA_NUM_THREADS tuning, config.h:32-33 / README.md "Speed Optimization").

`autotune_sch(op_fn, args, variants)` times the op once per knob variant
on the current device and caches the winner per (device_kind, shape-key)
— in-process and optionally on disk (MDC_AUTOTUNE_CACHE=path).  It is
opt-in: dispatch never times anything behind the user's back; the plan
defaults come from the measured per-device-kind table (utils/device.py).

Typical use (see benchmarks/sweep_cfg5.py for the measurement series that
motivated the default variants):

    from modulated_deform_conv_tpu.utils import autotune
    best = autotune.autotune_sch(
        lambda: mdc.modulated_deform_conv2d(x, off, m, w, b, padding=1),
        key=f"c3_{x.shape}")
    # best = {"SCH": 112} — applied for subsequent calls in this process
"""
from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, Optional, Sequence

_CACHE: Dict[str, Dict[str, int]] = {}


def _cache_path() -> Optional[str]:
    return os.environ.get("MDC_AUTOTUNE_CACHE")


def _load_disk() -> Dict[str, Dict[str, int]]:
    path = _cache_path()
    if path and os.path.exists(path):
        try:
            with open(path) as f:
                return json.load(f)
        except Exception:
            return {}
    return {}


def _save_disk(cache: Dict[str, Dict[str, int]]) -> None:
    path = _cache_path()
    if path:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(cache, f, indent=2, sort_keys=True)
        os.replace(tmp, path)


def _device_key() -> str:
    import jax
    try:
        return str(getattr(jax.devices()[0], "device_kind", "cpu"))
    except Exception:  # pragma: no cover
        return "cpu"


def _apply(overrides: Dict[str, int]) -> None:
    from ..ops.pallas import gathermm as gm
    from ..ops.pallas import shiftblend as sb
    gm._SCH_OVERRIDE = int(overrides.get("SCH", 0))
    gm._PT_OVERRIDE = int(overrides.get("PT", 0))
    gm._K0_OVERRIDE = int(overrides.get("K0", 0))
    sb._BLK_OVERRIDE = int(overrides.get("SB_BLK", 0))


def _time_once(fn: Callable[[], object], reps: int = 3) -> float:
    import numpy as np
    out = fn()                                   # compile + warm
    np.asarray(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    return best


def _time_differenced(chain_builder: Callable[[int], Callable[[], object]],
                      reps: int, n_lo: int, n_hi: int) -> float:
    """Per-step time via chain differencing (bench.py:measure_amortized,
    VERDICT r4 item 4): wall-time a short and a long on-device chain of
    the SAME step and report (min(t_hi) - min(t_lo)) / (n_hi - n_lo).
    Differencing minima over several reps cancels both the ~30ms fixed
    tunnel dispatch latency and the multi-second slow windows that made
    the old whole-call 2-rep timing pick a 13%-worse variant once
    (suite r4) — it resolves sub-ms step deltas."""
    import numpy as np
    lo, hi = chain_builder(n_lo), chain_builder(n_hi)
    np.asarray(lo())                             # compile + warm
    np.asarray(hi())
    t_lo, t_hi = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(lo())
        t_lo.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(hi())
        t_hi.append(time.perf_counter() - t0)
    return max((min(t_hi) - min(t_lo)) / (n_hi - n_lo), 1e-9)


def autotune_sch(fn: Optional[Callable[[], object]], key: str,
                 variants: Sequence[Dict[str, int]] = (
                     {}, {"SCH": -2}),
                 reps: int = 3,
                 chain_builder: Optional[
                     Callable[[int], Callable[[], object]]] = None,
                 n_lo: int = 1, n_hi: int = 7) -> Dict[str, int]:
    """Pick the fastest plan-knob variant for the op and pin it.

    Timing modes:
      * `chain_builder(n) -> nullary` (preferred): builds an n-step
        on-device chain of the op under the CURRENT overrides; variants
        are compared on the chain-differenced per-step time (sub-ms
        resolution through the tunnel's dispatch latency and drift).
        The builder must construct a FRESH jitted chain per (variant, n)
        — jax's jit cache keys on shapes only, not module overrides.
      * `fn` (legacy): a nullary callable timed whole, min over `reps`.

    A variant is a dict of plan overrides (SCH/PT/K0 for gathermm,
    SB_BLK for shiftblend); `{"SCH": -2}` means "double the heuristic
    chunk size" (+10% on the ResNet c3 stage, benchmarks/sweep_cfg5.py).
    The winner is cached per (device_kind, key) in-process and in
    MDC_AUTOTUNE_CACHE when set, and left APPLIED on return.

    NOTE (scope): overrides are process-global module state consumed at
    TRACE time, not per-shape dispatch state.  Alternating two
    differently-tuned shapes in one process leaves the second running
    with the first's knobs unless you re-call autotune_sch (cached: just
    re-applies) or `reset()` between them.  This mirrors the reference's
    process-wide CUDA_NUM_THREADS constant (config.h:32); a per-shape
    override table is deliberately not maintained because jit caches by
    shape and would silently pin whichever override was live at first
    trace anyway.
    """
    from ..ops.pallas import gathermm as gm
    full_key = f"{_device_key()}::{key}"
    cached = _CACHE.get(full_key) or _load_disk().get(full_key)
    if cached is not None:
        _apply(cached)
        return cached

    from ..ops.pallas import shiftblend as sb
    saved = (gm._SCH_OVERRIDE, gm._PT_OVERRIDE, gm._K0_OVERRIDE,
             sb._BLK_OVERRIDE)
    best_t, best_v = float("inf"), {}
    try:
        for var in variants:
            _apply(var)     # SCH=-2 is resolved inside the plan (2x)
            try:
                if chain_builder is not None:
                    t = _time_differenced(chain_builder, reps, n_lo, n_hi)
                else:
                    t = _time_once(fn, reps)
            except Exception:
                # A variant may be uncompilable for this config (e.g.
                # SB_BLK=1024 at Cg > 64 crashes the TPU compiler) —
                # skip it rather than failing the whole tune.
                continue
            if t < best_t:
                best_t, best_v = t, dict(var)
    finally:
        (gm._SCH_OVERRIDE, gm._PT_OVERRIDE, gm._K0_OVERRIDE,
         sb._BLK_OVERRIDE) = saved
    _CACHE[full_key] = best_v
    disk = _load_disk()
    disk[full_key] = best_v
    _save_disk(disk)
    _apply(best_v)
    return best_v


def reset() -> None:
    """Clear all applied overrides (back to the per-device-kind plan
    defaults).  See the scope note in autotune_sch."""
    _apply({})
