"""One-shot knob autotune (utils/autotune.py): picks a variant, caches it
per (device_kind, key), respects MDC_AUTOTUNE_CACHE, and the SCH=-2
double-the-heuristic sentinel resolves inside the gathermm plan."""
import json

import jax.numpy as jnp
import numpy as np
import pytest

from modulated_deform_conv_tpu.ops.pallas import gathermm as gm
from modulated_deform_conv_tpu.utils import autotune
from modulated_deform_conv_tpu.utils.config import DeformConvSpec


def test_sch_double_sentinel_resolves_in_plan():
    spec = DeformConvSpec.make(2, 3, 1, 1, 1, 1, 1, 64, True)
    base = gm._Plan(spec, 2, 32, (28, 28), (28, 28), jnp.float32)
    saved = gm._SCH_OVERRIDE
    try:
        gm._SCH_OVERRIDE = -2
        doubled = gm._Plan(spec, 2, 32, (28, 28), (28, 28), jnp.float32)
    finally:
        gm._SCH_OVERRIDE = saved
    assert doubled.SCH == min(2 * base.SCH, doubled.SPAD)
    assert doubled.ineligible_reason() is None


def test_autotune_picks_and_caches(tmp_path, monkeypatch):
    cache = tmp_path / "tune.json"
    monkeypatch.setenv("MDC_AUTOTUNE_CACHE", str(cache))
    autotune._CACHE.clear()
    calls = {"n": 0}

    def fn():
        calls["n"] += 1
        # fake op: make the {} variant "slower" deterministically by
        # observing the live override (no TPU needed)
        import time
        if gm._SCH_OVERRIDE == 0:
            time.sleep(0.02)
        return np.zeros(())

    best = autotune.autotune_sch(fn, key="unit", reps=1)
    assert best == {"SCH": -2}
    assert gm._SCH_OVERRIDE == -2
    gm._SCH_OVERRIDE = 0
    n_after_first = calls["n"]

    # cached: second call must not re-time, and must re-apply the winner
    best2 = autotune.autotune_sch(fn, key="unit", reps=1)
    assert best2 == best and calls["n"] == n_after_first
    assert gm._SCH_OVERRIDE == -2
    gm._SCH_OVERRIDE = 0

    # disk cache survives a fresh in-process cache
    autotune._CACHE.clear()
    best3 = autotune.autotune_sch(fn, key="unit", reps=1)
    assert best3 == best and calls["n"] == n_after_first
    gm._SCH_OVERRIDE = 0
    data = json.loads(cache.read_text())
    assert any(k.endswith("::unit") for k in data)
