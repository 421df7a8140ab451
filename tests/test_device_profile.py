"""Device-keyed plan constants (utils/device.py; VERDICT r2 item 5): the
kernel budgets resolve per `device_kind` with a conservative fallback for
unknown chips, and env overrides take precedence."""
import pytest

from modulated_deform_conv_tpu.utils import device as dev
from modulated_deform_conv_tpu.ops.pallas import gathermm, shiftblend


def test_known_kinds_scale_from_v5e():
    v5e = dev.current_profile("TPU v5 lite")
    assert v5e.vmem_bytes == 128 * 1024 * 1024
    # r2-measured v5e values are reproduced exactly.
    assert v5e.sb_vmem_limit == 117 * 1024 * 1024
    assert v5e.sb_x_resident_budget == 48 * 1024 * 1024
    assert v5e.gm_vmem_limit == 100 * 1024 * 1024
    assert v5e.gm_x_plane_budget == 40 * 1024 * 1024
    assert v5e.gm_a_chunk_budget == 2 * 1024 * 1024
    assert v5e.sb_crossover_cg == 128
    assert v5e.lane_budget == 4608

    v3 = dev.current_profile("TPU v3")
    assert v3.vmem_bytes == 32 * 1024 * 1024
    # budgets shrink proportionally on a smaller-VMEM chip
    assert v3.sb_vmem_limit == v5e.sb_vmem_limit // 4
    assert v3.gm_x_plane_budget == v5e.gm_x_plane_budget // 4


def test_unknown_kind_falls_back_conservative():
    prof = dev.current_profile("TPU v99 hypothetical")
    assert prof.vmem_bytes == dev._FALLBACK_VMEM
    assert prof.sb_vmem_limit < dev.current_profile("TPU v5e").sb_vmem_limit


def test_env_overrides(monkeypatch):
    monkeypatch.setenv("MDC_VMEM_BYTES", str(64 * 1024 * 1024))
    monkeypatch.setenv("MDC_SB_CROSSOVER", "256")
    dev._profile_for_kind.cache_clear()
    try:
        prof = dev.current_profile("TPU v5 lite")
        assert prof.vmem_bytes == 64 * 1024 * 1024
        assert prof.sb_crossover_cg == 256
    finally:
        dev._profile_for_kind.cache_clear()


def test_kernel_modules_resolve_through_profile(monkeypatch):
    # Off-TPU (this test suite) the v5e baseline profile applies.
    assert shiftblend._vmem_limit() == 117 * 1024 * 1024
    assert gathermm._x_plane_budget() == 40 * 1024 * 1024
    # The module-level names remain as pinning overrides.
    monkeypatch.setattr(shiftblend, "_X_RESIDENT_BUDGET", 1234)
    assert shiftblend._x_resident_budget() == 1234
    monkeypatch.setattr(gathermm, "_LANE_BUDGET", 99)
    assert gathermm._lane_budget() == 99


def test_calibrate_derivation_and_profile_file(tmp_path, monkeypatch):
    """calibrate.derive scales the v5e constants by the measured MXU/VPU
    ratio and VMEM; utils/device.py loads the written MDC_PROFILE file
    (env overrides still win)."""
    import json
    from modulated_deform_conv_tpu import calibrate
    from modulated_deform_conv_tpu.utils import device

    # identical rates to the script's own v5e reference -> identical
    # constants
    p = calibrate.derive("TPU vX", calibrate._V5E_MXU_FLOPS,
                         calibrate._V5E_VPU_ELEMS, 128 * 1024 * 1024)
    assert p["sb_crossover_cg"] == 128
    assert p["lane_budget"] == 4608
    # 2x the MXU/VPU ratio -> crossover doubles (clamped multiple of 8)
    p2 = calibrate.derive("TPU vY", 2 * calibrate._V5E_MXU_FLOPS,
                          calibrate._V5E_VPU_ELEMS, 64 * 1024 * 1024)
    assert p2["sb_crossover_cg"] == 256
    assert p2["lane_budget"] == 4608 // 2

    path = tmp_path / "prof.json"
    path.write_text(json.dumps({"TPU vY": p2}))
    monkeypatch.setenv("MDC_PROFILE", str(path))
    device._profile_for_kind.cache_clear()
    prof = device.current_profile("TPU vY")
    assert prof.sb_crossover_cg == 256
    assert prof.lane_budget == 2304
    # explicit env override beats the file
    monkeypatch.setenv("MDC_SB_CROSSOVER", "64")
    device._profile_for_kind.cache_clear()
    assert device.current_profile("TPU vY").sb_crossover_cg == 64
    monkeypatch.delenv("MDC_SB_CROSSOVER")
    monkeypatch.delenv("MDC_PROFILE")
    device._profile_for_kind.cache_clear()
