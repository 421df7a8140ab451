"""Per-device-kind kernel plan constants (VERDICT r2 item 5).

The r2 kernels hardcoded VMEM budgets and the shiftblend/gathermm dispatch
crossover from measurements on one chip (TPU v5 lite).  This module keys
them on `jax.devices()[0].device_kind` instead: every budget is expressed
as the r2-measured fraction of the v5e's physical VMEM and scaled to the
current chip, with a conservative fallback for unknown kinds and env-var
overrides for tuning — the moral equivalent of the reference's editable
CUDA_NUM_THREADS / MAX_GRID_NUM launch knobs (config.h:32-33, README.md
"Speed Optimization"), resolved at runtime instead of compile time.

Env overrides (bytes unless noted):
  MDC_VMEM_BYTES       physical VMEM assumed for the chip
  MDC_SB_CROSSOVER     shiftblend-vs-gathermm dispatch crossover (channels
                       per deformable group; dimensionless)
  MDC_LANE_BUDGET      gathermm K*P_tile lane budget (lanes)
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional

_MB = 1024 * 1024

# Physical VMEM per core by device kind (public figures; see the TPU
# sections of jax-ml.github.io/scaling-book).  Matching is by normalized
# substring of `device_kind`, first hit wins.
_VMEM_TABLE = (
    ("v6", 128 * _MB),       # Trillium
    ("v5 lite", 128 * _MB),  # v5e (this repo's measured baseline chip)
    ("v5e", 128 * _MB),
    ("v5p", 128 * _MB),
    ("v5", 128 * _MB),
    ("v4", 128 * _MB),
    ("v3", 32 * _MB),
    ("v2", 32 * _MB),
)
_FALLBACK_VMEM = 32 * _MB    # unknown kind: assume the smallest table entry
_BASE_VMEM = 128 * _MB       # the v5e baseline all r2 fractions refer to


@dataclasses.dataclass(frozen=True)
class DeviceProfile:
    """Resolved plan constants for one device kind.

    Budget fields preserve the r2-measured v5e ratios (shiftblend.py /
    gathermm.py r2 constants), scaled by vmem_bytes/128MB."""
    kind: str
    vmem_bytes: int
    sb_crossover_cg: int     # dispatch: shiftblend when Cg <= this
    lane_budget: int         # gathermm KP lane budget

    def _scaled(self, v5e_bytes: int) -> int:
        return int(v5e_bytes * (self.vmem_bytes / _BASE_VMEM))

    @property
    def sb_vmem_limit(self) -> int:          # was 117MB on v5e
        return self._scaled(117 * _MB)

    @property
    def sb_x_resident_budget(self) -> int:   # was 48MB on v5e
        return self._scaled(48 * _MB)

    @property
    def gm_vmem_limit(self) -> int:          # was 100MB on v5e
        return self._scaled(100 * _MB)

    @property
    def gm_x_plane_budget(self) -> int:      # was 40MB on v5e
        return self._scaled(40 * _MB)

    @property
    def gm_a_chunk_budget(self) -> int:      # was 2MB on v5e
        return max(self._scaled(2 * _MB), 256 * 1024)


def _env_int(name: str, default: int) -> int:
    v = os.environ.get(name)
    return int(v) if v else default


def _lookup_vmem(kind: str) -> int:
    norm = kind.lower().replace("tpu", "").strip()
    for sub, bytes_ in _VMEM_TABLE:
        if sub in norm:
            return bytes_
    return _FALLBACK_VMEM


def _load_profile_file(kind: str) -> dict:
    """Calibrated constants for `kind` from the MDC_PROFILE json written
    by `python -m modulated_deform_conv_tpu.calibrate` (r5).  Explicit
    MDC_* env overrides still win over the file."""
    path = os.environ.get("MDC_PROFILE")
    if not path or not os.path.exists(path):
        return {}
    try:
        import json
        with open(path) as f:
            return json.load(f).get(kind, {})
    except Exception:
        return {}


@functools.lru_cache(maxsize=None)
def _profile_for_kind(kind: str) -> DeviceProfile:
    filed = _load_profile_file(kind)
    vmem = _env_int("MDC_VMEM_BYTES",
                    filed.get("vmem_bytes") or _lookup_vmem(kind))
    return DeviceProfile(
        kind=kind,
        vmem_bytes=vmem,
        # The Cg<=128 crossover is a v5e VPU-vs-MXU balance measurement
        # (benchmarks/suite_results.json r2); calibrate.py scales it by
        # the measured MXU/VPU ratio for new kinds (MDC_PROFILE), and the
        # env override wins over both.
        sb_crossover_cg=_env_int("MDC_SB_CROSSOVER",
                                 filed.get("sb_crossover_cg") or 128),
        lane_budget=_env_int("MDC_LANE_BUDGET",
                             filed.get("lane_budget") or 4608),
    )


def current_profile(kind: Optional[str] = None) -> DeviceProfile:
    """Plan constants for the current (or named) device kind.

    Off-TPU (CPU tests / interpreter mode) the v5e baseline profile is
    returned so plans are identical to what the TPU path would build."""
    if kind is None:
        import jax
        if jax.default_backend() == "tpu":
            kind = getattr(jax.devices()[0], "device_kind", "TPU v5 lite")
        else:
            kind = "TPU v5 lite"
    return _profile_for_kind(str(kind))
