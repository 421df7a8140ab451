"""Test harness config: force the CPU backend with 8 virtual devices.

The container registers an 'axon' TPU-tunnel PJRT plugin from
sitecustomize.py that ignores JAX_PLATFORMS, so the env var alone is not
enough — we must flip jax_platforms after import, before any backend use.
Tests run on a simulated 8-device CPU mesh (SURVEY.md §4 plan item 5).
"""
import os

_flag = "--xla_force_host_platform_device_count=8"
if _flag not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " " + _flag).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


import pytest  # noqa: E402

# The smoke lane (VERDICT r2 item 8): a curated <60s selection — analytic
# goldens, the numpy-oracle first cases, the tiny per-kernel parities in
# test_smoke.py (marked at module level), and the cheap infra tests.
_SMOKE_NODES = (
    "test_golden.py",
    "test_device_profile.py",
    "test_counters.py::test_halo_counter_zero_without_spatial_sharding",
    "test_parity_np.py::test_parity_2d[(1, 2, 3, (6, 5), 3, 1, 1, 1, 1, 1,"
    " False)]",
    "test_parity_np.py::test_parity_3d[(1, 2, 2, (4, 4, 4), 3, 1, 1, 1, 1,"
    " 1, False)]",
    "test_sharding.py::test_required_halo",
    "test_behavior.py::test_effective_step_gcd",
    "test_behavior.py::test_shape_validation_errors",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        rel = item.nodeid.split("tests/")[-1]
        if any(rel == n or rel.startswith(n + "::") for n in _SMOKE_NODES):
            item.add_marker(pytest.mark.smoke)
