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
