"""Test configuration: CPU backend with a virtual 8-device mesh + float64.

Differential tests compare against the C MuJoCo engine (pip ``mujoco``) in
double precision — the MJX test strategy (reference
``mjx/mujoco/mjx/_src/smooth_test.py`` et al.).  Multi-chip sharding tests
run on 8 virtual CPU devices via ``xla_force_host_platform_device_count``.
"""

import os

# Must run before jax initializes its backends.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
  os.environ["XLA_FLAGS"] = (
      flags + " --xla_force_host_platform_device_count=8"
  ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# minutes-scale CI gate: `pytest -m fast` runs the core-parity modules only
_FAST_MODULES = {
    "test_forward", "test_smooth", "test_constraint", "test_humanoid",
}


def pytest_collection_modifyitems(config, items):
  for item in items:
    mod = getattr(item, "module", None)
    if mod is not None and mod.__name__ in _FAST_MODULES:
      item.add_marker(pytest.mark.fast)

# The container's sitecustomize imports jax (registering the remote TPU
# backend) before this file runs, so the env var alone is not enough.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite is dominated by XLA compiles of
# the step/solver graphs; caching them makes repeat runs (CI, driver) fast.
# MI_NO_COMPILE_CACHE=1 disables it (debugging aid: the CPU AOT
# deserialization path of some jaxlib builds can be unstable).
if not os.environ.get("MI_NO_COMPILE_CACHE"):
  jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
  jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
