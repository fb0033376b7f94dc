"""Test configuration: CPU backend with 8 virtual devices.

Multi-device sharding paths are tested on a simulated 8-device CPU mesh
(``--xla_force_host_platform_device_count``), per SURVEY.md section 4.

Note: the platform override must go through ``jax.config`` (not just the
``JAX_PLATFORMS`` env var) because the environment's TPU plugin force-selects
its platform at interpreter startup.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# The suite is compile-dominated (many small jitted graphs per test file);
# a persistent compilation cache makes repeat runs fast.
os.makedirs("/root/.cache/jax_lqg_tests", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_lqg_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture
def x64():
    """Run a test in float64 for tight oracle comparisons."""
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", False)
