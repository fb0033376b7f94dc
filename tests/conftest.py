"""Test configuration: CPU backend with 8 virtual devices (default).

Multi-device sharding paths are tested on a simulated 8-device CPU mesh
(``--xla_force_host_platform_device_count``), per SURVEY.md section 4.

Set ``LQG_TPU_TEST_PLATFORM=tpu`` to run the suite against the real chip
instead (Pallas kernels then compile for TPU rather than running in
interpret mode); pair with ``-m tpu`` to select the on-chip kernel parity
tests.

Note: the platform override must go through ``jax.config`` (not just the
``JAX_PLATFORMS`` env var) because the environment's TPU plugin
force-selects its platform at interpreter startup.
"""

import os
import tempfile

_PLATFORM = os.environ.get("LQG_TPU_TEST_PLATFORM", "cpu")

if _PLATFORM == "cpu":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402

if _PLATFORM == "cpu":
    jax.config.update("jax_platforms", "cpu")

# The suite is compile-dominated (many small jitted graphs per test file);
# a persistent compilation cache makes repeat runs fast.  Fall back to a
# tmpdir (or no cache) when the preferred location is not writable.
for _cache_dir in (os.path.expanduser("~/.cache/jax_lqg_tests"),
                   os.path.join(tempfile.gettempdir(), "jax_lqg_tests")):
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        break
    except OSError:
        continue

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Skip ``tpu``-marked tests unless running against the real chip."""
    if jax.default_backend() == "tpu":
        return
    skip_tpu = pytest.mark.skip(
        reason="requires the TPU backend (LQG_TPU_TEST_PLATFORM=tpu)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip_tpu)


@pytest.fixture
def x64():
    """Run a test in float64 for tight oracle comparisons."""
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", False)
