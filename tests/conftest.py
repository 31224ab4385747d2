"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment pre-registers a tunneled TPU backend at interpreter start
(sitecustomize), so JAX_PLATFORMS env alone is not enough — force the CPU
platform via jax.config before any backend is instantiated.  The driver
validates multi-chip sharding the same way (see __graft_entry__.py); tests
must never require real TPU hardware.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compile cache: the suite is compile-bound on CPU
jax.config.update("jax_compilation_cache_dir", "/tmp/dynam3d_test_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# --- tiers: the full suite is compile-bound (>10 min cold); the quick tier
# (`pytest -m "not slow"`) skips the heavyweight end-to-end modules and
# finishes in a few minutes for inner-loop development.
_SLOW_MODULES = {
    "test_vln_loop",
    "test_reference_golden",
    "test_pretrain_loop",
    "test_recorded_replay",
    "test_e2e_slice",
    "test_checkpoint_parity",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavyweight end-to-end module (full-tier only)"
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__.split(".")[-1] in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
