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


def _host_cache_dir(base: str) -> str:
    """Key the persistent compile cache by host CPU features: XLA:CPU AOT
    entries compiled on a different machine model fail to load (machine-
    feature mismatch), so a shared dir wastes time and spams errors."""
    import hashlib

    try:
        flags = [l for l in open("/proc/cpuinfo") if l.startswith("flags")][0]
    except Exception:
        import platform

        flags = platform.processor() or "unknown"
    return f"{base}_{hashlib.sha1(flags.encode()).hexdigest()[:12]}"


# persistent compile cache: the suite is compile-bound on CPU
jax.config.update(
    "jax_compilation_cache_dir", _host_cache_dir("/tmp/dynam3d_test_xla_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# --- tiers: the full suite is compile-bound (the persistent cache only
# helps same-host reruns).  The quick tier (`pytest -m "not slow"`) is the
# core-correctness set — ~5 min cold on a typical multi-core host, ~12 min
# on a 1-core container.  Everything else (end-to-end drivers + compile-
# heavy integration modules) runs in the full tier.
_SLOW_MODULES = {
    # end-to-end drivers
    "test_vln_loop",
    "test_reference_golden",
    "test_closed_loop_golden",
    "test_pretrain_loop",
    "test_recorded_replay",
    "test_e2e_slice",
    "test_checkpoint_parity",
    # compile-heavy integration modules (measured on a 1-core host,
    # /tmp durations r4: parallel 266s, pallas_kernels 360s, spec_decode
    # 400s, vlm 122s, converters2 120s, policy_3dff 109s, pretrain 106s,
    # encoders 90s, vector_feed 42s, yolov8_seg 36s) — the quick tier
    # keeps the core-correctness set (update-parity, memory3d, geom, ops,
    # render, metrics, utils, datasets, parity-runway round-trips)
    "test_parallel",
    "test_pallas_kernels",
    "test_spec_decode",
    "test_vlm",
    "test_converters2",
    "test_policy_3dff",
    "test_pretrain",
    "test_encoders",
    "test_vector_feed",
    "test_yolov8_seg",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavyweight end-to-end module (full-tier only)"
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__.split(".")[-1] in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
