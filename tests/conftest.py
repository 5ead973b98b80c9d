"""Test configuration: run everything on a virtual 8-device CPU mesh with
float64 enabled (DQMC needs f64; multi-chip sharding tests need >1 device).

Must run before jax is imported anywhere. NOTE: in this environment the
JAX_PLATFORMS env var is overridden by the TPU plugin — the config update
below is the reliable way to force the CPU backend.
"""

import os

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: the fast tier's wall time is dominated by
# jit compiles of ~100 distinct (shape, config) sweep variants (measured 874 s
# cold); with a warm cache repeated runs skip them, which is what the
# per-change `pytest -m "not slow"` loop actually needs. Code changes
# invalidate exactly the affected entries (the cache key hashes the HLO).
# Override the location with JAX_TEST_CACHE_DIR; disable with
# JAX_TEST_CACHE_DIR="".
_cache_dir = os.environ.get(
    "JAX_TEST_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_test_cache"))
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
