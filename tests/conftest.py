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
