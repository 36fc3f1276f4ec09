"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip hardware is not available in CI; sharding tests run on
``xla_force_host_platform_device_count=8`` CPU devices (the SURVEY §4 test
plan's replacement for the reference's nonexistent distributed tests).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
