"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip hardware is not available in CI; sharding tests run on
``xla_force_host_platform_device_count=8`` CPU devices (the SURVEY §4 test
plan's replacement for the reference's nonexistent distributed tests).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# torch (used only as a test oracle) deadlocks XLA-CPU's threadpool on
# single-core boxes unless OpenMP is pinned to one thread.
os.environ.setdefault("OMP_NUM_THREADS", "1")
# NB: the 8-virtual-device flag is NOT set globally — on small hosts it makes
# XLA-CPU compilation pathologically slow.  Sharding tests (test_sharding.py)
# spawn a subprocess with xla_force_host_platform_device_count=8.

import jax  # noqa: E402

# The env var alone is NOT enough in this container: /root/.axon_site's
# sitecustomize force-registers the axon TPU PJRT plugin at interpreter
# start, which overrides JAX_PLATFORMS.  The config override below wins even
# after that registration (verified), so "CPU" tests really run on CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Single-core CI box: persist compiled executables across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/fm3dgan_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
