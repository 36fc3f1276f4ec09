"""Multi-device data-parallel tests.

Runs the full training iteration on an 8-virtual-device CPU mesh in a
subprocess (the xla_force_host_platform_device_count flag must be set before
JAX initializes, and it globally slows compilation, so it is confined here).
This is the SURVEY.md §4(d) replacement for the reference's nonexistent
distributed tests.
"""

import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_dryrun_multichip_8_devices():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["OMP_NUM_THREADS"] = "1"
    # Fresh compile-cache namespace is fine; the subprocess shares the cache.
    proc = subprocess.run(
        [sys.executable, "__graft_entry__.py", "multichip", "8"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=3000,
    )
    assert proc.returncode == 0, proc.stdout + "\n" + proc.stderr
    assert "dryrun_multichip OK on 8 devices" in proc.stdout, proc.stdout
