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
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    try:
        from __graft_entry__ import scrubbed_cpu_env
    finally:
        sys.path.remove(repo)
    # scrubbed_cpu_env strips the axon sitecustomize from PYTHONPATH and all
    # PALLAS_/AXON_/TPU_/JAX_ vars — plain JAX_PLATFORMS=cpu is defeated by
    # the TPU plugin registration and the subprocess lands on real hardware.
    for attempt in (1, 2):
        proc = subprocess.run(
            [sys.executable, "__graft_entry__.py", "multichip", "8",
             "--iters", "2", "--dp-check"],
            cwd=repo,
            env=scrubbed_cpu_env(8),
            capture_output=True,
            text=True,
            timeout=3000,
        )
        # Signal-kill (negative rc) = XLA-CPU's stuck-collective watchdog
        # aborting under host scheduler starvation (8 virtual devices on one
        # shared core) — retry once, warm from the compile cache.  Genuine
        # failures exit positive and are not retried.
        if proc.returncode >= 0 or attempt == 2:
            break
    assert proc.returncode == 0, proc.stdout + "\n" + proc.stderr
    assert "dryrun_multichip OK on 8 devices" in proc.stdout, proc.stdout
    assert "dp-correctness OK" in proc.stdout, proc.stdout


_SHARDED_EVAL_SCRIPT = """
import jax, numpy as np
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/fm3dgan_jax_cache_dryrun")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.default_backend() == "cpu" and len(jax.devices()) >= 8
from fm3dgan.parallel import create_mesh
from fm3dgan.eval.fid import make_sharded_feature_fn
from fm3dgan.models.inception import InceptionV3Pool3

mesh = create_mesh(8)
model = InceptionV3Pool3(resize_input=False)
rng = np.random.RandomState(0)
x = rng.uniform(-1, 1, (16, 75, 75, 3)).astype("float32")
variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
fn = make_sharded_feature_fn(lambda v, im: model.apply(v, im), mesh)
feats = np.asarray(fn(variables, x))
assert feats.shape == (16, 2048), feats.shape
ref = np.asarray(jax.jit(model.apply)(variables, x))
np.testing.assert_allclose(feats, ref, atol=1e-4, rtol=1e-4)
print("sharded-eval OK", feats.shape)

# get_model_fid_score's mesh path: batches that do NOT divide the mesh
# (10 on mesh(8)) must pad, extract, and trim — not crash on device_put
# divisibility.
from fm3dgan.eval.fid import make_mesh_feature_fn
mfn = make_mesh_feature_fn(
    lambda im: model.apply(variables, im), mesh
)
feats10 = np.asarray(mfn(x[:10]))
assert feats10.shape == (10, 2048), feats10.shape
np.testing.assert_allclose(feats10, ref[:10], atol=1e-4, rtol=1e-4)
print("mesh-feature-pad OK", feats10.shape)
"""


@pytest.mark.slow
def test_sharded_eval_feature_extraction_8_devices():
    """jax.lax.all_gather eval feature collection over the mesh — the
    TPU-native replacement for the reference's pickle-based all_gather
    (Miscellaneous/distributed.py:93-110), checked against the unsharded
    InceptionV3 pool3 features."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    try:
        from __graft_entry__ import scrubbed_cpu_env
    finally:
        sys.path.remove(repo)
    proc = subprocess.run(
        [sys.executable, "-c", _SHARDED_EVAL_SCRIPT],
        cwd=repo,
        env=scrubbed_cpu_env(8),
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert proc.returncode == 0, proc.stdout + "\n" + proc.stderr
    assert "sharded-eval OK" in proc.stdout, proc.stdout
    assert "mesh-feature-pad OK" in proc.stdout, proc.stdout
