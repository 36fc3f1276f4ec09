"""Training step smoke tests on a tiny stack (generator 8px, encoders 128px).

Covers the reference iteration cadence (train_3_encoder.py:779-822): D step,
R1 reg, G step (rec + DS + extreme lambda schedules), PPL reg, EMA; plus the
host-side data dispatch and schedule flags.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fm3dgan.train import TrainConfig, Trainer


@pytest.fixture(scope="module")
def trainer():
    cfg = TrainConfig(
        size=8,
        rec_batch=2,
        ds_batch=2,
        d_reg_every=2,
        g_reg_every=2,
        path_reg_batch_shrink=2,
        lpips_loss_lambda=0.0,
        face_id_loss_lambda=0.0,
        # encoder input (128px) and generator output (8px) sizes differ in
        # this tiny stack, so the render-vs-output face-regional loss is off.
        rec_face_reg_loss_lambda=0.0,
        ds_face_reg_loss_lambda=0.0,
        ep_face_reg_loss_lambda=0.0,
    )
    return Trainer(
        cfg, seed=0, use_lpips=False, use_arcface=False, input_size=128
    )


def _batch(seed, n=2, enc=128, gen=8):
    rng = np.random.RandomState(seed)
    photo = rng.uniform(-1, 1, (n, enc, enc, 3)).astype(np.float32)
    render = rng.uniform(-1, 1, (n, enc, enc, 3)).astype(np.float32)
    render[:, :16, :, :] = -1.0  # background region for the face-reg mask
    ref = rng.uniform(-1, 1, (n, gen, gen, 3)).astype(np.float32)
    return photo, render, ref


def test_schedule_flags():
    cfg = TrainConfig(ds_freq=2, ex_ds_freq=3)
    ds = [i for i in range(12) if cfg.is_ds_iter(i)]
    assert ds == [1, 3, 5, 7, 9, 11]
    ep = [i for i in range(24) if cfg.is_extreme_ds_iter(i)]
    # ds_count 2, 5, ... -> iters 5, 11, 17, 23 (train_3_encoder.py:783-789).
    assert ep == [5, 11, 17, 23]


def test_d_and_g_step(trainer):
    photo, render, ref = _batch(0)
    state0_d = jax.tree.map(np.asarray, trainer.state.params["d"])
    state0_g = jax.tree.map(np.asarray, trainer.state.params["g"])

    m = trainer.train_iteration(0, photo, render, ref)
    for k in ("d", "g", "l1", "face_reg", "r1", "g_reg"):
        assert np.isfinite(float(m[k])), (k, m[k])
    assert not m["ds_flag"]

    # D and G+encoder params must have moved.
    d_after = jax.tree.map(np.asarray, trainer.state.params["d"])
    g_after = jax.tree.map(np.asarray, trainer.state.params["g"])
    d_moved = any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(state0_d), jax.tree.leaves(d_after))
    )
    g_moved = any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(state0_g), jax.tree.leaves(g_after))
    )
    assert d_moved and g_moved

    # EMA must have moved towards the new generator.
    ema = jax.tree.leaves(jax.tree.map(np.asarray, trainer.state.g_ema_params))
    g0 = jax.tree.leaves(state0_g)
    assert any(not np.allclose(a, b) for a, b in zip(ema, g0))


def test_ds_and_extreme_steps(trainer):
    photo, render, ref = _batch(1)
    # iter 1 -> DS (uses D_edit with use_separate_d).
    m1 = trainer.train_iteration(1, photo, render, ref)
    assert m1["ds_flag"] and not m1["extreme_ds_flag"]
    assert np.isfinite(float(m1["d"]))
    # iter 5 -> extreme DS (lambda shrink + face-reg 100).
    m5 = trainer.train_iteration(5, photo, render, ref)
    assert m5["extreme_ds_flag"]
    assert np.isfinite(float(m5["g"]))


def test_data_loading_dispatch():
    from fm3dgan.data import RandomFakeData, data_loading

    rec = RandomFakeData(4, size=16, seed=0)
    ds = RandomFakeData(4, size=16, seed=1)
    ep = RandomFakeData(4, size=16, seed=2)

    g, r, ref = data_loading(rec, ds, ds_flag=False)
    np.testing.assert_array_equal(g, ref)

    g, r, ref = data_loading(rec, ds, ds_flag=True, extreme_loader=ep)
    # Swapped pairs: ref[0] is the photo of sample 1 etc.
    np.testing.assert_array_equal(ref[0], g[1])
    np.testing.assert_array_equal(ref[1], g[0])

    g2, r2, ref2 = data_loading(
        rec, ds, ds_flag=True, extreme_loader=ep, extreme_ds_flag=True
    )
    assert g2.shape[0] == 2  # even indices only (dataset.py:401-404)


def test_samplers():
    from fm3dgan.data import dual_supervision_indices, extreme_pose_indices

    rng = np.random.RandomState(0)
    idx = dual_supervision_indices(14, 7, rng)
    assert len(idx) == 28
    for j in range(0, 28, 2):
        a, b = idx[j], idx[j + 1]
        assert a // 7 == b // 7 and a != b  # same id, different variation

    idx = extreme_pose_indices(14, 7, rng)
    assert len(idx) == 4
    for j in range(0, 4, 2):
        assert idx[j] % 7 == 0  # normal pose
        assert idx[j + 1] // 7 == idx[j] // 7 and idx[j + 1] != idx[j]
