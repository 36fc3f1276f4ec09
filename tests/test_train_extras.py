"""Checkpoint round-trip, 2-encoder FFHQ-DS steps, and CLI smoke test."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _scrubbed_env():
    """Truly-CPU env for subprocess CLIs: plain JAX_PLATFORMS=cpu is defeated
    by the axon sitecustomize's TPU plugin registration, so subprocesses
    would silently land on (and require) the real TPU tunnel."""
    sys.path.insert(0, REPO)
    try:
        from __graft_entry__ import scrubbed_cpu_env
    finally:
        sys.path.remove(REPO)
    return scrubbed_cpu_env(1)



def _tiny_cfg(**kw):
    from fm3dgan.train import TrainConfig

    base = dict(
        size=8,
        rec_batch=2,
        ds_batch=2,
        d_reg_every=2,
        g_reg_every=2,
        path_reg_batch_shrink=2,
        lpips_loss_lambda=0.0,
        face_id_loss_lambda=0.0,
        rec_face_reg_loss_lambda=0.0,
        ds_face_reg_loss_lambda=0.0,
        ep_face_reg_loss_lambda=0.0,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_checkpoint_roundtrip(tmp_path):
    from fm3dgan.train import Trainer

    trainer = Trainer(
        _tiny_cfg(), seed=0, use_lpips=False, use_arcface=False, input_size=128
    )
    rng = np.random.RandomState(0)
    photo = rng.uniform(-1, 1, (2, 128, 128, 3)).astype(np.float32)
    render = rng.uniform(-1, 1, (2, 128, 128, 3)).astype(np.float32)
    ref = rng.uniform(-1, 1, (2, 8, 8, 3)).astype(np.float32)
    trainer.train_iteration(0, photo, render, ref)

    ckpt_dir = str(tmp_path / "ckpt")
    os.makedirs(ckpt_dir)
    trainer.save_checkpoint(ckpt_dir, 1)

    # A fresh trainer restores the exact state.
    trainer2 = Trainer(
        _tiny_cfg(), seed=123, use_lpips=False, use_arcface=False, input_size=128
    )
    before = jax.tree.leaves(trainer2.state.params["g"])[0]
    trainer2.load_checkpoint(ckpt_dir, 1)
    for a, b in zip(
        jax.tree.leaves(jax.tree.map(np.asarray, trainer.state.params)),
        jax.tree.leaves(jax.tree.map(np.asarray, trainer2.state.params)),
    ):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(
        np.asarray(trainer.state.mean_path_length),
        np.asarray(trainer2.state.mean_path_length),
    )
    # The restore must actually have replaced the seed-123 init (different
    # seeds guarantee different initial leaves).
    assert not np.array_equal(
        np.asarray(before),
        np.asarray(jax.tree.leaves(trainer2.state.params["g"])[0]),
    )


@pytest.mark.slow
def test_2encoder_ffhq_ds_steps():
    from fm3dgan.models import Discriminator, Generator
    from fm3dgan.models.resnet_encoder import ResNet18Encoder
    from fm3dgan.train.state import make_d_optimizer
    from fm3dgan.train.steps_2encoder import make_2encoder_ffhq_ds_steps
    import optax

    cfg = _tiny_cfg()
    gen = Generator(size=8, style_dim=512, n_mlp=1)
    e_tsr = ResNet18Encoder(tensor_encoding=True)
    e_w = ResNet18Encoder(tensor_encoding=False)
    d_module = Discriminator(size=8)

    rng = np.random.RandomState(0)
    photo = jnp.asarray(rng.uniform(-1, 1, (2, 128, 128, 3)).astype(np.float32))
    r_edit = jnp.asarray(rng.uniform(-1, 1, (2, 128, 128, 3)).astype(np.float32))
    ffhq = jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 3)).astype(np.float32))
    g_ref = jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 3)).astype(np.float32))

    v_tsr = jax.jit(e_tsr.init)(jax.random.PRNGKey(0), photo)
    v_w = jax.jit(e_w.init)(jax.random.PRNGKey(1), photo)
    v_g = jax.jit(gen.init)(
        {"params": jax.random.PRNGKey(2), "noise": jax.random.PRNGKey(3)},
        jnp.zeros((1, 512)),
    )
    v_d = jax.jit(d_module.init)(jax.random.PRNGKey(4), ffhq)

    params = {
        "tensor_encoder": v_tsr["params"],
        "modulation_encoder": v_w["params"],
        "g": v_g["params"],
        "d_ffhq": v_d["params"],
    }
    stats = {
        "tensor_encoder": {"batch_stats": v_tsr["batch_stats"]},
        "modulation_encoder": {"batch_stats": v_w["batch_stats"]},
        "g": {"noises": v_g["noises"]},
    }
    g_enc_tx = optax.adam(1e-3)
    steps = make_2encoder_ffhq_ds_steps(
        e_tsr, e_w, gen, d_module, cfg, g_enc_tx,
        mod_encode="Render Image", co_modulation=None,
    )
    d_opt = make_d_optimizer(cfg).init(params["d_ffhq"])
    g_opt = g_enc_tx.init(
        {k: params[k] for k in ("g", "tensor_encoder", "modulation_encoder")}
    )

    params, stats, d_opt, m1 = steps["d_ffhq_step"](
        params, stats, d_opt, photo, r_edit, ffhq
    )
    assert np.isfinite(float(m1["d_ffhq"]))

    params, d_opt, m2 = steps["d_ffhq_reg_step"](params, d_opt, ffhq)
    assert np.isfinite(float(m2["r1_ffhq"]))

    params, stats, g_opt, fake, m3 = steps["g_ffhq_ds_step"](
        params, stats, g_opt, photo, r_edit, g_ref, {}
    )
    assert fake.shape == (2, 8, 8, 3)
    assert np.isfinite(float(m3["g_ffhq"]))


@pytest.mark.slow
def test_train_cli_smoke(tmp_path):
    env = _scrubbed_env()
    proc = subprocess.run(
        [
            sys.executable,
            "tools/train_3_encoder.py",
            "--fake_data",
            "--training_iters", "3",
            "--size", "8",
            "--input_size", "128",
            "--rec_batch", "2",
            "--ds_batch", "2",
            "--d_reg_every", "2",
            "--g_reg_every", "2",
            "--lpips_loss_lambda", "0",
            "--face_id_loss_lambda", "0",
            "--rec_face_reg_loss_lambda", "0",
            "--ds_face_reg_loss_lambda", "0",
            "--ep_face_reg_loss_lambda", "0",
            "--exp_dir", str(tmp_path / "exp"),
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=2400,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    log = (tmp_path / "exp" / "training_log.jsonl").read_text().strip()
    assert len(log.splitlines()) == 3


@pytest.mark.slow
def test_hmap_loss_wired():
    """Heatmap loss fires past hmap_iter_thres with a nonzero finite metric
    (reference gating: train_3_encoder.py:538-541)."""
    from fm3dgan.train import Trainer

    cfg = _tiny_cfg(hmap_loss_lambda=5.0, hmap_iter_thres=0, g_reg_every=100)
    trainer = Trainer(
        cfg, seed=0, use_lpips=False, use_arcface=False, input_size=128,
        # Depth-4 hourglass needs >=64px FAN input (spatial floor of 1 after
        # the stride-2 stem + 4 halvings).
        fan_input_size=64,
    )
    assert trainer.fan_module is not None
    rng = np.random.RandomState(0)
    photo = rng.uniform(-1, 1, (2, 128, 128, 3)).astype(np.float32)
    render = rng.uniform(-1, 1, (2, 128, 128, 3)).astype(np.float32)
    ref = rng.uniform(-1, 1, (2, 8, 8, 3)).astype(np.float32)

    # iter 0: not past threshold (strict >) -> hmap must be exactly 0.
    m0 = trainer.train_iteration(0, photo, render, ref)
    assert float(m0["hmap"]) == 0.0
    # iter 1: past threshold -> hmap fires, finite and nonzero.
    m1 = trainer.train_iteration(1, photo, render, ref)
    assert np.isfinite(float(m1["hmap"]))
    assert float(m1["hmap"]) > 0.0


@pytest.mark.slow
def test_seeded_run_determinism():
    """Two Trainers with the same seed produce identical metrics, including
    the PPL iteration whose batch subset is host-randomly chosen
    (train_3_encoder.py:568-570 -- now drawn from a seeded RNG)."""
    from fm3dgan.train import Trainer

    rng = np.random.RandomState(7)
    photo = rng.uniform(-1, 1, (4, 128, 128, 3)).astype(np.float32)
    render = rng.uniform(-1, 1, (4, 128, 128, 3)).astype(np.float32)
    ref = rng.uniform(-1, 1, (4, 8, 8, 3)).astype(np.float32)

    def run():
        cfg = _tiny_cfg(rec_batch=4, ds_batch=4, d_reg_every=1, g_reg_every=1)
        t = Trainer(
            cfg, seed=3, use_lpips=False, use_arcface=False, input_size=128
        )
        out = []
        for i in range(2):
            m = t.train_iteration(i, photo, render, ref)
            out.append({k: float(v) for k, v in m.items()
                        if hasattr(v, "item") or isinstance(v, float)})
        return out

    a, b = run(), run()
    for ma, mb in zip(a, b):
        for k in ma:
            assert ma[k] == mb[k], (k, ma[k], mb[k])


@pytest.mark.slow
def test_in_training_quant_eval_hook():
    """QuantEvalHook emits a scores record from the EMA stack
    (Sample_Eval_Save_Ckpt eval half, train_3_encoder.py:708-733)."""
    from fm3dgan.train import Trainer
    from fm3dgan.train.eval_hook import QuantEvalHook, make_fake_eval_batches

    trainer = Trainer(
        _tiny_cfg(), seed=0, use_lpips=False, use_arcface=False,
        input_size=128,
    )
    rec_fn, edit_fn = make_fake_eval_batches(128, batch=2, n_batches=1)
    hook = QuantEvalHook(trainer, rec_batches=rec_fn, edit_batches=edit_fn)
    rec = hook(0)
    assert rec["eval_step"] == 0
    assert np.isfinite(rec["recon_l1"])
    assert np.isfinite(rec["edit_face_regional"])
    # No ArcFace/LPIPS/Inception/FAN scorers -> NaN, not a crash.
    assert np.isnan(rec["recon_id_cosine"])
    assert np.isnan(rec["recon_lpips"])
    assert np.isnan(rec["edit_fid"])
    assert np.isnan(rec["edit_hmap"])


@pytest.mark.slow
@pytest.mark.parametrize(
    "co_mod", ["Multiplication", "Concatenation", "Tensor Transform"]
)
def test_trainer2_co_mod_full_iteration(co_mod, tmp_path):
    """All three co-modulation modes run D/R1/G/PPL/EMA through Trainer2,
    including path regularization (reference train.py:495-530 applies G_Reg
    to every 2-encoder config)."""
    from fm3dgan.train.loop2 import Trainer2

    cfg = _tiny_cfg(d_reg_every=1, g_reg_every=1)
    trainer = Trainer2(
        cfg, seed=0, co_modulation=co_mod,
        use_lpips=False, use_arcface=False, input_size=128,
    )
    rng = np.random.RandomState(0)
    photo = rng.uniform(-1, 1, (2, 128, 128, 3)).astype(np.float32)
    render = rng.uniform(-1, 1, (2, 128, 128, 3)).astype(np.float32)
    ref = rng.uniform(-1, 1, (2, 8, 8, 3)).astype(np.float32)

    ema0 = jax.tree.leaves(jax.tree.map(np.asarray, trainer.state["g_ema"]))
    m = trainer.train_iteration(0, photo, render, ref)
    for k in ("d", "g", "r1", "g_reg", "path_length"):
        assert np.isfinite(float(m[k])), (co_mod, k, m[k])
    ema1 = jax.tree.leaves(jax.tree.map(np.asarray, trainer.state["g_ema"]))
    assert any(not np.allclose(a, b) for a, b in zip(ema0, ema1))

    # Orbax round-trip.
    ckpt_dir = str(tmp_path / "ckpt")
    os.makedirs(ckpt_dir)
    trainer.save_checkpoint(ckpt_dir, 1)
    trainer2 = Trainer2(
        cfg, seed=99, co_modulation=co_mod,
        use_lpips=False, use_arcface=False, input_size=128,
    )
    trainer2.load_checkpoint(ckpt_dir, 1)
    for a, b in zip(
        jax.tree.leaves(jax.tree.map(np.asarray, trainer.state["params"])),
        jax.tree.leaves(jax.tree.map(np.asarray, trainer2.state["params"])),
    ):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_train_cli_preemption(tmp_path):
    """SIGTERM mid-training -> flush + final checkpoint + exit 0, then a
    clean --resume_dir/--resume_step restart (the spot-TPU-VM preemption
    contract; the reference's only recovery is the periodic
    model_save_freq save, train_3_encoder.py:708-733)."""
    import json
    import signal
    import time

    env = _scrubbed_env()
    exp = tmp_path / "exp"
    common = [
        sys.executable, "tools/train_3_encoder.py",
        "--fake_data",
        "--size", "8", "--input_size", "128",
        "--rec_batch", "2", "--ds_batch", "2",
        "--d_reg_every", "2", "--g_reg_every", "2",
        "--lpips_loss_lambda", "0", "--face_id_loss_lambda", "0",
        "--rec_face_reg_loss_lambda", "0", "--ds_face_reg_loss_lambda", "0",
        "--ep_face_reg_loss_lambda", "0",
        "--log_every", "1",
        "--exp_dir", str(exp),
    ]
    proc = subprocess.Popen(
        common + ["--training_iters", "100"],
        cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    log = exp / "training_log.jsonl"
    deadline = time.time() + 2400
    try:
        while time.time() < deadline:
            if proc.poll() is not None:
                out, err = proc.communicate()
                raise AssertionError(
                    f"CLI exited early rc={proc.returncode}:\n"
                    f"{out[-2000:]}\n{err[-2000:]}"
                )
            if log.exists() and len(log.read_text().strip().splitlines()) >= 2:
                break
            time.sleep(2)
        else:
            raise AssertionError("no training iterations within deadline")
        proc.send_signal(signal.SIGTERM)
        out, err = proc.communicate(timeout=600)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, out[-2000:] + err[-2000:]
    assert "[preempt] checkpoint saved at iter" in out, out[-2000:]

    recs = [json.loads(ln) for ln in log.read_text().strip().splitlines()]
    pre = [r for r in recs if "preempted_at" in r]
    assert len(pre) == 1
    step = pre[0]["preempted_at"]
    # Every iteration up to the preemption point was flushed before exit.
    iters = sorted(r["iter"] for r in recs if "iter" in r)
    assert iters == list(range(step + 1))
    assert (exp / "ckpt" / f"{step:06d}").exists()
    assert (exp / "ckpt" / f"{step:06d}.json").exists()

    # Resume continues from step+1 without error (warm compile cache).
    proc2 = subprocess.run(
        common + [
            "--training_iters", str(step + 3),
            "--resume_dir", str(exp / "ckpt"), "--resume_step", str(step),
        ],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=2400,
    )
    assert proc2.returncode == 0, (
        proc2.stdout[-2000:] + proc2.stderr[-2000:]
    )
    recs = [json.loads(ln) for ln in log.read_text().strip().splitlines()]
    iters = sorted(r["iter"] for r in recs if "iter" in r)
    assert iters[-1] == step + 2


@pytest.mark.slow
def test_edit_cli(tmp_path):
    """tools/edit.py serves (photo, render) -> edited image from a Trainer
    checkpoint (the Forward_Inference_3_Encoder production flow)."""
    from PIL import Image

    from fm3dgan.train import Trainer

    trainer = Trainer(
        _tiny_cfg(), seed=0, use_lpips=False, use_arcface=False,
        input_size=128,
    )
    ckpt_dir = str(tmp_path / "ckpt")
    os.makedirs(ckpt_dir)
    trainer.save_checkpoint(ckpt_dir, 1)

    rng = np.random.RandomState(0)
    photo_p = str(tmp_path / "photo.png")
    render_p = str(tmp_path / "render.png")
    for pth in (photo_p, render_p):
        Image.fromarray(
            rng.randint(0, 255, (128, 128, 3), np.uint8)
        ).save(pth)

    env = _scrubbed_env()
    out_dir = tmp_path / "edited"
    proc = subprocess.run(
        [
            sys.executable, "tools/edit.py",
            "--ckpt_dir", ckpt_dir, "--step", "1",
            "--photo", photo_p, "--render", render_p,
            "--out_dir", str(out_dir), "--grid",
        ],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=2400,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    out = out_dir / "photo__render.png"
    assert out.exists()
    img = np.asarray(Image.open(out))
    assert img.shape == (8, 8, 3)  # generator size of the tiny config
    assert (out_dir / "photo__render_grid.png").exists()


@pytest.mark.slow
def test_export_model_cli_roundtrip(tmp_path):
    """tools/export_model.py serializes the serving forward via jax.export
    and the artifact reproduces the live forward (--verify) — the AOT
    deployment path replacing the reference's torch.save pickles."""
    from fm3dgan.train import Trainer

    trainer = Trainer(
        _tiny_cfg(), seed=0, use_lpips=False, use_arcface=False,
        input_size=128,
    )
    ckpt_dir = str(tmp_path / "ckpt")
    os.makedirs(ckpt_dir)
    trainer.save_checkpoint(ckpt_dir, 1)

    env = _scrubbed_env()
    out = tmp_path / "model.shlo"
    proc = subprocess.run(
        [
            sys.executable, "tools/export_model.py",
            "--ckpt_dir", ckpt_dir, "--step", "1",
            "--out", str(out), "--batch", "2", "--verify",
        ],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=2400,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "verify OK" in proc.stdout, proc.stdout[-2000:]
    assert out.stat().st_size > 0


@pytest.mark.slow
def test_shared_forward_fused_matches_unfused():
    """share_dg_noise fast path: the fused shared-forward step (ONE generator
    forward reused for the D and G updates via jax.vjp pullback) must match
    the unfused dispatch sequence with the same shared RNG — identical math,
    only op ordering differs.  (face_reg/hmap stay off: the tiny config's
    render resolution differs from the generator size, which those losses —
    like the reference's — require to match.)"""
    from fm3dgan.train import Trainer

    rng = np.random.RandomState(11)
    photo = rng.uniform(-1, 1, (4, 128, 128, 3)).astype(np.float32)
    render = rng.uniform(-1, 1, (4, 128, 128, 3)).astype(np.float32)
    ref = rng.uniform(-1, 1, (4, 8, 8, 3)).astype(np.float32)

    def run(fused):
        cfg = _tiny_cfg(
            rec_batch=4, ds_batch=4, d_reg_every=1, g_reg_every=1,
            share_dg_noise=True,
            # fuse_r1_iters so the fused=True run really takes the fused
            # path on this R1+PPL iteration (the default demotes it).
            fuse_r1_iters=True,
        )
        t = Trainer(
            cfg, seed=5, use_lpips=False, use_arcface=False, input_size=128
        )
        m = t.train_iteration(0, photo, render, ref, fused=fused)
        return t, {
            k: float(v)
            for k, v in m.items()
            if hasattr(v, "item") or isinstance(v, float)
        }

    t_fused, m_fused = run(True)
    t_unfused, m_unfused = run(False)
    for k in ("d", "g", "l1", "ref_score", "out_score"):
        assert abs(m_fused[k] - m_unfused[k]) <= 1e-3 * max(
            1.0, abs(m_unfused[k])
        ), (k, m_fused[k], m_unfused[k])
    for k in ("r1", "g_reg"):
        assert abs(m_fused[k] - m_unfused[k]) <= 1e-2 * max(
            1.0, abs(m_unfused[k])
        ), (k, m_fused[k], m_unfused[k])
    import jax
    from jax.flatten_util import ravel_pytree

    fa, _ = ravel_pytree(jax.device_get(t_fused.state.params["g"]))
    fb, _ = ravel_pytree(jax.device_get(t_unfused.state.params["g"]))
    # Identical math up to fp op ordering; Adam sign flips on near-zero-grad
    # coordinates bound the worst case at a few update magnitudes.
    assert float(np.max(np.abs(fa - fb))) <= 5e-3


@pytest.mark.slow
def test_trainer2_shared_forward_fused_matches_unfused():
    """2-encoder share_dg_noise fast path (steps_2encoder.py::
    fused_shared_iteration_step): the one-dispatch shared-forward iteration
    must match the unfused dispatch sequence with the same shared RNG —
    identical math, only op ordering differs (≙ the 3-encoder test above).
    fuse_img_equiv_limit=0 forces the unfused fallback, which consumes the
    identical key stream (keys are drawn up-front in the loop)."""
    from fm3dgan.train.loop2 import Trainer2

    rng = np.random.RandomState(7)
    photo = rng.uniform(-1, 1, (4, 128, 128, 3)).astype(np.float32)
    render = rng.uniform(-1, 1, (4, 128, 128, 3)).astype(np.float32)
    ref = rng.uniform(-1, 1, (4, 8, 8, 3)).astype(np.float32)

    def run(limit):
        cfg = _tiny_cfg(
            rec_batch=4, ds_batch=4, d_reg_every=1, g_reg_every=1,
            share_dg_noise=True, fuse_r1_iters=True,
            fuse_img_equiv_limit=limit,
        )
        t = Trainer2(
            cfg, seed=3, use_lpips=False, use_arcface=False, input_size=128
        )
        m = t.train_iteration(0, photo, render, ref)
        return t, {
            k: float(v)
            for k, v in m.items()
            if hasattr(v, "item") or isinstance(v, float)
        }

    t_fused, m_fused = run(16)
    t_unfused, m_unfused = run(0)
    for k in ("d", "g", "l1", "ref_score", "out_score"):
        assert abs(m_fused[k] - m_unfused[k]) <= 1e-3 * max(
            1.0, abs(m_unfused[k])
        ), (k, m_fused[k], m_unfused[k])
    for k in ("r1", "g_reg"):
        assert abs(m_fused[k] - m_unfused[k]) <= 1e-2 * max(
            1.0, abs(m_unfused[k])
        ), (k, m_fused[k], m_unfused[k])
    from jax.flatten_util import ravel_pytree

    fa, _ = ravel_pytree(jax.device_get(t_fused.state["params"]["g"]))
    fb, _ = ravel_pytree(jax.device_get(t_unfused.state["params"]["g"]))
    assert float(np.max(np.abs(fa - fb))) <= 5e-3


def test_shared_forward_fused_matches_unfused_tiny():
    """Unmarked (non-slow) fused-parity smoke: the only always-on coverage
    for the fused shared-forward fast path (the full-width variant above is
    slow-marked).  width_mult=1/16 + fast_init collapse compile time, and
    the compared iteration is reg-free (no R1/PPL grad-of-grad — their
    double-backward compile alone doubles the test's cost; the slow-marked
    variant covers them).  Parity semantics are width-independent."""
    from fm3dgan.train import Trainer

    rng = np.random.RandomState(11)
    photo = rng.uniform(-1, 1, (4, 128, 128, 3)).astype(np.float32)
    render = rng.uniform(-1, 1, (4, 128, 128, 3)).astype(np.float32)
    ref = rng.uniform(-1, 1, (4, 8, 8, 3)).astype(np.float32)

    def run(fused):
        cfg = _tiny_cfg(
            rec_batch=4, ds_batch=4, d_reg_every=3, g_reg_every=3,
            share_dg_noise=True,
            width_mult=1 / 16, latent=32, n_mlp=2,
        )
        t = Trainer(
            cfg, seed=5, use_lpips=False, use_arcface=False,
            input_size=128, fast_init=True,
        )
        # Iteration 1: no R1 (1 % 3 != 0 after iter 0... d_reg fires at 0),
        # no PPL — the fused program is the shared-forward D+G+EMA one.
        m = t.train_iteration(1, photo, render, ref, fused=fused)
        return t, {
            k: float(v)
            for k, v in m.items()
            if hasattr(v, "item") or isinstance(v, float)
        }

    t_fused, m_fused = run(True)
    t_unfused, m_unfused = run(False)
    for k in ("d", "g", "l1", "ref_score", "out_score"):
        assert abs(m_fused[k] - m_unfused[k]) <= 1e-3 * max(
            1.0, abs(m_unfused[k])
        ), (k, m_fused[k], m_unfused[k])
    from jax.flatten_util import ravel_pytree

    fa, _ = ravel_pytree(jax.device_get(t_fused.state.params["g"]))
    fb, _ = ravel_pytree(jax.device_get(t_unfused.state.params["g"]))
    assert float(np.max(np.abs(fa - fb))) <= 5e-3


def test_uint8_input_path_matches_float():
    """The uint8 wire path (uint8 batches + steps._norm_input on-device
    normalize) must be bit-identical to pre-normalized f32 batches:
    (u8/255)*2-1 is exactly datasets.default_transform's math, so one
    seeded iteration from the same init must produce identical metrics and
    updated params."""
    from fm3dgan.train import Trainer

    rng = np.random.RandomState(23)
    photo_u8 = rng.randint(0, 256, (4, 128, 128, 3), dtype=np.uint8)
    render_u8 = rng.randint(0, 256, (4, 128, 128, 3), dtype=np.uint8)
    ref_u8 = rng.randint(0, 256, (4, 8, 8, 3), dtype=np.uint8)
    to_f32 = lambda a: a.astype(np.float32) * (2.0 / 255.0) - 1.0

    def run(photo, render, ref):
        cfg = _tiny_cfg(
            rec_batch=4, ds_batch=4, d_reg_every=3, g_reg_every=3,
            share_dg_noise=True, width_mult=1 / 16, latent=32, n_mlp=2,
        )
        t = Trainer(
            cfg, seed=5, use_lpips=False, use_arcface=False,
            input_size=128, fast_init=True,
        )
        m = t.train_iteration(1, photo, render, ref, fused=True)
        return t, {k: float(v) for k, v in m.items()
                   if hasattr(v, "item") or isinstance(v, float)}

    t_u8, m_u8 = run(photo_u8, render_u8, ref_u8)
    t_f32, m_f32 = run(to_f32(photo_u8), to_f32(render_u8), to_f32(ref_u8))
    for k in ("d", "g", "l1", "ref_score", "out_score"):
        assert abs(m_u8[k] - m_f32[k]) <= 1e-5 * max(1.0, abs(m_f32[k])), (
            k, m_u8[k], m_f32[k]
        )
    from jax.flatten_util import ravel_pytree

    fa, _ = ravel_pytree(jax.device_get(t_u8.state.params["g"]))
    fb, _ = ravel_pytree(jax.device_get(t_f32.state.params["g"]))
    assert float(np.max(np.abs(fa - fb))) <= 1e-5


def test_trainer2_uint8_input_path_matches_float():
    """Trainer2's step programs also accept uint8 batches (device-side
    normalize, steps_2encoder imports steps._norm_input) — one seeded
    iteration must match the pre-normalized f32 run exactly."""
    from fm3dgan.train.loop2 import Trainer2

    rng = np.random.RandomState(7)
    photo_u8 = rng.randint(0, 256, (2, 128, 128, 3), dtype=np.uint8)
    render_u8 = rng.randint(0, 256, (2, 128, 128, 3), dtype=np.uint8)
    ref_u8 = rng.randint(0, 256, (2, 8, 8, 3), dtype=np.uint8)
    to_f32 = lambda a: a.astype(np.float32) * (2.0 / 255.0) - 1.0

    def run(photo, render, ref):
        cfg = _tiny_cfg(d_reg_every=3, g_reg_every=3)
        t = Trainer2(
            cfg, seed=0, co_modulation="Multiplication",
            use_lpips=False, use_arcface=False, input_size=128,
        )
        m = t.train_iteration(1, photo, render, ref)
        return t, {k: float(v) for k, v in m.items()
                   if hasattr(v, "item") or isinstance(v, float)}

    t_u8, m_u8 = run(photo_u8, render_u8, ref_u8)
    t_f32, m_f32 = run(to_f32(photo_u8), to_f32(render_u8), to_f32(ref_u8))
    for k in ("d", "g", "l1"):
        assert abs(m_u8[k] - m_f32[k]) <= 1e-5 * max(1.0, abs(m_f32[k])), (
            k, m_u8[k], m_f32[k]
        )
