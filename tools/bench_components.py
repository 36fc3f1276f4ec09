#!/usr/bin/env python3
"""Per-component device-time breakdown of the training step.

The XPlane trace (tools/profile_train.py) shows WHERE a step's time goes by
kernel, but attributing kernels to sub-networks by hand is error-prone.  This
tool times each sub-network of the G/D steps in isolation — forward and
forward+backward — so perf work can target the actual top cost, not a guess.

Components (production 3-encoder config, train_3_encoder.py:448-533):
  enc       E_Tsr + E_W + E_W+ forward (train-mode batch stats)
  gen       Generator forward from (latent, tensor)
  full      encoders + generator composed (the fake-image producer)
  d         Discriminator forward
  lpips     LPIPS(fake, ref) mean distance
  arcface   Face-ID loss (gray+pool + ResNetFace18 embedding distance)
  *_bwd     same, plus gradients (params for trainables; input image for
            frozen nets — training only needs their input cotangent)

  python tools/bench_components.py --batch 16 --size 256 --dtype bfloat16
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fm3dgan_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _sync(x):
    """Force completion via a host read (block_until_ready is a no-op over
    the axon tunnel — see .claude/skills/verify/SKILL.md)."""
    leaves = jax.tree.leaves(x)
    return float(jnp.sum(leaves[0].astype(jnp.float32)))


def _time(fn, *args, warmup=2, iters=5):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    from fm3dgan.train import TrainConfig, Trainer
    from fm3dgan.train.steps import _encode, _generate, forward_full
    from fm3dgan.losses.recon import face_identity_loss

    cfg = TrainConfig(
        size=args.size,
        rec_batch=args.batch,
        ds_batch=args.batch,
        compute_dtype=args.dtype,
    )
    tr = Trainer(cfg, seed=0, fast_init=True)
    models, d_module = tr.models, tr.d_module
    params = tr.state.params
    stats = tr.state.stats
    frozen = tr.frozen

    rng = np.random.RandomState(0)
    s = args.size
    mk_img = lambda: jnp.asarray(
        rng.uniform(-1, 1, (args.batch, s, s, 3)).astype(np.float32)
    )
    photo, render, ref = mk_img(), mk_img(), mk_img()
    noise_rng = jax.random.PRNGKey(7)

    # ---- component callables (jitted; params passed as args) ----
    @jax.jit
    def enc_fwd(params, stats, photo, render):
        t, l, _ = _encode(models, params, stats, photo, render, cfg, True)
        return t, l

    @jax.jit
    def enc_bwd(params, stats, photo, render):
        def f(p):
            t, l, _ = _encode(models, p, stats, photo, render, cfg, True)
            return jnp.sum(t.astype(jnp.float32)) + jnp.sum(
                l.astype(jnp.float32)
            )
        return jax.grad(f)(params)

    tensor0, latent0 = enc_fwd(params, stats, photo, render)
    tensor0 = jax.lax.stop_gradient(tensor0)
    latent0 = jax.lax.stop_gradient(latent0)

    @jax.jit
    def gen_fwd(params, stats, latent, tensor):
        return _generate(models, params, stats, latent, tensor, cfg, noise_rng)

    @jax.jit
    def gen_bwd(params, stats, latent, tensor):
        def f(p):
            img = _generate(models, p, stats, latent, tensor, cfg, noise_rng)
            return jnp.sum(img.astype(jnp.float32))
        return jax.grad(f)(params)

    @jax.jit
    def full_fwd(params, stats, photo, render):
        img, _ = forward_full(
            models, params, stats, photo, render, cfg, noise_rng, True
        )
        return img

    @jax.jit
    def full_bwd(params, stats, photo, render):
        def f(p):
            img, _ = forward_full(
                models, p, stats, photo, render, cfg, noise_rng, True
            )
            return jnp.sum(img.astype(jnp.float32))
        return jax.grad(f)(params)

    fake = jax.lax.stop_gradient(full_fwd(params, stats, photo, render))

    @jax.jit
    def d_fwd(d_params, img):
        return d_module.apply({"params": d_params}, img)

    @jax.jit
    def d_bwd(d_params, img):
        return jax.grad(
            lambda p: jnp.sum(
                d_module.apply({"params": p}, img).astype(jnp.float32)
            )
        )(d_params)

    @jax.jit
    def d_in_grad(d_params, img):
        """dD/d(img): the piece the G step pays for its GAN loss."""
        return jax.grad(
            lambda x: jnp.sum(
                d_module.apply({"params": d_params}, x).astype(jnp.float32)
            )
        )(img)

    results = {}
    results["enc_fwd"] = _time(enc_fwd, params, stats, photo, render,
                               iters=args.iters)
    results["enc_fwd_bwd"] = _time(enc_bwd, params, stats, photo, render,
                                   iters=args.iters)
    results["gen_fwd"] = _time(gen_fwd, params, stats, latent0, tensor0,
                               iters=args.iters)
    results["gen_fwd_bwd"] = _time(gen_bwd, params, stats, latent0, tensor0,
                                   iters=args.iters)
    results["full_fwd"] = _time(full_fwd, params, stats, photo, render,
                                iters=args.iters)
    results["full_fwd_bwd"] = _time(full_bwd, params, stats, photo, render,
                                    iters=args.iters)
    results["d_fwd"] = _time(d_fwd, params["d"], fake, iters=args.iters)
    results["d_fwd_bwd"] = _time(d_bwd, params["d"], fake, iters=args.iters)
    results["d_in_grad"] = _time(d_in_grad, params["d"], fake,
                                 iters=args.iters)

    if tr.lpips_module is not None:
        lpips_module = tr.lpips_module

        @jax.jit
        def lpips_fwd(frozen, a, b):
            return jnp.mean(lpips_module.apply(frozen["lpips"], a, b))

        @jax.jit
        def lpips_in_grad(frozen, a, b):
            return jax.grad(
                lambda x: jnp.mean(
                    lpips_module.apply(frozen["lpips"], x, b)
                ).astype(jnp.float32)
            )(a)

        results["lpips_fwd"] = _time(lpips_fwd, frozen, fake, ref,
                                     iters=args.iters)
        results["lpips_in_grad"] = _time(lpips_in_grad, frozen, fake, ref,
                                         iters=args.iters)

    if tr.arcface_module is not None:
        arc = tr.arcface_module

        @jax.jit
        def arc_fwd(frozen, a, b):
            return face_identity_loss(
                a, b, lambda x: arc.apply(frozen["arcface"], x),
                cfg.face_id_loss_type,
            )

        @jax.jit
        def arc_in_grad(frozen, a, b):
            return jax.grad(
                lambda x: face_identity_loss(
                    x, b, lambda y: arc.apply(frozen["arcface"], y),
                    cfg.face_id_loss_type,
                ).astype(jnp.float32)
            )(a)

        results["arcface_fwd"] = _time(arc_fwd, frozen, fake, ref,
                                       iters=args.iters)
        results["arcface_in_grad"] = _time(arc_in_grad, frozen, fake, ref,
                                           iters=args.iters)

    out = {
        "batch": args.batch,
        "size": args.size,
        "dtype": args.dtype,
        "ms": {k: round(v * 1e3, 2) for k, v in results.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
