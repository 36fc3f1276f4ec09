#!/usr/bin/env python3
"""2-encoder training CLI — counterpart of the reference ``python3 train.py``
(/root/reference/train.py:833+): E_Tsr + one modulation encoder, optional
co-modulation, optional FFHQ-based dual supervision against a second
discriminator D_ffhq.

  python tools/train_2_encoder.py --fake_data --training_iters 6 --size 8 \
      --input_size 128 --exp_dir /tmp/exp2 [--co_mod Multiplication] \
      [--ds_dataset_type FFHQ]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from fm3dgan.train import TrainConfig

    p = argparse.ArgumentParser(description=__doc__)
    for f in dataclasses.fields(TrainConfig):
        flag = f"--{f.name}"
        if isinstance(f.default, bool):
            p.add_argument(flag, type=lambda s: s.lower() in ("1", "true", "yes"),
                           default=f.default)
        elif f.default is None or f.name == "w_plus_sliced_layer":
            p.add_argument(flag, type=str, default=None)
        elif isinstance(f.default, int):
            p.add_argument(flag, type=int, default=f.default)
        elif isinstance(f.default, float):
            p.add_argument(flag, type=float, default=f.default)
        else:
            p.add_argument(flag, type=str, default=f.default)
    p.add_argument("--exp_dir", default="./Exp2")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--input_size", type=int, default=None)
    p.add_argument("--fake_data", action="store_true")
    p.add_argument("--mod_encode", default="Render Image",
                   choices=["Render Image", "Photo Image"])
    p.add_argument("--co_mod", default=None,
                   choices=[None, "Multiplication", "Concatenation",
                            "Tensor Transform"])
    p.add_argument("--ds_dataset_type", default="Synthetic",
                   choices=["Synthetic", "FFHQ"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from fm3dgan.data import RandomFakeData, data_loading
    from fm3dgan.models import Discriminator, Generator
    from fm3dgan.models.psp_encoder import GradualStyleEncoder
    from fm3dgan.models.resnet_encoder import ResNet18Encoder
    from fm3dgan.train.state import make_d_optimizer
    from fm3dgan.train.steps_2encoder import (
        make_2encoder_ffhq_ds_steps,
        make_2encoder_step_fns,
    )
    import optax

    cfg_kwargs = {
        f.name: getattr(args, f.name) for f in dataclasses.fields(TrainConfig)
    }
    if isinstance(cfg_kwargs.get("w_plus_sliced_layer"), str):
        cfg_kwargs["w_plus_sliced_layer"] = tuple(
            int(x) for x in cfg_kwargs["w_plus_sliced_layer"].split(",")
        )
    if isinstance(cfg_kwargs.get("hmap_iter_thres"), str):
        cfg_kwargs["hmap_iter_thres"] = float(cfg_kwargs["hmap_iter_thres"])
    cfg = TrainConfig(**cfg_kwargs)
    input_size = args.input_size or cfg.size
    assert args.fake_data, "round-1 CLI supports --fake_data; real dirs next"

    # Modules: plain mode uses E_Tsr tensor + E_W vector; co-mod modes pair a
    # vector/tensor-transform encoder with a W+ encoder (train.py:391-430).
    style_dim = cfg.latent * (2 if args.co_mod in ("Concatenation",
                                                   "Tensor Transform") else 1)
    gen = Generator(size=cfg.size, style_dim=style_dim, n_mlp=cfg.n_mlp,
                    channel_multiplier=cfg.channel_multiplier)
    d_module = Discriminator(size=cfg.size,
                             channel_multiplier=cfg.channel_multiplier)
    if args.co_mod is None:
        e_tsr = ResNet18Encoder(tensor_encoding=True)
        e_mod = ResNet18Encoder(tensor_encoding=False)
    elif args.co_mod == "Tensor Transform":
        e_tsr = ResNet18Encoder(tensor_encoding=True, tensor_transform=True)
        e_mod = GradualStyleEncoder(
            n_styles=2 * int(math.log2(cfg.size)) - 2, input_size=input_size
        )
    else:
        e_tsr = ResNet18Encoder(tensor_encoding=False)
        e_mod = GradualStyleEncoder(
            n_styles=2 * int(math.log2(cfg.size)) - 2, input_size=input_size
        )

    key = jax.random.PRNGKey(args.seed)
    ks = jax.random.split(key, 6)
    img = jnp.zeros((1, input_size, input_size, 3))
    small = jnp.zeros((1, cfg.size, cfg.size, 3))
    v_tsr = jax.jit(e_tsr.init)(ks[0], img)
    v_mod = jax.jit(e_mod.init)(ks[1], img)
    v_g = jax.jit(gen.init)(
        {"params": ks[2], "noise": ks[3]}, jnp.zeros((1, style_dim))
    )
    v_d = jax.jit(d_module.init)(ks[4], small)
    v_d_ffhq = jax.jit(d_module.init)(ks[5], small)

    r = cfg.g_reg_ratio
    g_tx = optax.adam(cfg.lr * r, b1=0.0**r, b2=0.99**r, eps=1e-8)
    d_tx = make_d_optimizer(cfg)
    enc_params = {
        "g": v_g["params"],
        "tensor_encoder": v_tsr["params"],
        "modulation_encoder": v_mod["params"],
    }
    state = {
        "params": {**enc_params, "d": v_d["params"], "d_ffhq": v_d_ffhq["params"]},
        "stats": {
            "g": {k: v for k, v in v_g.items() if k != "params"},
            "tensor_encoder": {k: v for k, v in v_tsr.items() if k != "params"},
            "modulation_encoder": {
                k: v for k, v in v_mod.items() if k != "params"
            },
        },
        "g_ema": jax.tree.map(jnp.copy, v_g["params"]),
        "g_opt": g_tx.init(enc_params),
        "d_opt": d_tx.init(v_d["params"]),
        "d_ffhq_opt": d_tx.init(v_d_ffhq["params"]),
        "mean_path_length": jnp.zeros(()),
    }

    steps = make_2encoder_step_fns(
        e_tsr, e_mod, gen, d_module, cfg,
        mod_encode=args.mod_encode, co_modulation=args.co_mod,
    )
    ffhq_steps = None
    if args.ds_dataset_type == "FFHQ":
        ffhq_steps = make_2encoder_ffhq_ds_steps(
            e_tsr, e_mod, gen, d_module, cfg,
            g_tx, mod_encode=args.mod_encode, co_modulation=args.co_mod,
        )

    os.makedirs(args.exp_dir, exist_ok=True)
    log_path = os.path.join(args.exp_dir, "training_log.jsonl")
    rec = RandomFakeData(cfg.rec_batch, input_size, seed=1)
    ds = RandomFakeData(cfg.ds_batch, input_size, seed=2)
    ffhq = RandomFakeData(cfg.ds_batch, cfg.size, seed=3)
    rng = np.random.RandomState(args.seed)

    def downref(x):
        if x.shape[1] == cfg.size:
            return x
        f = x.shape[1] // cfg.size
        return x.reshape(x.shape[0], cfg.size, f, cfg.size, f, 3).mean((2, 4))

    with open(log_path, "a") as logf:
        last_r1 = 0.0
        last_reg = {"g_reg": 0.0, "path_length": 0.0}
        for i in range(cfg.training_iters):
            t0 = time.time()
            ds_flag = cfg.is_ds_iter(i)
            metrics = {}
            if ds_flag and args.ds_dataset_type == "FFHQ":
                photo, r_edit = next(ds)
                (ffhq_ref,) = (next(ffhq)[0],)
                key_i = jax.random.PRNGKey(1000 + i)
                st = state
                st["params"], st["stats"], st["d_ffhq_opt"], m = ffhq_steps[
                    "d_ffhq_step"
                ](st["params"], st["stats"], st["d_ffhq_opt"],
                  jnp.asarray(photo), jnp.asarray(r_edit),
                  jnp.asarray(downref(ffhq_ref)))
                metrics.update(m)
                if i % cfg.d_reg_every == 0:
                    st["params"], st["d_ffhq_opt"], m = ffhq_steps[
                        "d_ffhq_reg_step"
                    ](st["params"], st["d_ffhq_opt"], jnp.asarray(downref(ffhq_ref)))
                    metrics.update(m)
                st["params"], st["stats"], st["g_opt"], fake, m = ffhq_steps[
                    "g_ffhq_ds_step"
                ](st["params"], st["stats"], st["g_opt"], jnp.asarray(photo),
                  jnp.asarray(r_edit), jnp.asarray(downref(photo)), {})
                metrics.update(m)
                g_input, r_input, g_ref = photo, r_edit, downref(photo)
            else:
                g_input, r_input, g_ref = data_loading(rec, ds, ds_flag)
                g_ref = downref(g_ref)

            key_i = jax.random.PRNGKey(2000 + i)
            state, m = steps["d_step"](
                state, jnp.asarray(g_input), jnp.asarray(r_input),
                jnp.asarray(g_ref), key_i,
            )
            metrics.update(m)
            if i % cfg.d_reg_every == 0:
                state, m = steps["d_reg_step"](state, jnp.asarray(g_ref))
                last_r1 = float(m["r1"])
            metrics["r1"] = last_r1
            will_reg = (
                cfg.use_g_reg and i % cfg.g_reg_every == 0
                and args.co_mod is None
            )
            state, m = steps["g_step"](
                state, jnp.asarray(g_input), jnp.asarray(r_input),
                jnp.asarray(g_ref), key_i, {},
                ds_flag, False, not will_reg,
            )
            metrics.update(m)
            if will_reg:
                bsz = g_input.shape[0]
                n_sub = max(1, bsz // cfg.path_reg_batch_shrink)
                idx = np.sort(rng.choice(bsz, n_sub, replace=False))
                state, m = steps["g_reg_step"](
                    state, jnp.asarray(g_input[idx]), jnp.asarray(r_input[idx]),
                    key_i, True,
                )
                last_reg = {k: float(v) for k, v in m.items()}
            metrics.update(last_reg)

            dt = time.time() - t0
            line = {
                "iter": i, "time_s": round(dt, 3),
                **{k: (float(v) if hasattr(v, "item") else v)
                   for k, v in metrics.items()},
            }
            logf.write(json.dumps(line) + "\n")
            logf.flush()
            print(
                f"[{i}] d={line.get('d', 0):.4f} g={line.get('g', 0):.4f} "
                f"({dt:.2f}s)" + (" [DS]" if ds_flag else "")
            )


if __name__ == "__main__":
    main()
