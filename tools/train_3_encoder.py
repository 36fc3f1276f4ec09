#!/usr/bin/env python3
"""3-encoder training CLI — the counterpart of the reference entry point
``python3 train_3_encoder.py`` (/root/reference/train_3_encoder.py:831-888).

Every TrainConfig field is a flag (proper booleans, unlike the reference's
``type=bool`` argparse pitfalls).  Data comes from the reference directory
layouts (SURVEY.md §2.7) or ``--fake_data`` for smoke runs.

Example:
  python tools/train_3_encoder.py --fake_data --training_iters 20 \
      --rec_batch 4 --size 256 --exp_dir /tmp/exp
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from fm3dgan.train import TrainConfig, Trainer


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    for f in dataclasses.fields(TrainConfig):
        flag = f"--{f.name}"
        if f.type == "bool" or isinstance(f.default, bool):
            p.add_argument(
                flag,
                type=lambda s: s.lower() in ("1", "true", "yes"),
                default=f.default,
            )
        elif f.default is None or f.name == "w_plus_sliced_layer":
            p.add_argument(flag, type=str, default=None)
        elif isinstance(f.default, int):
            p.add_argument(flag, type=int, default=f.default)
        elif isinstance(f.default, float):
            p.add_argument(flag, type=float, default=f.default)
        else:
            p.add_argument(flag, type=str, default=f.default)
    p.add_argument("--exp_dir", type=str, default="./Exp")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--input_size", type=int, default=None,
                   help="encoder input resolution (default: --size)")
    p.add_argument("--fake_data", action="store_true")
    p.add_argument("--rec_data_dir", type=str, default=None,
                   help="dir with img/ and render_img/ subfolders")
    p.add_argument("--ds_data_dir", type=str, default=None,
                   help="synthetic id_XXXXX/{g,r}_K.png pair dir")
    p.add_argument("--ep_data_dir", type=str, default=None,
                   help="extreme-pose pair dir")
    p.add_argument("--n_data_workers", type=int, default=4)
    p.add_argument("--data_parallel", action="store_true",
                   help="shard batches over all local devices")
    p.add_argument("--resume_dir", type=str, default=None)
    p.add_argument("--resume_step", type=int, default=None)
    return p


def make_loaders(args, cfg: TrainConfig):
    if args.fake_data:
        from fm3dgan.data import RandomFakeData

        size = args.input_size or cfg.size
        rec = RandomFakeData(cfg.rec_batch, size, seed=1)
        ds = RandomFakeData(cfg.ds_batch, size, seed=2)
        ep = RandomFakeData(cfg.ds_batch * 2, size, seed=3)
        return rec, ds, ep

    from fm3dgan.data import (
        DataLoader,
        ReconstructionDataset,
        SyntheticPairDataset,
        dual_supervision_indices,
        extreme_pose_indices,
    )

    rec_set = ReconstructionDataset(
        os.path.join(args.rec_data_dir, "img"),
        os.path.join(args.rec_data_dir, "render_img"),
    )
    rec = DataLoader(rec_set, cfg.rec_batch, num_workers=args.n_data_workers)

    ds_set = SyntheticPairDataset(args.ds_data_dir)
    n_per_id = ds_set.n_img_per_id
    ds = DataLoader(
        ds_set,
        cfg.ds_batch,
        index_sampler=lambda rng: dual_supervision_indices(
            len(ds_set), n_per_id, rng
        ),
        num_workers=args.n_data_workers,
    )
    ep = None
    if args.ep_data_dir:
        ep_set = SyntheticPairDataset(args.ep_data_dir)
        ep = DataLoader(
            ep_set,
            cfg.ds_batch * 2,  # halved after even-index slicing
            index_sampler=lambda rng: extreme_pose_indices(
                len(ep_set), ep_set.n_img_per_id, rng
            ),
            num_workers=args.n_data_workers,
        )
    return rec, ds, ep


def main():
    args = build_arg_parser().parse_args()
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

    mesh = None
    if args.data_parallel:
        from fm3dgan.parallel import create_mesh

        mesh = create_mesh()

    os.makedirs(args.exp_dir, exist_ok=True)
    ckpt_dir = os.path.join(args.exp_dir, "ckpt")
    sample_dir = os.path.join(args.exp_dir, "sample")
    os.makedirs(ckpt_dir, exist_ok=True)
    os.makedirs(sample_dir, exist_ok=True)
    log_path = os.path.join(args.exp_dir, "training_log.jsonl")

    trainer = Trainer(
        cfg, seed=args.seed, mesh=mesh, input_size=args.input_size
    )
    start_iter = 0
    if args.resume_dir:
        trainer.load_checkpoint(args.resume_dir, args.resume_step)
        start_iter = args.resume_step + 1

    rec, ds, ep = make_loaders(args, cfg)
    from fm3dgan.data import data_loading

    with open(log_path, "a") as logf:
        for i in range(start_iter, cfg.training_iters):
            t0 = time.time()
            ds_flag = cfg.is_ds_iter(i)
            ep_flag = cfg.is_extreme_ds_iter(i)
            g_input, r_input, g_ref = data_loading(
                rec, ds, ds_flag, extreme_loader=ep or ds,
                extreme_ds_flag=ep_flag,
            )
            if g_ref.shape[1] != cfg.size:
                # Smoke-test path (generator smaller than encoder input):
                # box-downsample refs to the generated resolution.
                f = g_ref.shape[1] // cfg.size
                g_ref = g_ref.reshape(
                    g_ref.shape[0], cfg.size, f, cfg.size, f, 3
                ).mean(axis=(2, 4))
            metrics = trainer.train_iteration(i, g_input, r_input, g_ref)
            dt = time.time() - t0
            line = {
                "iter": i,
                "time_s": round(dt, 3),
                **{
                    k: (float(v) if hasattr(v, "item") else v)
                    for k, v in metrics.items()
                },
            }
            logf.write(json.dumps(line) + "\n")
            logf.flush()
            print(
                f"[{i}] d={line.get('d', 0):.4f} g={line.get('g', 0):.4f} "
                f"l1={line.get('l1', 0):.4f} r1={line.get('r1', 0):.4f} "
                f"ppl={line.get('g_reg', 0):.4f} ({dt:.2f}s)"
                + (" [DS]" if ds_flag else "")
                + (" [EP]" if ep_flag else "")
            )
            # Visual sample grid every val_sample_freq iters with the EMA
            # generator (Sample_Eval_Save_Ckpt, train_3_encoder.py:667-706).
            if i % cfg.val_sample_freq == 0 and i > 0:
                _save_sample_grid(trainer, g_input, r_input, sample_dir, i)

            if i % cfg.model_save_freq == 0 and i > 0:
                trainer.save_checkpoint(ckpt_dir, i)


def _save_sample_grid(trainer, photos, renders, sample_dir, step, n=4):
    """Photo x render editing grid PNG from the EMA generator."""
    import jax

    from fm3dgan.eval.visual_eval import (
        get_batch_eval_result,
        grid_to_image,
        save_image,
    )
    from fm3dgan.pipeline.forward import forward_3_encoder

    state = trainer.state
    variables = {
        "g": {"params": state.g_ema_params, **state.stats["g"]},
        "e_tsr": {"params": state.params["e_tsr"], **state.stats["e_tsr"]},
        "e_w": {"params": state.params["e_w"], **state.stats["e_w"]},
        "e_w_plus": {
            "params": state.params["e_w_plus"], **state.stats["e_w_plus"]
        },
    }
    cfg = trainer.config

    def forward_fn(p, r):
        import jax.numpy as jnp

        img, _ = forward_3_encoder(
            trainer.models, variables, jnp.asarray(p), jnp.asarray(r),
            tsr_encode=cfg.tsr_encode,
            sliced_layer=cfg.w_plus_sliced_layer,
            use_tanh=cfg.use_tanh,
        )
        return img

    grid = get_batch_eval_result(forward_fn, photos[:n], renders[:n])
    save_image(
        os.path.join(sample_dir, f"{step:06d}.png"), grid_to_image(grid)
    )


if __name__ == "__main__":
    main()
