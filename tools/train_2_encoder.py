#!/usr/bin/env python3
"""2-encoder training CLI — counterpart of the reference ``python3 train.py``
(/root/reference/train.py:833+): E_Tsr + one modulation encoder, optional
co-modulation, optional FFHQ-based dual supervision against a second
discriminator D_ffhq.  PPL path regularization runs for ALL modes
(train.py:495-530), with Orbax checkpointing.

  python tools/train_2_encoder.py --fake_data --training_iters 6 --size 8 \
      --input_size 128 --exp_dir /tmp/exp2 [--co_mod Multiplication] \
      [--ds_dataset_type FFHQ]
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


def build_arg_parser():
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
    p.add_argument("--rec_data_dir", type=str, default=None,
                   help="dir with img/ and render_img/ subfolders")
    p.add_argument("--ds_data_dir", type=str, default=None,
                   help="synthetic id_XXXXX/{g,r}_K.png pair dir, or the "
                        "FFHQ editing layout for --ds_dataset_type FFHQ")
    p.add_argument("--ffhq_data_dir", type=str, default=None,
                   help="flat FFHQ image folder (D_ffhq reals)")
    p.add_argument("--n_data_workers", type=int, default=4)
    p.add_argument("--input_uint8", type=lambda s: s.lower() in
                   ("1", "true", "yes"), default=True,
                   help="load training batches as uint8 and normalize "
                        "on-device (4x less host->device traffic; "
                        "bit-identical). false = legacy f32 pipeline")
    p.add_argument("--divergence_threshold", type=float, default=1e6,
                   help="halt (emergency ckpt + exit 3) when |g| or |l1| "
                        "exceeds this — or is non-finite — for 2 "
                        "consecutive log windows; 0 disables")
    p.add_argument("--cache_decoded", type=str, default="auto",
                   choices=("auto", "true", "false"),
                   help="memoize decoded+transformed images in host RAM. "
                        "auto (default) bounds the cache to ~25%% of "
                        "available RAM; true = unbounded (opt-in for small "
                        "layouts); false = off")
    p.add_argument("--data_parallel", action="store_true")
    p.add_argument("--multihost", action="store_true",
                   help="join a multi-host DCN job (jax.distributed."
                        "initialize, autodetected on TPU pods) before "
                        "building the mesh; implies --data_parallel. Each "
                        "host's loader feeds its own slice — per-host batch "
                        "sizes in the config, global batch = local x "
                        "process_count")
    p.add_argument("--coordinator_address", type=str, default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--resume_dir", type=str, default=None)
    p.add_argument("--resume_step", type=int, default=None)
    p.add_argument("--log_every", type=int, default=10,
                   help="flush metrics to host every N iters (1 = "
                        "per-iteration, reference behavior)")
    p.add_argument("--mod_encode", default="Render Image",
                   choices=["Render Image", "Photo Image"])
    p.add_argument("--co_mod", default=None,
                   choices=[None, "Multiplication", "Concatenation",
                            "Tensor Transform"])
    p.add_argument("--ds_dataset_type", default="Synthetic",
                   choices=["Synthetic", "FFHQ"])
    return p


def _resolve_cache(args, cfg):
    """--cache_decoded auto/true/false -> _DecodeCache arg (bool or entry
    cap).  auto derives a cap from available RAM so FFHQ-scale layouts
    cannot OOM the host (fm3dgan.data.datasets.auto_cache_entries)."""
    if args.cache_decoded == "true":
        return True
    if args.cache_decoded == "false":
        return False
    from fm3dgan.data.datasets import auto_cache_entries

    return auto_cache_entries(args.input_size or cfg.size)


def make_loaders(args, cfg):
    if args.fake_data:
        from fm3dgan.data import RandomFakeData

        size = args.input_size or cfg.size
        rec = RandomFakeData(cfg.rec_batch, size, seed=1)
        ds = RandomFakeData(cfg.ds_batch, size, seed=2)
        ffhq = RandomFakeData(cfg.ds_batch, cfg.size, seed=3)
        return rec, ds, ffhq

    from fm3dgan.data import (
        DataLoader,
        ImageFolderDataset,
        ReconstructionDataset,
        SyntheticPairDataset,
        dual_supervision_indices,
    )
    from fm3dgan.data.datasets import default_transform, uint8_transform

    # Encoder streams resize to input_size; the real-image D stream (FFHQ)
    # stays at the generator size (train.py:699-716 keeps both at its fixed
    # 256 — here the two are configurable independently).  uint8 wire path
    # ≙ train_3_encoder (steps_2encoder normalizes on device).
    size = args.input_size or cfg.size
    transform = (
        uint8_transform(size) if args.input_uint8 else default_transform(size)
    )
    cache = _resolve_cache(args, cfg)

    rec_set = ReconstructionDataset(
        os.path.join(args.rec_data_dir, "img"),
        os.path.join(args.rec_data_dir, "render_img"),
        transform=transform,
        cache=cache,
    )
    rec = DataLoader(rec_set, cfg.rec_batch, num_workers=args.n_data_workers)

    if args.ds_dataset_type == "FFHQ":
        from fm3dgan.data.datasets import EditingDataset

        ds_set = EditingDataset(
            os.path.join(args.ds_data_dir, "img"),
            os.path.join(args.ds_data_dir, "edit_render_img"),
            render_image_folder=os.path.join(args.ds_data_dir, "render_img"),
            train=True,
            transform=transform,
            cache=cache,
        )
        # Train mode yields [photo, own render, edit render]; the FFHQ-DS
        # branch consumes (photo, edit render) (train.py:715-716).
        base = DataLoader(
            ds_set, cfg.ds_batch, num_workers=args.n_data_workers
        )

        class _EditPairs:
            def __next__(self):
                photo, _own, edit = next(base)
                return photo, edit

        ds = _EditPairs()
        ffhq_set = ImageFolderDataset(
            args.ffhq_data_dir,
            transform=(
                uint8_transform(cfg.size) if args.input_uint8
                else default_transform(cfg.size)
            ),
            cache=cache,
        )
        ffhq = DataLoader(
            ffhq_set, cfg.ds_batch, num_workers=args.n_data_workers
        )
    else:
        ds_set = SyntheticPairDataset(
            args.ds_data_dir, transform=transform, cache=cache
        )
        ds = DataLoader(
            ds_set,
            cfg.ds_batch,
            index_sampler=lambda rng: dual_supervision_indices(
                len(ds_set), ds_set.n_img_per_id, rng
            ),
            num_workers=args.n_data_workers,
        )
        ffhq = None
    return rec, ds, ffhq


def main():
    from fm3dgan.train import TrainConfig

    args = build_arg_parser().parse_args()
    import jax

    # Persist compiled executables across runs/resumes (≙ train_3_encoder).
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("FM3DGAN_JAX_CACHE", "/tmp/fm3dgan_jax_cache_tpu"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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

    from fm3dgan.data import data_loading
    from fm3dgan.train.loop2 import Trainer2

    mesh = None
    if args.multihost:
        from fm3dgan.parallel import init_multihost

        init_multihost(args.coordinator_address, args.num_processes,
                       args.process_id)
        args.data_parallel = True
    if args.data_parallel:
        from fm3dgan.parallel import create_mesh

        mesh = create_mesh()

    os.makedirs(args.exp_dir, exist_ok=True)
    ckpt_dir = os.path.join(args.exp_dir, "ckpt")
    os.makedirs(ckpt_dir, exist_ok=True)
    log_path = os.path.join(args.exp_dir, "training_log.jsonl")

    trainer = Trainer2(
        cfg,
        seed=args.seed,
        mod_encode=args.mod_encode,
        co_modulation=args.co_mod,
        ds_dataset_type=args.ds_dataset_type,
        mesh=mesh,
        use_lpips=cfg.lpips_loss_lambda > 0,
        use_arcface=cfg.face_id_loss_lambda > 0,
        input_size=args.input_size,
    )
    start_iter = 0
    if args.resume_dir:
        trainer.load_checkpoint(args.resume_dir, args.resume_step)
        start_iter = args.resume_step + 1

    rec, ds, ffhq = make_loaders(args, cfg)

    def downref(x):
        if x.shape[1] == cfg.size:
            return x
        f = x.shape[1] // cfg.size
        return x.reshape(x.shape[0], cfg.size, f, cfg.size, f, 3).mean((2, 4))

    def _load_batch(i):
        ds_flag = cfg.is_ds_iter(i)
        ffhq_ref = None
        if ds_flag and args.ds_dataset_type == "FFHQ":
            g_input, r_input = next(ds)
            g_ref = downref(g_input)
            ffhq_ref = downref(next(ffhq)[0])
        else:
            g_input, r_input, g_ref = data_loading(rec, ds, ds_flag)
            g_ref = downref(g_ref)
        return g_input, r_input, g_ref, ffhq_ref

    def _stage(batch):
        # Double-buffered transfer (see tools/train_3_encoder.py): issue the
        # device_put for batch i+1 right after dispatching step i.
        g_input, r_input, g_ref, ffhq_ref = batch
        staged = trainer.stage_batch(g_input, r_input, g_ref)
        if ffhq_ref is not None:
            staged = staged + trainer.stage_batch(ffhq_ref)
        else:
            staged = staged + (None,)
        return staged

    from fm3dgan.train.preempt import GracefulShutdown

    stopper = GracefulShutdown()
    pending: list = []
    diverged_windows = 0
    staged = _stage(_load_batch(start_iter))
    with open(log_path, "a") as logf:
        for i in range(start_iter, cfg.training_iters):
            t0 = time.time()
            ds_flag = cfg.is_ds_iter(i)
            g_input, r_input, g_ref, ffhq_ref = staged
            metrics = trainer.train_iteration(
                i, g_input, r_input, g_ref, ffhq_ref=ffhq_ref
            )
            # Snapshot once per iteration so every block below sees the same
            # value even if the signal lands between them; skip next-batch
            # staging after a signal so the final checkpoint is reached
            # inside the spot grace window.
            preempt_now = stopper.requested
            if not preempt_now and i + 1 < cfg.training_iters:
                staged = _stage(_load_batch(i + 1))
            dt = time.time() - t0
            # Deferred host read (see tools/train_3_encoder.py --log_every):
            # float()-ing device scalars every step serializes a sync into
            # every iteration.
            pending.append((i, dt, ds_flag, metrics))
            if (
                len(pending) >= max(1, args.log_every)
                or i == cfg.training_iters - 1
                or (i % cfg.model_save_freq == 0 and i > 0)
                or preempt_now
            ):
                for j, jdt, jds, m in pending:
                    line = {
                        "iter": j, "time_s": round(jdt, 3),
                        **{k: (float(v) if hasattr(v, "item") else v)
                           for k, v in m.items()},
                    }
                    logf.write(json.dumps(line) + "\n")
                    print(
                        f"[{j}] d={line.get('d', 0):.4f} "
                        f"g={line.get('g', 0):.4f} "
                        f"ppl={line.get('g_reg', 0):.4f} ({jdt:.2f}s)"
                        + (" [DS]" if jds else "")
                    )
                    # Divergence guard (≙ train_3_encoder.py): free at
                    # flush time; halts a run that would otherwise burn
                    # fleet TPU-hours producing garbage.
                    vals = [line.get("g", 0.0), line.get("l1", 0.0)]
                    if args.divergence_threshold > 0 and (
                        any(not np.isfinite(v) for v in vals)
                        or any(abs(v) > args.divergence_threshold
                               for v in vals)
                    ):
                        diverged_windows += 1
                    else:
                        diverged_windows = 0
                logf.flush()
                pending.clear()
                if diverged_windows >= 2 * max(1, args.log_every):
                    print(
                        f"[{i}] DIVERGENCE: |g|/|l1| beyond "
                        f"{args.divergence_threshold:g} (or non-finite) "
                        f"for 2 consecutive log windows — emergency "
                        f"checkpoint and exit 3."
                    )
                    logf.write(json.dumps(
                        {"diverged": i,
                         "threshold": args.divergence_threshold}) + "\n")
                    logf.flush()
                    trainer.save_checkpoint(ckpt_dir, i)
                    sys.exit(3)
            if i % cfg.model_save_freq == 0 and i > 0 and not preempt_now:
                trainer.save_checkpoint(ckpt_dir, i)

            # Spot-VM preemption (SIGTERM) / ctrl-C: final checkpoint, exit 0.
            if preempt_now:
                stopper.checkpoint_and_exit(trainer, ckpt_dir, i, logf)
                break


if __name__ == "__main__":
    main()
