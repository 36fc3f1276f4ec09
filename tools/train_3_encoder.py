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
    p.add_argument("--rng_impl", type=str, default=None,
                   choices=("threefry2x32", "rbg", "unsafe_rbg"),
                   help="JAX PRNG implementation; threefry (default) is "
                        "ALU-heavy on TPU and the generator draws per-layer "
                        "noise every forward — unsafe_rbg is near-free")
    p.add_argument("--input_size", type=int, default=None,
                   help="encoder input resolution (default: --size)")
    p.add_argument("--fan_input_size", type=int, default=256,
                   help="heatmap FAN input resolution (256 for pretrained "
                        "2DFAN-4 weights; smaller for smoke runs)")
    p.add_argument("--fake_data", action="store_true")
    p.add_argument("--rec_data_dir", type=str, default=None,
                   help="dir with img/ and render_img/ subfolders")
    p.add_argument("--ds_data_dir", type=str, default=None,
                   help="synthetic id_XXXXX/{g,r}_K.png pair dir")
    p.add_argument("--ep_data_dir", type=str, default=None,
                   help="extreme-pose pair dir")
    p.add_argument("--rec_eval_dir", type=str, default=None,
                   help="held-out recon eval dir (img/ + render_img/)")
    p.add_argument("--edit_eval_dir", type=str, default=None,
                   help="held-out edit eval dir (img/ + edit_render_img/)")
    p.add_argument("--fid_stats_path", type=str, default=None,
                   help="precomputed FFHQ inception stats .pkl/.npz for the "
                        "edit-score FID (Evaluation/quant_eval.py:23)")
    p.add_argument("--inception_ckpt", type=str, default=None,
                   help="pytorch-fid InceptionV3 .pth for in-loop FID")
    p.add_argument("--n_eval_batches", type=int, default=None,
                   help="cap on eval batches per score pass")
    p.add_argument("--val_bundle_dir", type=str, default=None,
                   help="dir of .npy visual-val bundles "
                        "(visual_test_img_generation.py layout)")
    p.add_argument("--n_real_eval_faces", type=int, default=2)
    p.add_argument("--n_syn_eval_faces", type=int, default=2)
    p.add_argument("--n_data_workers", type=int, default=4)
    p.add_argument("--divergence_threshold", type=float, default=1e6,
                   help="halt (emergency ckpt + exit 3) when |g| or |l1| "
                        "exceeds this — or is non-finite — for 2 "
                        "consecutive log windows; 0 disables.  Motivated "
                        "by the r5 campaign's GAN runaway (5 -> 1e9 in ~10 "
                        "iters): a diverged run burns fleet TPU-hours for "
                        "nothing")
    p.add_argument("--input_uint8", type=lambda s: s.lower() in
                   ("1", "true", "yes"), default=True,
                   help="load training batches as uint8 and normalize "
                        "on-device (4x less host->device traffic; "
                        "bit-identical). false = legacy f32 pipeline")
    p.add_argument("--cache_decoded", type=str, default="auto",
                   choices=("auto", "true", "false"),
                   help="memoize decoded+transformed images in host RAM "
                        "(exact: the transform is deterministic). auto "
                        "(default) bounds the cache to ~25%% of available "
                        "RAM so FFHQ-scale layouts (~420k files = ~320GB "
                        "decoded) cannot OOM the host; true = unbounded "
                        "(explicit opt-in for small generated layouts)")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard batches over all local devices")
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
                   help="flush metrics to host every N iters; reading a "
                        "device scalar forces a sync, so per-iteration "
                        "logging serializes a host round-trip into every "
                        "step (~40%% throughput on a remote TPU). 1 = "
                        "reference behavior (train_3_encoder.py:824-858)")
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
    from fm3dgan.data.datasets import default_transform, uint8_transform

    # Real-data images must arrive at the ENCODER input size (the reference's
    # transform resizes to its fixed 256, dataset.py:24-27; here input_size
    # is configurable so the transform must follow it).  Training loaders
    # default to the uint8 path: batches cross host->device as 1/4 the
    # bytes and the steps normalize on device (bit-identical math,
    # steps._norm_input) — the r5 campaign measured f32 batch transfer as
    # the tunneled-TPU steady-state bottleneck.  Eval/val loaders keep f32.
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

    ds_set = SyntheticPairDataset(
        args.ds_data_dir, transform=transform, cache=cache
    )
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
        ep_set = SyntheticPairDataset(
            args.ep_data_dir, transform=transform, cache=cache
        )
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
    import jax

    # Persist compiled executables: a resumed run (--resume_dir after a
    # preemption) must not re-pay the ~20 min of 256px fused-program
    # compiles over the remote tunnel.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("FM3DGAN_JAX_CACHE", "/tmp/fm3dgan_jax_cache_tpu"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.rng_impl:
        jax.config.update("jax_default_prng_impl", args.rng_impl)
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
    sample_dir = os.path.join(args.exp_dir, "sample")
    os.makedirs(ckpt_dir, exist_ok=True)
    os.makedirs(sample_dir, exist_ok=True)
    log_path = os.path.join(args.exp_dir, "training_log.jsonl")

    trainer = Trainer(
        cfg, seed=args.seed, mesh=mesh, input_size=args.input_size,
        fan_input_size=args.fan_input_size,
    )
    start_iter = 0
    if args.resume_dir:
        trainer.load_checkpoint(args.resume_dir, args.resume_step)
        start_iter = args.resume_step + 1

    rec, ds, ep = make_loaders(args, cfg)
    from fm3dgan.data import data_loading

    # In-training quantitative eval (Sample_Eval_Save_Ckpt,
    # train_3_encoder.py:708-733): recon + edit scores from the EMA stack
    # every model_save_freq iters, appended to the JSONL log.
    eval_hook = _make_eval_hook(args, cfg, trainer)
    # Fixed visual val set (Visual_Evaluation_Setup, train_3_encoder.py:860 /
    # visual_eval.py:40-83) — in-training grids render this held-out set, not
    # the current training batch.
    val_sets = _make_val_sets(args, cfg)

    def _load_batch(i):
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
            in_dtype = g_ref.dtype
            g_ref = g_ref.reshape(
                g_ref.shape[0], cfg.size, f, cfg.size, f, 3
            ).mean(axis=(2, 4))
            if in_dtype == np.uint8:
                # Stay on the uint8 wire path; the device normalizer is
                # dtype-gated, so a float64 mean here would skip it.
                g_ref = np.clip(np.round(g_ref), 0, 255).astype(np.uint8)
            else:
                g_ref = g_ref.astype(np.float32)
        return g_input, r_input, g_ref

    from fm3dgan.train.preempt import GracefulShutdown

    stopper = GracefulShutdown()
    pending: list = []
    diverged_windows = 0
    # Double-buffered input transfer: batch i is already on device when step
    # i dispatches; batch i+1's device_put is issued right after, overlapping
    # the copy with step i's device compute.
    staged = trainer.stage_batch(*_load_batch(start_iter))
    with open(log_path, "a") as logf:
        for i in range(start_iter, cfg.training_iters):
            t0 = time.time()
            ds_flag = cfg.is_ds_iter(i)
            ep_flag = cfg.is_extreme_ds_iter(i)
            g_input, r_input, g_ref = staged
            metrics = trainer.train_iteration(i, g_input, r_input, g_ref)
            # Snapshot once per iteration so every block below (staging,
            # flush, eval, checkpoint-and-exit) sees the same value even if
            # the signal lands between them.  After a preemption signal the
            # spot grace window is ~30s: skip next-batch staging, the visual
            # grid, and the multi-minute quant-eval hook so the final
            # checkpoint is reached before SIGKILL.
            preempt_now = stopper.requested
            load_s = 0.0
            if not preempt_now and i + 1 < cfg.training_iters:
                # load_s: host wall spent producing + staging the NEXT batch
                # while the device runs step i.  The input pipeline is the
                # bottleneck only when load_s exceeds the device step time
                # (then time_s tracks load_s instead of the dispatch cost).
                t_load = time.time()
                staged = trainer.stage_batch(*_load_batch(i + 1))
                load_s = time.time() - t_load
            dt = time.time() - t0
            # Defer the host read: metrics are device scalars; float()-ing
            # them here would sync every step.  time_s is dispatch wall (the
            # device runs ahead); flush intervals carry true throughput.
            pending.append((i, dt, load_s, ds_flag, ep_flag, metrics))
            if (
                len(pending) >= max(1, args.log_every)
                or i == cfg.training_iters - 1
                or (i % cfg.val_sample_freq == 0 and i > 0)
                or (i % cfg.model_save_freq == 0 and i > 0)
                or preempt_now
            ):
                for j, jdt, jload, jds, jep, m in pending:
                    line = {
                        "iter": j,
                        "time_s": round(jdt, 3),
                        "load_s": round(jload, 3),
                        **{
                            k: (float(v) if hasattr(v, "item") else v)
                            for k, v in m.items()
                        },
                    }
                    logf.write(json.dumps(line) + "\n")
                    print(
                        f"[{j}] d={line.get('d', 0):.4f} "
                        f"g={line.get('g', 0):.4f} "
                        f"l1={line.get('l1', 0):.4f} "
                        f"r1={line.get('r1', 0):.4f} "
                        f"ppl={line.get('g_reg', 0):.4f} ({jdt:.2f}s)"
                        + (" [DS]" if jds else "")
                        + (" [EP]" if jep else "")
                    )
                    # Divergence guard (free: values are already host
                    # floats at flush time, no extra sync).  The r5
                    # campaign's GAN runaway went 5 -> 1e9 within ~10
                    # iterations and then burned 340 diverged iterations of
                    # TPU time before a human noticed; a production spot
                    # fleet would burn hours.  Non-finite or
                    # above-threshold g/l1 for 2 consecutive FLUSHED
                    # windows => emergency checkpoint + exit 3 (resume from
                    # the last healthy ckpt, typically with a lower lr).
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
                        f"{args.divergence_threshold:g} (or non-finite) for "
                        f"2 consecutive log windows — emergency checkpoint "
                        f"and exit 3.  Resume from an earlier healthy "
                        f"checkpoint (e.g. --resume_dir {ckpt_dir} "
                        f"--resume_step <last good>), typically with a "
                        f"lower --lr."
                    )
                    logf.write(json.dumps(
                        {"diverged": i,
                         "threshold": args.divergence_threshold}) + "\n")
                    logf.flush()
                    trainer.save_checkpoint(ckpt_dir, i)
                    sys.exit(3)
            # Visual sample grid every val_sample_freq iters with the EMA
            # generator (Sample_Eval_Save_Ckpt, train_3_encoder.py:667-706).
            if i % cfg.val_sample_freq == 0 and i > 0 and not preempt_now:
                if val_sets is not None:
                    _save_val_set_grid(trainer, val_sets, sample_dir, i)
                else:
                    _save_sample_grid(trainer, g_input, r_input, sample_dir, i)

            if i % cfg.model_save_freq == 0 and i > 0 and not preempt_now:
                if eval_hook is not None:
                    scores = eval_hook(i)
                    logf.write(json.dumps({"eval": scores}) + "\n")
                    logf.flush()
                    printable = {
                        k: round(v, 4)
                        for k, v in scores.items()
                        if isinstance(v, float) and np.isfinite(v)
                    }
                    print(f"[{i}] quant eval: {printable}")
                trainer.save_checkpoint(ckpt_dir, i)

            # Spot-VM preemption (SIGTERM) / ctrl-C: final checkpoint, exit 0.
            if preempt_now:
                stopper.checkpoint_and_exit(trainer, ckpt_dir, i, logf)
                break


def _make_eval_hook(args, cfg, trainer):
    from fm3dgan.train.eval_hook import (
        QuantEvalHook,
        make_dir_eval_batches,
        make_fake_eval_batches,
    )

    if args.rec_eval_dir or args.edit_eval_dir:
        from fm3dgan.data.datasets import default_transform

        rec_fn, edit_fn = make_dir_eval_batches(
            args.rec_eval_dir,
            args.edit_eval_dir,
            cfg.quant_eval_batch_size,
            n_batches=args.n_eval_batches,
            # Eval images must arrive at the encoder input size, like the
            # training loaders (GradualStyleEncoder spatials depend on it).
            transform=default_transform(args.input_size or cfg.size),
        )
    elif args.fake_data:
        rec_fn, edit_fn = make_fake_eval_batches(
            args.input_size or cfg.size, batch=2,
            n_batches=args.n_eval_batches or 1,
        )
    else:
        return None

    inception_fn = None
    real_stats = None
    if args.fid_stats_path:
        import jax
        import jax.numpy as jnp

        from fm3dgan.eval.fid import load_stats
        from fm3dgan.models.inception import InceptionV3Pool3

        real_stats = load_stats(args.fid_stats_path)
        module = InceptionV3Pool3()
        if args.inception_ckpt:
            from fm3dgan.compat.torch_port import load_torch_state_dict
            from fm3dgan.models.inception import convert_fid_inception

            variables = convert_fid_inception(
                load_torch_state_dict(args.inception_ckpt)
            )
        else:
            print("WARNING: random-init inception features for in-loop FID")
            variables = jax.jit(module.init)(
                jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3))
            )
        apply = jax.jit(lambda v, x: module.apply(v, x))
        inception_fn = lambda x: apply(variables, x)

    return QuantEvalHook(
        trainer,
        rec_batches=rec_fn,
        edit_batches=edit_fn,
        inception_fn=inception_fn,
        real_stats=real_stats,
    )


def _make_val_sets(args, cfg):
    """Fixed visual val sets: .npy bundles and/or synthetic ids; a fixed
    random set for --fake_data (visual_eval.py:40-83)."""
    import glob

    size = args.input_size or cfg.size
    rng = np.random.RandomState(args.seed + 77)
    sets = []
    if args.val_bundle_dir:
        from fm3dgan.eval.visual_eval import get_real_img_val_sample

        paths = sorted(glob.glob(os.path.join(args.val_bundle_dir, "*.npy")))
        sets += get_real_img_val_sample(
            paths, args.n_real_eval_faces, size=size, rng=rng
        )
    if args.ds_data_dir and not args.fake_data:
        from fm3dgan.data import SyntheticPairDataset
        from fm3dgan.data.datasets import default_transform
        from fm3dgan.eval.visual_eval import get_syn_img_val_sample

        # Val images must match the encoder input size (the fixed-256
        # default would crash the first val grid at --input_size != 256).
        ds_set = SyntheticPairDataset(
            args.ds_data_dir, transform=default_transform(size)
        )
        sets += get_syn_img_val_sample(
            ds_set, args.n_syn_eval_faces,
            n_img_per_id=ds_set.n_img_per_id, rng=rng,
        )
    if not sets and args.fake_data:
        for _ in range(2):
            sets += [
                rng.uniform(-1, 1, (1, size, size, 3)).astype(np.float32)
                for _ in range(3)
            ]
    return sets or None


def _save_val_set_grid(trainer, val_sets, sample_dir, step):
    from fm3dgan.eval.visual_eval import (
        get_val_sample_grid,
        grid_to_image,
        save_image,
    )
    from fm3dgan.train.eval_hook import ema_forward_fn

    grid = get_val_sample_grid(ema_forward_fn(trainer), val_sets)
    save_image(
        os.path.join(sample_dir, f"{step:06d}.png"), grid_to_image(grid)
    )


def _save_sample_grid(trainer, photos, renders, sample_dir, step, n=4):
    """Photo x render editing grid PNG from the EMA generator."""
    import jax

    # Training batches may arrive as device uint8 (the low-wire-cost input
    # path); this eval forward expects [-1,1] floats.
    photos = np.asarray(photos)
    renders = np.asarray(renders)
    if photos.dtype == np.uint8:
        photos = photos.astype(np.float32) * (2.0 / 255.0) - 1.0
    if renders.dtype == np.uint8:
        renders = renders.astype(np.float32) * (2.0 / 255.0) - 1.0

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
