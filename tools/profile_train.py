#!/usr/bin/env python3
"""jax.profiler trace capture for the training step (SURVEY §5: the reference
has no tracing at all — wall-clock prints only, train_3_encoder.py:780,820).

Captures a TensorBoard-loadable XPlane trace of N full training iterations
plus a per-step wall-clock breakdown (D / R1 / G / PPL dispatched separately
so the trace groups them), written under --out_dir.

  python tools/profile_train.py --batch 8 --size 256 --dtype bfloat16 \
      --out_dir /tmp/fm3dgan_trace
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
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--no_frozen", action="store_true")
    p.add_argument("--out_dir", default="/tmp/fm3dgan_trace")
    p.add_argument("--share_noise", type=int, default=None,
                   help="override config.share_dg_noise (0/1)")
    p.add_argument("--remat_frozen", type=int, default=None)
    p.add_argument("--remat_reg", type=int, default=None)
    p.add_argument("--upfirdn_backend", default=None,
                   choices=("xla", "pallas"))
    p.add_argument("--fused", action="store_true",
                   help="trace the production fused one-dispatch iteration "
                        "instead of the 4 separate step programs (separate "
                        "steps group the trace by phase; fused is what the "
                        "bench measures)")
    args = p.parse_args()

    from fm3dgan.train import TrainConfig, Trainer

    if args.upfirdn_backend:
        from fm3dgan.ops.upfirdn2d import set_backend

        set_backend(args.upfirdn_backend)

    cfg_kwargs = {}
    if args.share_noise is not None:
        cfg_kwargs["share_dg_noise"] = bool(args.share_noise)
    if args.remat_frozen is not None:
        cfg_kwargs["remat_frozen"] = bool(args.remat_frozen)
    if args.remat_reg is not None:
        cfg_kwargs["remat_reg"] = bool(args.remat_reg)
    cfg = TrainConfig(
        size=args.size,
        rec_batch=args.batch,
        ds_batch=args.batch,
        compute_dtype=args.dtype,
        lpips_loss_lambda=0.0 if args.no_frozen else 3.0,
        face_id_loss_lambda=0.0 if args.no_frozen else 30.0,
        **cfg_kwargs,
    )
    trainer = Trainer(
        cfg, seed=0,
        use_lpips=not args.no_frozen,
        use_arcface=not args.no_frozen,
        fast_init=True,
    )
    rng = np.random.RandomState(0)
    s = args.size
    photo = jnp.asarray(
        rng.uniform(-1, 1, (args.batch, s, s, 3)).astype(np.float32)
    )
    render = jnp.asarray(
        rng.uniform(-1, 1, (args.batch, s, s, 3)).astype(np.float32)
    )

    # Compile outside the trace (iter 0 hits rec+R1+PPL; iter 1 hits DS).
    for i in range(2):
        trainer.train_iteration(i, photo, render, photo, fused=args.fused)
    _sync(trainer.state.params)
    print("# compiled; tracing", file=sys.stderr)

    # Per-step wall-clock breakdown (each step dispatched + synced).
    # Skipped under --fused: it would compile the 4 separate step programs
    # solely for the breakdown, and the fused trace carries the same
    # information through analyze_trace.py.
    breakdown = {}
    key = jax.random.PRNGKey(9)
    for name, fn in () if args.fused else (
        ("d_step", lambda: trainer.steps["d_step"](
            trainer.state, photo, render, photo, key, False)),
        ("d_reg_step", lambda: trainer.steps["d_reg_step"](
            trainer.state, photo, False)),
        ("g_step", lambda: trainer.steps["g_step"](
            trainer.state, photo, render, photo, key, trainer.frozen,
            False, False, False, False, True)),
        ("g_reg_step", lambda: trainer.steps["g_reg_step"](
            trainer.state, photo[: max(1, args.batch // 2)],
            render[: max(1, args.batch // 2)], key, True)),
    ):
        # NB: these donate the state; rebind it from the returned value.
        # First call compiles (train_iteration warms only the FUSED step) —
        # time the second dispatch.
        for timed in (False, True):
            t0 = time.perf_counter()
            new_state, _ = fn()
            _sync(new_state.params)
            if timed:
                breakdown[name] = round(time.perf_counter() - t0, 4)
            trainer.state = new_state

    os.makedirs(args.out_dir, exist_ok=True)
    with jax.profiler.trace(args.out_dir):
        for i in range(args.iters):
            trainer.train_iteration(
                16 + i, photo, render, photo, fused=args.fused
            )
        _sync(trainer.state.params)

    print(json.dumps({"step_seconds": breakdown, "trace_dir": args.out_dir}))


if __name__ == "__main__":
    main()
