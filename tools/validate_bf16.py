#!/usr/bin/env python3
"""bf16-vs-fp32 training parity validation.

Runs the same seeded smoke training twice — compute_dtype=float32 and
bfloat16 — on identical synthetic data and reports per-metric trajectories
and relative deviations.  Decision input for defaulting TPU training to
bfloat16 compute (the reference trains fp32/TF32 on A100,
train_3_encoder.py:448-596; bf16 on TPU doubles MXU throughput).

  python tools/validate_bf16.py --iters 100 --size 64 --batch 4
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fm3dgan_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

TRACKED = ("d", "g", "l1", "r1", "g_reg", "lpips", "face_id")


def run(dtype: str, args) -> dict:
    from fm3dgan.train import TrainConfig, Trainer

    cfg = TrainConfig(
        size=args.size,
        rec_batch=args.batch,
        ds_batch=args.batch,
        d_reg_every=4,
        g_reg_every=4,
        compute_dtype=dtype,
        lpips_loss_lambda=args.lpips_lambda,
        face_id_loss_lambda=args.face_id_lambda,
        # Face-regional loss needs render and fake at the same resolution
        # (true in the production 256px config; not in this size-64 smoke
        # geometry) — excluded from the parity comparison.
        rec_face_reg_loss_lambda=0.0,
        ds_face_reg_loss_lambda=0.0,
        ep_face_reg_loss_lambda=0.0,
    )
    trainer = Trainer(
        cfg,
        seed=0,
        use_lpips=args.lpips_lambda > 0,
        use_arcface=args.face_id_lambda > 0,
        input_size=args.input_size,
    )
    rng = np.random.RandomState(0)
    s, si = args.size, args.input_size
    history = {k: [] for k in TRACKED}
    for i in range(args.iters):
        photo = rng.uniform(-1, 1, (args.batch, si, si, 3)).astype(np.float32)
        render = photo + 0.1 * rng.randn(args.batch, si, si, 3).astype(
            np.float32
        )
        render[:, : si // 8] = -1.0
        ref = rng.uniform(-1, 1, (args.batch, s, s, 3)).astype(np.float32)
        m = trainer.train_iteration(i, photo, render, ref)
        for k in TRACKED:
            if k in m:
                history[k].append(float(m[k]))
    return history


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--input_size", type=int, default=128)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--lpips_lambda", type=float, default=3.0)
    p.add_argument("--face_id_lambda", type=float, default=30.0)
    args = p.parse_args()

    h32 = run("float32", args)
    h16 = run("bfloat16", args)

    report = {}
    ok = True
    for k in TRACKED:
        a = np.asarray(h32[k])
        b = np.asarray(h16[k])
        if a.size == 0:
            continue
        n = min(a.size, b.size)
        a, b = a[:n], b[:n]
        # Compare windowed means: per-step values diverge chaotically in any
        # GAN (and under any precision change); the training signal is the
        # trajectory.
        w = max(1, n // 4)
        ma = np.array([a[i : i + w].mean() for i in range(0, n - w + 1, w)])
        mb = np.array([b[i : i + w].mean() for i in range(0, n - w + 1, w)])
        scale = np.maximum(np.abs(ma), 1e-2)
        rel = float(np.max(np.abs(ma - mb) / scale))
        report[k] = {
            "fp32_tail_mean": round(float(a[-w:].mean()), 4),
            "bf16_tail_mean": round(float(b[-w:].mean()), 4),
            "max_windowed_rel_dev": round(rel, 4),
            "finite": bool(np.isfinite(b).all()),
        }
        ok = ok and bool(np.isfinite(b).all())
    report["all_bf16_finite"] = ok
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
