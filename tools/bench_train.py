#!/usr/bin/env python3
"""Training-step throughput benchmark (BASELINE.json configs 3-4).

Measures the full reference iteration — D step + lazy R1 + G step (GAN + L1 +
LPIPS + ArcFace-ID losses) + lazy PPL + EMA — at 256px on the TPU, and the
amortized images/sec including regularizer cadence (R1 every 16, PPL every 4).

  python tools/bench_train.py [--batch 8] [--iters 8] [--dtype bfloat16]
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


def sync(state):
    # Host read: block_until_ready is a no-op over the remote-TPU tunnel.
    leaf = jax.tree.leaves(state.params["g"])[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def supervise(argv, artifact, deadline_s):
    """Run the measurement as a killable child under a hard deadline and
    ALWAYS write ``artifact`` (same discipline as bench.py: a hung
    remote-TPU call cannot be interrupted from inside the process, and a
    timed-out round must still leave a parseable JSON record — BENCH_TRAIN
    r4 was never written because the number lived only in prose)."""
    import subprocess

    def strip_own_flags(args):
        out, skip = [], False
        for a in args:
            if skip:
                skip = False
                continue
            if a.startswith(("--artifact", "--deadline")):
                # Both forms: "--artifact=X" and "--artifact X".
                skip = "=" not in a
                continue
            out.append(a)
        return out

    child_argv = (
        [sys.executable, os.path.abspath(__file__)]
        + strip_own_flags(argv)
        + ["--child"]
    )
    rec = None
    err = None
    try:
        proc = subprocess.run(
            child_argv, timeout=deadline_s, capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        sys.stderr.write(proc.stderr[-4000:])
        line = next(
            (ln for ln in reversed(proc.stdout.strip().splitlines())
             if ln.startswith("{")),
            None,
        )
        if proc.returncode == 0 and line:
            rec = json.loads(line)
        else:
            err = (
                f"child rc={proc.returncode}: "
                + (proc.stderr.strip().splitlines()[-1]
                   if proc.stderr.strip() else "no stderr")
            )
    except subprocess.TimeoutExpired as e:
        tail = e.stderr or b""
        if isinstance(tail, bytes):
            tail = tail.decode(errors="replace")
        sys.stderr.write(tail[-2000:])
        err = f"watchdog: child exceeded {deadline_s}s"
    if rec is None:
        rec = {
            "metric": "train_images_per_sec_per_chip_256px",
            "value": 0.0,
            "unit": "img/s",
            "error": err[:500],
        }
    rec["config"] = "tools/bench_train.py " + " ".join(
        a for a in strip_own_flags(argv) if a != "--child"
    )
    rec["device"] = "TPU v5e-1 (axon tunnel)"
    rec["date"] = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    with open(artifact, "w") as f:
        json.dump(rec, f, indent=2)
        f.write("\n")
    print(json.dumps(rec))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--no_frozen", action="store_true",
                   help="skip LPIPS/ArcFace losses")
    p.add_argument("--upfirdn_backend", default="xla",
                   choices=("xla", "pallas"))
    p.add_argument("--unfused", action="store_true",
                   help="dispatch D/R1/G/PPL as separate jit calls "
                        "(default: one fused dispatch per iteration)")
    p.add_argument("--fuse_reg", type=int, default=None,
                   help="override config.fuse_reg_iters (0/1)")
    p.add_argument("--fuse_r1", type=int, default=None,
                   help="override config.fuse_r1_iters (0/1)")
    p.add_argument("--remat_frozen", type=int, default=None,
                   help="override config.remat_frozen (0/1)")
    p.add_argument("--remat_reg", type=int, default=None,
                   help="override config.remat_reg (0/1)")
    p.add_argument("--share_noise", type=int, default=None,
                   help="override config.share_dg_noise (0/1)")
    p.add_argument("--fuse_limit", type=int, default=None,
                   help="override config.fuse_img_equiv_limit")
    p.add_argument("--rng_impl", default=None,
                   choices=("threefry2x32", "rbg", "unsafe_rbg"),
                   help="JAX PRNG implementation: threefry is ALU-heavy on "
                        "TPU and the generator draws per-layer noise every "
                        "forward; unsafe_rbg trades stream quality for "
                        "near-free on-device bits")
    p.add_argument("--artifact", default=None,
                   help="write the result JSON here (e.g. "
                        "BENCH_TRAIN_r05.json), running the measurement in "
                        "a killable child under --deadline; the artifact is "
                        "written even on timeout/crash (error field)")
    p.add_argument("--deadline", type=int, default=1500,
                   help="supervisor deadline seconds (cold fused-program "
                        "compiles take ~10 min on this host)")
    p.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
    args = p.parse_args()

    if args.artifact and not args.child:
        supervise(sys.argv[1:], args.artifact, args.deadline)
        return

    if args.rng_impl:
        import jax
        jax.config.update("jax_default_prng_impl", args.rng_impl)

    from fm3dgan.ops.upfirdn2d import set_backend
    from fm3dgan.train import TrainConfig, Trainer

    set_backend(args.upfirdn_backend)

    cfg_kwargs = {}
    if args.fuse_reg is not None:
        cfg_kwargs["fuse_reg_iters"] = bool(args.fuse_reg)
    if args.fuse_r1 is not None:
        cfg_kwargs["fuse_r1_iters"] = bool(args.fuse_r1)
    if args.remat_frozen is not None:
        cfg_kwargs["remat_frozen"] = bool(args.remat_frozen)
    if args.remat_reg is not None:
        cfg_kwargs["remat_reg"] = bool(args.remat_reg)
    if args.share_noise is not None:
        cfg_kwargs["share_dg_noise"] = bool(args.share_noise)
    if args.fuse_limit is not None:
        cfg_kwargs["fuse_img_equiv_limit"] = args.fuse_limit
    cfg = TrainConfig(
        size=args.size,
        rec_batch=args.batch,
        ds_batch=args.batch,
        compute_dtype=args.dtype,
        lpips_loss_lambda=0.0 if args.no_frozen else 3.0,
        face_id_loss_lambda=0.0 if args.no_frozen else 30.0,
        **cfg_kwargs,
    )
    t0 = time.time()
    trainer = Trainer(
        cfg,
        seed=0,
        use_lpips=not args.no_frozen,
        use_arcface=not args.no_frozen,
        fast_init=True,
    )
    print(f"# trainer built in {time.time() - t0:.1f}s", file=sys.stderr)

    rng = np.random.RandomState(0)
    s = args.size

    def batch(seed):
        # Pre-staged on device: over the remote-TPU tunnel, per-step host
        # uploads would dominate the measurement; in production the input
        # pipeline overlaps transfers with compute.
        r = np.random.RandomState(seed)
        photo = r.uniform(-1, 1, (args.batch, s, s, 3)).astype(np.float32)
        render = r.uniform(-1, 1, (args.batch, s, s, 3)).astype(np.float32)
        render[:, : s // 8] = -1.0
        return jnp.asarray(photo), jnp.asarray(render), jnp.asarray(photo)

    batches = [batch(100 + i) for i in range(4)]

    # Warmup / compile EVERY static combo the timed window will hit
    # (rec+R1+PPL, ds, rec plain, rec+PPL ... the cadence pattern repeats
    # every lcm(d_reg_every, g_reg_every) iterations): warm one full window,
    # then time an identically-phased later window so no compile or
    # cache-load lands inside the measurement.
    for i in range(16, 24):
        trainer.train_iteration(i, *batches[i % 4], fused=not args.unfused)
    sync(trainer.state)
    print("# compiled", file=sys.stderr)

    # Steady-state throughput: dispatch the whole window asynchronously and
    # sync ONCE — production training syncs only at logging points, so the
    # host pipeline (pytree flatten + tunnel RPC per dispatch) overlaps
    # device execution.  Per-iteration sync would serialize a ~0.3s host
    # round-trip into every step and understate throughput by ~40%.
    t0 = time.perf_counter()
    for i in range(args.iters):
        trainer.train_iteration(32 + i, *batches[i % 4], fused=not args.unfused)
    sync(trainer.state)
    wall = time.perf_counter() - t0
    # Window spans the full reg cadence: amortized over R1 (1/16) + PPL (1/4).
    dt = wall / args.iters

    # Synced variant: host-read after every iteration — what the reference's
    # per-iteration timing measures (torch loss.item() syncs each step).
    synced = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        trainer.train_iteration(48 + i, *batches[i % 4], fused=not args.unfused)
        sync(trainer.state)
        synced.append(time.perf_counter() - t0)
    dt_synced = float(np.median(synced))

    print(
        json.dumps(
            {
                "metric": "train_images_per_sec_per_chip_256px",
                "value": round(args.batch / dt, 2),
                "unit": "img/s",
                "batch": args.batch,
                "mean_step_s": round(dt, 4),
                "synced_img_per_sec": round(args.batch / dt_synced, 2),
                "synced_median_step_s": round(dt_synced, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
