#!/usr/bin/env python3
"""Micro-benchmarks for the core ops on TPU vs the HBM roofline.

Measures the StyleGAN2-hot upfirdn2d configurations (generator blur, 2x
upsample, 2x downsample, ToRGB skip upsample) under BOTH backends — the XLA
depthwise-conv lowering and the Pallas kernels — plus fused_leaky_relu,
reporting achieved bytes/s against the chip's approximate HBM bandwidth.
This is the decision table for which modes default to Pallas
(fm3dgan/ops/upfirdn2d.py mode dispatch).

  python tools/bench_ops.py [--batch 16] [--iters 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fm3dgan_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# v5e: ~819 GB/s HBM BW.
HBM_GBPS = 819.0


def _sync(out):
    # Host read: block_until_ready is a no-op over the remote-TPU tunnel.
    return float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))


def time_fn(fn, *args, iters=50, warmup=5):
    for _ in range(warmup):
        _sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--inner", type=int, default=50)
    p.add_argument("--dtype", default="float32")
    args = p.parse_args()
    dtype = jnp.dtype(args.dtype)
    bpe = dtype.itemsize

    import fm3dgan.ops.upfirdn2d as u_mod
    from fm3dgan.ops import fused_leaky_relu, make_kernel, upfirdn2d
    from fm3dgan.ops.upfirdn2d import upsample2d

    k = make_kernel([1, 3, 3, 1])
    rng = np.random.RandomState(0)
    n = args.batch
    K = args.inner  # per-call tunnel latency ~25ms: loop the op inside jit

    def looped(op):
        # Chain K applications (same-shape ops) so XLA can't elide them.
        @jax.jit
        def f(x):
            return jax.lax.fori_loop(0, K, lambda i, y: op(y), x)
        return f

    def looped_reduce(op):
        # Shape-changing ops: accumulate a scalar from each application of a
        # slightly perturbed input (data dependency via the loop carry).
        @jax.jit
        def f(x):
            def body(i, carry):
                s, x = carry
                out = op(x + s * 1e-20)
                return s + jnp.sum(out), x
            s, _ = jax.lax.fori_loop(
                0, K, body, (jnp.zeros((), x.dtype), x)
            )
            return s
        return f

    # (name, build(shape-preserving?), x, bytes_factor)
    # bytes_factor: (in + out) bytes as a multiple of input bytes.
    cases = []
    for h, c in [(8, 512), (16, 512), (32, 512), (64, 512), (128, 256), (256, 128)]:
        x = jnp.asarray(rng.randn(n, h, h, c).astype(dtype))
        cases.append(
            # pad (2,1), k=4: output shape == input shape (chainable).
            (f"blur k4 {h}x{h}x{c}",
             lambda: looped(lambda y: upfirdn2d(y, k, 1, 1, (2, 1))),
             x, 2.0)
        )
    for h, c in [(8, 512), (16, 512), (32, 512), (64, 512), (128, 256)]:
        x = jnp.asarray(rng.randn(n, h, h, c).astype(dtype))
        cases.append(
            (f"up2 k4 {h}x{h}x{c}",
             lambda: looped_reduce(lambda y: upfirdn2d(y, k * 4.0, 2, 1, (2, 1))),
             x, 5.0)
        )
    for h, c in [(16, 512), (32, 512), (64, 512), (128, 256), (256, 128)]:
        x = jnp.asarray(rng.randn(n, h, h, c).astype(dtype))
        cases.append(
            (f"down2 k4 {h}x{h}x{c}",
             lambda: looped_reduce(lambda y: upfirdn2d(y, k, 1, 2, (1, 1))),
             x, 1.25)
        )
    for h in [32, 64, 128]:
        x = jnp.asarray(rng.randn(n, h, h, 3).astype(dtype))
        cases.append(
            (f"up2 skip {h}x{h}x3",
             lambda: looped_reduce(lambda y: upsample2d(y, k)), x, 5.0)
        )

    print(f"{'case':24s} {'xla ms':>8s} {'GB/s':>7s}  {'pallas ms':>9s} "
          f"{'GB/s':>7s}  {'win':>7s}")
    for name, build, x, bytes_factor in cases:
        row = {}
        for backend in ("xla", "pallas"):
            u_mod.set_backend(backend)
            try:
                dt = time_fn(build(), x, iters=args.iters) / K
            finally:
                u_mod.set_backend("xla")
            nbytes = x.size * bpe * bytes_factor
            row[backend] = (dt, nbytes / dt / 1e9)
        speedup = row["xla"][0] / row["pallas"][0]
        print(
            f"{name:24s} {row['xla'][0]*1e3:8.3f} {row['xla'][1]:7.1f}  "
            f"{row['pallas'][0]*1e3:9.3f} {row['pallas'][1]:7.1f}  "
            f"{speedup:6.2f}x"
        )

    x = jnp.asarray(rng.randn(n, 256, 256, 128).astype(dtype))
    b = jnp.asarray(rng.randn(128).astype(dtype))
    fl = looped(lambda y: fused_leaky_relu(y, b))
    dt = time_fn(fl, x, iters=args.iters) / K
    gbps = x.size * bpe * 2 / dt / 1e9
    print(f"{'fused_lrelu 256x256x128':24s} {dt*1e3:8.3f} {gbps:7.1f}"
          f"  ({100*gbps/HBM_GBPS:.0f}% roof)")


if __name__ == "__main__":
    main()
