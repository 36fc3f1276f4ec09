#!/usr/bin/env python3
"""Micro-benchmarks for the core ops on TPU vs the HBM roofline.

Measures the StyleGAN2-hot upfirdn2d configurations (generator blur, ToRGB
skip upsample, discriminator blur) and fused_leaky_relu, reporting achieved
bytes/s against the chip's approximate HBM bandwidth — the decision input for
which modes deserve Pallas kernels (vs XLA's depthwise-conv lowering).

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

    cases = []
    for h, c in [(8, 512), (16, 512), (32, 512), (64, 512), (128, 256), (256, 128)]:
        x = jnp.asarray(rng.randn(n, h, h, c).astype(dtype))
        cases.append(
            # pad (2,1), k=4: output shape == input shape (chainable).
            (f"blur k4 {h}x{h}x{c}",
             looped(lambda y: upfirdn2d(y, k, 1, 1, (2, 1))),
             x, 1.0)
        )
    for h in [32, 64, 128]:
        x = jnp.asarray(rng.randn(n, h, h, 3).astype(dtype))
        cases.append(
            (f"up2 skip {h}x{h}x3", looped_reduce(lambda y: upsample2d(y, k)), x, 4.0)
        )
    x = jnp.asarray(rng.randn(n, 256, 256, 128).astype(dtype))
    b = jnp.asarray(rng.randn(128).astype(dtype))
    cases.append(
        ("fused_lrelu 256x256x128", looped(lambda y: fused_leaky_relu(y, b)), x, 1.0)
    )

    print(f"{'case':28s} {'ms':>8s} {'GB/s':>8s} {'%roof':>6s}")
    for name, fn, x, out_factor in cases:
        dt = time_fn(fn, x, iters=args.iters) / K
        nbytes = x.size * bpe * (1 + out_factor)
        gbps = nbytes / dt / 1e9
        print(f"{name:28s} {dt*1e3:8.3f} {gbps:8.1f} {100*gbps/HBM_GBPS:5.1f}%")


if __name__ == "__main__":
    main()
