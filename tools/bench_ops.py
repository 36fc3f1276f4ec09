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


def time_fn(fn, *args, iters=50, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--dtype", default="float32")
    args = p.parse_args()
    dtype = jnp.dtype(args.dtype)
    bpe = dtype.itemsize

    from fm3dgan.ops import fused_leaky_relu, make_kernel, upfirdn2d
    from fm3dgan.ops.upfirdn2d import upsample2d

    k = make_kernel([1, 3, 3, 1])
    rng = np.random.RandomState(0)
    n = args.batch

    # (name, fn, x_shape, out_elems_factor)
    cases = []
    for h, c in [(8, 512), (16, 512), (32, 512), (64, 512), (128, 256), (256, 128)]:
        x = jnp.asarray(rng.randn(n, h, h, c).astype(dtype))
        cases.append(
            (f"blur k4 {h}x{h}x{c}", jax.jit(lambda x: upfirdn2d(x, k, 1, 1, (1, 1))), x, 1.0)
        )
    for h in [4, 8, 16, 32, 64, 128]:
        x = jnp.asarray(rng.randn(n, h, h, 3).astype(dtype))
        cases.append(
            (f"up2 skip {h}x{h}x3", jax.jit(lambda x: upsample2d(x, k)), x, 4.0)
        )
    x = jnp.asarray(rng.randn(n, 256, 256, 128).astype(dtype))
    b = jnp.asarray(rng.randn(128).astype(dtype))
    cases.append(
        ("fused_lrelu 256x256x128", jax.jit(lambda x: fused_leaky_relu(x, b)), x, 1.0)
    )

    print(f"{'case':28s} {'ms':>8s} {'GB/s':>8s} {'%roof':>6s}")
    for name, fn, x, out_factor in cases:
        dt = time_fn(fn, x, iters=args.iters)
        nbytes = x.size * bpe * (1 + out_factor)
        gbps = nbytes / dt / 1e9
        print(f"{name:28s} {dt*1e3:8.3f} {gbps:8.1f} {100*gbps/HBM_GBPS:5.1f}%")


if __name__ == "__main__":
    main()
