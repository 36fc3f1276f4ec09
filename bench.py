"""Benchmark harness: edited images/sec/chip @256px.

Measures the production inference path (BASELINE.json headline): the
3-encoder forward — E_Tsr + E_W + E_W_Plus + StyleGAN2 synthesis — producing a
256x256 edited image from a (photo, render) pair, jitted on one TPU chip with
bfloat16 compute.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference repo publishes no numbers (BASELINE.md); the
baseline constant below is a documented engineering estimate of the reference
PyTorch stack's single-A100 throughput at batch size 16-64 (StyleGAN2 256px
synthesis plus ResNet18 x2 + IR-SE-18 encoders, fp16/TF32):
~200 edited images/sec.  Replace with a measured number when an A100 run of
the reference is available.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persist compiled executables across bench invocations.
jax.config.update("jax_compilation_cache_dir", "/tmp/fm3dgan_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_A100_IMGS_PER_SEC = 200.0

BATCH = 32
SIZE = 256
WARMUP = 3
ITERS = 10


def main():
    from fm3dgan.pipeline import FaceManipulator, forward_3_encoder

    models = FaceManipulator.create(
        size=SIZE, input_size=SIZE, dtype=jnp.bfloat16
    )
    # eval_shape-based init: values are irrelevant for throughput, and real
    # init programs take minutes to compile on small hosts.
    variables = models.init_variables_fast(seed=0)

    @jax.jit
    def step(photo, render):
        img, _ = forward_3_encoder(models, variables, photo, render)
        return img

    rng = np.random.RandomState(0)
    photo = jnp.asarray(rng.uniform(-1, 1, (BATCH, SIZE, SIZE, 3)).astype(np.float32))
    render = jnp.asarray(rng.uniform(-1, 1, (BATCH, SIZE, SIZE, 3)).astype(np.float32))

    for _ in range(WARMUP):
        step(photo, render).block_until_ready()

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = step(photo, render)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    imgs_per_sec = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "edited_images_per_sec_per_chip_256px",
                "value": round(imgs_per_sec, 2),
                "unit": "img/s",
                "vs_baseline": round(imgs_per_sec / REFERENCE_A100_IMGS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
