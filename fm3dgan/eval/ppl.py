"""Perceptual path length (parity with /root/reference/Evaluation/ppl.py:42-137).

W-space lerp pairs with eps=1e-4 -> LPIPS distance -> 1/99-percentile filter
-> mean.  (Note the reference does NOT divide by eps^2; we reproduce that.)
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def generate_interpolated_images(
    style_fn: Callable[[jax.Array], jax.Array],
    synthesis_fn: Callable[[jax.Array], jax.Array],
    key: jax.Array,
    batch_size: int,
    latent_dim: int,
    eps: float = 1e-4,
) -> jax.Array:
    """Pairs of images at W-space lerp t and t+eps (ppl.py:42-80).

    style_fn: z -> W.  synthesis_fn: W [N,D] -> image (deterministic noise).
    Returns [2*batch, H, W, 3] with pairs interleaved.
    """
    kz, kt = jax.random.split(key)
    z = jax.random.normal(kz, (batch_size * 2, latent_dim))
    t = jax.random.uniform(kt, (batch_size, 1))
    latent = style_fn(z)
    l0, l1 = latent[::2], latent[1::2]
    e0 = l0 + t * (l1 - l0)
    e1 = l0 + (t + eps) * (l1 - l0)
    interleaved = jnp.stack([e0, e1], axis=1).reshape(latent.shape)
    return synthesis_fn(interleaved)


def get_ppl_score(
    style_fn: Callable,
    synthesis_fn: Callable,
    lpips_fn: Callable,
    n_sample: int,
    batch_size: int,
    latent_dim: int = 512,
    eps: float = 1e-4,
    key: Optional[jax.Array] = None,
    info_print: bool = False,
) -> float:
    """PPL with 1/99 percentile filtering (ppl.py:83-137)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    n_batch = max(1, n_sample // batch_size)
    distances = []
    for idx in range(n_batch):
        if info_print:
            print(f"Evaluating Batch: {idx}")
        key, sub = jax.random.split(key)
        img = generate_interpolated_images(
            style_fn, synthesis_fn, sub, batch_size, latent_dim, eps
        )
        if img.shape[1] > 256:
            img = jax.image.resize(
                img, (img.shape[0], 256, 256, img.shape[3]), method="bilinear"
            )
        dist = lpips_fn(img[::2], img[1::2])
        distances.append(np.asarray(dist).reshape(-1))
    distances = np.concatenate(distances, axis=0)
    lo = np.percentile(distances, 1, method="lower")
    hi = np.percentile(distances, 99, method="higher")
    filtered = distances[(distances >= lo) & (distances <= hi)]
    return float(filtered.mean())
