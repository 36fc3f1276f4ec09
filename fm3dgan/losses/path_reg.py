"""Path-length (PPL) regularizer.

Parity with /root/reference/Util/training_util.py:24-37 /
stylegan2.py:683-688: path_lengths = sqrt(mean_layers(sum_dim |J^T y|^2)) where
y is white noise scaled by 1/sqrt(H*W), J the image-latent Jacobian.

TPU-native formulation: the reference computes autograd.grad inside the
generator forward; here the same quantity is one jax.vjp against the
latent->image function — jit-compatible and second-order differentiable.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def path_regularize(
    g_fn: Callable[[jax.Array], jax.Array],
    latent: jax.Array,
    mean_path_length: jax.Array,
    key: jax.Array,
    decay: float = 0.01,
    noise: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Compute (path_penalty, new_mean_path_length, path_lengths).

    g_fn: latent [N, n_latent, D] -> image [N, H, W, C], closed over params
      (differentiable through to them).
    latent: the W+ latent input.
    mean_path_length: running EMA scalar (carried in train state).
    noise: optional pre-drawn white-noise image (already 1/sqrt(H*W)-scaled);
      default draws it from ``key`` like the reference's randn_like
      (training_util.py:25-27).  Used by golden-parity tests to feed both
      frameworks the identical noise.
    """
    fake_img, vjp_fn = jax.vjp(g_fn, latent)
    n, h, w, _ = fake_img.shape
    if noise is None:
        noise = jax.random.normal(
            key, fake_img.shape, fake_img.dtype
        ) / jnp.sqrt(jnp.asarray(h * w, fake_img.dtype))
    (grad,) = vjp_fn(noise)
    # grad: [N, n_latent, D]; sqrt(mean over layers of sum over D of grad^2).
    path_lengths = jnp.sqrt(jnp.mean(jnp.sum(jnp.square(grad), axis=2), axis=1))
    path_mean = mean_path_length + decay * (
        jnp.mean(path_lengths) - mean_path_length
    )
    # NB: the reference does NOT detach path_mean inside the penalty (only the
    # returned running mean is detached, training_util.py:33-37).
    path_penalty = jnp.mean(jnp.square(path_lengths - path_mean))
    return path_penalty, jax.lax.stop_gradient(path_mean), path_lengths
