"""Geometry losses: face-regional mask MSE and landmark-heatmap loss.

Parity with /root/reference/Util/training_util.py:206-256.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def get_render_mask(render_img: jax.Array) -> jax.Array:
    """[N,H,W,3] -> [N,H,W] float mask where the render has content
    (mean over channels > -1, training_util.py:228-237)."""
    return (jnp.mean(render_img, axis=-1) > -1.0).astype(render_img.dtype)


def face_regional_loss(r_img: jax.Array, g_img: jax.Array) -> jax.Array:
    """MSE between render-masked render and render-masked output
    (training_util.py:240-256)."""
    mask = get_render_mask(r_img)[..., None]
    return jnp.mean(jnp.square(r_img * mask - g_img * mask))


def heat_map_loss(
    g_output: jax.Array,
    r_input: jax.Array,
    heatmap_fn: Callable[[jax.Array], jax.Array],
) -> jax.Array:
    """mean over batch of sum((H_render - H_gen)^2) over [N,64,64,68] FAN
    heatmaps (training_util.py:206-222).

    heatmap_fn: images [N,H,W,3] in [-1,1] -> heatmaps (the FAN landmark
    stack, fm3dgan/models/fan_landmark.py).  Disabled by default in the
    shipped config (hmap_loss_lambda=0, train_3_encoder_hyperparams.py:67).
    """
    hm_r = heatmap_fn(r_input)
    hm_g = heatmap_fn(g_output)
    return jnp.mean(jnp.sum(jnp.square(hm_r - hm_g), axis=(1, 2, 3)))
