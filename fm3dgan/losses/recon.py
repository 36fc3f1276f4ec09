"""Reconstruction losses: L1, LPIPS, ArcFace identity.

Parity with /root/reference/Util/training_util.py:103-201.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

FACE_ID_LOSS_TYPE = ("MSE", "CosineSimilarity")

# Rec. 601 luma coefficients (training_util.py:140).
_GRAY_COEF = (0.2989, 0.587, 0.114)


def l1_loss(output: jax.Array, target: jax.Array) -> jax.Array:
    """mean(|out - ref|) (training_util.py:103-113)."""
    return jnp.mean(jnp.abs(output - target))


def lpips_loss(output, target, lpips_fn) -> jax.Array:
    """mean LPIPS distance (training_util.py:115-126); lpips_fn closed over
    frozen weights (fm3dgan/models/lpips.py)."""
    return jnp.mean(lpips_fn(output, target))


def rgb_to_grayscale(img: jax.Array) -> jax.Array:
    """[N,H,W,3] in [-1,1] -> [N,H,W,1] luma (training_util.py:130-146)."""
    coef = jnp.asarray(_GRAY_COEF, img.dtype)
    return jnp.sum(img * coef[None, None, None, :], axis=-1, keepdims=True)


def convert_for_face_recognition(img: jax.Array) -> jax.Array:
    """[N,256,256,3] in [-1,1] -> [N,128,128,1]: grayscale + 2x avg pool
    (training_util.py:148-161)."""
    gray = rgb_to_grayscale(img)
    n, h, w, c = gray.shape
    pooled = gray.reshape(n, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))
    return pooled


def face_identity_loss(
    output: jax.Array,
    target: jax.Array,
    face_rec_fn: Callable[[jax.Array], jax.Array],
    loss_type: str = "MSE",
) -> jax.Array:
    """ArcFace feature loss (training_util.py:178-201).

    face_rec_fn: [N,128,128,1] -> [N,512] embedding, closed over frozen params.
    """
    assert loss_type in FACE_ID_LOSS_TYPE
    out_feat = face_rec_fn(convert_for_face_recognition(output))
    tgt_feat = face_rec_fn(convert_for_face_recognition(target))
    if loss_type == "MSE":
        return jnp.mean(jnp.square(out_feat - tgt_feat))
    # mean(1 - cos_sim) with torch's eps-guarded norms.
    eps = 1e-8
    num = jnp.sum(out_feat * tgt_feat, axis=-1)
    den = jnp.maximum(
        jnp.linalg.norm(out_feat, axis=-1) * jnp.linalg.norm(tgt_feat, axis=-1),
        eps,
    )
    return jnp.mean(1.0 - num / den)
