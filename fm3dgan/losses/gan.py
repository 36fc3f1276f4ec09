"""GAN losses and R1 gradient penalty.

Parity with /root/reference/Util/training_util.py:39-58 and :46-52; the R1
double-backward is expressed as jax.grad of a grad-norm function (JAX
differentiates through it naturally under jit — no create_graph machinery).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def d_logistic_loss(real_pred: jax.Array, fake_pred: jax.Array) -> jax.Array:
    """softplus(-real).mean() + softplus(fake).mean()."""
    return jnp.mean(jax.nn.softplus(-real_pred)) + jnp.mean(
        jax.nn.softplus(fake_pred)
    )


def g_nonsaturating_loss(fake_pred: jax.Array) -> jax.Array:
    """softplus(-fake).mean()."""
    return jnp.mean(jax.nn.softplus(-fake_pred))


def d_r1_penalty(
    d_fn: Callable[[jax.Array], jax.Array], real_img: jax.Array
) -> jax.Array:
    """R1 penalty: mean over batch of ||d D(x)/d x||^2 (training_util.py:46-52).

    d_fn: image -> logits [N, 1] (closed over D params).  The result is
    differentiable w.r.t. the params inside d_fn (second-order autodiff).
    """
    grad = jax.grad(lambda img: jnp.sum(d_fn(img)))(real_img)
    return jnp.mean(jnp.sum(jnp.square(grad).reshape(grad.shape[0], -1), axis=1))
