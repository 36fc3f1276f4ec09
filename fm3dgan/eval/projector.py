"""Image projection (GAN inversion).

Parity with /root/reference/Evaluation/image_projection/: optimize
(avg-W latent + per-layer noises) to reconstruct a target image
(Image_Projector, image_projector.py:67-147) with an MSE -> MSE+LPIPS loss
schedule (project/__init__.py:147-221) and Adam-with-cosine-ramp-lr or L-BFGS
optimizers (project/__init__.py:228-333; the reference vendors a 1.1k-LoC
FullBatchLBFGS — here optax.lbfgs provides the native equivalent).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def get_avg_w_latent(generator, g_variables, key, n_samples: int = 1000):
    """Mean mapped W over n random z (Get_Avg_W_as_Latent,
    image_projector.py:30-59)."""
    z = jax.random.normal(key, (n_samples, generator.style_dim))
    w = generator.apply(g_variables, method=lambda m: m.get_latent(z))
    return jnp.mean(w, axis=0, keepdims=True)


def cosine_ramp_lr(base_lr: float, total_steps: int, rampup: float = 0.05,
                   rampdown: float = 0.25) -> Callable[[int], float]:
    """StyleGAN2-projector lr schedule (project/__init__.py:228-234)."""

    def schedule(step):
        t = step / max(1, total_steps)
        lr_ramp = jnp.minimum(1.0, (1.0 - t) / rampdown)
        lr_ramp = 0.5 - 0.5 * jnp.cos(lr_ramp * math.pi)
        lr_ramp = lr_ramp * jnp.minimum(1.0, t / rampup)
        return base_lr * lr_ramp

    return schedule


@dataclasses.dataclass
class ProjectorConfig:
    steps: int = 1000
    lr: float = 0.1
    optimizer: str = "adam"  # 'adam' | 'lbfgs'
    lpips_start_step: int = 500  # MSE-only before, MSE+LPIPS after
    mse_weight: float = 1.0
    lpips_weight: float = 1.0


def project_image(
    generator,
    g_variables,
    target: jax.Array,
    key: jax.Array,
    lpips_fn: Optional[Callable] = None,
    config: Optional[ProjectorConfig] = None,
) -> Dict[str, Any]:
    """Optimize (W, noises) to reconstruct ``target`` [1,H,W,3] in [-1,1].

    Returns {'latent', 'noises', 'image', 'losses'}.
    """
    config = config or ProjectorConfig()
    k_avg, k_noise = jax.random.split(key)
    avg_w = get_avg_w_latent(generator, g_variables, k_avg)
    noises = generator.apply(
        g_variables, method=lambda m: m.make_noise(k_noise)
    )
    opt_params = {"latent": avg_w, "noises": noises}

    def synth(p):
        return generator.apply(
            g_variables,
            input_is_latent=True,
            latent_styles=[p["latent"]],
            noise=list(p["noises"]),
        )

    def loss_fn(p, use_lpips):
        img = synth(p)
        loss = config.mse_weight * jnp.mean(jnp.square(img - target))
        if use_lpips and lpips_fn is not None:
            loss = loss + config.lpips_weight * jnp.mean(lpips_fn(img, target))
        return loss

    if config.optimizer == "lbfgs":
        tx = optax.lbfgs()
    else:
        tx = optax.adam(cosine_ramp_lr(config.lr, config.steps))
    opt_state = tx.init(opt_params)

    @jax.jit
    def step_mse(p, s):
        loss, grads = jax.value_and_grad(lambda q: loss_fn(q, False))(p)
        updates, s = tx.update(
            grads, s, p, value=loss,
            grad=grads, value_fn=lambda q: loss_fn(q, False),
        ) if config.optimizer == "lbfgs" else tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    @jax.jit
    def step_full(p, s):
        loss, grads = jax.value_and_grad(lambda q: loss_fn(q, True))(p)
        updates, s = tx.update(
            grads, s, p, value=loss,
            grad=grads, value_fn=lambda q: loss_fn(q, True),
        ) if config.optimizer == "lbfgs" else tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    losses = []
    for i in range(config.steps):
        step = step_mse if i < config.lpips_start_step else step_full
        opt_params, opt_state, loss = step(opt_params, opt_state)
        losses.append(float(loss))

    final_img = synth(opt_params)
    return {
        "latent": opt_params["latent"],
        "noises": opt_params["noises"],
        "image": final_img,
        "losses": losses,
    }


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 2.0) -> float:
    """PSNR on [-1,1] images (image_projector.py:151-219)."""
    mse = float(np.mean(np.square(np.asarray(a) - np.asarray(b))))
    return 10.0 * math.log10(peak**2 / mse)
