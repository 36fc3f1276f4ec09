"""Train state pytree and optimizer construction.

Replaces the reference's mutable module/optimizer choreography
(train_3_encoder.py:399-444) with a pure pytree: parameter partitions for
(G+encoders), D and D_edit; Adam with the reg-ratio-scaled lr and betas
(lr * r, betas (0^r, 0.99^r)); EMA generator params; PPL running mean.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from fm3dgan.train.config import TrainConfig


def make_g_enc_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    r = config.g_reg_ratio
    tx = optax.adam(
        learning_rate=config.lr * r, b1=0.0**r, b2=0.99**r, eps=1e-8
    )
    # Gate encoder partitions by their train flags (the reference's
    # requires_grad choreography, train_3_encoder.py:409-415).
    def label_fn(params):
        labels = {}
        for k in params:
            if k == "g":
                labels[k] = "train"
            elif k == "e_tsr":
                labels[k] = "train" if config.tsr_train else "frozen"
            elif k == "e_w":
                labels[k] = "train" if config.w_train else "frozen"
            elif k == "e_w_plus":
                labels[k] = "train" if config.w_plus_train else "frozen"
            else:
                labels[k] = "frozen"
        return {k: jax.tree.map(lambda _: v, params[k]) for k, v in labels.items()}

    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()}, label_fn
    )


def make_d_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    r = config.d_reg_ratio
    return optax.adam(
        learning_rate=config.lr * r, b1=0.0**r, b2=0.99**r, eps=1e-8
    )


@flax.struct.dataclass
class TrainState:
    """All mutable training state as one pytree (jit/shard-friendly)."""

    # Trainable parameter partitions.
    params: Dict[str, Any]  # {'g', 'e_tsr', 'e_w', 'e_w_plus', 'd', 'd_edit'}
    # Non-param variable collections (encoder batch_stats, generator noises).
    stats: Dict[str, Any]
    # EMA of generator params (g_ema, train_3_encoder.py:195-200,776).
    g_ema_params: Any
    # Optimizer states.
    g_enc_opt: Any
    d_opt: Any
    d_edit_opt: Optional[Any]
    # PPL running mean (train_3_encoder.py:774).
    mean_path_length: jax.Array
    # Step counter (host-driven schedule uses it only for logging).
    step: jax.Array

    @classmethod
    def create(cls, config: TrainConfig, params, stats, with_d_edit: bool):
        g_enc_tx = make_g_enc_optimizer(config)
        d_tx = make_d_optimizer(config)
        g_enc_partition = {
            k: params[k] for k in ("g", "e_tsr", "e_w", "e_w_plus")
        }
        return cls(
            params=params,
            stats=stats,
            g_ema_params=jax.tree.map(jnp.copy, params["g"]),
            g_enc_opt=g_enc_tx.init(g_enc_partition),
            d_opt=d_tx.init(params["d"]),
            d_edit_opt=d_tx.init(params["d_edit"]) if with_d_edit else None,
            mean_path_length=jnp.zeros((), jnp.float32),
            step=jnp.zeros((), jnp.int32),
        )
