"""2-encoder training steps (the reference's train.py variant).

Parity with /root/reference/train.py:464-530,700-740: the 2-encoder scheme
(E_Tsr + one modulation encoder, co-modulation modes) with the optional
FFHQ-based dual supervision branch — a second discriminator D_ffhq judging
edited outputs against pure-FFHQ reals, plus an identity loss, after which the
generated batch REPLACES g_input for the regular D/G steps
(train.py:715-730).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from fm3dgan.losses.gan import (
    d_logistic_loss,
    d_r1_penalty,
    g_nonsaturating_loss,
)
from fm3dgan.losses.recon import face_identity_loss
from fm3dgan.pipeline.forward import forward_2_encoder
from fm3dgan.train.config import TrainConfig
from fm3dgan.train.state import make_d_optimizer


def make_2encoder_ffhq_ds_steps(
    tensor_encoder,
    modulation_encoder,
    generator,
    d_module,
    config: TrainConfig,
    g_enc_tx: optax.GradientTransformation,
    arcface_module=None,
    mod_encode: str = "Render Image",
    co_modulation: Optional[str] = None,
):
    """Returns jitted {'d_ffhq_step', 'd_ffhq_reg_step', 'g_ffhq_ds_step'}.

    State layout: params keys 'tensor_encoder', 'modulation_encoder', 'g',
    'd_ffhq'; variables dicts carry batch_stats alongside.
    """
    d_tx = make_d_optimizer(config)
    enc_keys = ("g", "tensor_encoder", "modulation_encoder")

    def _fwd(params, stats, photo, render, train):
        variables = {
            k: {"params": params[k], **stats.get(k, {})}
            for k in ("tensor_encoder", "modulation_encoder", "g")
        }
        img, upd = forward_2_encoder(
            tensor_encoder,
            modulation_encoder,
            generator,
            variables,
            photo,
            render,
            mod_encode=mod_encode,
            co_modulation=co_modulation,
            sliced_layer=config.w_plus_sliced_layer,
            use_tanh=config.use_tanh,
            train=train,
        )
        new_stats = dict(stats)
        for k, v in upd.items():
            merged = dict(stats.get(k, {}))
            merged.update(v)
            new_stats[k] = merged
        return img, new_stats

    @jax.jit
    def d_ffhq_step(params, stats, d_opt, photo, r_edit, ffhq_ref):
        """D_ffhq logistic loss: fake = edit(photo, r_edit), real = pure FFHQ
        (train.py:715-716)."""
        fake, new_stats = _fwd(params, stats, photo, r_edit, train=True)
        fake = jax.lax.stop_gradient(fake)

        def loss_fn(d_params):
            out_pred = d_module.apply({"params": d_params}, fake)
            ref_pred = d_module.apply({"params": d_params}, ffhq_ref)
            return d_logistic_loss(ref_pred, out_pred)

        loss, grads = jax.value_and_grad(loss_fn)(params["d_ffhq"])
        updates, d_opt = d_tx.update(grads, d_opt, params["d_ffhq"])
        new_params = dict(params)
        new_params["d_ffhq"] = optax.apply_updates(params["d_ffhq"], updates)
        return new_params, new_stats, d_opt, {"d_ffhq": loss}

    @jax.jit
    def d_ffhq_reg_step(params, d_opt, ffhq_ref):
        def loss_fn(d_params):
            r1 = d_r1_penalty(
                lambda img: d_module.apply({"params": d_params}, img), ffhq_ref
            )
            return config.r1 / 2.0 * r1 * config.d_reg_every, r1

        (_, r1), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params["d_ffhq"]
        )
        updates, d_opt = d_tx.update(grads, d_opt, params["d_ffhq"])
        new_params = dict(params)
        new_params["d_ffhq"] = optax.apply_updates(params["d_ffhq"], updates)
        return new_params, d_opt, {"r1_ffhq": r1}

    @jax.jit
    def g_ffhq_ds_step(params, stats, g_opt, photo, r_edit, g_ref, frozen):
        """G step vs D_ffhq + identity loss; returns the (detached) generated
        batch which replaces g_input downstream (train.py:464-494)."""

        def loss_fn(enc_params):
            p = dict(params)
            p.update(enc_params)
            fake, new_stats = _fwd(p, stats, photo, r_edit, train=True)
            out_pred = d_module.apply({"params": params["d_ffhq"]}, fake)
            g_loss = g_nonsaturating_loss(out_pred)
            face_id = jnp.zeros((), fake.dtype)
            if arcface_module is not None and config.face_id_loss_lambda > 0:
                face_id = config.face_id_loss_lambda * face_identity_loss(
                    fake,
                    g_ref,
                    lambda x: arcface_module.apply(frozen["arcface"], x),
                    config.face_id_loss_type,
                )
            total = g_loss + face_id
            return total, (g_loss, face_id, fake, new_stats)

        enc_params = {k: params[k] for k in enc_keys}
        (_, (g_loss, face_id, fake, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(enc_params)
        updates, g_opt = g_enc_tx.update(grads, g_opt, enc_params)
        new_params = dict(params)
        new_params.update(optax.apply_updates(enc_params, updates))
        metrics = {"g_ffhq": g_loss, "face_id_ffhq": face_id}
        return (
            new_params,
            new_stats,
            g_opt,
            jax.lax.stop_gradient(fake),
            metrics,
        )

    return {
        "d_ffhq_step": d_ffhq_step,
        "d_ffhq_reg_step": d_ffhq_reg_step,
        "g_ffhq_ds_step": g_ffhq_ds_step,
    }
