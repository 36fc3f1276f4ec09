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
from fm3dgan.pipeline.forward import encode_2_encoder, forward_2_encoder
from fm3dgan.train.config import TrainConfig
from fm3dgan.train.state import make_d_optimizer
from fm3dgan.train.steps import _norm_input


def make_2encoder_step_fns(
    tensor_encoder,
    modulation_encoder,
    generator,
    d_module,
    config: TrainConfig,
    lpips_module=None,
    arcface_module=None,
    mod_encode: str = "Render Image",
    co_modulation: Optional[str] = None,
):
    """Jitted D/R1/G/PPL/EMA steps for the 2-encoder scheme — the train.py
    counterpart of fm3dgan.train.steps.make_step_fns (train.py:391-530).

    State is a plain dict:
      {'params': {tensor_encoder, modulation_encoder, g, d, d_ffhq},
       'stats': {...}, 'g_ema': ..., 'g_opt': ..., 'd_opt': ...,
       'd_ffhq_opt': ..., 'mean_path_length': ...}
    """
    from fm3dgan.losses.geometry import face_regional_loss
    from fm3dgan.losses.path_reg import path_regularize
    from fm3dgan.losses.recon import l1_loss

    d_tx = make_d_optimizer(config)
    r = config.g_reg_ratio
    g_tx = optax.adam(config.lr * r, b1=0.0**r, b2=0.99**r, eps=1e-8)
    enc_keys = ("g", "tensor_encoder", "modulation_encoder")

    def _vars(params, stats, key):
        return {"params": params[key], **stats.get(key, {})}

    def _fwd(params, stats, photo, render, train, noise_rng=None):
        variables = {k: _vars(params, stats, k) for k in enc_keys}
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
            noise_rng=noise_rng,
        )
        new_stats = dict(stats)
        for k, v in upd.items():
            merged = dict(stats.get(k, {}))
            merged.update(v)
            new_stats[k] = merged
        return img, new_stats

    def _d_update_from_fake(state, fake_sg, ref, new_stats):
        """D loss/grad/optimizer update given an already stop-gradiented
        fake batch (shared by d_step and the shared-forward fused step).
        Plain (un-jitted): both callers trace it inside their own jitted
        programs — jitting it here would split d_step's generator forward
        out of the single compiled program."""

        def loss_fn(d_params):
            out_pred = d_module.apply({"params": d_params}, fake_sg)
            ref_pred = d_module.apply({"params": d_params}, ref)
            return d_logistic_loss(ref_pred, out_pred), (
                jnp.mean(ref_pred),
                jnp.mean(out_pred),
            )

        (loss, (rs, os_)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"]["d"]
        )
        updates, new_opt = d_tx.update(grads, state["d_opt"], state["params"]["d"])
        state = dict(state)
        state["params"] = dict(state["params"])
        state["params"]["d"] = optax.apply_updates(state["params"]["d"], updates)
        state["stats"] = new_stats
        state["d_opt"] = new_opt
        return state, {"d": loss, "ref_score": rs, "out_score": os_}

    @functools.partial(jax.jit, donate_argnums=(0,))
    def d_step(state, photo, render, ref, rng):
        photo, render, ref = map(_norm_input, (photo, render, ref))
        fake, new_stats = _fwd(
            state["params"], state["stats"], photo, render, True, rng
        )
        return _d_update_from_fake(
            state, jax.lax.stop_gradient(fake), ref, new_stats
        )

    def _d_reg_impl(state, ref):
        ref = _norm_input(ref)

        def loss_fn(d_params):
            d_fn = lambda img: d_module.apply({"params": d_params}, img)
            if config.remat_reg:
                d_fn = jax.checkpoint(d_fn)
            r1 = d_r1_penalty(d_fn, ref)
            return config.r1 / 2.0 * r1 * config.d_reg_every, r1

        (_, r1), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"]["d"]
        )
        updates, new_opt = d_tx.update(grads, state["d_opt"], state["params"]["d"])
        state = dict(state)
        state["params"] = dict(state["params"])
        state["params"]["d"] = optax.apply_updates(state["params"]["d"], updates)
        state["d_opt"] = new_opt
        return state, {"r1": r1}

    d_reg_step = functools.partial(jax.jit, donate_argnums=(0,))(_d_reg_impl)

    def _g_losses(
        fake, d_params, photo, render, ref, frozen,
        ds_flag: bool, extreme_ds_flag: bool,
    ):
        """GAN + reconstruction loss stack over a generated batch
        (train.py:507-533 lambda schedule) — shared by the G step and the
        fused shared-forward iteration."""
        shrink = config.ep_lpips_l1_weight_shrink if extreme_ds_flag else 1.0
        lpips_l = config.lpips_loss_lambda / shrink
        l1_l = config.l1_loss_lambda / shrink
        if not ds_flag:
            face_reg_l = config.rec_face_reg_loss_lambda
        elif not extreme_ds_flag:
            face_reg_l = config.ds_face_reg_loss_lambda
        else:
            face_reg_l = config.ep_face_reg_loss_lambda

        out_pred = d_module.apply({"params": d_params}, fake)
        g_loss = g_nonsaturating_loss(out_pred)
        # Frozen nets rematerialized (only input grads needed) — same
        # HBM rationale as steps.py::_g_impl.
        remat = jax.checkpoint if config.remat_frozen else (lambda f: f)
        lp = jnp.zeros((), fake.dtype)
        if lpips_module is not None and lpips_l > 0:
            lp = lpips_l * remat(
                lambda a, b: jnp.mean(
                    lpips_module.apply(frozen["lpips"], a, b)
                )
            )(fake, ref)
        l1 = l1_l * l1_loss(fake, ref)
        fid_loss = jnp.zeros((), fake.dtype)
        if arcface_module is not None and config.face_id_loss_lambda > 0:
            id_ref = photo if extreme_ds_flag else ref
            fid_loss = config.face_id_loss_lambda * remat(
                lambda a, b: face_identity_loss(
                    a, b,
                    lambda x: arcface_module.apply(frozen["arcface"], x),
                    config.face_id_loss_type,
                )
            )(fake, id_ref)
        freg = (
            face_reg_l * face_regional_loss(render, fake)
            if face_reg_l > 0
            else jnp.zeros((), fake.dtype)
        )
        total = g_loss + lp + l1 + fid_loss + freg
        metrics = {
            "g": g_loss, "lpips": lp, "l1": l1, "face_id": fid_loss,
            "face_reg": freg,
        }
        return total, metrics

    @functools.partial(
        jax.jit,
        static_argnames=("ds_flag", "extreme_ds_flag", "apply_ema"),
        donate_argnums=(0,),
    )
    def g_step(
        state, photo, render, ref, rng, frozen,
        ds_flag: bool, extreme_ds_flag: bool, apply_ema: bool = True,
    ):
        photo, render, ref = map(_norm_input, (photo, render, ref))

        def loss_fn(enc_params):
            p = dict(state["params"])
            p.update(enc_params)
            fake, new_stats = _fwd(p, state["stats"], photo, render, True, rng)
            total, metrics = _g_losses(
                fake, state["params"]["d"], photo, render, ref, frozen,
                ds_flag, extreme_ds_flag,
            )
            return total, (metrics, new_stats)

        enc_params = {k: state["params"][k] for k in enc_keys}
        (_, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(enc_params)
        updates, new_opt = g_tx.update(grads, state["g_opt"], enc_params)
        new_enc = optax.apply_updates(enc_params, updates)
        state = dict(state)
        state["params"] = dict(state["params"])
        state["params"].update(new_enc)
        state["stats"] = new_stats
        state["g_opt"] = new_opt
        if apply_ema:
            d = config.ema_decay
            state["g_ema"] = jax.tree.map(
                lambda e, p_: d * e + (1 - d) * p_,
                state["g_ema"],
                state["params"]["g"],
            )
        return state, metrics

    def _g_reg_impl(state, photo, render, rng, apply_ema: bool = True):
        photo, render = _norm_input(photo), _norm_input(render)
        noise_key, ppl_key = jax.random.split(rng)

        def loss_fn(enc_params):
            p = dict(state["params"])
            p.update(enc_params)
            # Encode without the generator, then PPL against the latent —
            # all co-modulation modes route through the same latent space
            # (Forward_Inference with PPL_regularize, train.py:495-530 /
            # network_util.py:232-282).  train=True: the reference keeps the
            # encoders in train() mode through the PPL forward, so BN uses
            # batch stats and the running stats advance here too.
            variables = {k: _vars(p, state["stats"], k) for k in enc_keys}
            latent, tensor, upd = encode_2_encoder(
                tensor_encoder,
                modulation_encoder,
                generator,
                variables,
                photo,
                render,
                mod_encode=mod_encode,
                co_modulation=co_modulation,
                sliced_layer=config.w_plus_sliced_layer,
                train=True,
            )
            new_stats = dict(state["stats"])
            for k, v in upd.items():
                merged = dict(state["stats"].get(k, {}))
                merged.update(v)
                new_stats[k] = merged

            def g_fn(lat):
                g_kwargs = dict(
                    input_is_latent=True,
                    latent_styles=[lat],
                    randomize_noise=True,
                    rngs={"noise": noise_key},
                )
                if tensor is not None:
                    g_kwargs["external_input_tensor"] = tensor
                return generator.apply(variables["g"], **g_kwargs)

            if config.remat_reg:
                g_fn = jax.checkpoint(g_fn)
            penalty, new_mean, pl = path_regularize(
                g_fn, latent, state["mean_path_length"], ppl_key
            )
            weighted = config.path_reg_weight * config.g_reg_every * penalty
            return weighted, (penalty, new_mean, jnp.mean(pl), new_stats)

        enc_params = {k: state["params"][k] for k in enc_keys}
        (_, (penalty, new_mean, mean_pl, new_stats)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(enc_params)
        )
        updates, new_opt = g_tx.update(grads, state["g_opt"], enc_params)
        new_enc = optax.apply_updates(enc_params, updates)
        state = dict(state)
        state["params"] = dict(state["params"])
        state["params"].update(new_enc)
        state["g_opt"] = new_opt
        state["mean_path_length"] = new_mean
        state["stats"] = new_stats
        if apply_ema:
            d = config.ema_decay
            state["g_ema"] = jax.tree.map(
                lambda e, p_: d * e + (1 - d) * p_,
                state["g_ema"],
                state["params"]["g"],
            )
        return state, {"g_reg": penalty, "path_length": mean_pl}

    g_reg_step = functools.partial(
        jax.jit, static_argnames=("apply_ema",), donate_argnums=(0,)
    )(_g_reg_impl)

    # ---------------- Fused shared-forward iteration -----------------------
    # share_dg_noise fast path (≙ steps.py::fused_shared_iteration_step for
    # the 3-encoder driver): ONE encoder+generator forward serves both the D
    # update (stop-gradient'd fake) and the G update (downstream loss grad
    # pulled back through jax.vjp), and the whole iteration — optionally
    # including the R1/PPL regularizers — is a single jitted dispatch.
    # Semantics vs the reference train.py: D and G see the same generated
    # batch (the reference regenerates with fresh noise, train.py:464,507)
    # and BN running stats advance once per iteration instead of twice —
    # opt-in via config.share_dg_noise.

    @functools.partial(
        jax.jit,
        static_argnames=("ds_flag", "extreme_ds_flag", "do_r1", "do_g_reg"),
        donate_argnums=(0,),
    )
    def fused_shared_iteration_step(
        state,
        photo,
        render,
        ref,
        d_rng,
        ppl_rng,
        ppl_idx,
        frozen,
        ds_flag: bool,
        extreme_ds_flag: bool,
        do_r1: bool,
        do_g_reg: bool,
    ):
        photo, render, ref = map(_norm_input, (photo, render, ref))
        metrics: Dict[str, Any] = {}
        enc_params = {k: state["params"][k] for k in enc_keys}

        def fwd(ep):
            p = dict(state["params"])
            p.update(ep)
            return _fwd(p, state["stats"], photo, render, True, d_rng)

        fake, pullback, new_stats = jax.vjp(fwd, enc_params, has_aux=True)
        fake_sg = jax.lax.stop_gradient(fake)

        # --- D update (the d_step body, reusing the shared fake) ---
        state, d_metrics = _d_update_from_fake(state, fake_sg, ref, new_stats)
        metrics.update(d_metrics)

        if do_r1:
            state, r1_m = _d_reg_impl(state, ref)
            metrics.update(r1_m)

        # --- G update: downstream loss grad w.r.t. fake, pulled back ---
        def downstream(fk):
            return _g_losses(
                fk, state["params"]["d"], photo, render, ref, frozen,
                ds_flag, extreme_ds_flag,
            )

        (_, g_metrics), grad_fake = jax.value_and_grad(
            downstream, has_aux=True
        )(fake)
        (g_grads,) = pullback(grad_fake)
        metrics.update(g_metrics)

        updates, new_g_opt = g_tx.update(g_grads, state["g_opt"], enc_params)
        new_enc = optax.apply_updates(enc_params, updates)
        state["params"].update(new_enc)
        state["g_opt"] = new_g_opt
        if not do_g_reg:
            d = config.ema_decay
            state["g_ema"] = jax.tree.map(
                lambda e, p_: d * e + (1 - d) * p_,
                state["g_ema"],
                state["params"]["g"],
            )

        if do_g_reg:
            p_sub = jnp.take(photo, ppl_idx, axis=0)
            r_sub = jnp.take(render, ppl_idx, axis=0)
            state, gr_m = _g_reg_impl(state, p_sub, r_sub, ppl_rng, True)
            metrics.update(gr_m)
        return state, metrics

    return {
        "d_step": d_step,
        "d_reg_step": d_reg_step,
        "g_step": g_step,
        "g_reg_step": g_reg_step,
        "fused_shared_iteration_step": fused_shared_iteration_step,
    }


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
            d_fn = lambda img: d_module.apply({"params": d_params}, img)
            if config.remat_reg:
                d_fn = jax.checkpoint(d_fn)
            r1 = d_r1_penalty(d_fn, ffhq_ref)
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
                remat = (
                    jax.checkpoint if config.remat_frozen else (lambda f: f)
                )
                face_id = config.face_id_loss_lambda * remat(
                    lambda a, b: face_identity_loss(
                        a,
                        b,
                        lambda x: arcface_module.apply(frozen["arcface"], x),
                        config.face_id_loss_type,
                    )
                )(fake, g_ref)
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
