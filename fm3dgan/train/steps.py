"""Jitted training step functions.

Pure-function counterparts of the reference's backward drivers
(train_3_encoder.py:448-596): the mutable requires_grad choreography becomes
parameter partitions (grads taken only w.r.t. the partition being trained),
and each step returns a new TrainState.

Four steps per the reference cadence (train_3_encoder.py:779-822):
  d_step      — GAN logistic loss on the active D (D or D_edit)
  d_reg_step  — lazy R1 every d_reg_every iters
  g_step      — GAN + LPIPS + L1 + FaceID (+ FaceRegional/heatmap) on G+encoders
  g_reg_step  — lazy path-length regularizer every g_reg_every iters
plus the g_ema update (train_3_encoder.py:195-200).

All steps run under jit; multi-chip data parallelism comes from calling them
with batch arrays sharded over the mesh 'data' axis and replicated state
(fm3dgan/parallel/mesh.py) — XLA inserts the gradient all-reduces.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from fm3dgan.losses.gan import (
    d_logistic_loss,
    d_r1_penalty,
    g_nonsaturating_loss,
)
from fm3dgan.losses.geometry import face_regional_loss
from fm3dgan.losses.path_reg import path_regularize
from fm3dgan.losses.recon import face_identity_loss, l1_loss
from fm3dgan.pipeline.forward import FaceManipulator, _combine_w_wplus
from fm3dgan.train.config import TrainConfig
from fm3dgan.train.state import TrainState, make_d_optimizer, make_g_enc_optimizer


def _variables(params: Dict[str, Any], stats: Dict[str, Any], key: str):
    v = {"params": params[key]}
    v.update(stats.get(key, {}))
    return v


def _norm_input(x):
    """Accept uint8 image batches and normalize ON DEVICE.

    (x/255)*2-1 — exactly the host default_transform (datasets.py), so the
    uint8 and float32 input paths are bit-identical.  uint8 batches cross
    host->device as 1/4 the bytes: the r5 campaign measured the tunneled
    TPU's steady state as TRANSFER-bound (load_s ~0.5s/iter for 38MB of
    f32 batches; the same batch moves in ~24ms as uint8).  float inputs
    pass through untouched, so pre-normalized pipelines keep working.
    """
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) * (2.0 / 255.0) - 1.0
    return x


def _encode(models, params, stats, photo, render, config, train):
    """Run the 3 encoders; returns (tensor, latent, new_stats)."""
    tsr_input = photo if config.tsr_encode == "Photo Image" else render
    new_stats = dict(stats)

    def apply_enc(module, key, x):
        if train:
            out, upd = module.apply(
                _variables(params, stats, key), x, train=True,
                mutable=["batch_stats"],
            )
            merged = dict(stats.get(key, {}))
            merged.update(upd)
            new_stats[key] = merged
            return out
        return module.apply(_variables(params, stats, key), x)

    tensor = apply_enc(models.e_tsr, "e_tsr", tsr_input)
    w = apply_enc(models.e_w, "e_w", render)
    w_plus = apply_enc(models.e_w_plus, "e_w_plus", photo)
    latent = _combine_w_wplus(w, w_plus, config.w_plus_sliced_layer)
    return tensor, latent, new_stats


def _generate(models, params, stats, latent, tensor, config, noise_rng):
    g_vars = _variables(params, stats, "g")
    img = models.generator.apply(
        g_vars,
        input_is_latent=True,
        latent_styles=[latent],
        external_input_tensor=tensor,
        randomize_noise=noise_rng is not None,
        rngs={"noise": noise_rng} if noise_rng is not None else None,
    )
    if config.use_tanh:
        img = jnp.tanh(img)
    return img


def forward_full(models, params, stats, photo, render, config, noise_rng, train):
    tensor, latent, new_stats = _encode(
        models, params, stats, photo, render, config, train
    )
    img = _generate(models, params, stats, latent, tensor, config, noise_rng)
    return img, new_stats


def make_step_fns(
    models: FaceManipulator,
    d_module,
    config: TrainConfig,
    lpips_module=None,
    arcface_module=None,
    fan_module=None,
    fan_input_size: int = 256,
):
    """Build the jitted step functions.

    d_module: the Discriminator module definition (shared by D and D_edit).
    lpips_module/arcface_module/fan_module: frozen-net module defs; their
    variables are passed per-call in ``frozen``
    ({'lpips':..., 'arcface':..., 'fan':...}).
    fan_input_size: resolution the heatmap FAN consumes (256 for the
    pretrained 2DFAN-4; smaller for smoke tests with random weights).
    """
    g_enc_tx = make_g_enc_optimizer(config)
    d_tx = make_d_optimizer(config)

    # ---------------- D step (train_3_encoder.py:448-477) ----------------

    def _d_update_from_fake(
        state: TrainState, fake_sg, ref, use_edit: bool, new_stats
    ):
        """D loss/grad/optimizer update given an already stop-gradiented
        fake batch (shared by the plain D step and the shared-forward fused
        iteration, which reuses ONE generator forward for both updates)."""
        d_key = "d_edit" if use_edit else "d"

        def loss_fn(d_params):
            # Two separate B-batch D calls (the reference's shape,
            # train_3_encoder.py:454-458).  A vmapped pass over the stacked
            # (fake, ref) pair is mathematically identical (proven in
            # tests/test_models.py) but measured ~9% slower end-to-end on
            # v5e — the batched-axis lowering of minibatch-stddev's grouped
            # reshape inserts extra copies.
            out_pred = d_module.apply({"params": d_params}, fake_sg)
            ref_pred = d_module.apply({"params": d_params}, ref)
            loss = d_logistic_loss(ref_pred, out_pred)
            return loss, (jnp.mean(ref_pred), jnp.mean(out_pred))

        (loss, (ref_score, out_score)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params[d_key])

        opt_state = state.d_edit_opt if use_edit else state.d_opt
        updates, new_opt = d_tx.update(grads, opt_state, state.params[d_key])
        new_d_params = optax.apply_updates(state.params[d_key], updates)
        new_params = dict(state.params)
        new_params[d_key] = new_d_params
        state = state.replace(
            params=new_params,
            stats=new_stats,
            **({"d_edit_opt": new_opt} if use_edit else {"d_opt": new_opt}),
        )
        metrics = {"d": loss, "ref_score": ref_score, "out_score": out_score}
        return state, metrics

    def _d_impl(state: TrainState, photo, render, ref, rng, use_edit: bool):
        photo, render, ref = map(_norm_input, (photo, render, ref))
        fake, new_stats = forward_full(
            models, state.params, state.stats, photo, render, config,
            noise_rng=rng, train=True,
        )
        return _d_update_from_fake(
            state, jax.lax.stop_gradient(fake), ref, use_edit, new_stats
        )

    d_step = functools.partial(
        jax.jit, static_argnames=("use_edit",), donate_argnums=(0,)
    )(_d_impl)

    # ---------------- D regularization (R1) (:479-493) -------------------

    def _d_reg_impl(state: TrainState, ref, use_edit: bool):
        ref = _norm_input(ref)
        d_key = "d_edit" if use_edit else "d"

        def loss_fn(d_params):
            d_fn = lambda img: d_module.apply({"params": d_params}, img)
            if config.remat_reg:
                # The R1 grad-of-grad holds D's forward, backward AND
                # double-backward live at once; remat of the forward keeps
                # the peak at ~one backward's liveness.
                d_fn = jax.checkpoint(d_fn)
            r1 = d_r1_penalty(d_fn, ref)
            # weight r1/2 * d_reg_every (train_3_encoder.py:490); the
            # reference's `0*real_pred[0]` coupling term exists only to keep
            # torch graphs alive — unnecessary in JAX.
            return config.r1 / 2.0 * r1 * config.d_reg_every, r1

        (_, r1), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params[d_key]
        )
        opt_state = state.d_edit_opt if use_edit else state.d_opt
        updates, new_opt = d_tx.update(grads, opt_state, state.params[d_key])
        new_d_params = optax.apply_updates(state.params[d_key], updates)
        new_params = dict(state.params)
        new_params[d_key] = new_d_params
        state = state.replace(
            params=new_params,
            **({"d_edit_opt": new_opt} if use_edit else {"d_opt": new_opt}),
        )
        return state, {"r1": r1}

    d_reg_step = functools.partial(
        jax.jit, static_argnames=("use_edit",), donate_argnums=(0,)
    )(_d_reg_impl)

    # ---------------- G step (:495-558) -----------------------------------

    g_enc_keys = ("g", "e_tsr", "e_w", "e_w_plus")

    def _ema(ema_params, g_params):
        d = config.ema_decay
        return jax.tree.map(
            lambda e, p: d * e + (1.0 - d) * p, ema_params, g_params
        )

    def _g_downstream_losses(
        fake,
        d_params,
        photo,
        render,
        ref,
        frozen: Dict[str, Any],
        ds_flag: bool,
        extreme_ds_flag: bool,
        apply_hmap: bool,
    ):
        """GAN + reconstruction loss stack over a generated batch
        (train_3_encoder.py:507-533 incl. the lambda schedule :517-526) —
        shared by the G step and the fused shared-forward iteration."""
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

        # Frozen loss nets (LPIPS/ArcFace/FAN) are rematerialized: only
        # their INPUT gradients are needed, so keeping VGG16/ResNetFace
        # activations live through the whole G backward is pure HBM
        # waste; recomputing them is what lets regularizer iterations join
        # the fused dispatch within v5e HBM (ROUND_NOTES r2/r3).
        remat = jax.checkpoint if config.remat_frozen else (lambda f: f)

        lpips = jnp.zeros((), fake.dtype)
        if lpips_module is not None and lpips_l > 0:
            lpips = lpips_l * remat(
                lambda a, b: jnp.mean(
                    lpips_module.apply(frozen["lpips"], a, b)
                )
            )(fake, ref)
        l1 = l1_l * l1_loss(fake, ref)
        face_id = jnp.zeros((), fake.dtype)
        if arcface_module is not None and config.face_id_loss_lambda > 0:
            # Extreme-DS compares identity against the input photo
            # (train_3_encoder.py:521).
            id_ref = photo if extreme_ds_flag else ref
            if id_ref.shape[1] != fake.shape[1]:
                # Smoke geometries run the generator below the encoder
                # input size (production is 256/256, a no-op here):
                # box-downsample so ArcFace sees one resolution.
                n_, hf, wf, c_ = fake.shape
                f_ = id_ref.shape[1] // hf
                id_ref = id_ref.reshape(
                    n_, hf, f_, wf, f_, c_
                ).mean(axis=(2, 4))
            face_id = config.face_id_loss_lambda * remat(
                lambda a, b: face_identity_loss(
                    a,
                    b,
                    lambda x: arcface_module.apply(frozen["arcface"], x),
                    config.face_id_loss_type,
                )
            )(fake, id_ref)
        hmap = jnp.zeros((), fake.dtype)
        if apply_hmap and fan_module is not None and config.hmap_loss_lambda > 0:
            from fm3dgan.losses.geometry import heat_map_loss
            from fm3dgan.models.fan_landmark import center_crop_for_fan

            def heatmap_fn(images):
                return fan_module.apply(
                    frozen["fan"],
                    center_crop_for_fan(
                        images, target_size=fan_input_size
                    ),
                )

            hmap = config.hmap_loss_lambda * remat(
                lambda a, b: heat_map_loss(a, b, heatmap_fn)
            )(fake, render)
        if face_reg_l > 0:
            face_reg = face_reg_l * face_regional_loss(render, fake)
        else:
            face_reg = jnp.zeros((), fake.dtype)

        total = g_loss + lpips + l1 + face_id + hmap + face_reg
        metrics = {
            "g": g_loss,
            "lpips": lpips,
            "l1": l1,
            "face_id": face_id,
            "hmap": hmap,
            "face_reg": face_reg,
        }
        return total, metrics

    def _g_impl(
        state: TrainState,
        photo,
        render,
        ref,
        rng,
        frozen: Dict[str, Any],
        use_edit: bool,
        ds_flag: bool,
        extreme_ds_flag: bool,
        apply_hmap: bool = False,
        apply_ema: bool = False,
    ):
        photo, render, ref = map(_norm_input, (photo, render, ref))
        d_key = "d_edit" if use_edit else "d"

        def loss_fn(g_enc_params):
            params = dict(state.params)
            params.update(g_enc_params)
            fake, new_stats = forward_full(
                models, params, state.stats, photo, render, config,
                noise_rng=rng, train=True,
            )
            total, metrics = _g_downstream_losses(
                fake, state.params[d_key], photo, render, ref, frozen,
                ds_flag, extreme_ds_flag, apply_hmap,
            )
            return total, (metrics, new_stats)

        g_enc_params = {k: state.params[k] for k in g_enc_keys}
        (_, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(g_enc_params)

        updates, new_opt = g_enc_tx.update(grads, state.g_enc_opt, g_enc_params)
        new_g_enc = optax.apply_updates(g_enc_params, updates)
        new_params = dict(state.params)
        new_params.update(new_g_enc)
        replace_kwargs = dict(
            params=new_params, stats=new_stats, g_enc_opt=new_opt,
            step=state.step + 1,
        )
        if apply_ema:
            # Fused EMA (one device dispatch less than a separate ema_step).
            replace_kwargs["g_ema_params"] = _ema(
                state.g_ema_params, new_params["g"]
            )
        state = state.replace(**replace_kwargs)
        return state, metrics

    g_step = functools.partial(
        jax.jit, static_argnames=("use_edit", "ds_flag", "extreme_ds_flag",
                                  "apply_hmap", "apply_ema"),
        donate_argnums=(0,),
    )(_g_impl)

    # ---------------- G regularization (PPL) (:561-596) -------------------

    def _g_reg_impl(state: TrainState, photo, render, rng, apply_ema: bool = False):
        """photo/render: pre-sliced path-reg batch (host does the random
        subset choice, train_3_encoder.py:568-570)."""
        photo, render = _norm_input(photo), _norm_input(render)
        noise_key, ppl_key = jax.random.split(rng)

        def loss_fn(g_enc_params):
            params = dict(state.params)
            params.update(g_enc_params)
            # train=True: the reference keeps the encoders in train() mode
            # through the PPL forward (train_3_encoder.py:561-596), so BN
            # normalizes with BATCH stats (gradients flow through them) and
            # the running stats advance from this forward too.  Batch-stat
            # normalization also makes the PPL value independent of how many
            # forwards preceded it in the iteration (the shared-forward fused
            # path advances running stats once instead of twice).
            encode_fn = lambda p, ph, r: _encode(
                models, p, state.stats, ph, r, config, train=True
            )
            if config.remat_reg:
                encode_fn = jax.checkpoint(encode_fn)
            tensor, latent, new_stats = encode_fn(params, photo, render)

            def g_fn(lat):
                return _generate(
                    models, params, state.stats, lat, tensor, config, noise_key
                )

            if config.remat_reg:
                # The PPL double-backward (vjp-of-vjp) otherwise keeps the
                # full synthesis activations live twice.
                g_fn = jax.checkpoint(g_fn)
            penalty, new_mean, path_lengths = path_regularize(
                g_fn, latent, state.mean_path_length, ppl_key
            )
            weighted = (
                config.path_reg_weight * config.g_reg_every * penalty
            )
            return weighted, (
                penalty, new_mean, jnp.mean(path_lengths), new_stats
            )

        g_enc_params = {k: state.params[k] for k in g_enc_keys}
        (_, (penalty, new_mean, mean_pl, new_stats)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(g_enc_params)
        )
        updates, new_opt = g_enc_tx.update(grads, state.g_enc_opt, g_enc_params)
        new_g_enc = optax.apply_updates(g_enc_params, updates)
        new_params = dict(state.params)
        new_params.update(new_g_enc)
        replace_kwargs = dict(
            params=new_params, g_enc_opt=new_opt, mean_path_length=new_mean,
            stats=new_stats,
        )
        if apply_ema:
            replace_kwargs["g_ema_params"] = _ema(
                state.g_ema_params, new_params["g"]
            )
        state = state.replace(**replace_kwargs)
        return state, {"g_reg": penalty, "path_length": mean_pl}

    g_reg_step = functools.partial(
        jax.jit, static_argnames=("apply_ema",), donate_argnums=(0,)
    )(_g_reg_impl)

    # ---------------- Fused full iteration --------------------------------
    # One device dispatch per training iteration instead of 2-4: over a
    # remote/tunneled TPU each dispatch costs a host round-trip (~100ms of
    # the measured step at batch 32), and on any host it repeats the pytree
    # flatten of the full parameter set.  Sequencing D -> (R1) -> G -> (PPL)
    # inside one jit preserves the reference update order exactly
    # (train_3_encoder.py:779-822).

    @functools.partial(
        jax.jit,
        static_argnames=(
            "use_edit", "ds_flag", "extreme_ds_flag", "do_r1", "do_g_reg",
            "apply_hmap",
        ),
        donate_argnums=(0,),
    )
    def fused_iteration_step(
        state: TrainState,
        photo,
        render,
        ref,
        d_rng,
        g_rng,
        ppl_rng,
        ppl_idx,
        frozen: Dict[str, Any],
        use_edit: bool,
        ds_flag: bool,
        extreme_ds_flag: bool,
        do_r1: bool,
        do_g_reg: bool,
        apply_hmap: bool = False,
    ):
        metrics: Dict[str, Any] = {}
        state, d_m = _d_impl(state, photo, render, ref, d_rng, use_edit)
        metrics.update(d_m)
        if do_r1:
            state, r1_m = _d_reg_impl(state, ref, use_edit)
            metrics.update(r1_m)
        state, g_m = _g_impl(
            state, photo, render, ref, g_rng, frozen, use_edit, ds_flag,
            extreme_ds_flag, apply_hmap, not do_g_reg,
        )
        metrics.update(g_m)
        if do_g_reg:
            p_sub = jnp.take(photo, ppl_idx, axis=0)
            r_sub = jnp.take(render, ppl_idx, axis=0)
            state, gr_m = _g_reg_impl(state, p_sub, r_sub, ppl_rng, True)
            metrics.update(gr_m)
        return state, metrics

    # ---------------- Fused shared-forward iteration -----------------------
    # share_dg_noise fast path: ONE generator+encoder forward serves both the
    # D update (stop-gradient'd fake) and the G update (downstream loss grad
    # w.r.t. fake pulled back through jax.vjp).  Passing the same RNG to the
    # separate D/G steps does NOT get CSE'd by XLA in practice — this
    # restructuring removes the duplicated ~forward by construction.
    # Semantics vs the reference: D and G see the same generated batch
    # (the reference regenerates with fresh noise, train_3_encoder.py:460,507)
    # and BN running stats advance once per iteration instead of twice —
    # opt-in via config.share_dg_noise.

    @functools.partial(
        jax.jit,
        static_argnames=(
            "use_edit", "ds_flag", "extreme_ds_flag", "do_r1", "do_g_reg",
            "apply_hmap",
        ),
        donate_argnums=(0,),
    )
    def fused_shared_iteration_step(
        state: TrainState,
        photo,
        render,
        ref,
        d_rng,
        g_rng,
        ppl_rng,
        ppl_idx,
        frozen: Dict[str, Any],
        use_edit: bool,
        ds_flag: bool,
        extreme_ds_flag: bool,
        do_r1: bool,
        do_g_reg: bool,
        apply_hmap: bool = False,
    ):
        del g_rng  # the single forward uses d_rng for both updates
        photo, render, ref = map(_norm_input, (photo, render, ref))
        d_key = "d_edit" if use_edit else "d"
        metrics: Dict[str, Any] = {}

        g_enc_params = {k: state.params[k] for k in g_enc_keys}

        def fwd(ge):
            params = dict(state.params)
            params.update(ge)
            return forward_full(
                models, params, state.stats, photo, render, config,
                noise_rng=d_rng, train=True,
            )

        fake, pullback, new_stats = jax.vjp(fwd, g_enc_params, has_aux=True)
        fake_sg = jax.lax.stop_gradient(fake)

        # --- D update (the _d_impl body, reusing the shared fake) ---
        state, d_metrics = _d_update_from_fake(
            state, fake_sg, ref, use_edit, new_stats
        )
        metrics.update(d_metrics)

        if do_r1:
            state, r1_m = _d_reg_impl(state, ref, use_edit)
            metrics.update(r1_m)

        # --- G update: downstream loss grad w.r.t. fake, pulled back ---
        def downstream(fk):
            return _g_downstream_losses(
                fk, state.params[d_key], photo, render, ref, frozen,
                ds_flag, extreme_ds_flag, apply_hmap,
            )

        (_, g_metrics), grad_fake = jax.value_and_grad(
            downstream, has_aux=True
        )(fake)
        (g_grads,) = pullback(grad_fake)
        metrics.update(g_metrics)

        updates, new_g_opt = g_enc_tx.update(
            g_grads, state.g_enc_opt, g_enc_params
        )
        new_g_enc = optax.apply_updates(g_enc_params, updates)
        new_params = dict(state.params)
        new_params.update(new_g_enc)
        replace_kwargs = dict(
            params=new_params, g_enc_opt=new_g_opt, step=state.step + 1
        )
        if not do_g_reg:
            replace_kwargs["g_ema_params"] = _ema(
                state.g_ema_params, new_params["g"]
            )
        state = state.replace(**replace_kwargs)

        if do_g_reg:
            p_sub = jnp.take(photo, ppl_idx, axis=0)
            r_sub = jnp.take(render, ppl_idx, axis=0)
            state, gr_m = _g_reg_impl(state, p_sub, r_sub, ppl_rng, True)
            metrics.update(gr_m)
        return state, metrics

    # ---------------- EMA (:195-200, 776) ---------------------------------

    @functools.partial(jax.jit, donate_argnums=(0,))
    def ema_step(state: TrainState):
        decay = config.ema_decay
        new_ema = jax.tree.map(
            lambda e, p: decay * e + (1.0 - decay) * p,
            state.g_ema_params,
            state.params["g"],
        )
        return state.replace(g_ema_params=new_ema)

    return {
        "d_step": d_step,
        "d_reg_step": d_reg_step,
        "g_step": g_step,
        "g_reg_step": g_reg_step,
        "ema_step": ema_step,
        "fused_iteration_step": fused_iteration_step,
        "fused_shared_iteration_step": fused_shared_iteration_step,
    }
