"""Host-side training loop.

Counterpart of the reference ``train()`` (train_3_encoder.py:756-828): the
alternating reconstruction / dual-supervision / extreme-pose schedule runs on
the host as Python control flow; each branch calls a pre-compiled jitted step.
Replaces: nn.DataParallel fan-out -> mesh sharding; text-log prints ->
structured metrics dict; torch.save -> Orbax checkpoints.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fm3dgan.models.arcface import ResNetFace18
from fm3dgan.models.discriminator import Discriminator
from fm3dgan.models.lpips import LPIPS
from fm3dgan.parallel.mesh import create_mesh, replicate, shard_batch
from fm3dgan.pipeline.forward import FaceManipulator
from fm3dgan.train.config import TrainConfig
from fm3dgan.train.state import TrainState
from fm3dgan.train.steps import make_step_fns


class Trainer:
    """Builds the model stack, train state and jitted steps; runs iterations."""

    def __init__(
        self,
        config: TrainConfig,
        seed: int = 0,
        mesh=None,
        frozen_variables: Optional[Dict[str, Any]] = None,
        use_lpips: bool = True,
        use_arcface: bool = True,
        use_fan: Optional[bool] = None,
        fan_input_size: int = 256,
        input_size: Optional[int] = None,
        fast_init: bool = False,
    ):
        """fast_init: build structurally-correct random variables via
        jax.eval_shape (no init compiles) — for benchmarking, where parameter
        values are irrelevant.  Real training uses the proper initializers."""
        self.config = config
        self.models = FaceManipulator.create(
            size=config.size,
            style_dim=config.latent,
            n_mlp=config.n_mlp,
            channel_multiplier=config.channel_multiplier,
            w_plus_layers=config.w_plus_encoder_layer_num,
            input_size=input_size or config.size,
            width_mult=config.width_mult,
            dtype=jnp.dtype(config.compute_dtype),
        )
        self.d_module = Discriminator(
            size=config.size,
            channel_multiplier=config.channel_multiplier,
            width_mult=config.width_mult,
            dtype=jnp.dtype(config.compute_dtype),
        )
        # Frozen loss nets run in the training compute dtype too — the LPIPS
        # VGG16 fwd+bwd at full resolution is one of the heaviest G-step
        # segments; leaving it fp32 halves its MXU throughput.
        cdtype = jnp.dtype(config.compute_dtype)
        self.lpips_module = LPIPS(dtype=cdtype) if use_lpips else None
        self.arcface_module = (
            ResNetFace18(use_se=False, dtype=cdtype) if use_arcface else None
        )
        # FAN heatmap net: built when the heatmap loss can ever fire
        # (hmap_loss_lambda > 0, gated by hmap_iter_thres at step time —
        # train_3_encoder.py:538-541).
        if use_fan is None:
            use_fan = config.hmap_loss_lambda > 0
        self.fan_input_size = fan_input_size
        self.input_size = input_size or config.size
        if use_fan:
            from fm3dgan.models.fan_landmark import FAN

            self.fan_module = FAN(dtype=cdtype)
        else:
            self.fan_module = None

        key = jax.random.PRNGKey(seed)
        (
            k_models, k_d, k_de, k_lpips, k_arc, k_fan, _
        ) = jax.random.split(key, 7)
        # Host-side RNG for the path-reg batch-subset choice
        # (train_3_encoder.py:568-570) — seeded so runs are reproducible.
        self._host_rng = np.random.RandomState(seed)
        # Per-iteration RNG keys are derived on the HOST (``_iter_keys``):
        # the old jax.random.split chain dispatched 2 tiny device programs
        # per key — 6 RPC round-trips per training iteration over the
        # remote-TPU tunnel, visible as jit__threefry_split/jit__unstack
        # modules between every step in the r5 XPlane trace.  Key width
        # follows the configured PRNG impl (threefry 2 words, rbg 4).
        self._seed = seed
        self._key_words = int(
            np.prod(jax.eval_shape(jax.random.PRNGKey, 0).shape)
        )

        if fast_init:
            variables = self.models.init_variables_fast(seed=seed)
        else:
            variables = self.models.init_variables(k_models)
        img = jnp.zeros((1, config.size, config.size, 3), jnp.float32)
        if fast_init:
            v_shapes = jax.eval_shape(self.d_module.init, k_d, img)
            rng0 = np.random.RandomState(seed + 1)
            mk = lambda shapes: jax.tree.map(
                lambda l: jnp.asarray(
                    rng0.normal(0, 0.05, l.shape).astype(l.dtype)
                ),
                shapes,
            )
            v_d = mk(v_shapes)
            v_d_edit = mk(v_shapes)
        else:
            v_d = jax.jit(self.d_module.init)(k_d, img)
            v_d_edit = jax.jit(self.d_module.init)(k_de, img)

        params = {
            "g": variables["g"]["params"],
            "e_tsr": variables["e_tsr"]["params"],
            "e_w": variables["e_w"]["params"],
            "e_w_plus": variables["e_w_plus"]["params"],
            "d": v_d["params"],
            "d_edit": v_d_edit["params"],
        }
        stats = {
            "g": {k: v for k, v in variables["g"].items() if k != "params"},
            "e_tsr": {k: v for k, v in variables["e_tsr"].items() if k != "params"},
            "e_w": {k: v for k, v in variables["e_w"].items() if k != "params"},
            "e_w_plus": {
                k: v for k, v in variables["e_w_plus"].items() if k != "params"
            },
        }
        self.state = TrainState.create(config, params, stats, with_d_edit=True)

        self.frozen: Dict[str, Any] = frozen_variables or {}
        if use_lpips and "lpips" not in self.frozen:
            size = input_size or config.size
            dummy = jnp.zeros((1, size, size, 3), jnp.float32)
            if fast_init:
                shapes = jax.eval_shape(self.lpips_module.init, k_lpips, dummy, dummy)
                rngl = np.random.RandomState(seed + 2)
                self.frozen["lpips"] = jax.tree.map(
                    lambda l: jnp.asarray(
                        rngl.normal(0, 0.05, l.shape).astype(l.dtype)
                    ),
                    shapes,
                )
            else:
                self.frozen["lpips"] = jax.jit(self.lpips_module.init)(
                    k_lpips, dummy, dummy
                )
        if use_arcface and "arcface" not in self.frozen:
            # ArcFace consumes the generated image after gray+2x-pool
            # (training_util.py:178-201): size//2 per side — 128 at the
            # production 256px; smaller in smoke configs (fc5 is the only
            # input-size-dependent parameter).
            dummy = jnp.zeros(
                (1, config.size // 2, config.size // 2, 1), jnp.float32
            )
            if fast_init:
                shapes = jax.eval_shape(self.arcface_module.init, k_arc, dummy)
                rnga = np.random.RandomState(seed + 3)
                def fill_a(path, l):
                    name = path[-1].key if hasattr(path[-1], "key") else ""
                    if name == "var":
                        return jnp.ones(l.shape, l.dtype)
                    if name == "mean":
                        return jnp.zeros(l.shape, l.dtype)
                    return jnp.asarray(
                        rnga.normal(0, 0.05, l.shape).astype(l.dtype)
                    )
                self.frozen["arcface"] = jax.tree_util.tree_map_with_path(
                    fill_a, shapes
                )
            else:
                self.frozen["arcface"] = jax.jit(self.arcface_module.init)(k_arc, dummy)
        if self.fan_module is not None and "fan" not in self.frozen:
            dummy = jnp.zeros(
                (1, fan_input_size, fan_input_size, 3), jnp.float32
            )
            if fast_init:
                shapes = jax.eval_shape(self.fan_module.init, k_fan, dummy)
                rngf = np.random.RandomState(seed + 4)

                def fill_f(path, l):
                    name = path[-1].key if hasattr(path[-1], "key") else ""
                    if name == "var":
                        return jnp.ones(l.shape, l.dtype)
                    if name == "mean":
                        return jnp.zeros(l.shape, l.dtype)
                    return jnp.asarray(
                        rngf.normal(0, 0.05, l.shape).astype(l.dtype)
                    )

                self.frozen["fan"] = jax.tree_util.tree_map_with_path(
                    fill_f, shapes
                )
            else:
                self.frozen["fan"] = jax.jit(self.fan_module.init)(
                    k_fan, dummy
                )

        self.steps = make_step_fns(
            self.models,
            self.d_module,
            config,
            lpips_module=self.lpips_module,
            arcface_module=self.arcface_module,
            fan_module=self.fan_module,
            fan_input_size=fan_input_size,
        )

        self.mesh = mesh
        if mesh is not None:
            self.state = replicate(self.state, mesh)
            self.frozen = replicate(self.frozen, mesh)

        self.mean_metrics: Dict[str, float] = {}
        self._last_r1 = jnp.zeros(())
        self._last_greg = {"g_reg": jnp.zeros(()), "path_length": jnp.zeros(())}

    def _iter_keys(self, iter_idx: int):
        """(d_rng, g_rng, ppl_rng) for one iteration, derived host-side.

        Stateless counter-based derivation (numpy Philox keyed on
        (seed, iter_idx)): zero device dispatches — the split-chain version
        cost 6 tunnel RPCs per iteration — and resume-invariant: a run
        resumed at step N draws the identical keys an uninterrupted run
        would, which a chained split stream cannot.  The raw uint32 words
        are valid JAX PRNG keys for the configured default impl.
        """
        gen = np.random.Generator(
            np.random.Philox(key=[self._seed & 0xFFFFFFFFFFFFFFFF, iter_idx])
        )
        words = gen.integers(
            0, 2 ** 32, size=(3, self._key_words), dtype=np.uint32
        )
        return words[0], words[1], words[2]

    def _put(self, *arrays):
        if self.mesh is not None:
            return shard_batch(tuple(jnp.asarray(a) for a in arrays), self.mesh)
        return tuple(jnp.asarray(a) for a in arrays)

    def stage_batch(self, *arrays):
        """Issue the host->device transfer for an upcoming iteration NOW.

        jax.device_put is asynchronous: calling this right after dispatching
        step i with batch i+1 overlaps the ~25MB/iter input copy with device
        compute instead of leaving it on the step's critical path.  Passing
        the staged arrays back into train_iteration is free — _put on
        already-placed arrays with the same sharding is a no-op.
        """
        return self._put(*arrays)

    def train_iteration(
        self, iter_idx: int, g_input, r_input, g_ref,
        fused: Optional[bool] = None,
    ) -> Dict[str, Any]:
        """One full reference iteration (train_3_encoder.py:779-822):
        D step, lazy R1, G step, lazy PPL, EMA.

        fused=True runs the whole iteration as ONE jitted dispatch
        (steps.fused_iteration_step) — same update order, 2-4x fewer host
        round-trips; False dispatches the four steps separately.

        With the default remat_frozen/remat_reg config the fused program —
        including PPL regularizer iterations (fuse_reg_iters) — fits v5e
        HBM at 16 img-equivalents per chip; bs32/256px measured ~65MB over
        HBM even with remat, so the auto heuristic caps at
        fuse_img_equiv_limit and falls back to separate dispatches above
        it."""
        cfg = self.config
        ds_flag = cfg.is_ds_iter(iter_idx)
        extreme = cfg.is_extreme_ds_iter(iter_idx)
        use_edit = bool(ds_flag and cfg.use_separate_d)
        do_r1 = iter_idx % cfg.d_reg_every == 0
        will_g_reg = cfg.use_g_reg and iter_idx % cfg.g_reg_every == 0
        # Heatmap loss fires past the iteration threshold
        # (train_3_encoder.py:538-541).
        apply_hmap = (
            self.fan_module is not None
            and cfg.hmap_loss_lambda > 0
            and iter_idx > cfg.hmap_iter_thres
        )

        photo, render, ref = self._put(g_input, r_input, g_ref)
        metrics: Dict[str, Any] = {}

        # Host-side random subset CHOICE for the PPL batch
        # (train_3_encoder.py:568-570), device-side slicing.  Drawn every
        # g_reg cadence point so fused/unfused runs consume the same RNG
        # stream.
        bsz = photo.shape[0]
        path_bsz = max(1, bsz // cfg.path_reg_batch_shrink)
        if will_g_reg:
            idx = np.sort(
                self._host_rng.choice(bsz, size=path_bsz, replace=False)
            )
        else:
            idx = np.arange(path_bsz)

        if fused is None:
            # Auto: one-dispatch iteration whenever the per-chip
            # img-equivalents fit the HBM budget (TrainConfig.fuse_fits_hbm).
            per_chip = g_input.shape[0] // max(1, (
                len(self.mesh.devices.flat) if self.mesh is not None else 1
            ))
            fused = cfg.fuse_fits_hbm(per_chip)
        fused = fused and cfg.fuse_allows_regs(do_r1, will_g_reg)
        # Draw the iteration's 3 keys up-front so fused/unfused/shared-noise
        # runs consume the identical RNG stream.
        d_rng, g_rng, ppl_rng = self._iter_keys(iter_idx)
        if self.config.share_dg_noise:
            # Same generated batch for the D and G updates: the fused
            # shared-forward step computes ONE generator forward and reuses
            # it for both (jax.vjp pullback), removing the duplicated
            # forward from the program.
            g_rng = d_rng
        if fused:
            step_name = (
                "fused_shared_iteration_step"
                if self.config.share_dg_noise
                else "fused_iteration_step"
            )
            self.state, m = self.steps[step_name](
                self.state,
                photo,
                render,
                ref,
                d_rng,
                g_rng,
                ppl_rng,
                jnp.asarray(idx),
                self.frozen,
                use_edit,
                ds_flag,
                extreme,
                do_r1,
                will_g_reg,
                apply_hmap,
            )
            if do_r1:
                self._last_r1 = m["r1"]
            if will_g_reg:
                self._last_greg = {
                    "g_reg": m["g_reg"], "path_length": m["path_length"]
                }
            metrics.update(m)
        else:
            self.state, d_m = self.steps["d_step"](
                self.state, photo, render, ref, d_rng, use_edit
            )
            metrics.update(d_m)

            if do_r1:
                self.state, r1_m = self.steps["d_reg_step"](
                    self.state, ref, use_edit
                )
                self._last_r1 = r1_m["r1"]

            # EMA is fused into the LAST G update of the iteration (one EMA
            # application per iteration, after all updates — the reference's
            # accumulate() placement, train_3_encoder.py:822).
            self.state, g_m = self.steps["g_step"](
                self.state,
                photo,
                render,
                ref,
                g_rng,
                self.frozen,
                use_edit,
                ds_flag,
                extreme,
                apply_hmap,
                not will_g_reg,
            )
            metrics.update(g_m)

            if will_g_reg:
                p_sub = jnp.take(photo, jnp.asarray(idx), axis=0)
                r_sub = jnp.take(render, jnp.asarray(idx), axis=0)
                if self.mesh is not None:
                    p_sub, r_sub = self._put(p_sub, r_sub)
                self.state, gr_m = self.steps["g_reg_step"](
                    self.state, p_sub, r_sub, ppl_rng, True
                )
                self._last_greg = gr_m

        metrics["r1"] = self._last_r1
        metrics.update(self._last_greg)
        metrics["ds_flag"] = ds_flag
        metrics["extreme_ds_flag"] = extreme
        return metrics

    # ------------------------------------------------------------------
    # Checkpointing (Orbax) — counterpart of the torch.save dict
    # (train_3_encoder.py:735-753).
    # ------------------------------------------------------------------

    def save_checkpoint(self, ckpt_dir: str, step: int):
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(ckpt_dir, f"{step:06d}"))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, jax.device_get(self.state))
        ckptr.wait_until_finished()
        meta = {
            "step": step,
            "tsr_encode": self.config.tsr_encode,
            "use_tanh": self.config.use_tanh,
            "sliced_layer": self.config.w_plus_sliced_layer,
            "size": self.config.size,
            "input_size": self.input_size,
        }
        with open(os.path.join(ckpt_dir, f"{step:06d}.json"), "w") as f:
            json.dump(meta, f)

    def load_checkpoint(self, ckpt_dir: str, step: int):
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(ckpt_dir, f"{step:06d}"))
        ckptr = ocp.StandardCheckpointer()
        self.state = ckptr.restore(path, self.state)
