"""Host-side training loop for the 2-encoder scheme (reference train.py).

Counterpart of ``train()`` (/root/reference/train.py:679-830): builds the
encoder pair for the chosen co-modulation mode (train.py:391-430), runs the
alternating reconstruction / dual-supervision schedule with the optional
FFHQ-DS branch (train.py:700-740), and checkpoints with Orbax (≙ the
torch.save dict, train.py:580-607).
"""

from __future__ import annotations

import json
import math
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fm3dgan.models.arcface import ResNetFace18
from fm3dgan.models.discriminator import Discriminator
from fm3dgan.models.generator import Generator
from fm3dgan.models.lpips import LPIPS
from fm3dgan.models.psp_encoder import GradualStyleEncoder
from fm3dgan.models.resnet_encoder import ResNet18Encoder
from fm3dgan.parallel.mesh import replicate, shard_batch
from fm3dgan.train.config import TrainConfig
from fm3dgan.train.state import make_d_optimizer
from fm3dgan.train.steps_2encoder import (
    make_2encoder_ffhq_ds_steps,
    make_2encoder_step_fns,
)


class Trainer2:
    """2-encoder trainer: module construction, state, jitted steps,
    per-iteration schedule, Orbax checkpointing."""

    def __init__(
        self,
        config: TrainConfig,
        seed: int = 0,
        mod_encode: str = "Render Image",
        co_modulation: Optional[str] = None,
        ds_dataset_type: str = "Synthetic",
        mesh=None,
        frozen_variables: Optional[Dict[str, Any]] = None,
        use_lpips: bool = True,
        use_arcface: bool = True,
        input_size: Optional[int] = None,
    ):
        self.config = config
        self.mod_encode = mod_encode
        self.co_modulation = co_modulation
        self.ds_dataset_type = ds_dataset_type
        input_size = input_size or config.size

        # Encoder pair per mode (train.py:391-430): plain = tensor + W
        # vector; Multiplication/Concatenation = vector + W+;
        # Tensor Transform = tensor-transform + W+.
        style_dim = config.latent * (
            2 if co_modulation in ("Concatenation", "Tensor Transform") else 1
        )
        self.generator = Generator(
            size=config.size,
            style_dim=style_dim,
            n_mlp=config.n_mlp,
            channel_multiplier=config.channel_multiplier,
        )
        self.d_module = Discriminator(
            size=config.size, channel_multiplier=config.channel_multiplier
        )
        n_styles = 2 * int(math.log2(config.size)) - 2
        if co_modulation is None:
            self.e_tsr = ResNet18Encoder(tensor_encoding=True)
            self.e_mod = ResNet18Encoder(tensor_encoding=False)
        elif co_modulation == "Tensor Transform":
            self.e_tsr = ResNet18Encoder(
                tensor_encoding=True, tensor_transform=True
            )
            self.e_mod = GradualStyleEncoder(
                n_styles=n_styles, input_size=input_size
            )
        else:
            self.e_tsr = ResNet18Encoder(tensor_encoding=False)
            self.e_mod = GradualStyleEncoder(
                n_styles=n_styles, input_size=input_size
            )

        self.lpips_module = LPIPS() if use_lpips else None
        self.arcface_module = (
            ResNetFace18(use_se=False) if use_arcface else None
        )

        key = jax.random.PRNGKey(seed)
        ks = jax.random.split(key, 9)
        self._host_rng = np.random.RandomState(seed)
        # Host-side stateless per-iteration keys (≙ loop.py::_iter_keys):
        # no split-chain device dispatches, resume-invariant stream.
        self._seed = seed
        self._key_words = int(
            np.prod(jax.eval_shape(jax.random.PRNGKey, 0).shape)
        )
        img = jnp.zeros((1, input_size, input_size, 3))
        small = jnp.zeros((1, config.size, config.size, 3))
        v_tsr = jax.jit(self.e_tsr.init)(ks[0], img)
        v_mod = jax.jit(self.e_mod.init)(ks[1], img)
        v_g = jax.jit(self.generator.init)(
            {"params": ks[2], "noise": ks[3]}, jnp.zeros((1, style_dim))
        )
        v_d = jax.jit(self.d_module.init)(ks[4], small)
        v_d_ffhq = jax.jit(self.d_module.init)(ks[5], small)

        r = config.g_reg_ratio
        self.g_tx = optax.adam(
            config.lr * r, b1=0.0**r, b2=0.99**r, eps=1e-8
        )
        d_tx = make_d_optimizer(config)
        enc_params = {
            "g": v_g["params"],
            "tensor_encoder": v_tsr["params"],
            "modulation_encoder": v_mod["params"],
        }
        self.state: Dict[str, Any] = {
            "params": {
                **enc_params,
                "d": v_d["params"],
                "d_ffhq": v_d_ffhq["params"],
            },
            "stats": {
                "g": {k: v for k, v in v_g.items() if k != "params"},
                "tensor_encoder": {
                    k: v for k, v in v_tsr.items() if k != "params"
                },
                "modulation_encoder": {
                    k: v for k, v in v_mod.items() if k != "params"
                },
            },
            "g_ema": jax.tree.map(jnp.copy, v_g["params"]),
            "g_opt": self.g_tx.init(enc_params),
            "d_opt": d_tx.init(v_d["params"]),
            "d_ffhq_opt": d_tx.init(v_d_ffhq["params"]),
            "mean_path_length": jnp.zeros(()),
        }

        self.frozen: Dict[str, Any] = frozen_variables or {}
        if use_lpips and "lpips" not in self.frozen:
            dummy = jnp.zeros((1, input_size, input_size, 3))
            self.frozen["lpips"] = jax.jit(self.lpips_module.init)(
                ks[6], dummy, dummy
            )
        if use_arcface and "arcface" not in self.frozen:
            dummy = jnp.zeros((1, 128, 128, 1))
            self.frozen["arcface"] = jax.jit(self.arcface_module.init)(
                ks[7], dummy
            )

        self.steps = make_2encoder_step_fns(
            self.e_tsr, self.e_mod, self.generator, self.d_module, config,
            lpips_module=self.lpips_module,
            arcface_module=self.arcface_module,
            mod_encode=mod_encode,
            co_modulation=co_modulation,
        )
        self.ffhq_steps = None
        if ds_dataset_type == "FFHQ":
            self.ffhq_steps = make_2encoder_ffhq_ds_steps(
                self.e_tsr, self.e_mod, self.generator, self.d_module,
                config, self.g_tx,
                arcface_module=self.arcface_module,
                mod_encode=mod_encode,
                co_modulation=co_modulation,
            )

        self.mesh = mesh
        if mesh is not None:
            self.state = replicate(self.state, mesh)
            self.frozen = replicate(self.frozen, mesh)

        self._last_r1 = jnp.zeros(())
        self._last_greg = {"g_reg": jnp.zeros(()), "path_length": jnp.zeros(())}

    def _iter_keys(self, iter_idx: int):
        """Host-derived (d_rng, g_rng, ppl_rng) — see loop.py::_iter_keys."""
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
        """Issue the host->device transfer for an upcoming iteration NOW
        (double-buffered prefetch contract — see Trainer.stage_batch)."""
        return self._put(*arrays)

    def train_iteration(
        self,
        iter_idx: int,
        g_input,
        r_input,
        g_ref,
        ffhq_ref=None,
    ) -> Dict[str, Any]:
        """One reference iteration (train.py:700-740): on FFHQ-DS iters the
        extra D_ffhq/G_ffhq branch runs first and its generated batch
        replaces g_input for the regular D/G steps; then D step, lazy R1,
        G step, lazy PPL, EMA."""
        cfg = self.config
        ds_flag = cfg.is_ds_iter(iter_idx)
        metrics: Dict[str, Any] = {}

        g_input, r_input, g_ref = self._put(g_input, r_input, g_ref)

        if ds_flag and self.ffhq_steps is not None:
            assert ffhq_ref is not None, "FFHQ-DS iteration needs ffhq_ref"
            (ffhq_ref,) = self._put(ffhq_ref)
            st = self.state
            st["params"], st["stats"], st["d_ffhq_opt"], m = self.ffhq_steps[
                "d_ffhq_step"
            ](st["params"], st["stats"], st["d_ffhq_opt"], g_input, r_input,
              ffhq_ref)
            metrics.update(m)
            if iter_idx % cfg.d_reg_every == 0:
                st["params"], st["d_ffhq_opt"], m = self.ffhq_steps[
                    "d_ffhq_reg_step"
                ](st["params"], st["d_ffhq_opt"], ffhq_ref)
                metrics.update(m)
            st["params"], st["stats"], st["g_opt"], fake, m = self.ffhq_steps[
                "g_ffhq_ds_step"
            ](st["params"], st["stats"], st["g_opt"], g_input, r_input,
              g_ref, self.frozen)
            metrics.update(m)
            # Generated batch replaces g_input downstream (train.py:723-730).
            g_input = fake

        do_r1 = iter_idx % cfg.d_reg_every == 0
        will_g_reg = cfg.use_g_reg and iter_idx % cfg.g_reg_every == 0

        bsz = g_input.shape[0]
        path_bsz = max(1, bsz // cfg.path_reg_batch_shrink)
        if will_g_reg:
            idx = np.sort(
                self._host_rng.choice(bsz, size=path_bsz, replace=False)
            )
        else:
            idx = np.arange(path_bsz)

        # Keys drawn up-front so fused/unfused runs consume the identical
        # RNG stream (≙ loop.py).
        d_rng, g_rng, ppl_rng = self._iter_keys(iter_idx)
        if cfg.share_dg_noise:
            g_rng = d_rng

        # One-dispatch shared-forward iteration (steps_2encoder.py::
        # fused_shared_iteration_step): Trainer2 fuses only via
        # share_dg_noise — without sharing, separate dispatches cost the
        # same compute.  Same auto-fuse HBM heuristic as loop.py.
        fused = False
        if cfg.share_dg_noise:
            per_chip = bsz // max(1, (
                len(self.mesh.devices.flat) if self.mesh is not None else 1
            ))
            fused = cfg.fuse_fits_hbm(per_chip) and cfg.fuse_allows_regs(
                do_r1, will_g_reg
            )

        if fused:
            self.state, m = self.steps["fused_shared_iteration_step"](
                self.state, g_input, r_input, g_ref,
                d_rng, ppl_rng, jnp.asarray(idx), self.frozen,
                ds_flag, False, do_r1, will_g_reg,
            )
            if do_r1:
                self._last_r1 = m["r1"]
            if will_g_reg:
                self._last_greg = {
                    "g_reg": m["g_reg"], "path_length": m["path_length"]
                }
            metrics.update(m)
        else:
            self.state, m = self.steps["d_step"](
                self.state, g_input, r_input, g_ref, d_rng
            )
            metrics.update(m)

            if do_r1:
                self.state, r1_m = self.steps["d_reg_step"](self.state, g_ref)
                self._last_r1 = r1_m["r1"]

            self.state, m = self.steps["g_step"](
                self.state, g_input, r_input, g_ref, g_rng,
                self.frozen, ds_flag, False, not will_g_reg,
            )
            metrics.update(m)

            if will_g_reg:
                p_sub = jnp.take(g_input, jnp.asarray(idx), axis=0)
                r_sub = jnp.take(r_input, jnp.asarray(idx), axis=0)
                if self.mesh is not None:
                    p_sub, r_sub = self._put(p_sub, r_sub)
                self.state, gr_m = self.steps["g_reg_step"](
                    self.state, p_sub, r_sub, ppl_rng, True
                )
                self._last_greg = gr_m
        metrics["r1"] = self._last_r1
        metrics.update(self._last_greg)
        metrics["ds_flag"] = ds_flag
        return metrics

    # ------------------------------------------------------------------
    # Checkpointing (≙ torch.save dict, train.py:580-607).
    # ------------------------------------------------------------------

    def save_checkpoint(self, ckpt_dir: str, step: int):
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(ckpt_dir, f"{step:06d}"))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, jax.device_get(self.state))
        ckptr.wait_until_finished()
        meta = {
            "step": step,
            "co_mod": self.co_modulation,
            "mod_encode": self.mod_encode,
            "use_tanh": self.config.use_tanh,
            "sliced_layer": self.config.w_plus_sliced_layer,
            "size": self.config.size,
        }
        with open(os.path.join(ckpt_dir, f"{step:06d}.json"), "w") as f:
            json.dump(meta, f)

    def load_checkpoint(self, ckpt_dir: str, step: int):
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(ckpt_dir, f"{step:06d}"))
        ckptr = ocp.StandardCheckpointer()
        self.state = ckptr.restore(path, self.state)
