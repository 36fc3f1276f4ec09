#!/usr/bin/env python3
"""Generate the on-disk dataset layouts the training pipeline consumes.

TPU-native counterpart of the reference's dataset-generation tooling
(SURVEY §2.11) to the extent it is portable: the reference scripts
(/root/reference/DiscoFaceGAN_related_scripts/discofacegan_img_generation.py:28-95,
real_img_varying_render_face_generation.py:54-77,
visual_test_img_generation.py:44-76) run a TF1 DiscoFaceGAN checkout to
sample identity-disentangled lambda codes and a 3DMM reconstruction block to
produce renders.  That external model stack is out of scope (README "Scope
cut"); what IS the data contract — and what this tool produces — are the
directory layouts:

  synthetic  id_XXXXX/{g_K.png, r_K.png}   K in 0..n_var-1
             (discofacegan_img_generation.py:69-95: identity slice held
              fixed across the n_var=7 variations)
  ffhq       img/NNNNN.png + render_img/NNNNN.png           (recon pairs)
             + edit_render_img/NNNNN_e{0..3}.png            (4 edits per id,
              real_img_varying_render_face_generation.py:66-68)
  valnpy     NNNNN.npy visual-val bundles [photo, own render, 4 edit renders]
             (visual_test_img_generation.py:73-76)

Image sources:
  --source model      sample a (possibly trained) fm3dgan Generator for the
                      g/photo images: one W per identity (identity held fixed
                      across variations, like the lambda identity slice),
                      fresh per-variation noise.  Renders are stylized masks
                      of the generated image (grayscale face-region stand-in
                      — a real 3DMM render requires the external stack).
  --source procedural deterministic colored-gradient stand-ins (CI/smoke).

Either way the output loads through fm3dgan.data.datasets and drives the full
training/eval path end-to-end.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_T0 = time.time()


def _log(msg: str) -> None:
    print(f"[datagen +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def _save_png(path: str, arr01: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(
        (np.clip(arr01, 0.0, 1.0) * 255).astype(np.uint8)
    ).save(path)


def _procedural_image(rng: np.random.RandomState, size: int) -> np.ndarray:
    """Deterministic smooth random field in [0,1], [H,W,3]."""
    small = rng.uniform(0, 1, (8, 8, 3)).astype(np.float32)
    ys = np.linspace(0, 7, size)
    xs = np.linspace(0, 7, size)
    yi, xi = np.floor(ys).astype(int), np.floor(xs).astype(int)
    yf, xf = (ys - yi)[:, None, None], (xs - xi)[None, :, None]
    yi2, xi2 = np.minimum(yi + 1, 7), np.minimum(xi + 1, 7)
    a = small[yi][:, xi] * (1 - yf) * (1 - xf)
    b = small[yi][:, xi2] * (1 - yf) * xf
    c = small[yi2][:, xi] * yf * (1 - xf)
    d = small[yi2][:, xi2] * yf * xf
    return a + b + c + d


def _render_standin(img01: np.ndarray) -> np.ndarray:
    """Stand-in 'render': grayscale face-region crop against the render
    background convention (background pixels at exactly 0 -> -1 after the
    [-1,1] transform, which is what face_regional_loss masks on,
    training_util.py:236)."""
    h, w, _ = img01.shape
    gray = img01.mean(axis=2, keepdims=True).repeat(3, axis=2)
    out = np.zeros_like(gray)
    y0, y1 = int(0.15 * h), int(0.95 * h)
    x0, x1 = int(0.2 * w), int(0.8 * w)
    out[y0:y1, x0:x1] = np.maximum(gray[y0:y1, x0:x1], 1.0 / 255.0)
    return out


class _ModelSampler:
    def __init__(
        self, size: int, ckpt_dir: str | None, seed: int,
        mix_mode: str = "fine",
    ):
        import jax
        import jax.numpy as jnp

        from fm3dgan.models.generator import Generator

        # Compiles here are slow over the remote tunnel — persist them (the
        # bench/profile tools already do; this tool's first run cost ~20 min
        # of UNCACHED init+synthesis compiles before this line existed).
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/fm3dgan_jax_cache_tpu"
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        self.jax = jax
        if ckpt_dir:
            # ckpt_dir format "dir:step" -> a Trainer checkpoint.
            from fm3dgan.utils.analysis import build_manipulator_from_checkpoint

            d, step = ckpt_dir.rsplit(":", 1)
            models, variables, _ = build_manipulator_from_checkpoint(
                d, int(step)
            )
            self.generator = models.generator
            self.variables = variables["g"]
        else:
            self.generator = Generator(size=size)
            _log("compiling generator init")
            self.variables = jax.jit(self.generator.init)(
                {"params": jax.random.PRNGKey(seed)},
                jnp.zeros((1, 512), jnp.float32),
            )
            _log("generator init done")
        # NB: everything (including the [-1,1]->[0,1] postprocess and the
        # identity-W broadcast over variations) lives inside ONE jit per
        # identity: on the axon TPU tunnel, fetching the result of EAGER
        # ops to host hangs indefinitely, while jitted outputs fetch fine.
        #
        # Variations are style-mixed: the identity W drives the layers below
        # ``inject`` (held fixed across the batch, ≙ the discofacegan
        # identity lambda slice) and a fresh per-variation W drives the rest.
        # NoiseInjection alone cannot vary an UNTRAINED generator's output
        # (its weights init to zero, stylegan2.py:301-312), so mixing is what
        # makes g_0..g_{n-1} genuinely distinct images.
        #
        # mix_mode picks which layers vary: 'fine' (last 6 — color/texture,
        # strongest identity hold) for plain DS layouts; 'middle' (all but
        # the first 3 — structure/pose too) for layouts standing in for
        # pose-varying data (the extreme-pose sampler's contract,
        # discofacegan extreme-pose generation): fine-only variation cannot
        # represent pose changes.
        assert mix_mode in ("fine", "middle"), mix_mode
        inject = (
            max(1, self.generator.n_latent - 6)
            if mix_mode == "fine"
            else min(3, self.generator.n_latent - 1)
        )

        def _identity_batch(v, z_id, z_var, key, n_var):
            w_id = self.generator.apply(v, z_id, method="get_latent")
            w_var = self.generator.apply(v, z_var, method="get_latent")
            wb = jnp.broadcast_to(w_id, (n_var,) + w_id.shape[1:])
            img = self.generator.apply(
                v,
                input_is_latent=True,
                latent_styles=[wb, w_var],
                inject_index=inject,
                rngs={"noise": key},
            )
            return jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)

        self._identity_batch = jax.jit(
            _identity_batch, static_argnames=("n_var",)
        )

    def identity_images(self, key, n_var: int) -> np.ndarray:
        """One identity W, n_var STYLE-MIXED variations -> [n_var, H, W, 3]
        in [0,1]: the identity W is held fixed on the layers below the mix
        point (≙ discofacegan lambda[0:160]) while per-variation W codes
        drive the rest — fine layers (color/texture) by default, middle+fine
        (structure/pose) with mix_mode='middle'."""
        jax = self.jax
        kz, kv, kn = jax.random.split(key, 3)

        z_id = jax.random.normal(kz, (1, 512))
        z_var = jax.random.normal(kv, (n_var, 512))
        return np.asarray(
            self._identity_batch(self.variables, z_id, z_var, kn, n_var)
        )


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("layout", choices=("synthetic", "ffhq", "valnpy"))
    p.add_argument("out_dir")
    p.add_argument("--n_ids", type=int, default=16)
    p.add_argument("--n_var", type=int, default=7,
                   help="variations per identity (synthetic layout; the "
                        "reference uses 7)")
    p.add_argument("--n_edits", type=int, default=4,
                   help="edit renders per photo (ffhq/valnpy; reference "
                        "N_EDIT_IMG_PER_ID=4, dataset.py:117)")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--source", choices=("procedural", "model"),
                   default="procedural")
    p.add_argument("--ckpt_dir", default=None,
                   help="with --source model: trained checkpoint directory")
    p.add_argument("--mix_mode", choices=("fine", "middle"), default="fine",
                   help="with --source model: which layers the per-variation"
                        " W drives. fine = last 6 (color/texture; strongest "
                        "identity hold). middle = all but the first 3 "
                        "(structure/pose too) — use for layouts standing in "
                        "for pose-varying data (extreme-pose DS)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    sampler = None
    if args.source == "model":
        import jax

        sampler = _ModelSampler(
            args.size, args.ckpt_dir, args.seed, mix_mode=args.mix_mode
        )

    def identity_batch(idx: int, n: int) -> np.ndarray:
        if sampler is not None:
            import jax

            return sampler.identity_images(
                jax.random.fold_in(jax.random.PRNGKey(args.seed), idx), n
            )
        rng = np.random.RandomState(args.seed * 100003 + idx)
        base = _procedural_image(rng, args.size)
        out = []
        for _ in range(n):
            out.append(
                np.clip(base + rng.uniform(-0.15, 0.15, base.shape), 0, 1)
            )
        return np.stack(out)

    if args.layout == "synthetic":
        for i in range(args.n_ids):
            if i % 25 == 0:
                _log(f"synthetic id {i}/{args.n_ids}")
            id_dir = os.path.join(args.out_dir, f"id_{i:05d}")
            os.makedirs(id_dir, exist_ok=True)
            imgs = identity_batch(i, args.n_var)
            for k in range(args.n_var):
                _save_png(os.path.join(id_dir, f"g_{k}.png"), imgs[k])
                _save_png(
                    os.path.join(id_dir, f"r_{k}.png"),
                    _render_standin(imgs[k]),
                )
        print(f"synthetic layout: {args.n_ids} ids x {args.n_var} pairs "
              f"-> {args.out_dir}")
    elif args.layout == "ffhq":
        img_d = os.path.join(args.out_dir, "img")
        ren_d = os.path.join(args.out_dir, "render_img")
        edit_d = os.path.join(args.out_dir, "edit_render_img")
        for d in (img_d, ren_d, edit_d):
            os.makedirs(d, exist_ok=True)
        for i in range(args.n_ids):
            if i % 25 == 0:
                _log(f"ffhq id {i}/{args.n_ids}")
            imgs = identity_batch(i, 1 + args.n_edits)
            _save_png(os.path.join(img_d, f"{i:05d}.png"), imgs[0])
            _save_png(
                os.path.join(ren_d, f"{i:05d}.png"), _render_standin(imgs[0])
            )
            for e in range(args.n_edits):
                _save_png(
                    os.path.join(edit_d, f"{i:05d}_e{e}.png"),
                    _render_standin(imgs[1 + e]),
                )
        print(f"ffhq layout: {args.n_ids} photos (+{args.n_edits} edits each)"
              f" -> {args.out_dir}")
    else:  # valnpy
        for i in range(args.n_ids):
            imgs = identity_batch(i, 1 + args.n_edits)
            bundle = [imgs[0] * 2 - 1, _render_standin(imgs[0]) * 2 - 1]
            bundle += [
                _render_standin(imgs[1 + e]) * 2 - 1
                for e in range(args.n_edits)
            ]
            np.save(
                os.path.join(args.out_dir, f"{i:05d}.npy"),
                np.stack(bundle).astype(np.float32),
            )
        print(f"valnpy bundles: {args.n_ids} -> {args.out_dir}")


if __name__ == "__main__":
    main()
