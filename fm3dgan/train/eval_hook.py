"""In-training quantitative evaluation hook.

Counterpart of the eval half of ``Sample_Eval_Save_Ckpt``
(/root/reference/train_3_encoder.py:708-733): every ``model_save_freq``
iterations the reference runs ``Get_Recon_Score`` + ``Get_Edit_Score`` on
held-out loaders with the EMA generator and appends the scores to the
experiment log — its only training-quality regression mechanism.

Here the hook builds a jitted EMA-stack forward from the live TrainState and
reuses fm3dgan.eval.quant_eval; scores come back as a flat dict ready for the
JSONL training log.  Scorer nets degrade gracefully: any of
ArcFace/LPIPS/Inception/FAN that is unavailable yields NaN for its metrics
(the reference's ArcFace checkpoint and FFHQ FID stats are missing from its
own mount, SURVEY.md intro).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fm3dgan.eval.quant_eval import get_edit_score, get_recon_score


def ema_forward_fn(trainer) -> Callable:
    """Jitted (photo, render) -> edited image through the EMA generator and
    the current encoders (the eval path of train_3_encoder.py:683-687).

    If the generator output resolution differs from the encoder input
    resolution (tiny smoke stacks only; production is 256/256), the output is
    bilinearly resized up so downstream comparisons are well-shaped.
    """
    from fm3dgan.pipeline.forward import forward_3_encoder

    models = trainer.models
    cfg = trainer.config

    @jax.jit
    def fwd(params, g_ema_params, stats, photo, render):
        variables = {
            "g": {"params": g_ema_params, **stats["g"]},
            "e_tsr": {"params": params["e_tsr"], **stats["e_tsr"]},
            "e_w": {"params": params["e_w"], **stats["e_w"]},
            "e_w_plus": {"params": params["e_w_plus"], **stats["e_w_plus"]},
        }
        img, _ = forward_3_encoder(
            models, variables, photo, render,
            tsr_encode=cfg.tsr_encode,
            sliced_layer=cfg.w_plus_sliced_layer,
            use_tanh=cfg.use_tanh,
        )
        if img.shape[1] != photo.shape[1]:
            img = jax.image.resize(
                img, (img.shape[0], photo.shape[1], photo.shape[2], 3),
                method="bilinear",
            )
        return img

    def forward(photo, render):
        state = trainer.state
        return fwd(
            state.params, state.g_ema_params, state.stats,
            jnp.asarray(photo), jnp.asarray(render),
        )

    return forward


class QuantEvalHook:
    """Runs recon + edit quantitative eval on demand from a Trainer.

    rec_batches / edit_batches: zero-arg callables returning a fresh iterable
    of eval batches (recon: (photo, render) tuples; edit: [photo, r1..r4]
    lists) — callables so each eval pass re-reads the loader from the start.
    """

    def __init__(
        self,
        trainer,
        rec_batches: Optional[Callable[[], Iterable]] = None,
        edit_batches: Optional[Callable[[], Iterable]] = None,
        inception_fn: Optional[Callable] = None,
        real_stats: Optional[Tuple[np.ndarray, np.ndarray]] = None,
        real_stats_path: Optional[str] = None,
        heatmap_landmark_fn: Optional[Callable] = None,
    ):
        self.trainer = trainer
        self.rec_batches = rec_batches
        self.edit_batches = edit_batches
        self.inception_fn = inception_fn
        self.real_stats = real_stats
        self.real_stats_path = real_stats_path
        self.heatmap_landmark_fn = heatmap_landmark_fn
        self._forward = ema_forward_fn(trainer)
        self._face_rec_fn = self._build_face_rec_fn()
        self._lpips_fn = self._build_lpips_fn()

    def _build_face_rec_fn(self):
        t = self.trainer
        if t.arcface_module is None or "arcface" not in t.frozen:
            return None
        apply = jax.jit(
            lambda vars_, x: t.arcface_module.apply(vars_, x)
        )

        # ArcFace's fc5 flatten fixes its input resolution at init time:
        # size//2 (the reference's grayscale+pool convention — 128² from
        # 256² images; smaller in smoke stacks).  Resize eval images that
        # arrive at any other resolution.
        arc_res = t.config.size // 2

        def fn(x):
            x = jnp.asarray(x)
            if x.shape[1] != arc_res or x.shape[2] != arc_res:
                x = jax.image.resize(
                    x, (x.shape[0], arc_res, arc_res, x.shape[3]),
                    method="bilinear",
                )
            return apply(t.frozen["arcface"], x)

        return fn

    def _build_lpips_fn(self):
        t = self.trainer
        if t.lpips_module is None or "lpips" not in t.frozen:
            return None
        apply = jax.jit(
            lambda vars_, a, b: t.lpips_module.apply(vars_, a, b)
        )
        return lambda a, b: apply(
            t.frozen["lpips"], jnp.asarray(a), jnp.asarray(b)
        )

    def __call__(self, step: int) -> Dict[str, float]:
        """Returns a flat record of all available scores (NaN = no scorer)."""
        record: Dict[str, float] = {"eval_step": step}
        if self.rec_batches is not None:
            cos, lp, l1 = get_recon_score(
                self.rec_batches(),
                self._forward,
                self._face_rec_fn,
                self._lpips_fn,
            )
            record.update(
                recon_id_cosine=cos, recon_lpips=lp, recon_l1=l1
            )
        if self.edit_batches is not None:
            cos, fid, hmap, lmark, freg = get_edit_score(
                self.edit_batches(),
                self._forward,
                self._face_rec_fn,
                self.inception_fn,
                real_stats=self.real_stats,
                real_stats_path=self.real_stats_path,
                heatmap_landmark_fn=self.heatmap_landmark_fn,
            )
            record.update(
                edit_id_cosine=cos,
                edit_fid=fid,
                edit_hmap=hmap,
                edit_landmark=lmark,
                edit_face_regional=freg,
            )
        return record


def make_fake_eval_batches(
    size: int, batch: int = 2, n_batches: int = 1, seed: int = 9
) -> Tuple[Callable[[], List], Callable[[], List]]:
    """Deterministic random eval sets for smoke runs (--fake_data)."""
    rng = np.random.RandomState(seed)
    rec = [
        (
            rng.uniform(-1, 1, (batch, size, size, 3)).astype(np.float32),
            rng.uniform(-1, 1, (batch, size, size, 3)).astype(np.float32),
        )
        for _ in range(n_batches)
    ]
    edit = [
        [rng.uniform(-1, 1, (batch, size, size, 3)).astype(np.float32)
         for _ in range(5)]
        for _ in range(n_batches)
    ]
    return (lambda: rec), (lambda: edit)


def make_dir_eval_batches(
    rec_eval_dir: Optional[str],
    edit_eval_dir: Optional[str],
    batch_size: int,
    n_batches: Optional[int] = None,
    transform: Optional[Callable] = None,
) -> Tuple[Optional[Callable[[], Iterable]], Optional[Callable[[], Iterable]]]:
    """Eval-batch factories from the reference directory layouts.

    rec_eval_dir: contains img/ and render_img/ (FFHQ_Dataset_Reconstruction,
    dataset.py:76-106).  edit_eval_dir: contains img/ and edit_render_img/
    (FFHQ_Dataset_Editing eval mode, dataset.py:109-160).
    transform: the decode transform — pass default_transform(input_size)
    when training at a non-256 input size (the encoder spatials are
    input_size-dependent, so the fixed-256 default would crash the first
    eval pass); None keeps the reference's fixed 256.
    """
    import os

    from fm3dgan.data.datasets import EditingDataset, ReconstructionDataset

    rec_fn = edit_fn = None
    if rec_eval_dir:
        rec_set = ReconstructionDataset(
            os.path.join(rec_eval_dir, "img"),
            os.path.join(rec_eval_dir, "render_img"),
            transform=transform,
        )

        def rec_fn():
            n = len(rec_set)
            limit = n_batches or max(1, n // batch_size)
            for b in range(limit):
                idxs = range(
                    b * batch_size, min((b + 1) * batch_size, n)
                )
                if not idxs:
                    break
                items = [rec_set[i] for i in idxs]
                yield (
                    np.stack([p for p, _ in items]),
                    np.stack([r for _, r in items]),
                )

    if edit_eval_dir:
        edit_set = EditingDataset(
            os.path.join(edit_eval_dir, "img"),
            os.path.join(edit_eval_dir, "edit_render_img"),
            train=False,
            transform=transform,
        )

        def edit_fn():
            n = len(edit_set)
            limit = n_batches or max(1, n // batch_size)
            for b in range(limit):
                idxs = range(
                    b * batch_size, min((b + 1) * batch_size, n)
                )
                if not idxs:
                    break
                items = [edit_set[i] for i in idxs]  # each: [photo, r1..r4]
                yield [
                    np.stack([it[k] for it in items]) for k in range(5)
                ]

    return rec_fn, edit_fn
