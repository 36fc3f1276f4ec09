"""Quantitative evaluation suites.

Parity with /root/reference/Evaluation/quant_eval.py:25-209:
  * get_recon_score — ArcFace ID cosine, LPIPS, per-image L1 over a
    reconstruction loader.
  * get_edit_score — ID cosine, FID vs precomputed FFHQ stats, heatmap L2,
    landmark MSE (optional: requires the FAN landmark stack), face-regional
    MSE over an editing loader (1 photo x 4 edit renders).

All model callables are jitted closures over frozen/trained variables:
  forward_fn(photo, render) -> edited image
  face_rec_fn([N,128,128,1]) -> [N,512]
  lpips_fn(a, b) -> [N]
  inception_fn(img) -> [N,2048]
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from fm3dgan.eval.fid import calc_fid, compute_inception_stats, load_stats
from fm3dgan.losses.geometry import get_render_mask
from fm3dgan.losses.recon import convert_for_face_recognition


def compute_face_identity_similarity(
    output, target, face_rec_fn
) -> np.ndarray:
    """Cosine similarity of ArcFace embeddings (quant_eval.py:25-49)."""
    tgt = np.asarray(face_rec_fn(convert_for_face_recognition(target)))
    outs = output if isinstance(output, (list, tuple)) else [output]
    sims = []
    for o in outs:
        feat = np.asarray(face_rec_fn(convert_for_face_recognition(o)))
        num = np.sum(feat * tgt, axis=-1)
        den = np.maximum(
            np.linalg.norm(feat, axis=-1) * np.linalg.norm(tgt, axis=-1), 1e-8
        )
        sims.append(num / den)
    if isinstance(output, (list, tuple)):
        return np.stack(sims)
    return sims[0]


def get_recon_score(
    eval_batches,
    forward_fn: Callable,
    face_rec_fn: Callable,
    lpips_fn: Callable,
    info_print: bool = False,
) -> Tuple[float, float, float]:
    """(mean ID-cosine, mean LPIPS, mean per-image L1) (quant_eval.py:51-107).

    eval_batches: iterable of (photo, render) NHWC [-1,1] arrays.
    face_rec_fn / lpips_fn may be None (scorer net unavailable) — the
    corresponding score is NaN.
    """
    cos_sim, lpips_vals, l1_vals = [], [], []
    for idx, (photo, render) in enumerate(eval_batches):
        if info_print:
            print(f"Batch: {idx}")
        out = forward_fn(photo, render)
        if face_rec_fn is not None:
            cos_sim += list(
                compute_face_identity_similarity(out, photo, face_rec_fn)
            )
        if lpips_fn is not None:
            lpips_vals += list(np.asarray(lpips_fn(out, photo)).reshape(-1))
        l1_vals += list(
            np.mean(np.abs(np.asarray(out) - np.asarray(photo)), axis=(1, 2, 3))
        )
    return (
        float(np.mean(cos_sim)) if cos_sim else float("nan"),
        float(np.mean(lpips_vals)) if lpips_vals else float("nan"),
        float(np.mean(l1_vals)),
    )


def get_edit_score(
    eval_batches,
    forward_fn: Callable,
    face_rec_fn: Callable,
    inception_fn: Callable,
    real_stats_path: Optional[str] = None,
    real_stats: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    heatmap_landmark_fn: Optional[Callable] = None,
    info_print: bool = False,
):
    """(mean ID-cosine, FID, mean heatmap-L2, mean landmark-MSE, mean
    face-regional MSE) (quant_eval.py:110-209).

    eval_batches: iterable of [photo, edit_render_1..4] lists.
    heatmap_landmark_fn: images -> (heatmaps [N,64,64,68], landmarks [N,68,2]);
      heatmap/landmark scores are NaN when unavailable (the reference's FAN
      dependency, SURVEY.md §2.4).
    face_rec_fn / inception_fn may be None — the corresponding scores
    (ID-cosine / FID) are NaN.
    """
    cos_sim: List[float] = []
    hmap_scores: List[float] = []
    lmark_scores: List[float] = []
    face_diff: List[float] = []
    feats = []

    for idx, batch in enumerate(eval_batches):
        if info_print:
            print(f"Batch: {idx}")
        photo = batch[0]
        outs = []
        for render in batch[1:]:
            out = forward_fn(photo, render)
            outs.append(out)
            mask = np.asarray(get_render_mask(jnp.asarray(render)))[..., None]
            diff = np.mean(
                np.square(np.asarray(render) * mask - np.asarray(out) * mask),
                axis=(1, 2, 3),
            )
            face_diff += list(diff)
            if heatmap_landmark_fn is not None:
                hm_g, lm_g = heatmap_landmark_fn(out)
                hm_r, lm_r = heatmap_landmark_fn(render)
                hmap_scores += list(
                    np.sum(
                        np.square(np.asarray(hm_r) - np.asarray(hm_g)),
                        axis=(1, 2, 3),
                    )
                )
                lmark_scores += list(
                    np.mean(np.square(np.asarray(lm_r) - np.asarray(lm_g)), axis=(1, 2))
                )
        if face_rec_fn is not None:
            sims = compute_face_identity_similarity(outs, photo, face_rec_fn)
            cos_sim += list(np.asarray(sims).reshape(-1))
        if inception_fn is not None:
            all_out = np.concatenate([np.asarray(o) for o in outs], axis=0)
            feats.append(np.asarray(inception_fn(jnp.asarray(all_out))))

    if inception_fn is not None and (
        real_stats is not None or real_stats_path is not None
    ):
        feats = np.concatenate(feats, axis=0)
        sample_mean, sample_cov = compute_inception_stats(feats)
        if real_stats is None:
            real_stats = load_stats(real_stats_path)
        fid = calc_fid(sample_mean, sample_cov, real_stats[0], real_stats[1])
    else:
        fid = float("nan")

    hmap = float(np.mean(hmap_scores)) if hmap_scores else float("nan")
    lmark = float(np.mean(lmark_scores)) if lmark_scores else float("nan")
    return (
        float(np.mean(cos_sim)) if cos_sim else float("nan"),
        fid,
        hmap,
        lmark,
        float(np.mean(face_diff)),
    )
