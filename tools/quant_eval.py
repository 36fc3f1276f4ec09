#!/usr/bin/env python3
"""Quantitative evaluation CLI: reconstruction + editing scores.

Counterpart of the reference's in-training eval block
(train_3_encoder.py:708-733 calling Evaluation/quant_eval.py).

  python tools/quant_eval.py --ckpt_dir Exp/ckpt --step 10000 \
      --recon_dir /data/val  --edit_dir /data/val \
      [--arcface_ckpt resnet18_arcfacenet.pth] [--lpips_heads vgg.pth] \
      [--inception_ckpt pt_inception.pth] [--ffhq_stats stats.pkl]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt_dir", required=True)
    p.add_argument("--step", type=int, required=True)
    p.add_argument("--recon_dir", default=None,
                   help="dir with img/ + render_img/ for reconstruction eval")
    p.add_argument("--edit_dir", default=None,
                   help="dir with img/ + edit_render_img/ for editing eval")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--edit_batch", type=int, default=16)
    p.add_argument("--arcface_ckpt", default=None)
    p.add_argument("--lpips_heads", default=None)
    p.add_argument("--vgg_backbone", default=None)
    p.add_argument("--inception_ckpt", default=None)
    p.add_argument("--ffhq_stats", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from fm3dgan.data import DataLoader, EditingDataset, ReconstructionDataset
    from fm3dgan.eval.quant_eval import get_edit_score, get_recon_score
    from fm3dgan.models.arcface import ResNetFace18
    from fm3dgan.models.inception import InceptionV3Pool3, convert_fid_inception
    from fm3dgan.models.lpips import LPIPS
    from fm3dgan.pipeline import forward_3_encoder
    from fm3dgan.utils.analysis import build_manipulator_from_checkpoint

    models, variables, meta = build_manipulator_from_checkpoint(
        args.ckpt_dir, args.step
    )
    size = meta["size"]

    @jax.jit
    def forward(v, photo, render):
        img, _ = forward_3_encoder(
            models, v, photo, render,
            tsr_encode=meta["tsr_encode"],
            sliced_layer=tuple(meta["sliced_layer"]) if meta["sliced_layer"] else None,
            use_tanh=meta["use_tanh"],
        )
        return img

    forward_fn = lambda p_, r_: forward(variables, jnp.asarray(p_), jnp.asarray(r_))

    arc = ResNetFace18(use_se=False)
    if args.arcface_ckpt:
        from fm3dgan.compat.torch_port import convert_arcface, load_torch_state_dict

        arc_vars = convert_arcface(load_torch_state_dict(args.arcface_ckpt))
    else:
        print("WARNING: random-init ArcFace features")
        arc_vars = jax.jit(arc.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 1))
        )
    face_rec_fn = jax.jit(lambda x: arc.apply(arc_vars, x))

    if args.recon_dir:
        lp = LPIPS()
        dummy = jnp.zeros((1, size, size, 3))
        lp_vars = jax.jit(lp.init)(jax.random.PRNGKey(0), dummy, dummy)
        if args.lpips_heads:
            from fm3dgan.compat.torch_port import (
                convert_lpips,
                load_torch_state_dict,
            )

            lp_vars = convert_lpips(
                load_torch_state_dict(args.lpips_heads),
                load_torch_state_dict(args.vgg_backbone)
                if args.vgg_backbone
                else None,
                lp_vars,
            )
        lpips_fn = jax.jit(lambda a, b: lp.apply(lp_vars, a, b))

        ds = ReconstructionDataset(
            os.path.join(args.recon_dir, "img"),
            os.path.join(args.recon_dir, "render_img"),
        )
        batches = (
            ds_batch
            for ds_batch in iter(DataLoader(ds, args.batch, drop_last=False))
        )
        import itertools

        n_batches = max(1, len(ds) // args.batch)
        cos, lpips_v, l1 = get_recon_score(
            itertools.islice(batches, n_batches), forward_fn, face_rec_fn,
            lpips_fn, info_print=True,
        )
        print(f"RECON  id-cosine={cos:.4f}  lpips={lpips_v:.4f}  l1={l1:.4f}")

    if args.edit_dir:
        inception = InceptionV3Pool3()
        if args.inception_ckpt:
            from fm3dgan.compat.torch_port import load_torch_state_dict

            inc_vars = convert_fid_inception(
                load_torch_state_dict(args.inception_ckpt)
            )
        else:
            print("WARNING: random-init inception features")
            inc_vars = jax.jit(inception.init)(
                jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3))
            )
        inception_fn = jax.jit(lambda x: inception.apply(inc_vars, x))

        ds = EditingDataset(
            os.path.join(args.edit_dir, "img"),
            os.path.join(args.edit_dir, "edit_render_img"),
        )
        loader = DataLoader(ds, args.edit_batch, drop_last=False)
        import itertools

        n_batches = max(1, len(ds) // args.edit_batch)
        cos, fid, hmap, lmark, freg = get_edit_score(
            itertools.islice(iter(loader), n_batches),
            forward_fn,
            face_rec_fn,
            inception_fn,
            real_stats_path=args.ffhq_stats,
            info_print=True,
        )
        print(
            f"EDIT   id-cosine={cos:.4f}  fid={fid:.2f}  hmap={hmap:.4f}  "
            f"lmark={lmark:.4f}  face-reg={freg:.4f}"
        )


if __name__ == "__main__":
    main()
