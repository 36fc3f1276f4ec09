#!/usr/bin/env python3
"""GAN-inversion CLI: optimize (W, noises) to reconstruct a target image.

Counterpart of /root/reference/Evaluation/image_projection/image_projector.py.

  python tools/project.py --ckpt_dir Exp/ckpt --step 10000 --image face.png \
      [--steps 1000] [--optimizer adam|lbfgs] [--out recon.png]
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
    p.add_argument("--image", required=True)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--optimizer", default="adam", choices=["adam", "lbfgs"])
    p.add_argument("--lpips_start_step", type=int, default=500)
    p.add_argument("--out", default="projected.png")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from fm3dgan.data.datasets import load_image
    from fm3dgan.eval.projector import ProjectorConfig, project_image, psnr
    from fm3dgan.eval.visual_eval import save_image, tensor_to_image
    from fm3dgan.utils.analysis import build_manipulator_from_checkpoint

    models, variables, meta = build_manipulator_from_checkpoint(
        args.ckpt_dir, args.step
    )
    target = jnp.asarray(load_image(args.image))[None]

    cfg = ProjectorConfig(
        steps=args.steps,
        lr=args.lr,
        optimizer=args.optimizer,
        lpips_start_step=args.lpips_start_step,
    )
    res = project_image(
        models.generator, variables["g"], target, jax.random.PRNGKey(0),
        config=cfg,
    )
    save_image(args.out, tensor_to_image(np.asarray(res["image"]))[0])
    print(
        f"final loss {res['losses'][-1]:.5f}  "
        f"psnr {psnr(res['image'], target):.2f} dB  -> {args.out}"
    )


if __name__ == "__main__":
    main()
