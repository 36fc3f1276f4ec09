#!/usr/bin/env python3
"""Dataset -> Inception (mean, cov) stats pickle builder.

Counterpart of /root/reference/Evaluation/calc_inception.py:68-124.  The
reference's FFHQ stats pickle is absent from its mount
(.MISSING_LARGE_BLOBS:1); this CLI regenerates equivalent stats for any image
folder.

  python tools/calc_inception.py --img_dir /data/ffhq_val --out stats.pkl \
      [--inception_ckpt pt_inception-2015-12-05.pth] [--batch 64] [--n_sample 50000]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--img_dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--inception_ckpt", default=None,
                   help="pytorch-fid InceptionV3 .pth (random init if absent)")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--n_sample", type=int, default=50_000)
    p.add_argument("--size", type=int, default=256)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from fm3dgan.data import ImageFolderDataset
    from fm3dgan.eval.fid import compute_inception_stats, save_stats
    from fm3dgan.models.inception import InceptionV3Pool3, convert_fid_inception

    model = InceptionV3Pool3()
    if args.inception_ckpt:
        from fm3dgan.compat.torch_port import load_torch_state_dict

        variables = convert_fid_inception(load_torch_state_dict(args.inception_ckpt))
    else:
        print("WARNING: no inception checkpoint — random-init features")
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, args.size, args.size, 3))
        )

    @jax.jit
    def features(x):
        return model.apply(variables, x)

    dataset = ImageFolderDataset(args.img_dir)
    n = min(args.n_sample, len(dataset))
    feats = []
    for i in range(0, n, args.batch):
        batch = np.stack([dataset[j] for j in range(i, min(i + args.batch, n))])
        feats.append(np.asarray(features(jnp.asarray(batch))))
        if (i // args.batch) % 10 == 0:
            print(f"{i + len(batch)}/{n}")
    feats = np.concatenate(feats, axis=0)
    mean, cov = compute_inception_stats(feats)
    save_stats(args.out, mean, cov)
    print(f"saved stats for {feats.shape[0]} images -> {args.out}")


if __name__ == "__main__":
    main()
