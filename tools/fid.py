#!/usr/bin/env python3
"""Unconditional FID CLI (counterpart of /root/reference/Evaluation/fid.py:134+).

  python tools/fid.py --ckpt_dir Exp/ckpt --step 10000 --stats ffhq_stats.pkl \
      [--n_sample 50000] [--batch 100] [--inception_ckpt pt_inception.pth]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt_dir", required=True)
    p.add_argument("--step", type=int, required=True)
    p.add_argument("--stats", required=True)
    p.add_argument("--n_sample", type=int, default=50_000)
    p.add_argument("--batch", type=int, default=100)
    p.add_argument("--inception_ckpt", default=None)
    p.add_argument("--data_parallel", action="store_true",
                   help="shard inception feature extraction over all local "
                        "devices (shard_map + all_gather)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from fm3dgan.eval.fid import get_model_fid_score
    from fm3dgan.models.inception import InceptionV3Pool3, convert_fid_inception
    from fm3dgan.utils.analysis import build_manipulator_from_checkpoint

    models, variables, _ = build_manipulator_from_checkpoint(
        args.ckpt_dir, args.step
    )

    @jax.jit
    def gen(z):
        return models.generator.apply(
            variables["g"], z, randomize_noise=False
        )

    inception = InceptionV3Pool3()
    if args.inception_ckpt:
        from fm3dgan.compat.torch_port import load_torch_state_dict

        inc_vars = convert_fid_inception(load_torch_state_dict(args.inception_ckpt))
    else:
        print("WARNING: random-init inception features")
        inc_vars = inception.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))

    @jax.jit
    def features(x):
        return inception.apply(inc_vars, x)

    mesh = None
    if args.data_parallel:
        from fm3dgan.parallel import create_mesh

        mesh = create_mesh()

    fid = get_model_fid_score(
        gen, features, args.stats, n_sample=args.n_sample,
        batch_size=args.batch, mesh=mesh,
    )
    print(f"FID ({args.n_sample} samples): {fid:.4f}")


if __name__ == "__main__":
    main()
