#!/usr/bin/env python3
"""PPL CLI (counterpart of /root/reference/Evaluation/ppl.py:142-215).

  python tools/ppl.py --ckpt_dir Exp/ckpt --step 10000 \
      [--n_sample 5000] [--batch 16] [--eps 1e-4] [--lpips_heads vgg.pth]
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
    p.add_argument("--n_sample", type=int, default=5000)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--eps", type=float, default=1e-4)
    p.add_argument("--lpips_heads", default=None,
                   help="LPIPS v0.1 vgg heads .pth (linear weights)")
    p.add_argument("--vgg_backbone", default=None,
                   help="torchvision VGG16 state dict .pth")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from fm3dgan.eval.ppl import get_ppl_score
    from fm3dgan.models.lpips import LPIPS
    from fm3dgan.utils.analysis import build_manipulator_from_checkpoint

    models, variables, _ = build_manipulator_from_checkpoint(
        args.ckpt_dir, args.step
    )
    g = models.generator

    @jax.jit
    def style_fn(z):
        return g.apply(variables["g"], method=lambda m: m.get_latent(z))

    @jax.jit
    def synthesis_fn(w):
        return g.apply(
            variables["g"],
            input_is_latent=True,
            latent_styles=[w],
            randomize_noise=False,
        )

    lpips = LPIPS()
    size = g.size
    dummy = jnp.zeros((1, min(size, 256), min(size, 256), 3))
    lp_vars = jax.jit(lpips.init)(jax.random.PRNGKey(0), dummy, dummy)
    if args.lpips_heads:
        from fm3dgan.compat.torch_port import convert_lpips, load_torch_state_dict

        heads = load_torch_state_dict(args.lpips_heads)
        backbone = (
            load_torch_state_dict(args.vgg_backbone) if args.vgg_backbone else None
        )
        lp_vars = convert_lpips(heads, backbone, lp_vars)
    else:
        print("WARNING: random-init LPIPS")

    @jax.jit
    def lpips_fn(a, b):
        return lpips.apply(lp_vars, a, b)

    ppl = get_ppl_score(
        style_fn,
        synthesis_fn,
        lpips_fn,
        n_sample=args.n_sample,
        batch_size=args.batch,
        latent_dim=g.style_dim,
        eps=args.eps,
        info_print=True,
    )
    print(f"PPL: {ppl:.6f}")


if __name__ == "__main__":
    main()
