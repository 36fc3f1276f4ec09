#!/usr/bin/env python3
"""Photo editing / serving CLI — the production inference entry.

Runs the 3-encoder manipulation pipeline (Forward_Inference_3_Encoder,
Util/network_util.py — SURVEY §3.2's serving call stack) on image files:
each (photo, render) pair produces an edited photo whose pose / expression /
illumination follow the render while identity and appearance follow the
photo.

  # From a training checkpoint (EMA generator by default):
  python tools/edit.py --ckpt_dir Exp/ckpt --step 420000 \
      --photo me.png --render pose1.png pose2.png --out_dir edited/

  # Every photo is paired with every render when one photo and N renders
  # (reanimation) or N photos and one render (style transfer) are given;
  # equal-length lists pair element-wise.

Outputs <photo-stem>__<render-stem>.png plus an optional side-by-side
--grid contact sheet.  --dtype bfloat16 runs the whole stack in bf16 on
TPU (the bench.py configuration, ~400 edited img/s/chip).
"""

from __future__ import annotations

import argparse
import itertools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fm3dgan_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    p = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    p.add_argument("--ckpt_dir", type=str, required=True,
                   help="Trainer checkpoint directory (Orbax)")
    p.add_argument("--step", type=int, required=True)
    p.add_argument("--no_ema", action="store_true",
                   help="use the live generator instead of the EMA copy")
    p.add_argument("--photo", type=str, nargs="+", required=True)
    p.add_argument("--render", type=str, nargs="+", required=True)
    p.add_argument("--out_dir", type=str, default="./edited")
    p.add_argument("--input_size", type=int, default=None,
                   help="encoder input resolution (default: generator size)")
    p.add_argument("--batch", type=int, default=16,
                   help="pairs per device dispatch")
    p.add_argument("--dtype", default="float32",
                   choices=("float32", "bfloat16"))
    p.add_argument("--grid", action="store_true",
                   help="also save photo|render|edited contact sheets")
    args = p.parse_args()

    from PIL import Image

    from fm3dgan.data.datasets import default_transform, load_image
    from fm3dgan.eval.visual_eval import save_image, tensor_to_image
    from fm3dgan.pipeline.forward import forward_3_encoder
    from fm3dgan.utils.analysis import build_manipulator_from_checkpoint

    models, variables, meta = build_manipulator_from_checkpoint(
        args.ckpt_dir, args.step, use_ema=not args.no_ema
    )
    size = meta["size"]
    in_size = args.input_size or meta.get("input_size") or size
    if args.dtype == "bfloat16":
        variables = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
            variables,
        )

    # Pairing: element-wise for equal lists, cross-product when one side is
    # a single file (reanimation / style-transfer patterns).
    if len(args.photo) == len(args.render):
        pairs = list(zip(args.photo, args.render))
    elif len(args.photo) == 1 or len(args.render) == 1:
        pairs = list(itertools.product(args.photo, args.render))
    else:
        p.error("--photo and --render must be equal-length, or one of them "
                "a single file")

    tf = default_transform(in_size)

    sliced = (
        tuple(meta["sliced_layer"]) if meta.get("sliced_layer") else None
    )

    @jax.jit
    def edit(variables, photo, render):
        img, _ = forward_3_encoder(
            models, variables, photo, render,
            tsr_encode=meta.get("tsr_encode", "Render Image"),
            sliced_layer=sliced,
            use_tanh=bool(meta.get("use_tanh", False)),
        )
        return img

    os.makedirs(args.out_dir, exist_ok=True)
    n_done = 0
    for lo in range(0, len(pairs), args.batch):
        chunk = pairs[lo : lo + args.batch]
        photo = jnp.asarray(
            np.stack([load_image(a, tf) for a, _ in chunk])
        )
        render = jnp.asarray(
            np.stack([load_image(b, tf) for _, b in chunk])
        )
        out = np.asarray(
            edit(variables, photo, render).astype(jnp.float32)
        )
        for k, (pa, pb) in enumerate(chunk):
            stem_a = os.path.splitext(os.path.basename(pa))[0]
            stem_b = os.path.splitext(os.path.basename(pb))[0]
            dst = os.path.join(args.out_dir, f"{stem_a}__{stem_b}.png")
            save_image(dst, tensor_to_image(out[k]))
            if args.grid:
                tiles = [
                    tensor_to_image(np.asarray(photo[k], np.float32)),
                    tensor_to_image(np.asarray(render[k], np.float32)),
                    tensor_to_image(out[k]),
                ]
                side = max(t.shape[0] for t in tiles)
                tiles = [
                    t if t.shape[0] == side else np.asarray(
                        Image.fromarray(t).resize(
                            (side, side), Image.NEAREST
                        )
                    )
                    for t in tiles
                ]
                row = np.concatenate(tiles, axis=1)
                save_image(
                    os.path.join(
                        args.out_dir, f"{stem_a}__{stem_b}_grid.png"
                    ),
                    row,
                )
            n_done += 1
            print(f"[{n_done}/{len(pairs)}] {dst}")


if __name__ == "__main__":
    main()
