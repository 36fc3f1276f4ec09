#!/usr/bin/env python3
"""AOT model export — serialize the production forward as StableHLO.

The reference's deployment story is ``torch.save`` pickles that need the
entire model codebase importable at load time
(`/root/reference/Util/network_util.py:101` Build_Generator_From_Dict).  The
TPU-native story is ahead-of-time export: ``jax.export`` lowers the jitted
3-encoder forward (Forward_Inference_3_Encoder's production path) to a
self-contained, versioned StableHLO artifact that any JAX process — or a
C++/PJRT serving runtime — can deserialize and run with **no fm3dgan Python
model code**.  Weights stay separate (the Orbax checkpoint), passed as call
arguments, so one artifact serves every checkpoint of the same architecture.

  # Export for TPU serving (artifact also runs on CPU for smoke checks):
  python tools/export_model.py --ckpt_dir Exp/ckpt --step 420000 \
      --out model.shlo --batch 32 --dtype bfloat16 --platforms tpu,cpu

  # Round-trip check: deserialize and compare against the live forward.
  python tools/export_model.py --ckpt_dir Exp/ckpt --step 420000 \
      --out model.shlo --verify
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build_forward(args):
    """(models, variables, meta, fn) for the checkpoint's serving forward."""
    from fm3dgan.pipeline.forward import forward_3_encoder
    from fm3dgan.utils.analysis import build_manipulator_from_checkpoint

    models, variables, meta = build_manipulator_from_checkpoint(
        args.ckpt_dir, args.step, use_ema=not args.no_ema
    )
    if args.dtype == "bfloat16":
        variables = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
            variables,
        )
    sliced = (
        tuple(meta["sliced_layer"]) if meta.get("sliced_layer") else None
    )

    def fn(variables, photo, render):
        img, _ = forward_3_encoder(
            models, variables, photo, render,
            tsr_encode=meta.get("tsr_encode", "Render Image"),
            sliced_layer=sliced,
            use_tanh=bool(meta.get("use_tanh", False)),
        )
        return img

    return models, variables, meta, fn


def main():
    p = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    p.add_argument("--ckpt_dir", type=str, required=True)
    p.add_argument("--step", type=int, required=True)
    p.add_argument("--no_ema", action="store_true")
    p.add_argument("--out", type=str, required=True,
                   help="output artifact path (.shlo)")
    p.add_argument("--batch", type=int, default=32,
                   help="static serving batch size (TPU-friendly shapes)")
    p.add_argument("--input_size", type=int, default=None)
    p.add_argument("--dtype", default="float32",
                   choices=("float32", "bfloat16"))
    p.add_argument("--platforms", type=str, default=None,
                   help="comma-separated lowering platforms, e.g. 'tpu,cpu' "
                        "(default: the current backend only)")
    p.add_argument("--verify", action="store_true",
                   help="after writing, deserialize the artifact and check "
                        "its output matches the live forward")
    args = p.parse_args()

    from jax import export as jexport

    models, variables, meta, fn = build_forward(args)
    size = meta["size"]
    in_size = args.input_size or meta.get("input_size") or size

    img_spec = jax.ShapeDtypeStruct(
        (args.batch, in_size, in_size, 3), jnp.float32
    )
    var_specs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype),
        variables,
    )
    platforms = (
        tuple(s.strip() for s in args.platforms.split(",") if s.strip())
        if args.platforms else None
    )
    exported = jexport.export(jax.jit(fn), platforms=platforms)(
        var_specs, img_spec, img_spec
    )
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(
        f"exported {args.out}: {len(blob) / 1e6:.2f} MB, "
        f"platforms={list(exported.platforms)}, "
        f"batch={args.batch}, {in_size}px, {args.dtype}"
    )

    if args.verify:
        with open(args.out, "rb") as f:
            reloaded = jexport.deserialize(f.read())
        rng = np.random.RandomState(0)
        photo = jnp.asarray(
            rng.uniform(-1, 1, img_spec.shape).astype(np.float32)
        )
        render = jnp.asarray(
            rng.uniform(-1, 1, img_spec.shape).astype(np.float32)
        )
        got = np.asarray(
            reloaded.call(variables, photo, render), dtype=np.float32
        )
        want = np.asarray(
            jax.jit(fn)(variables, photo, render), dtype=np.float32
        )
        # bf16 outputs carry ~2^-8 relative precision, and the artifact and
        # the fresh jit may fuse/reassociate differently — a float32-scale
        # tolerance would spuriously fail a correct bf16 export.
        tol = 2e-5 if args.dtype == "float32" else 5e-2
        np.testing.assert_allclose(got, want, atol=tol, rtol=tol)
        print(
            f"verify OK: artifact output matches live forward "
            f"(max |delta| = {np.max(np.abs(got - want)):.2e})"
        )


if __name__ == "__main__":
    main()
