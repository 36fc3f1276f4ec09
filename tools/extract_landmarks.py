#!/usr/bin/env python3
"""Batch facial-landmark extraction over an image directory.

TPU-native counterpart of the reference's MTCNN landmark extractor
(DiscoFaceGAN_related_scripts/landmark_extractor.py:32-50): iterate a
directory of face images, detect the face, and write one
``<image_name>.txt`` per image with the 5 keypoints (left eye, right eye,
nose, left mouth corner, right mouth corner) as ``x y`` lines — the exact
format Write_Detection_Result produces (landmark_extractor.py:18-30) and the
DiscoFaceGAN alignment preprocessing consumes.

Instead of MTCNN (an external TF model) this drives the framework's own
SFD + FAN stack (fm3dgan/models/sfd_detector.py, fan_landmark.py): S3FD
single-face detection with full-image fallback, the 0.12-offset crop, 4-stack
hourglass heatmaps, quarter-pixel decode back to the original frame, then the
iBUG-68 -> 5-point reduction (fan_landmark.landmarks_68_to_5).  Detection and
heatmap inference are jitted and batched; the box decode/crop stays on host
(data-dependent shapes).

With ``--points 68`` the full 68-point set is written instead (one ``x y``
line per point), for consumers of the raw FAN output.

Checkpoints: --sfd_ckpt / --fan_ckpt accept the public torch checkpoints
(s3fd / 2DFAN-4) via the converters; --random_init runs the stack with seeded
random weights (smoke/CI — landmarks are meaningless but the pipeline and
file contract are exercised end-to-end).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def _load_image(
    path: str, size: int | None
) -> tuple[np.ndarray, tuple[int, int]]:
    """One decode per file: (pixels resized to size^2, original (w, h))."""
    from PIL import Image

    with Image.open(path) as img:
        img = img.convert("RGB")
        orig_size = img.size
        if size is not None and img.size != (size, size):
            img = img.resize((size, size), Image.BILINEAR)
        return np.asarray(img, np.float32), orig_size


def _write_landmarks(path: str, lm: np.ndarray) -> None:
    # Write_Detection_Result format: one "x y" line per keypoint
    # (landmark_extractor.py:27-30).
    with open(path, "w") as f:
        for x, y in lm:
            f.write(f"{x} {y}\n")


def build_stack(args):
    """(detector_fn, fan_fn) — jitted S3FD map head + FAN heatmap head."""
    import jax
    import jax.numpy as jnp

    from fm3dgan.models.fan_landmark import FAN
    from fm3dgan.models.sfd_detector import S3FD

    sfd = S3FD()
    fan = FAN()
    if args.random_init:
        sfd_vars = jax.jit(sfd.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, args.size, args.size, 3))
        )
        fan_vars = jax.jit(fan.init)(
            jax.random.PRNGKey(1), jnp.zeros((1, 256, 256, 3))
        )
    else:
        from fm3dgan.compat.torch_port import load_torch_state_dict
        from fm3dgan.models.fan_landmark import convert_fan
        from fm3dgan.models.sfd_detector import convert_s3fd

        if not (args.sfd_ckpt and args.fan_ckpt):
            raise SystemExit(
                "--sfd_ckpt and --fan_ckpt are required "
                "(or pass --random_init for a smoke run)"
            )
        sfd_vars = convert_s3fd(load_torch_state_dict(args.sfd_ckpt))
        fan_vars = convert_fan(load_torch_state_dict(args.fan_ckpt))

    detector_fn = jax.jit(lambda x: sfd.apply(sfd_vars, x))
    fan_fn = jax.jit(lambda x: fan.apply(fan_vars, x))
    return detector_fn, fan_fn


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--img_dir", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--sfd_ckpt", default=None,
                   help="public s3fd torch checkpoint (.pth)")
    p.add_argument("--fan_ckpt", default=None,
                   help="public 2DFAN-4 torch checkpoint (.pth)")
    p.add_argument("--random_init", action="store_true",
                   help="seeded random weights (pipeline smoke run)")
    p.add_argument("--points", type=int, default=5, choices=(5, 68))
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=256,
                   help="images are resized to size^2 before detection; "
                        "landmarks are scaled back to the original frame")
    args = p.parse_args()

    from fm3dgan.models.fan_landmark import landmarks_68_to_5
    from fm3dgan.models.sfd_detector import make_heatmap_landmark_fn

    detector_fn, fan_fn = build_stack(args)
    landmark_fn = make_heatmap_landmark_fn(detector_fn, fan_fn)

    files = sorted(
        f for f in os.listdir(args.img_dir)
        if f.lower().endswith(IMG_EXTS)
    )
    if not files:
        raise SystemExit(f"no images found in {args.img_dir}")
    os.makedirs(args.out_dir, exist_ok=True)

    n_done = 0
    for start in range(0, len(files), args.batch):
        chunk = files[start : start + args.batch]
        imgs, orig_sizes = [], []
        for f in chunk:
            pixels, wh = _load_image(
                os.path.join(args.img_dir, f), args.size
            )
            imgs.append(pixels)
            orig_sizes.append(wh)
        batch = np.stack(imgs) / 255.0 * 2.0 - 1.0  # [-1, 1] NHWC
        _, lm68 = landmark_fn(batch)
        lm = lm68 if args.points == 68 else landmarks_68_to_5(lm68)
        for i, f in enumerate(chunk):
            w, h = orig_sizes[i]
            scaled = lm[i] * np.array(
                [w / args.size, h / args.size], np.float32
            )
            out = os.path.join(
                args.out_dir, os.path.splitext(f)[0] + ".txt"
            )
            _write_landmarks(out, scaled)
            n_done += 1
        print(f"[extract_landmarks] {n_done}/{len(files)}", file=sys.stderr)
    print(f"wrote {n_done} landmark files to {args.out_dir}")


if __name__ == "__main__":
    main()
