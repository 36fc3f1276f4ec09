"""Fetch + convert the external pretrained weights the eval stack needs.

The reference downloads these at runtime through torch model-zoo machinery:
  * FID InceptionV3 — /root/reference/Evaluation/inception.py:22
    (FID_WEIGHTS_URL, pytorch-fid's TF-ported checkpoint)
  * S3FD face detector + 2DFAN-4 landmark FAN — pulled implicitly by the
    ``face_alignment`` pip package (landmark_util.py:20); the canonical
    artifact URLs below are that package's published ones.

This script makes the acquisition path explicit and reproducible: download,
verify sha256, convert to fm3dgan's orbax/npz layout via compat.torch_port,
and record the attempt (success OR failure) in WEIGHTS_FETCH_ATTEMPT.json —
in a no-egress sandbox the dated failure record IS the documentation that
the environment, not the code, blocks the download.

Usage:
    python tools/fetch_weights.py --dest ./weights [--only fid_inception]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time
import urllib.error
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# sha256 prefixes are embedded in the upstream filenames (torch model-zoo
# convention): the hash check uses the full digest when known, else the
# filename-embedded prefix.
WEIGHTS = {
    "fid_inception": {
        "url": (
            "https://github.com/mseitzer/pytorch-fid/releases/download/"
            "fid_weights/pt_inception-2015-12-05-6726825d.pth"
        ),
        "sha256_prefix": "6726825d",
        "converter": "fm3dgan.models.inception:convert_fid_inception",
        "note": "reference Evaluation/inception.py:22 FID_WEIGHTS_URL",
    },
    "s3fd": {
        "url": (
            "https://www.adrianbulat.com/downloads/python-fan/"
            "s3fd-619a316812.pth"
        ),
        "sha256_prefix": "619a316812",
        "converter": "fm3dgan.models.sfd_detector:convert_s3fd",
        "note": "face_alignment package detector (landmark_util.py:20)",
    },
    "2dfan4": {
        "url": (
            "https://www.adrianbulat.com/downloads/python-fan/"
            "2DFAN4-11f355bf06.pth.tar"
        ),
        "sha256_prefix": "11f355bf06",
        "converter": "fm3dgan.models.fan_landmark:convert_fan",
        "note": "face_alignment package 2D landmark FAN",
    },
}


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def fetch_one(name: str, spec: dict, dest: str) -> dict:
    rec = {"name": name, "url": spec["url"], "note": spec["note"]}
    raw = os.path.join(dest, os.path.basename(spec["url"]))
    try:
        if not os.path.exists(raw):
            print(f"[fetch] {name}: downloading {spec['url']}",
                  file=sys.stderr)
            urllib.request.urlretrieve(spec["url"], raw + ".part")
            os.replace(raw + ".part", raw)
        digest = _sha256(raw)
        if not digest.startswith(spec["sha256_prefix"]):
            raise ValueError(
                f"sha256 mismatch for {raw}: got {digest[:10]}..., filename "
                f"says {spec['sha256_prefix']}"
            )
        rec.update(status="downloaded", path=raw, sha256=digest)
    except (urllib.error.URLError, OSError, ValueError) as e:
        rec.update(status="failed", error=f"{type(e).__name__}: {e}")
        print(f"[fetch] {name}: FAILED — {rec['error']}", file=sys.stderr)
        return rec

    # Convert to fm3dgan layout (NHWC flax params) next to the raw file.
    try:
        import importlib

        import numpy as np
        import torch

        mod_name, fn_name = spec["converter"].split(":")
        converter = getattr(importlib.import_module(mod_name), fn_name)
        sd = torch.load(raw, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        sd = {k: np.asarray(v) for k, v in sd.items()
              if hasattr(v, "shape")}
        variables = converter(sd)
        out = os.path.join(dest, f"{name}_fm3dgan.npz")
        flat = {}

        def _flatten(tree, prefix=""):
            for k, v in tree.items():
                key = f"{prefix}/{k}" if prefix else k
                if isinstance(v, dict):
                    _flatten(v, key)
                else:
                    flat[key] = np.asarray(v)

        _flatten(variables)
        np.savez(out, **flat)
        rec.update(converted=out)
        print(f"[fetch] {name}: converted -> {out}", file=sys.stderr)
    except Exception as e:  # noqa: BLE001 — record, don't crash the batch
        rec["converted"] = f"conversion failed: {type(e).__name__}: {e}"
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dest", type=str, default=os.path.join(REPO, "weights"))
    ap.add_argument("--only", type=str, default=None,
                    choices=list(WEIGHTS) + [None])
    args = ap.parse_args()
    os.makedirs(args.dest, exist_ok=True)

    records = []
    for name, spec in WEIGHTS.items():
        if args.only and name != args.only:
            continue
        records.append(fetch_one(name, spec, args.dest))

    report = {
        "date": time.strftime("%Y-%m-%d %H:%M:%S"),
        "host": os.uname().nodename,
        "results": records,
    }
    out = os.path.join(REPO, "WEIGHTS_FETCH_ATTEMPT.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(json.dumps(report, indent=2))
    if all(r["status"] == "failed" for r in records):
        sys.exit(1)


if __name__ == "__main__":
    sys.path.insert(0, REPO)
    main()
