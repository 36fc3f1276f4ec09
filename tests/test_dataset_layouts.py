"""tools/make_dataset_layouts.py round-trip: the generated directory layouts
must load through the dataset classes (the §2.11 data contract,
/root/reference/dataset.py:19-160)."""

import os
import subprocess
import sys

import numpy as np
import pytest


def _run(layout, out_dir, *extra):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    try:
        from __graft_entry__ import scrubbed_cpu_env
    finally:
        sys.path.remove(repo)
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(repo, "tools", "make_dataset_layouts.py"),
            layout,
            out_dir,
            "--n_ids", "3",
            "--size", "32",
            "--source", "procedural",
            *extra,
        ],
        # truly-CPU env: the axon sitecustomize otherwise routes the
        # subprocess onto the real TPU tunnel
        env=scrubbed_cpu_env(1),
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr


def test_synthetic_layout_roundtrip(tmp_path):
    from fm3dgan.data.datasets import SyntheticPairDataset, default_transform

    out = str(tmp_path / "syn")
    _run("synthetic", out, "--n_var", "7")
    ds = SyntheticPairDataset(out, transform=default_transform(32))
    assert len(ds) == 21
    assert ds.n_img_per_id == 7
    g, r = ds[0]
    assert g.shape == (32, 32, 3) and r.shape == (32, 32, 3)
    # Render background convention: -1 outside the face region (what
    # face_regional_loss masks on, training_util.py:236).
    assert float(r.min()) == -1.0


def test_ffhq_layout_roundtrip(tmp_path):
    from fm3dgan.data.datasets import (
        EditingDataset,
        ReconstructionDataset,
        default_transform,
    )

    out = str(tmp_path / "ffhq")
    _run("ffhq", out, "--n_edits", "4")
    rec = ReconstructionDataset(
        os.path.join(out, "img"),
        os.path.join(out, "render_img"),
        transform=default_transform(32),
    )
    assert len(rec) == 3
    photo, render = rec[1]
    assert photo.shape == (32, 32, 3)
    edit = EditingDataset(
        os.path.join(out, "img"),
        os.path.join(out, "edit_render_img"),
        transform=default_transform(32),
        render_image_folder=os.path.join(out, "render_img"),
    )
    assert len(edit) == 3


def test_valnpy_layout(tmp_path):
    out = str(tmp_path / "val")
    _run("valnpy", out, "--n_edits", "4")
    files = sorted(os.listdir(out))
    assert len(files) == 3
    bundle = np.load(os.path.join(out, files[0]))
    assert bundle.shape == (6, 32, 32, 3)  # photo + own render + 4 edits
    assert bundle.min() >= -1.0 and bundle.max() <= 1.0


def test_decode_cache_memoizes(tmp_path, monkeypatch):
    """cache=True datasets decode each file once; values are exact."""
    import fm3dgan.data.datasets as dsm
    from PIL import Image

    d = tmp_path / "img"
    d.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray(
            rng.randint(0, 255, (16, 16, 3), dtype=np.uint8)
        ).save(d / f"{i}.png")

    calls = {"n": 0}
    real = dsm.load_image

    def counting(path, transform=None):
        calls["n"] += 1
        return real(path, transform)

    monkeypatch.setattr(dsm, "load_image", counting)
    ds = dsm.ImageFolderDataset(str(d), cache=True)
    first = [ds[i] for i in range(3)]
    again = [ds[i] for i in range(3)]
    assert calls["n"] == 3  # second pass served from the memo
    for a, b in zip(first, again):
        np.testing.assert_array_equal(a, b)

    ds_nocache = dsm.ImageFolderDataset(str(d))
    calls["n"] = 0
    ds_nocache[0]
    ds_nocache[0]
    assert calls["n"] == 2  # default path untouched
