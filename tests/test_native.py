"""Native C++ data ops vs PIL/numpy oracles."""

import os

import numpy as np
import pytest

from fm3dgan.data import native


@pytest.fixture(scope="module")
def tmp_images(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    paths = []
    for i, (fmt, size) in enumerate(
        [("PNG", (64, 64)), ("JPEG", (80, 60)), ("PNG", (32, 48))]
    ):
        arr = rng.randint(0, 256, (size[1], size[0], 3), np.uint8)
        p = str(d / f"img{i}.{fmt.lower()}")
        Image.fromarray(arr).save(p, format=fmt, quality=95)
        paths.append(p)
    return paths


def test_native_available():
    assert native.ensure_built()
    assert native.available()


def test_preprocess_batch_matches_numpy():
    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 256, (4, 32, 32, 3), np.uint8)
    out = native.preprocess_batch(imgs, size=32)
    expected = imgs.astype(np.float32) / 255.0 * 2.0 - 1.0
    np.testing.assert_allclose(out, expected, atol=1e-6)
    assert out.dtype == np.float32


def test_preprocess_resize_identity_points():
    # 2x downscale of a constant image stays constant.
    imgs = np.full((1, 64, 64, 3), 100, np.uint8)
    out = native.preprocess_batch(imgs, size=32)
    np.testing.assert_allclose(out, 100 / 255.0 * 2 - 1, atol=1e-6)


def test_load_batch_decodes_and_normalizes(tmp_images):
    out = native.load_batch(tmp_images, size=64)
    assert out.shape == (3, 64, 64, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0

    # PNG roundtrip is lossless: at native size, decode must be exact.
    from PIL import Image

    ref = np.asarray(Image.open(tmp_images[0]).convert("RGB"))
    np.testing.assert_allclose(
        out[0], ref.astype(np.float32) / 255 * 2 - 1, atol=1e-6
    )


def test_load_batch_missing_file_raises(tmp_images):
    with pytest.raises(IOError):
        native.load_batch([tmp_images[0], "/nonexistent/x.png"], size=64)
