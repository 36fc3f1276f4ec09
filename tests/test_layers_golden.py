"""Golden-value tests for the equalized layers against independently written
numpy/torch oracles (formulas from SURVEY.md §2.2, not ported code)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fm3dgan.nn.layers import (
    Blur,
    EqualConv2d,
    EqualLinear,
    FusedLeakyReLU,
    PixelNorm,
    minibatch_stddev,
)


def test_equal_linear_formula():
    rng = np.random.RandomState(0)
    x = rng.randn(3, 7).astype(np.float32)
    lin = EqualLinear(5, bias_init=0.3, lr_mul=0.1)
    v = lin.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(lin.apply(v, jnp.asarray(x)))
    w = np.asarray(v["params"]["weight"])  # [in, out], init scaled by 1/lr_mul
    b = np.asarray(v["params"]["bias"])
    scale = (1.0 / math.sqrt(7)) * 0.1
    expected = x @ (w * scale) + b * 0.1
    np.testing.assert_allclose(out, expected, atol=1e-5)
    # bias_init lands in the raw param, scaled at apply time by lr_mul... the
    # reference stores bias_init directly and multiplies by lr_mul at forward
    # (stylegan2.py:146-180): bias param == bias_init.
    np.testing.assert_allclose(b, 0.3, atol=1e-6)


def test_equal_linear_fused_activation():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 4).astype(np.float32)
    lin = EqualLinear(4, activation="fused_lrelu")
    v = lin.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(lin.apply(v, jnp.asarray(x)))
    w = np.asarray(v["params"]["weight"])
    b = np.asarray(v["params"]["bias"])
    pre = x @ (w / math.sqrt(4)) + b
    expected = np.where(pre >= 0, pre, 0.2 * pre) * math.sqrt(2.0)
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_equal_conv2d_matches_torch():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 8, 8, 5).astype(np.float32)
    conv = EqualConv2d(6, 3, stride=2, padding=1)
    v = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(conv.apply(v, jnp.asarray(x)))
    w = np.asarray(v["params"]["weight"])  # HWIO
    b = np.asarray(v["params"]["bias"])

    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    wt = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)).copy())
    scale = 1.0 / math.sqrt(5 * 9)
    ref = F.conv2d(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
        wt * scale,
        bias=torch.from_numpy(b),
        stride=2,
        padding=1,
    )
    np.testing.assert_allclose(
        out, ref.numpy().transpose(0, 2, 3, 1), atol=1e-5
    )


def test_pixel_norm_sphere_radius():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(4, 16).astype(np.float32))
    out = np.asarray(PixelNorm().apply({}, x))
    # Each vector normalized to radius sqrt(D) (stylegan2.py:23-33).
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=1), math.sqrt(16), rtol=1e-4
    )


def test_blur_module_pad_arithmetic():
    # Upsample-factor blur: kernel scaled by factor^2 (stylegan2.py:95-96).
    x = jnp.ones((1, 9, 9, 4))
    out = np.asarray(Blur((1, 3, 3, 1), pad=(1, 1), upsample_factor=2).apply({}, x))
    assert out.shape == (1, 8, 8, 4)
    # DC gain = 4 in the interior.
    np.testing.assert_allclose(out[0, 3:5, 3:5, 0], 4.0, atol=1e-5)


def test_fused_leaky_relu_module_bias_is_per_channel():
    x = jnp.zeros((2, 4, 4, 8))
    mod = FusedLeakyReLU(8)
    v = mod.init(jax.random.PRNGKey(0), x)
    assert v["params"]["bias"].shape == (8,)
    v = {"params": {"bias": jnp.full((8,), -1.0)}}
    out = np.asarray(mod.apply(v, x))
    np.testing.assert_allclose(out, -1.0 * 0.2 * math.sqrt(2.0), atol=1e-6)


def test_minibatch_stddev_matches_numpy():
    rng = np.random.RandomState(4)
    x = rng.randn(8, 4, 4, 6).astype(np.float32)
    out = np.asarray(minibatch_stddev(jnp.asarray(x), group_size=4))
    assert out.shape == (8, 4, 4, 7)
    # Oracle per the reference math (stylegan2.py:793-813).
    y = x.reshape(4, 2, 4, 4, 1, 6)
    std = np.sqrt(y.var(axis=0) + 1e-8)
    feat = std.mean(axis=(1, 2, 4))  # [2, 1]
    for k in range(8):
        np.testing.assert_allclose(
            out[k, :, :, 6], feat[k % 2, 0], rtol=1e-5
        )
    np.testing.assert_allclose(out[..., :6], x, atol=0)
