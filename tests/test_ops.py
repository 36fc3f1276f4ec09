"""Unit tests for core ops against independent numpy oracles.

The oracle `_upfirdn2d_numpy` is written directly from the op definition
(zero-stuff by `up` with trailing zeros, pad/crop, true convolution, decimate
by `down`) — the same spec the reference's CPU fallback implements
(/root/reference/op/upfirdn2d.py:168-209).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fm3dgan.ops import fused_leaky_relu, make_kernel, upfirdn2d
from fm3dgan.ops import upfirdn2d as upfirdn2d_mod
from fm3dgan.ops.upfirdn2d import downsample2d, upsample2d


def _upfirdn2d_numpy(x, k, up, down, pad):
    """Naive oracle, NHWC. pad=(x0,x1,y0,y1) or (p0,p1)."""
    if len(pad) == 2:
        px0, px1, py0, py1 = pad[0], pad[1], pad[0], pad[1]
    else:
        px0, px1, py0, py1 = pad
    n, h, w, c = x.shape
    kh, kw = k.shape
    # 1) zero-stuff: each sample followed by up-1 zeros.
    y = np.zeros((n, h * up, w * up, c), x.dtype)
    y[:, ::up, ::up, :] = x
    # 2) pad (negative = crop).
    out_h = h * up + py0 + py1
    out_w = w * up + px0 + px1
    z = np.zeros((n, out_h, out_w, c), x.dtype)
    src_y = slice(max(-py0, 0), h * up - max(-py1, 0))
    src_x = slice(max(-px0, 0), w * up - max(-px1, 0))
    dst_y = slice(max(py0, 0), max(py0, 0) + (src_y.stop - src_y.start))
    dst_x = slice(max(px0, 0), max(px0, 0) + (src_x.stop - src_x.start))
    z[:, dst_y, dst_x, :] = y[:, src_y, src_x, :]
    # 3) true convolution with k, valid.
    kf = k[::-1, ::-1]
    oh = out_h - kh + 1
    ow = out_w - kw + 1
    out = np.zeros((n, oh, ow, c), np.float64)
    for i in range(kh):
        for j in range(kw):
            out += kf[i, j] * z[:, i : i + oh, j : j + ow, :]
    # 4) decimate.
    return out[:, ::down, ::down, :].astype(x.dtype)


@pytest.mark.parametrize(
    "up,down,pad,hw",
    [
        (1, 1, (1, 1), (8, 8)),
        (1, 1, (2, 2), (7, 9)),
        (2, 1, (2, 1), (8, 8)),
        (1, 2, (2, 2), (8, 8)),
        (2, 2, (1, 1), (6, 6)),
        (1, 1, (-1, 2), (9, 9)),   # negative pad (crop)
        (2, 1, (-1, -1), (8, 8)),
        (4, 1, (3, 2), (5, 5)),
        (1, 4, (2, 2), (16, 16)),
    ],
)
def test_upfirdn2d_matches_numpy_oracle(up, down, pad, hw):
    rng = np.random.RandomState(0)
    x = rng.randn(2, hw[0], hw[1], 3).astype(np.float32)
    k = np.asarray(make_kernel([1, 3, 3, 1]))
    expected = _upfirdn2d_numpy(x, k, up, down, pad)
    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k), up, down, pad))
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=1e-5, rtol=1e-5)


def test_upfirdn2d_asymmetric_kernel_flip():
    # Non-symmetric kernel exercises the true-convolution (flip) semantics.
    rng = np.random.RandomState(1)
    x = rng.randn(1, 6, 6, 2).astype(np.float32)
    k = np.array([[0.0, 1.0], [2.0, 3.0]], np.float32)
    expected = _upfirdn2d_numpy(x, k, 1, 1, (1, 0))
    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k), 1, 1, (1, 0)))
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_upsample_downsample_roundtrip_shapes():
    x = jnp.ones((2, 16, 16, 4))
    k = make_kernel([1, 3, 3, 1])
    up = upsample2d(x, k, 2)
    assert up.shape == (2, 32, 32, 4)
    down = downsample2d(x, k, 2)
    assert down.shape == (2, 8, 8, 4)
    # DC gain: upsampling kernel is pre-scaled by factor**2 so constants map to
    # constants (interior away from borders).
    np.testing.assert_allclose(np.asarray(up)[:, 8:24, 8:24, :], 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(down)[:, 2:6, 2:6, :], 1.0, atol=1e-5)


def test_upfirdn2d_grad_matches_numerical():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 5, 5, 2).astype(np.float32)
    k = np.asarray(make_kernel([1, 2, 1]), np.float32)

    def f(x):
        return jnp.sum(upfirdn2d(x, jnp.asarray(k), 2, 1, (1, 1)) ** 2)

    g = jax.grad(f)(jnp.asarray(x))
    eps = 1e-3
    num = np.zeros_like(x)
    for idx in np.ndindex(*x.shape):
        xp = x.copy()
        xp[idx] += eps
        xm = x.copy()
        xm[idx] -= eps
        num[idx] = (float(f(jnp.asarray(xp))) - float(f(jnp.asarray(xm)))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g), num, atol=1e-2, rtol=1e-2)


def test_fused_leaky_relu_semantics():
    x = jnp.asarray(np.random.RandomState(3).randn(4, 8, 8, 16).astype(np.float32))
    b = jnp.asarray(np.linspace(-1, 1, 16).astype(np.float32))
    out = fused_leaky_relu(x, b)
    y = np.asarray(x) + np.asarray(b)
    expected = np.where(y >= 0, y, 0.2 * y) * math.sqrt(2.0)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-6)
    # No-bias path.
    out2 = fused_leaky_relu(x, None)
    y2 = np.asarray(x)
    np.testing.assert_allclose(
        np.asarray(out2), np.where(y2 >= 0, y2, 0.2 * y2) * math.sqrt(2.0), atol=1e-6
    )


def test_fused_leaky_relu_pallas_matches_xla():
    from fm3dgan.ops import fused_act as fa

    x = jnp.asarray(np.random.RandomState(4).randn(2, 4, 4, 128).astype(np.float32))
    b = jnp.asarray(np.random.RandomState(5).randn(128).astype(np.float32))
    ref = fa._fused_leaky_relu_xla(x, b, 0.2, math.sqrt(2.0))
    try:
        fa.set_backend("pallas")
        got = fa.fused_leaky_relu(x, b)
        # Gradients too (custom VJP vs autodiff of the XLA path).
        gref = jax.grad(lambda x: jnp.sum(fa._fused_leaky_relu_xla(x, b, 0.2, math.sqrt(2.0)) ** 2))(x)
        gp = jax.grad(lambda x: jnp.sum(fa.fused_leaky_relu(x, b) ** 2))(x)
    finally:
        fa.set_backend("xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gref), atol=1e-4)
