"""Pallas blur kernel vs the XLA upfirdn2d path (values and gradients)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import importlib

u_mod = importlib.import_module("fm3dgan.ops.upfirdn2d")
from fm3dgan.ops import make_kernel
from fm3dgan.ops.upfirdn2d import _upfirdn2d_xla
from fm3dgan.ops.pallas.upfirdn2d_kernel import upfirdn2d_pallas_maybe


@pytest.mark.parametrize(
    "hw,c,pad",
    [
        ((8, 8), 128, (1, 1)),
        ((16, 16), 128, (2, 2)),
        ((16, 16), 256, (2, 1)),
        ((32, 16), 128, (1, 2)),
        ((33, 17), 128, (2, 2)),  # odd sizes (post-conv-transpose shapes)
        ((8, 8), 128, (0, 1)),
    ],
)
def test_pallas_blur_matches_xla(hw, c, pad):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, hw[0], hw[1], c).astype(np.float32))
    k = make_kernel([1, 3, 3, 1])
    ref = _upfirdn2d_xla(x, k, 1, 1, 1, 1, pad[0], pad[1], pad[0], pad[1])
    got = upfirdn2d_pallas_maybe(x, k, 1, 1, 1, 1, pad[0], pad[1], pad[0], pad[1])
    assert got is not None
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_pallas_blur_asymmetric_kernel():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 8, 128).astype(np.float32))
    k = jnp.asarray(
        np.outer([1.0, 2.0, 4.0, 0.5], [0.25, 1.0, 3.0, 2.0]).astype(np.float32)
    )
    ref = _upfirdn2d_xla(x, k, 1, 1, 1, 1, 2, 1, 2, 1)
    got = upfirdn2d_pallas_maybe(x, k, 1, 1, 1, 1, 2, 1, 2, 1)
    # separable SVD factorization: tiny fp deviation allowed
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-5
    )


def test_pallas_blur_gradient_matches_xla():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 128).astype(np.float32))
    k = make_kernel([1, 3, 3, 1])

    def loss_ref(x):
        return jnp.sum(
            _upfirdn2d_xla(x, k, 1, 1, 1, 1, 1, 1, 1, 1) ** 2
        )

    def loss_pallas(x):
        return jnp.sum(
            upfirdn2d_pallas_maybe(x, k, 1, 1, 1, 1, 1, 1, 1, 1) ** 2
        )

    g_ref = jax.grad(loss_ref)(x)
    g_pal = jax.grad(loss_pallas)(x)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref), atol=1e-4)


def test_pallas_dispatch_fallbacks():
    k = make_kernel([1, 3, 3, 1])
    x3 = jnp.ones((1, 8, 8, 3))
    assert upfirdn2d_pallas_maybe(x3, k, 1, 1, 1, 1, 1, 1, 1, 1) is None  # C<128
    x = jnp.ones((1, 8, 8, 128))
    assert upfirdn2d_pallas_maybe(x, k, 2, 2, 1, 1, 1, 1, 1, 1) is None  # up=2
    assert upfirdn2d_pallas_maybe(x, k, 1, 1, 1, 1, -1, 1, -1, 1) is None  # neg


@pytest.mark.parametrize(
    "hw,c,pad",
    [
        ((8, 8), 128, (2, 1)),  # StyleGAN2 Upsample config (k=4)
        ((16, 8), 256, (2, 1)),
        ((8, 8), 128, (1, 2)),
        ((16, 16), 200, (2, 1)),  # C % 128 != 0 (lane masking)
        ((8, 8), 64, (2, 1)),  # C < 128
    ],
)
def test_pallas_up2_matches_xla(hw, c, pad):
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, hw[0], hw[1], c).astype(np.float32))
    k = make_kernel([1, 3, 3, 1]) * 4.0
    ref = _upfirdn2d_xla(x, k, 2, 2, 1, 1, pad[0], pad[1], pad[0], pad[1])
    got = upfirdn2d_pallas_maybe(x, k, 2, 2, 1, 1, pad[0], pad[1], pad[0], pad[1])
    assert got is not None
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-5
    )


@pytest.mark.parametrize(
    "hw,c,pad",
    [
        ((16, 16), 128, (1, 1)),  # StyleGAN2 Downsample config (k=4)
        ((32, 16), 256, (1, 1)),
        ((16, 16), 128, (2, 2)),
        ((16, 16), 200, (1, 1)),  # C % 128 != 0
        ((34, 18), 128, (1, 1)),  # even-but-not-pow2 (post-pad shapes)
    ],
)
def test_pallas_down2_matches_xla(hw, c, pad):
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, hw[0], hw[1], c).astype(np.float32))
    k = make_kernel([1, 3, 3, 1])
    ref = _upfirdn2d_xla(x, k, 1, 1, 2, 2, pad[0], pad[1], pad[0], pad[1])
    got = upfirdn2d_pallas_maybe(x, k, 1, 1, 2, 2, pad[0], pad[1], pad[0], pad[1])
    assert got is not None
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-5
    )


@pytest.mark.parametrize("mode", ["up2", "down2"])
def test_pallas_resample_gradient_matches_xla(mode):
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(1, 8, 8, 128).astype(np.float32))
    if mode == "up2":
        k = make_kernel([1, 3, 3, 1]) * 4.0
        args = (2, 2, 1, 1, 2, 1, 2, 1)
    else:
        k = make_kernel([1, 3, 3, 1])
        args = (1, 1, 2, 2, 1, 1, 1, 1)

    def loss_ref(x):
        return jnp.sum(_upfirdn2d_xla(x, k, *args) ** 2)

    def loss_pallas(x):
        return jnp.sum(upfirdn2d_pallas_maybe(x, k, *args) ** 2)

    g_ref = jax.grad(loss_ref)(x)
    g_pal = jax.grad(loss_pallas)(x)
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), atol=1e-4, rtol=1e-5
    )


def test_pallas_resample_dispatch_fallbacks():
    k = make_kernel([1, 3, 3, 1]) * 4.0
    x = jnp.ones((1, 8, 8, 128))
    # up=2 pads not summing to k-1 (output != exactly 2x input).
    assert upfirdn2d_pallas_maybe(x, k, 2, 2, 1, 1, 1, 1, 1, 1) is None
    # Non-separable kernel.
    k_ns = jnp.asarray(
        np.array(
            [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
            np.float32,
        )
    )
    assert upfirdn2d_pallas_maybe(x, k_ns, 2, 2, 1, 1, 2, 1, 2, 1) is None
    # up=4 unsupported.
    assert upfirdn2d_pallas_maybe(x, k, 4, 4, 1, 1, 2, 1, 2, 1) is None


def test_backend_switch_end_to_end():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 16, 16, 128).astype(np.float32))
    k = make_kernel([1, 3, 3, 1])
    ref = u_mod.upfirdn2d(x, k, 1, 1, (1, 1))
    try:
        u_mod.set_backend("pallas")
        got = u_mod.upfirdn2d(x, k, 1, 1, (1, 1))
        # Unsupported config silently falls back.
        up = u_mod.upfirdn2d(x, k, 2, 1, (2, 1))
    finally:
        u_mod.set_backend("xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    assert up.shape == (1, 32, 32, 128)
