"""ModulatedConv2d: the input-scale/shared-weight/output-demod formulation must
match the per-sample-weight grouped formulation (the reference's
stylegan2.py:253-293 math) exactly.  Oracles here are written directly from the
math in numpy / torch.nn.functional (torch CPU), not ported code."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fm3dgan.nn.modulated import ModulatedConv2d


def _per_sample_weights(params, x_nchw, style, k, demodulate):
    """Build per-sample modulated weights [B, Cout, Cin, k, k] from module params."""
    # EqualLinear modulation: s = style @ (w * 1/sqrt(D)) + bias (bias_init=1).
    mw = np.asarray(params["modulation"]["weight"])  # [D, Cin]
    mb = np.asarray(params["modulation"]["bias"])  # [Cin]
    d = mw.shape[0]
    s = style @ (mw / math.sqrt(d)) + mb  # [B, Cin]
    w = np.asarray(params["weight"])  # [k,k,Cin,Cout] HWIO
    w = np.transpose(w, (3, 2, 0, 1))  # OIHW
    cin = w.shape[1]
    scale = 1.0 / math.sqrt(cin * k * k)
    wb = scale * w[None] * s[:, None, :, None, None]  # [B,O,I,kh,kw]
    if demodulate:
        demod = 1.0 / np.sqrt(np.sum(wb**2, axis=(2, 3, 4)) + 1e-8)  # [B,O]
        wb = wb * demod[:, :, None, None, None]
    return s, wb


@pytest.mark.parametrize("demodulate", [True, False])
def test_modulated_conv_plain_matches_per_sample_oracle(demodulate):
    rng = np.random.RandomState(0)
    b, h, w_, cin, cout, k, sd = 3, 8, 8, 6, 5, 3, 7
    x = rng.randn(b, h, w_, cin).astype(np.float32)
    style = rng.randn(b, sd).astype(np.float32)

    mod = ModulatedConv2d(cout, k, sd, demodulate=demodulate)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(style))
    out = np.asarray(mod.apply(params, jnp.asarray(x), jnp.asarray(style)))
    params = jax.tree.map(np.asarray, params)

    # torch (the oracle) is imported only after all JAX work has completed:
    # on single-core boxes torch's OpenMP runtime deadlocks XLA-CPU execution.
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    _, wb = _per_sample_weights(
        params["params"], None, style, k, demodulate
    )
    x_t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    expected = []
    for i in range(b):
        expected.append(
            F.conv2d(x_t[i : i + 1], torch.from_numpy(wb[i].astype(np.float32)), padding=k // 2)
        )
    expected = torch.cat(expected).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, expected, atol=2e-4, rtol=2e-4)


def test_modulated_conv_upsample_matches_per_sample_oracle():
    rng = np.random.RandomState(1)
    b, h, w_, cin, cout, k, sd = 2, 4, 4, 4, 3, 3, 5
    x = rng.randn(b, h, w_, cin).astype(np.float32)
    style = rng.randn(b, sd).astype(np.float32)

    mod = ModulatedConv2d(cout, k, sd, upsample=True)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(style))
    out = np.asarray(mod.apply(params, jnp.asarray(x), jnp.asarray(style)))
    params = jax.tree.map(np.asarray, params)

    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    _, wb = _per_sample_weights(params["params"], None, style, k, True)
    x_t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    ups = []
    for i in range(b):
        # conv_transpose2d wants [Cin, Cout, k, k]
        wt = torch.from_numpy(np.transpose(wb[i], (1, 0, 2, 3)).astype(np.float32))
        ups.append(F.conv_transpose2d(x_t[i : i + 1], wt, stride=2, padding=0))
    ups = torch.cat(ups)
    # Blur: kernel [1,3,3,1] outer, normalized, *factor^2, pad (1,1), true conv.
    kk = np.array([1.0, 3.0, 3.0, 1.0])
    k2 = np.outer(kk, kk)
    k2 = k2 / k2.sum() * 4.0
    kt = torch.from_numpy(k2[::-1, ::-1].copy().astype(np.float32))
    kt = kt.view(1, 1, 4, 4).repeat(cout, 1, 1, 1)
    blurred = F.conv2d(F.pad(ups, (1, 1, 1, 1)), kt, groups=cout)
    expected = blurred.numpy().transpose(0, 2, 3, 1)
    assert out.shape == expected.shape == (b, 2 * h, 2 * w_, cout)
    np.testing.assert_allclose(out, expected, atol=2e-4, rtol=2e-4)


def test_modulated_conv_downsample_shape_and_oracle():
    rng = np.random.RandomState(2)
    b, h, w_, cin, cout, k, sd = 2, 8, 8, 4, 3, 3, 5
    x = rng.randn(b, h, w_, cin).astype(np.float32)
    style = rng.randn(b, sd).astype(np.float32)

    mod = ModulatedConv2d(cout, k, sd, downsample=True)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(style))
    out = np.asarray(mod.apply(params, jnp.asarray(x), jnp.asarray(style)))
    params = jax.tree.map(np.asarray, params)
    assert out.shape == (b, h // 2, w_ // 2, cout)

    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    # Oracle: blur (pad (2,2), normalized kernel), then per-sample strided conv.
    kk = np.array([1.0, 3.0, 3.0, 1.0])
    k2 = np.outer(kk, kk)
    k2 = k2 / k2.sum()
    kt = torch.from_numpy(k2[::-1, ::-1].copy().astype(np.float32))
    kt = kt.view(1, 1, 4, 4).repeat(cin, 1, 1, 1)
    x_t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    xb = F.conv2d(F.pad(x_t, (2, 2, 2, 2)), kt, groups=cin)
    _, wb = _per_sample_weights(params["params"], None, style, k, True)
    expected = []
    for i in range(b):
        expected.append(
            F.conv2d(xb[i : i + 1], torch.from_numpy(wb[i].astype(np.float32)), stride=2)
        )
    expected = torch.cat(expected).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, expected, atol=2e-4, rtol=2e-4)
