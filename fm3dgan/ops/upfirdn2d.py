"""upfirdn2d: upsample (zero-insertion) -> FIR filter -> downsample, NHWC.

Semantics match the reference CUDA kernel / CPU fallback
(``/root/reference/op/upfirdn2d.py:168-209``, ``op/upfirdn2d_kernel.cu:237-240``):

    out[h, w] = sum_{kh, kw} k[kh, kw] * pad(upsample(x))[h*down + kh, w*down + kw]

with true convolution (flipped kernel), per-axis zero-insertion upsampling by
``up`` (trailing ``up-1`` zeros after the last sample), edge padding
``(pad0, pad1)`` that may be negative (cropping), and stride-``down``
decimation.  Output size per axis: ``(in*up + pad0 + pad1 - k) // down + 1``.

TPU-native design: instead of translating the CUDA tile scheduler, the whole op
is one ``lax.pad`` (interior dilation = zero-insertion, negative edge padding =
cropping) followed by one depthwise ``lax.conv_general_dilated`` in NHWC.  XLA
fuses the pad into the convolution; gradients come from JAX's conv adjoint,
which reproduces the reference's hand-written flip-kernel/swap-up-down backward
(``op/upfirdn2d.py:120-151``) automatically.  A Pallas kernel path
(:mod:`fm3dgan.ops.pallas.upfirdn2d_kernel`) covers the hot StyleGAN2 modes.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# Runtime-selectable backend: "xla" or "pallas" for supported modes; the env
# var FM3DGAN_UPFIRDN_BACKEND overrides the initial value (measured on TPU
# v5e: pallas trains ~5% faster end-to-end, tools/bench_train.py).
import os as _os

_BACKEND = _os.environ.get("FM3DGAN_UPFIRDN_BACKEND", "xla")
assert _BACKEND in ("xla", "pallas"), _BACKEND


def set_backend(name: str) -> None:
    global _BACKEND
    assert name in ("xla", "pallas"), name
    _BACKEND = name


def get_backend() -> str:
    return _BACKEND


def make_kernel(k: Sequence[float], dtype=jnp.float32) -> jax.Array:
    """1D -> outer-product 2D FIR kernel, normalized to sum 1.

    Mirrors ``make_kernel`` (``/root/reference/stylegan2.py:36-44``).
    """
    k = jnp.asarray(k, dtype=dtype)
    if k.ndim == 1:
        k = k[None, :] * k[:, None]
    return k / jnp.sum(k)


def upfirdn2d_out_shape(in_h: int, in_w: int, kernel_shape, up, down, pad):
    up_x, up_y, down_x, down_y, pad_x0, pad_x1, pad_y0, pad_y1 = _normalize_args(
        up, down, pad
    )
    kh, kw = kernel_shape
    out_h = (in_h * up_y + pad_y0 + pad_y1 - kh) // down_y + 1
    out_w = (in_w * up_x + pad_x0 + pad_x1 - kw) // down_x + 1
    return out_h, out_w


def _normalize_args(up, down, pad):
    if isinstance(up, int):
        up_x = up_y = up
    else:
        up_x, up_y = up
    if isinstance(down, int):
        down_x = down_y = down
    else:
        down_x, down_y = down
    if len(pad) == 2:
        pad_x0, pad_x1, pad_y0, pad_y1 = pad[0], pad[1], pad[0], pad[1]
    else:
        pad_x0, pad_x1, pad_y0, pad_y1 = pad
    return up_x, up_y, down_x, down_y, pad_x0, pad_x1, pad_y0, pad_y1


def upfirdn2d(
    x: jax.Array,
    kernel: jax.Array,
    up=1,
    down=1,
    pad=(0, 0),
) -> jax.Array:
    """Apply upfirdn to an NHWC tensor.

    Args:
      x: [N, H, W, C] input.
      kernel: [kh, kw] FIR kernel (applied as true convolution, matching the
        reference's ``torch.flip`` + cross-correlation).
      up: int or (up_x, up_y) zero-insertion factor.
      down: int or (down_x, down_y) decimation factor.
      pad: (pad0, pad1) applied to both axes, or (pad_x0, pad_x1, pad_y0, pad_y1).
        Negative values crop.

    Returns:
      [N, out_h, out_w, C].
    """
    (up_x, up_y, down_x, down_y, pad_x0, pad_x1, pad_y0, pad_y1) = _normalize_args(
        up, down, pad
    )
    if _BACKEND == "pallas":
        from fm3dgan.ops.pallas import upfirdn2d_kernel as pk

        out = pk.upfirdn2d_pallas_maybe(
            x, kernel, up_x, up_y, down_x, down_y, pad_x0, pad_x1, pad_y0, pad_y1
        )
        if out is not None:
            return out
    return _upfirdn2d_xla(
        x, kernel, up_x, up_y, down_x, down_y, pad_x0, pad_x1, pad_y0, pad_y1
    )


def _upfirdn2d_xla(
    x, kernel, up_x, up_y, down_x, down_y, pad_x0, pad_x1, pad_y0, pad_y1
):
    n, h, w, c = x.shape
    kh, kw = kernel.shape
    # Zero-insertion upsample + (possibly negative) edge padding in one lax.pad.
    # The reference zero-stuffs to h*up (up-1 trailing zeros) before padding, so
    # the high-edge padding absorbs the up-1 trailing zeros lost to interior-only
    # dilation.
    pad_cfg = (
        (0, 0, 0),
        (pad_y0, pad_y1 + up_y - 1, up_y - 1),
        (pad_x0, pad_x1 + up_x - 1, up_x - 1),
        (0, 0, 0),
    )
    y = lax.pad(x, jnp.zeros((), x.dtype), pad_cfg)
    # Depthwise true convolution: flip kernel (lax conv is cross-correlation),
    # one filter shared by all C channels via feature_group_count=C.
    k = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    rhs = jnp.broadcast_to(k[:, :, None, None], (kh, kw, 1, c))
    out = lax.conv_general_dilated(
        y,
        rhs,
        window_strides=(down_y, down_x),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        # fp32 needs HIGHEST to stop XLA downcasting the FIR taps to bf16;
        # for bf16 inputs HIGHEST would force a slower multi-pass upcast.
        precision=(
            lax.Precision.HIGHEST
            if x.dtype == jnp.float32
            else lax.Precision.DEFAULT
        ),
    )
    return out


# ---------------------------------------------------------------------------
# Convenience wrappers mirroring the reference module pad arithmetic
# (Upsample/Downsample/Blur, /root/reference/stylegan2.py:47-105).
# ---------------------------------------------------------------------------


def _up2_polyphase_k4(x: jax.Array, kernel_1d) -> jax.Array:
    """2x upsample with a separable 4-tap kernel, pads (2,1), as polyphase
    shifted adds (each output phase = 2 taps/axis) + interleave.

    6x faster than the zero-stuffed depthwise conv for small channel counts
    (the ToRGB skip path, C=3) where XLA's conv lowering wastes lanes.
    kernel_1d: 4 static floats, already scaled by the factor (sums to 2).
    """
    kf = tuple(reversed(tuple(kernel_1d)))  # true convolution
    n, h, w, c = x.shape

    def phase_taps(a):
        # out[2y+a] = sum_t kf[t] * xz[2y+a-2+t]; xz zero-stuffed by 2.
        taps = []
        for t in range(4):
            idx = a - 2 + t
            if idx % 2 == 0:
                taps.append((idx // 2, float(kf[t])))  # offset in x units
        return taps

    tbp = [phase_taps(0), phase_taps(1)]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    rows = []
    for taps in tbp:
        acc = None
        for off, wgt in taps:
            sl = lax.slice_in_dim(xp, 1 + off, 1 + off + h, axis=1)
            acc = wgt * sl if acc is None else acc + wgt * sl
        rows.append(acc)
    y = jnp.stack(rows, axis=2).reshape(n, 2 * h, w + 2, c)

    cols = []
    for taps in tbp:
        acc = None
        for off, wgt in taps:
            sl = lax.slice_in_dim(y, 1 + off, 1 + off + w, axis=2)
            acc = wgt * sl if acc is None else acc + wgt * sl
        cols.append(acc)
    return jnp.stack(cols, axis=3).reshape(n, 2 * h, 2 * w, c)


def upsample2d(x: jax.Array, kernel: jax.Array, factor: int = 2) -> jax.Array:
    """FIR upsample: kernel pre-scaled by factor**2 (``stylegan2.py:52``)."""
    kernel = kernel * (factor**2)
    p = kernel.shape[0] - factor
    pad0 = (p + 1) // 2 + factor - 1
    pad1 = p // 2
    if factor == 2 and kernel.shape == (4, 4) and (pad0, pad1) == (2, 1):
        # Separable fast path (StyleGAN2's [1,3,3,1] outer-product kernel).
        try:
            k_np = np.asarray(jax.lax.stop_gradient(kernel))
        except Exception:
            k_np = None
        if k_np is not None and np.linalg.matrix_rank(k_np, tol=1e-9) == 1:
            u, s, vt = np.linalg.svd(k_np)
            k1 = u[:, 0] * np.sqrt(s[0])
            k1b = vt[0, :] * np.sqrt(s[0])
            if np.allclose(np.outer(k1, k1b), k_np, atol=1e-7) and np.allclose(
                k1, k1b, atol=1e-7
            ):
                return _up2_polyphase_k4(x, tuple(float(v) for v in k1))
    return upfirdn2d(x, kernel, up=factor, down=1, pad=(pad0, pad1))


def downsample2d(x: jax.Array, kernel: jax.Array, factor: int = 2) -> jax.Array:
    p = kernel.shape[0] - factor
    pad0 = (p + 1) // 2
    pad1 = p // 2
    return upfirdn2d(x, kernel, up=1, down=factor, pad=(pad0, pad1))


def blur(x: jax.Array, kernel: jax.Array, pad, upsample_factor: int = 1) -> jax.Array:
    if upsample_factor > 1:
        kernel = kernel * (upsample_factor**2)
    return upfirdn2d(x, kernel, pad=pad)
