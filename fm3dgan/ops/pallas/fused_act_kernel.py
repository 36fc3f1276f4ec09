"""Pallas TPU kernel for fused bias + LeakyReLU + scale.

TPU counterpart of ``/root/reference/op/fused_bias_act_kernel.cu`` (a 1D CUDA
grid with ``loop_x=4``, block 128, ``:73-75``).  On TPU the op is a pure VPU
elementwise pass, so the kernel tiles the flattened [M, C] view over rows and
keeps the per-channel bias resident in VMEM.  The custom VJP mirrors the
reference's backward structure: the forward saves only the *output*, and the
gradient slope is picked from the saved output's sign
(``op/fused_act.py:29-66`` — valid because scale > 0 preserves sign).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(x_ref, b_ref, o_ref, *, negative_slope, scale):
    y = x_ref[:] + b_ref[:]
    o_ref[:] = jnp.where(y >= 0, y, y * negative_slope) * scale


def _bwd_kernel(g_ref, out_ref, dx_ref, *, negative_slope, scale):
    slope = jnp.where(out_ref[:] >= 0, scale, negative_slope * scale)
    dx_ref[:] = g_ref[:] * slope


def _interpret() -> bool:
    # Run in interpreter mode off-TPU (e.g. the CPU test mesh).
    return jax.default_backend() != "tpu"


def _row_tile(m: int, c: int, dtype_bytes: int = 4) -> int:
    # Keep (in + bias + out) x double-buffering comfortably inside VMEM.
    budget = 2 * 1024 * 1024  # bytes per operand block
    tile = max(8, budget // max(1, c * dtype_bytes))
    tile = min(tile, m)
    # Round to sublane multiple.
    return max(8, (tile // 8) * 8)


def _call_fwd(x2d, bias, negative_slope, scale):
    m, c = x2d.shape
    tile = _row_tile(m, c)
    grid = (pl.cdiv(m, tile),)
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel, negative_slope=negative_slope, scale=scale
        ),
        out_shape=jax.ShapeDtypeStruct((m, c), x2d.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(x2d, bias)


def _call_bwd(g2d, out2d, negative_slope, scale):
    m, c = g2d.shape
    tile = _row_tile(m, c)
    grid = (pl.cdiv(m, tile),)
    return pl.pallas_call(
        functools.partial(
            _bwd_kernel, negative_slope=negative_slope, scale=scale
        ),
        out_shape=jax.ShapeDtypeStruct((m, c), g2d.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(g2d, out2d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fused_leaky_relu_p(x2d, bias, negative_slope, scale):
    return _call_fwd(x2d, bias, negative_slope, scale)


def _p_fwd(x2d, bias, negative_slope, scale):
    out = _call_fwd(x2d, bias, negative_slope, scale)
    return out, out


def _p_bwd(negative_slope, scale, out, g):
    dx = _call_bwd(g, out, negative_slope, scale)
    # Bias grad: sum over all non-channel dims (op/fused_act.py:42-48).
    dbias = jnp.sum(dx, axis=0, keepdims=True)
    return dx, dbias


_fused_leaky_relu_p.defvjp(_p_fwd, _p_bwd)


def fused_leaky_relu_pallas_maybe(
    x: jax.Array,
    bias: Optional[jax.Array],
    negative_slope: float,
    scale: float,
) -> Optional[jax.Array]:
    """Run via the Pallas kernel when supported; None -> caller falls back."""
    if x.ndim < 2:
        return None
    c = x.shape[-1]
    if bias is None:
        bias = jnp.zeros((c,), x.dtype)
    if bias.shape != (c,):
        return None
    shape = x.shape
    x2d = x.reshape(-1, c)
    out = _fused_leaky_relu_p(
        x2d, bias.reshape(1, c).astype(x.dtype), float(negative_slope), float(scale)
    )
    return out.reshape(shape)
