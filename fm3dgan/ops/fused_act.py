"""Fused bias + LeakyReLU + scale.

Semantics of the reference CUDA kernel ``fused_bias_act``
(``/root/reference/op/fused_bias_act_kernel.cu:42``, CPU spec
``op/fused_act.py:113-126``):

    y = scale * leaky_relu(x + bias)          # bias broadcast over channels

Defaults ``negative_slope=0.2``, ``scale=sqrt(2)`` (``op/fused_act.py:113``).

On TPU this is a single VPU expression that XLA fuses into the producing
matmul/conv; the jnp path below is therefore already "fused".  A Pallas kernel
(:mod:`fm3dgan.ops.pallas.fused_act_kernel`) is provided for the standalone
case and as the native-kernel parity point; its custom VJP mirrors the
reference's backward that re-reads the saved output's sign
(``op/fused_act.py:29-93``).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

_BACKEND = "xla"


def set_backend(name: str) -> None:
    global _BACKEND
    assert name in ("xla", "pallas"), name
    _BACKEND = name


def fused_leaky_relu(
    x: jax.Array,
    bias: Optional[jax.Array] = None,
    negative_slope: float = 0.2,
    scale: float = math.sqrt(2.0),
) -> jax.Array:
    """scale * leaky_relu(x + bias); bias broadcasts over the trailing (channel)
    axis — NHWC layout, vs. the reference's NCHW axis-1 broadcast."""
    if _BACKEND == "pallas":
        from fm3dgan.ops.pallas import fused_act_kernel as pk

        out = pk.fused_leaky_relu_pallas_maybe(x, bias, negative_slope, scale)
        if out is not None:
            return out
    return _fused_leaky_relu_xla(x, bias, negative_slope, scale)


def _fused_leaky_relu_xla(x, bias, negative_slope, scale):
    if bias is not None:
        x = x + bias.astype(x.dtype)
    return jnp.where(x >= 0, x, x * negative_slope) * jnp.asarray(scale, x.dtype)
