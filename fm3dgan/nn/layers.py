"""StyleGAN2 building blocks, NHWC, equalized learning rate.

Semantics follow /root/reference/stylegan2.py (cited per class); the layout and
compute formulation are TPU-native: channels-last, convs via
lax.conv_general_dilated in NHWC/HWIO, activations fused by XLA.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from fm3dgan.ops import fused_leaky_relu, make_kernel
from fm3dgan.ops.upfirdn2d import blur as blur_op
from fm3dgan.ops.upfirdn2d import downsample2d, upsample2d

Dtype = Any


class PixelNorm(nn.Module):
    """x * rsqrt(mean(x^2, channels) + 1e-8)  (stylegan2.py:23-33).

    Channel axis is last (NHWC / [N, D])."""

    @nn.compact
    def __call__(self, x):
        return x * lax.rsqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + 1e-8)


class EqualLinear(nn.Module):
    """Linear with runtime weight scale (1/sqrt(in))*lr_mul (stylegan2.py:146-180)."""

    out_dim: int
    use_bias: bool = True
    bias_init: float = 0.0
    lr_mul: float = 1.0
    activation: Optional[str] = None  # None or "fused_lrelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        weight = self.param(
            "weight",
            lambda key, shape: jax.random.normal(key, shape) / self.lr_mul,
            (in_dim, self.out_dim),
        )
        scale = (1.0 / math.sqrt(in_dim)) * self.lr_mul
        bias = (
            self.param(
                "bias", nn.initializers.constant(self.bias_init), (self.out_dim,)
            )
            if self.use_bias
            else None
        )
        w = (weight * scale).astype(self.dtype)
        out = jnp.dot(x.astype(self.dtype), w)
        if self.activation == "fused_lrelu":
            return fused_leaky_relu(
                out, None if bias is None else bias * self.lr_mul
            )
        if bias is not None:
            out = out + (bias * self.lr_mul).astype(out.dtype)
        return out


class EqualConv2d(nn.Module):
    """Conv with runtime 1/sqrt(fan_in) weight scaling (stylegan2.py:108-143)."""

    out_channel: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_channel = x.shape[-1]
        k = self.kernel_size
        weight = self.param(
            "weight",
            nn.initializers.normal(stddev=1.0),
            (k, k, in_channel, self.out_channel),
        )
        scale = 1.0 / math.sqrt(in_channel * k * k)
        out = lax.conv_general_dilated(
            x.astype(self.dtype),
            (weight * scale).astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.out_channel,)
            )
            out = out + bias.astype(out.dtype)
        return out


class ScaledLeakyReLU(nn.Module):
    """leaky_relu * sqrt(2) (stylegan2.py:183-192)."""

    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x):
        return jnp.where(x >= 0, x, x * self.negative_slope) * math.sqrt(2.0)


class FusedLeakyReLU(nn.Module):
    """Per-channel bias + LeakyReLU + sqrt(2) scale (op/fused_act.py:96-110)."""

    channel: int
    negative_slope: float = 0.2
    scale: float = math.sqrt(2.0)

    @nn.compact
    def __call__(self, x):
        bias = self.param("bias", nn.initializers.zeros, (self.channel,))
        return fused_leaky_relu(x, bias, self.negative_slope, self.scale)


class Blur(nn.Module):
    """FIR blur (stylegan2.py:90-105); kernel is a static constant, not a param."""

    kernel: Sequence[int] = (1, 3, 3, 1)
    pad: Tuple[int, int] = (0, 0)
    upsample_factor: int = 1

    @nn.compact
    def __call__(self, x):
        k = make_kernel(self.kernel, dtype=x.dtype)
        return blur_op(x, k, self.pad, self.upsample_factor)


class Upsample(nn.Module):
    """FIR 2x upsample (stylegan2.py:47-64)."""

    kernel: Sequence[int] = (1, 3, 3, 1)
    factor: int = 2

    @nn.compact
    def __call__(self, x):
        return upsample2d(x, make_kernel(self.kernel, dtype=x.dtype), self.factor)


class Downsample(nn.Module):
    """FIR 2x downsample (stylegan2.py:67-86)."""

    kernel: Sequence[int] = (1, 3, 3, 1)
    factor: int = 2

    @nn.compact
    def __call__(self, x):
        return downsample2d(x, make_kernel(self.kernel, dtype=x.dtype), self.factor)


class ConvLayer(nn.Module):
    """Discriminator conv block: [Blur ->] EqualConv2d [-> act] (stylegan2.py:692-729)."""

    out_channel: int
    kernel_size: int
    downsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    use_bias: bool = True
    activate: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.downsample:
            factor = 2
            p = (len(self.blur_kernel) - factor) + (self.kernel_size - 1)
            pad0 = (p + 1) // 2
            pad1 = p // 2
            x = Blur(self.blur_kernel, pad=(pad0, pad1), name="blur")(x)
            stride, padding = 2, 0
        else:
            stride, padding = 1, self.kernel_size // 2
        x = EqualConv2d(
            self.out_channel,
            self.kernel_size,
            stride=stride,
            padding=padding,
            use_bias=self.use_bias and not self.activate,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.activate:
            if self.use_bias:
                x = FusedLeakyReLU(self.out_channel, name="activate")(x)
            else:
                x = ScaledLeakyReLU(0.2, name="activate")(x)
        return x


class ResBlock(nn.Module):
    """Discriminator residual block with 1/sqrt(2) scaling (stylegan2.py:732-759)."""

    out_channel: int
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_channel = x.shape[-1]
        out = ConvLayer(in_channel, 3, dtype=self.dtype, name="conv1")(x)
        out = ConvLayer(
            self.out_channel, 3, downsample=True, dtype=self.dtype, name="conv2"
        )(out)
        skip = ConvLayer(
            self.out_channel,
            1,
            downsample=True,
            activate=False,
            use_bias=False,
            dtype=self.dtype,
            name="skip",
        )(x)
        return (out + skip) / math.sqrt(2.0)


def minibatch_stddev(x: jax.Array, group_size: int = 4, num_features: int = 1):
    """Minibatch standard deviation feature map (stylegan2.py:793-813), NHWC.

    Appends one channel holding the per-group mean feature stddev.
    """
    n, h, w, c = x.shape
    group = min(n, group_size)
    # [group, n/group, H, W, F, C/F]
    y = x.reshape(group, -1, h, w, num_features, c // num_features)
    var = jnp.var(y, axis=0)  # biased, matching var(0, unbiased=False)
    stddev = jnp.sqrt(var + 1e-8)
    stddev = jnp.mean(stddev, axis=(1, 2, 4), keepdims=True)  # [n/group,1,1,F,1]
    stddev = jnp.squeeze(stddev, axis=-1)  # [n/group,1,1,F]
    stddev = jnp.tile(stddev, (group, h, w, 1))
    return jnp.concatenate([x, stddev.astype(x.dtype)], axis=-1)
