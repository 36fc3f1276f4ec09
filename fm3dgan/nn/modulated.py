"""Modulated convolution and generator blocks, NHWC.

TPU-first reformulation of the reference ModulatedConv2d
(/root/reference/stylegan2.py:195-298): the reference folds the batch into the
weight and runs a grouped conv with ``groups=batch`` — a pattern that defeats
MXU tiling.  Because convolution is linear in a per-input-channel scale, the
identical result is obtained by

    out[b] = demod[b] * conv(x[b] * style[b], scale * W)

i.e. scale the *inputs* per-sample, run ONE batched convolution with a weight
shared across the batch (dense MXU matmuls), and scale the *outputs* by the
per-sample demodulation factor.  demod is computed directly from (scale*W)^2
and style^2 without materializing per-sample weights.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from fm3dgan.nn.layers import Blur, EqualLinear, FusedLeakyReLU

Dtype = Any


class ModulatedConv2d(nn.Module):
    """Style-modulated, optionally demodulated conv (stylegan2.py:195-298)."""

    out_channel: int
    kernel_size: int
    style_dim: int
    demodulate: bool = True
    upsample: bool = False
    downsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, style, return_style_scalars: bool = False):
        """x: [N,H,W,Cin]; style: [N, style_dim] -> [N,H',W',Cout]."""
        n, h, w, in_channel = x.shape
        k = self.kernel_size
        fan_in = in_channel * k * k
        scale = 1.0 / math.sqrt(fan_in)

        weight = self.param(
            "weight",
            nn.initializers.normal(stddev=1.0),
            (k, k, in_channel, self.out_channel),
        )
        # Per-input-channel style scale s[b, i] (EqualLinear bias_init=1,
        # stylegan2.py:240).
        s = EqualLinear(in_channel, bias_init=1.0, name="modulation")(style)

        w_scaled = weight * scale  # [k,k,i,o]
        if self.demodulate:
            # demod[b,o] = rsqrt(sum_{k,k,i} (scale*W*s[b])^2 + 1e-8)
            # (stylegan2.py:260-262), computed without per-sample weights.
            w2 = jnp.sum(jnp.square(w_scaled), axis=(0, 1))  # [i,o]
            sigma = jnp.square(s) @ w2  # [b,o]
            demod = lax.rsqrt(sigma + 1e-8)

        x = (x * s[:, None, None, :]).astype(self.dtype)
        w_c = w_scaled.astype(self.dtype)

        if self.upsample:
            # Transposed conv (stride=2, pad=0) then blur (stylegan2.py:264-279),
            # expressed directly as an input-dilated correlation with the
            # spatially flipped kernel:
            #   out[p] = sum_a dilate2(x)[p - (k-1) + a] * W[k-1-a]
            # which is exactly torch's conv_transpose2d(stride=2, padding=0).
            out = lax.conv_general_dilated(
                x,
                jnp.flip(w_c, (0, 1)),
                window_strides=(1, 1),
                padding=[(k - 1, k - 1)] * 2,
                lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if self.demodulate:
                out = out * demod[:, None, None, :].astype(out.dtype)
            factor = 2
            p = (len(self.blur_kernel) - factor) - (k - 1)
            pad0 = (p + 1) // 2 + factor - 1
            pad1 = p // 2 + 1
            out = Blur(self.blur_kernel, pad=(pad0, pad1), upsample_factor=factor)(
                out
            )
        elif self.downsample:
            factor = 2
            p = (len(self.blur_kernel) - factor) + (k - 1)
            pad0 = (p + 1) // 2
            pad1 = p // 2
            x = Blur(self.blur_kernel, pad=(pad0, pad1))(x)
            out = lax.conv_general_dilated(
                x,
                w_c,
                window_strides=(2, 2),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if self.demodulate:
                out = out * demod[:, None, None, :].astype(out.dtype)
        else:
            out = lax.conv_general_dilated(
                x,
                w_c,
                window_strides=(1, 1),
                padding=[(k // 2, k // 2)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if self.demodulate:
                out = out * demod[:, None, None, :].astype(out.dtype)

        if return_style_scalars:
            return out, s
        return out


class NoiseInjection(nn.Module):
    """img + weight * noise (stylegan2.py:301-312); noise drawn from the
    'noise' RNG stream when not provided."""

    @nn.compact
    def __call__(self, image, noise: Optional[jax.Array] = None):
        weight = self.param("weight", nn.initializers.zeros, ())
        if noise is None:
            n, h, w, _ = image.shape
            noise = jax.random.normal(
                self.make_rng("noise"), (n, h, w, 1), image.dtype
            )
        return image + weight.astype(image.dtype) * noise.astype(image.dtype)


class ConstantInput(nn.Module):
    """Learned constant input tiled to the batch (stylegan2.py:315-329)."""

    channel: int
    size: int = 4

    @nn.compact
    def __call__(self, batch: int):
        const = self.param(
            "input",
            nn.initializers.normal(stddev=1.0),
            (1, self.size, self.size, self.channel),
        )
        return jnp.tile(const, (batch, 1, 1, 1))


class StyledConv(nn.Module):
    """ModulatedConv2d -> NoiseInjection -> FusedLeakyReLU (stylegan2.py:332-376)."""

    out_channel: int
    kernel_size: int
    style_dim: int
    upsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    demodulate: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        style,
        noise: Optional[jax.Array] = None,
        return_style_scalars: bool = False,
    ):
        ret = ModulatedConv2d(
            self.out_channel,
            self.kernel_size,
            self.style_dim,
            upsample=self.upsample,
            blur_kernel=self.blur_kernel,
            demodulate=self.demodulate,
            dtype=self.dtype,
            name="conv",
        )(x, style, return_style_scalars)
        if return_style_scalars:
            out, s = ret
        else:
            out = ret
        out = NoiseInjection(name="noise")(out, noise)
        out = FusedLeakyReLU(self.out_channel, name="activate")(out)
        if return_style_scalars:
            return out, s
        return out


class ToRGB(nn.Module):
    """1x1 modulated conv (no demod) to RGB + skip upsample-add
    (stylegan2.py:379-404)."""

    style_dim: int
    upsample: bool = True
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        style,
        skip: Optional[jax.Array] = None,
        return_style_scalars: bool = False,
    ):
        ret = ModulatedConv2d(
            3, 1, self.style_dim, demodulate=False, dtype=self.dtype, name="conv"
        )(x, style, return_style_scalars)
        if return_style_scalars:
            out, s = ret
        else:
            out = ret
        bias = self.param("bias", nn.initializers.zeros, (1, 1, 1, 3))
        out = out + bias.astype(out.dtype)
        if skip is not None:
            from fm3dgan.nn.layers import Upsample

            skip = Upsample(self.blur_kernel, name="upsample")(skip)
            out = out + skip
        if return_style_scalars:
            return out, s
        return out
