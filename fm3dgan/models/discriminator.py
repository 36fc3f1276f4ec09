"""StyleGAN2 discriminator, NHWC (parity with /root/reference/stylegan2.py:762-820)."""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from fm3dgan.models.generator import channel_table
from fm3dgan.nn.layers import ConvLayer, EqualLinear, ResBlock, minibatch_stddev

Dtype = Any


class Discriminator(nn.Module):
    size: int
    channel_multiplier: int = 2
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    stddev_group: int = 4
    stddev_feat: int = 1
    width_mult: float = 1.0  # smoke/dryrun width scale (see channel_table)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: [N, size, size, 3] in [-1, 1] -> logits [N, 1]."""
        channels = channel_table(self.channel_multiplier, self.width_mult)
        log_size = int(math.log2(self.size))

        out = ConvLayer(channels[self.size], 1, dtype=self.dtype, name="from_rgb")(x)
        for i in range(log_size, 2, -1):
            out = ResBlock(
                channels[2 ** (i - 1)],
                self.blur_kernel,
                dtype=self.dtype,
                name=f"res_{2**i}",
            )(out)

        # Minibatch stddev with group 4 (stylegan2.py:793-813).
        out = minibatch_stddev(out, self.stddev_group, self.stddev_feat)
        out = ConvLayer(channels[4], 3, dtype=self.dtype, name="final_conv")(out)
        n = out.shape[0]
        out = out.reshape(n, -1)
        out = EqualLinear(
            channels[4], activation="fused_lrelu", dtype=self.dtype, name="final_linear0"
        )(out)
        out = EqualLinear(1, dtype=self.dtype, name="final_linear1")(out)
        return out
