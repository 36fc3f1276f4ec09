"""ResNet-18 encoders E_Tsr / E_W, NHWC.

Parity with /root/reference/resnet_encoder.py:152-311: torchvision-style
BasicBlock [2,2,2,2] ResNet-18 with the classifier removed.

* ``tensor_encoding=True``: final AvgPool(2,2) -> [N, 4, 4, 512] tensor that
  replaces the generator's constant input (resnet_encoder.py:206-207,270-280).
* ``tensor_encoding=False``: global average pool -> [N, 512] W vector
  (resnet_encoder.py:208-209,272-273).
* ``tensor_transform=True``: extra fc 512*4*4 -> 512 returning (tensor, vector)
  (resnet_encoder.py:212-213,275-278), used by the 2-encoder co-modulation mode.

BatchNorm uses flax's batch_stats collection; pass ``train=True`` during
training and keep stats in the train state.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_planes = x.shape[-1]
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        out = norm("bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.planes, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
            name="conv2",
        )(out)
        out = norm("bn2")(out)
        if self.stride != 1 or in_planes != self.planes:
            identity = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = norm("downsample_bn")(identity)
        else:
            identity = x
        return nn.relu(out + identity)


class ResNet18Encoder(nn.Module):
    """E_Tsr (tensor_encoding=True) / E_W (False) / tensor-transform variant.

    ``width`` is the stem width (reference value 64); layer widths are
    width*(1,2,4,8) and the output vector/tensor carries 8*width channels.
    Sub-64 widths are a smoke/dryrun knob (sharding semantics are
    width-independent); checkpoint-parity configs use 64.
    """

    tensor_encoding: bool = True
    tensor_transform: bool = False
    width: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [N, 256, 256, 3] in [-1,1] -> [N,4,4,8w] / [N,8w] / both."""
        out = nn.Conv(
            self.width, (7, 7), strides=(2, 2), padding=3, use_bias=False,
            dtype=self.dtype, name="conv1",
        )(x)
        out = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn1",
        )(out)
        out = nn.relu(out)
        # MaxPool k3 s2 p1 (resnet_encoder.py:229).
        out = nn.max_pool(
            out, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
        )
        w = self.width
        layer_planes = [(w, 1), (2 * w, 2), (4 * w, 2), (8 * w, 2)]
        for li, (planes, stride) in enumerate(layer_planes, start=1):
            out = BasicBlock(
                planes, stride, dtype=self.dtype, name=f"layer{li}_0"
            )(out, train)
            out = BasicBlock(planes, 1, dtype=self.dtype, name=f"layer{li}_1")(
                out, train
            )

        if self.tensor_encoding:
            # AvgPool(2,2): [N,8,8,512] -> [N,4,4,512] at the reference's 256
            # input (resnet_encoder.py:206-207).  The window adapts so the
            # tensor head always emits the generator's 4x4 interface.
            win = max(1, out.shape[1] // 4)
            tensor = nn.avg_pool(out, (win, win), strides=(win, win))
            if self.tensor_transform:
                flat = tensor.reshape(tensor.shape[0], -1)
                vector = nn.Dense(
                    8 * self.width, dtype=self.dtype, name="ten_fc"
                )(flat)
                return tensor, vector
            return tensor
        else:
            vector = jnp.mean(out, axis=(1, 2))  # adaptive avg pool to 1x1
            if self.tensor_transform:
                raise ValueError("tensor_transform requires tensor_encoding")
            return vector
