"""ArcFace ResNetFace-18 identity network, NHWC.

Parity with /root/reference/Util/arcface_pytorch/resnet_face_recognition.py:
170-230,350-352 — ``ResNetFace(IRBlock, [2,2,2,2], use_se=False)``:
1-channel 3x3 input conv, 4 IR stages (planes 64/128/256/512, strides
1/2/2/2), BN + dropout + fc5(512*8*8 -> 512) + BatchNorm1d.

Input convention (training_util.py:130-161): RGB [-1,1] 256^2 -> grayscale ->
2x avg-pool -> [N,128,128,1].

The pretrained checkpoint is absent from the reference mount
(.MISSING_LARGE_BLOBS:2); use fm3dgan.compat.torch_port.load_arcface to load a
compatible ``resnet18_arcfacenet.pth`` when available.  This module is always
used frozen (eval mode): BatchNorm uses running stats, dropout is identity.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class _ScalarPReLU(nn.Module):
    """torch nn.PReLU() default: ONE shared slope parameter."""

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), (1,))
        return jnp.where(x >= 0, x, x * a[0].astype(x.dtype))


class SEBlock(nn.Module):
    """SE with Linear-PReLU-Linear-Sigmoid (resnet_face_recognition.py:152-167)."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))
        y = nn.Dense(c // self.reduction, name="fc0")(y)
        y = _ScalarPReLU(name="prelu")(y)
        y = nn.Dense(c, name="fc2")(y)
        y = nn.sigmoid(y)
        return x * y[:, None, None, :]


class IRBlock(nn.Module):
    """bn0 -> conv3x3(in,in) -> bn1 -> prelu -> conv3x3(in,planes,stride) ->
    bn2 [-> SE] -> +shortcut -> prelu (resnet_face_recognition.py:75-110).

    NB: the two activations share ONE scalar PReLU parameter (the reference
    reuses self.prelu)."""

    planes: int
    stride: int = 1
    use_se: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inplanes = x.shape[-1]
        bn = lambda name: nn.BatchNorm(
            use_running_average=True, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        prelu = _ScalarPReLU(name="prelu")
        out = bn("bn0")(x)
        out = nn.Conv(
            inplanes, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
            name="conv1",
        )(out)
        out = bn("bn1")(out)
        out = prelu(out)
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride), padding=1,
            use_bias=False, dtype=self.dtype, name="conv2",
        )(out)
        out = bn("bn2")(out)
        if self.use_se:
            out = SEBlock(name="se")(out)
        if self.stride != 1 or inplanes != self.planes:
            residual = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            residual = bn("downsample_bn")(residual)
        else:
            residual = x
        return prelu(out + residual)


class ResNetFace18(nn.Module):
    """[N,128,128,1] grayscale in [-1,1] -> [N,512] identity embedding."""

    use_se: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        bn = lambda name: nn.BatchNorm(
            use_running_average=True, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        x = nn.Conv(
            64, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv1"
        )(x)
        x = bn("bn1")(x)
        x = _ScalarPReLU(name="prelu")(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        layer_planes = [(64, 1), (128, 2), (256, 2), (512, 2)]
        for li, (planes, stride) in enumerate(layer_planes, start=1):
            x = IRBlock(
                planes, stride, use_se=self.use_se, dtype=self.dtype,
                name=f"layer{li}_0",
            )(x)
            x = IRBlock(
                planes, 1, use_se=self.use_se, dtype=self.dtype,
                name=f"layer{li}_1",
            )(x)
        x = bn("bn4")(x)
        # dropout: identity (frozen/eval).  Flatten matches torch NCHW
        # ordering for fc5 weight-port compatibility: [N,H,W,C] -> [N,C,H,W].
        n = x.shape[0]
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(n, -1)
        x = nn.Dense(512, name="fc5")(x)
        # BatchNorm1d(512) on features.
        x = nn.BatchNorm(
            use_running_average=True, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn5",
        )(x)
        return x
