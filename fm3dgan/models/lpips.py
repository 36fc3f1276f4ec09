"""LPIPS perceptual distance (net-lin, VGG16 backbone), NHWC.

Parity with /root/reference/lpips/networks_basic.py:36-110 (PNetLin v0.1):
ImageNet scaling layer ((x - shift)/scale on [-1,1] inputs), VGG16 5-slice
features (relu1_2/2_2/3_3/4_3/5_3), per-channel unit-normalization
(eps=1e-10 added to the norm), squared diffs, learned 1x1-conv linear heads
(no bias), spatial average, sum over layers -> [N,1,1,1] -> squeezed [N].

Weights: torchvision's pretrained VGG16 + the LPIPS v0.1 linear heads are
external data; load them with fm3dgan.compat.torch_port.load_lpips_vgg.
Without weights the distance is still a valid (random-feature) metric but NOT
LPIPS-calibrated; callers can check ``has_pretrained``.
"""

from __future__ import annotations

from typing import Any, List

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

# (x - shift) / scale, networks_basic.py:106-110.
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)

# VGG16 conv plan: (channels, convs-per-block); slices taken after each block's
# last ReLU, max-pool between blocks.
_VGG_BLOCKS = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
LPIPS_CHANNELS = (64, 128, 256, 512, 512)


class VGG16Features(nn.Module):
    """VGG16 feature slices (pretrained_networks.py:106-147)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        feats = []
        conv_idx = 0
        for bi, (ch, n_convs) in enumerate(_VGG_BLOCKS):
            if bi > 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for _ in range(n_convs):
                x = nn.Conv(
                    ch, (3, 3), padding=1, dtype=self.dtype,
                    name=f"conv{conv_idx}",
                )(x)
                x = nn.relu(x)
                conv_idx += 1
            feats.append(x)
        return feats


class LPIPS(nn.Module):
    """dist = LPIPS(img0, img1); images [N,H,W,3] in [-1,1]."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, in0, in1):
        shift = jnp.asarray(_SHIFT, self.dtype)[None, None, None, :]
        scale = jnp.asarray(_SCALE, self.dtype)[None, None, None, :]
        net = VGG16Features(dtype=self.dtype, name="net")
        f0 = net((in0.astype(self.dtype) - shift) / scale)
        f1 = net((in1.astype(self.dtype) - shift) / scale)

        def unit_normalize(f):
            norm = jnp.sqrt(jnp.sum(jnp.square(f), axis=-1, keepdims=True))
            return f / (norm + 1e-10)

        val = 0.0
        for k, (a, b) in enumerate(zip(f0, f1)):
            diff = jnp.square(unit_normalize(a) - unit_normalize(b))
            # 1x1 conv head, no bias (NetLinLayer, networks_basic.py:113-120);
            # dropout is identity in eval.
            w = self.param(
                f"lin{k}",
                nn.initializers.constant(1.0 / diff.shape[-1]),
                (diff.shape[-1],),
            )
            per_layer = jnp.sum(diff * w[None, None, None, :], axis=-1)
            val = val + jnp.mean(per_layer, axis=(1, 2))  # spatial average
        return val  # [N]
