"""pSp GradualStyleEncoder (E_W+), NHWC.

Parity with /root/reference/psp_encoder_model/encoders/psp_encoders.py:44-132
and helpers.py:38-139: IR-SE ResNet backbone + FPN taps at 3 feature levels
with bilinear (align_corners=True) lateral fusion, and n_styles
GradualStyleBlocks split coarse/middle/fine at indices 3/7 producing
[N, n_styles, 512] W+ codes.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fm3dgan.nn.layers import EqualLinear

Dtype = Any


def get_blocks(
    num_layers: int, width: int = 64
) -> List[List[Tuple[int, int, int]]]:
    """(in_channel, depth, stride) units per stage (helpers.py:38-73).

    ``width`` scales all stage depths (reference stem width 64) — sub-64 is a
    smoke/dryrun knob; checkpoint-parity configs use 64.
    """

    def block(in_channel, depth, num_units, stride=2):
        in_channel = in_channel * width // 64
        depth = depth * width // 64
        return [(in_channel, depth, stride)] + [
            (depth, depth, 1) for _ in range(num_units - 1)
        ]

    if num_layers == 18:
        return [
            block(64, 64, 2),
            block(64, 128, 2),
            block(128, 256, 2),
            block(256, 512, 2),
        ]
    if num_layers == 50:
        return [
            block(64, 64, 3),
            block(64, 128, 4),
            block(128, 256, 14),
            block(256, 512, 3),
        ]
    if num_layers == 100:
        return [
            block(64, 64, 3),
            block(64, 128, 13),
            block(128, 256, 30),
            block(256, 512, 3),
        ]
    if num_layers == 152:
        return [
            block(64, 64, 3),
            block(64, 128, 8),
            block(128, 256, 36),
            block(256, 512, 3),
        ]
    raise ValueError(f"num_layers must be in (18, 50, 100, 152), got {num_layers}")


def _align_corners_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] interpolation matrix for align_corners=True bilinear."""
    m = np.zeros((out_size, in_size), np.float32)
    if out_size == 1:
        m[0, 0] = 1.0
        return m
    src = np.arange(out_size) * ((in_size - 1) / (out_size - 1))
    lo = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    hi = np.clip(lo + 1, 0, in_size - 1)
    frac = (src - lo).astype(np.float32)
    m[np.arange(out_size), lo] += 1.0 - frac
    m[np.arange(out_size), hi] += frac
    return m


def bilinear_resize_align_corners(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize with align_corners=True semantics, NHWC.

    (jax.image.resize only offers half-pixel-center sampling; pSp's FPN uses
    align_corners=True, psp_encoders.py:99-100.)

    TPU-native formulation: two small dense interpolation matmuls (static
    weight matrices) instead of gathers, which are slow on TPU.
    """
    n, h, w, c = x.shape
    if h == out_h and w == out_w:
        return x
    wy = jnp.asarray(_align_corners_matrix(h, out_h), x.dtype)
    wx = jnp.asarray(_align_corners_matrix(w, out_w), x.dtype)
    x = jnp.einsum("oh,nhwc->nowc", wy, x)
    return jnp.einsum("ow,nhwc->nhoc", wx, x)


class PReLU(nn.Module):
    """Per-channel PReLU (torch nn.PReLU(num_parameters=C), init 0.25)."""

    @nn.compact
    def __call__(self, x):
        a = self.param(
            "alpha", nn.initializers.constant(0.25), (x.shape[-1],)
        )
        return jnp.where(x >= 0, x, x * a.astype(x.dtype))


class SEModule(nn.Module):
    """Squeeze-excitation (helpers.py:76-93)."""

    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        # max(1, .): sub-reduction-width channels only occur in tiny
        # smoke/dryrun configs; the reference width (>=64) divides evenly.
        s = nn.Conv(max(1, c // self.reduction), (1, 1), use_bias=False,
                    dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                    name="fc2")(s)
        return x * jax.nn.sigmoid(s)


class BottleneckIRSE(nn.Module):
    """IR-SE residual unit (helpers.py:115-139)."""

    depth: int
    stride: int
    use_se: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channel = x.shape[-1]
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        if in_channel == self.depth:
            # MaxPool(1, stride) == strided subsample.
            shortcut = x[:, :: self.stride, :: self.stride, :]
        else:
            shortcut = nn.Conv(
                self.depth, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="shortcut_conv",
            )(x)
            shortcut = norm("shortcut_bn")(shortcut)
        res = norm("bn0")(x)
        res = nn.Conv(
            self.depth, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
            name="conv1",
        )(res)
        res = PReLU(name="prelu")(res)
        res = nn.Conv(
            self.depth, (3, 3), strides=(self.stride, self.stride), padding=1,
            use_bias=False, dtype=self.dtype, name="conv2",
        )(res)
        res = norm("bn2")(res)
        if self.use_se:
            res = SEModule(dtype=self.dtype, name="se")(res)
        return res + shortcut


class GradualStyleBlock(nn.Module):
    """Conv-stride-2 stack + EqualLinear (psp_encoders.py:20-41)."""

    out_c: int
    spatial: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        import math

        num_pools = int(math.log2(self.spatial))
        for i in range(num_pools):
            x = nn.Conv(
                self.out_c, (3, 3), strides=(2, 2), padding=1,
                dtype=self.dtype, name=f"conv{i}",
            )(x)
            x = nn.leaky_relu(x, negative_slope=0.01)
        x = x.reshape(x.shape[0], self.out_c)
        return EqualLinear(self.out_c, dtype=self.dtype, name="linear")(x)


class Backbone(nn.Module):
    """IR / IR-SE face-recognition backbone (model_irse.py:18-57).

    input 112/224px RGB -> l2-normalized [N, 512] embedding.  Completes the
    reference's declared-but-untrained recognition family (IR_50 etc.,
    model_irse.py:60-93); shares BottleneckIRSE (use_se toggles IR vs IR-SE).
    """

    input_size: int = 112
    num_layers: int = 50
    mode: str = "ir"
    drop_ratio: float = 0.4
    affine: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.input_size in (112, 224), "input_size should be 112 or 224"
        assert self.num_layers in (50, 100, 152)
        assert self.mode in ("ir", "ir_se")
        use_se = self.mode == "ir_se"
        blocks = get_blocks(self.num_layers)

        x = nn.Conv(
            64, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
            name="input_conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="input_bn",
        )(x)
        x = PReLU(name="input_prelu")(x)

        unit_idx = 0
        for stage in blocks:
            for (_, depth, stride) in stage:
                x = BottleneckIRSE(
                    depth, stride, use_se=use_se, dtype=self.dtype,
                    name=f"body_{unit_idx}",
                )(x, train)
                unit_idx += 1

        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="output_bn",
        )(x)
        x = nn.Dropout(self.drop_ratio, deterministic=not train)(x)
        # torch Flatten runs over NCHW (model_irse.py:35-42) — transpose so a
        # ported Linear weight needs only the standard NCHW-flatten reorder.
        n, h, w, c = x.shape
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(n, c * h * w)
        x = nn.Dense(512, dtype=self.dtype, name="output_fc")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            use_scale=self.affine, use_bias=self.affine, dtype=self.dtype,
            name="output_bn1d",
        )(x)
        # l2_norm (helpers.py): x / ||x||_2, no eps.
        return x / jnp.linalg.norm(
            x.astype(jnp.float32), axis=-1, keepdims=True
        ).astype(x.dtype)


def IR_50(input_size: int = 112) -> Backbone:
    """ir-50 (model_irse.py:60-63)."""
    return Backbone(input_size, num_layers=50, mode="ir", affine=False)


def IR_101(input_size: int = 112) -> Backbone:
    return Backbone(input_size, num_layers=100, mode="ir", affine=False)


def IR_152(input_size: int = 112) -> Backbone:
    return Backbone(input_size, num_layers=152, mode="ir", affine=False)


def IR_SE_50(input_size: int = 112) -> Backbone:
    return Backbone(input_size, num_layers=50, mode="ir_se", affine=False)


def IR_SE_101(input_size: int = 112) -> Backbone:
    return Backbone(input_size, num_layers=100, mode="ir_se", affine=False)


def IR_SE_152(input_size: int = 112) -> Backbone:
    return Backbone(input_size, num_layers=152, mode="ir_se", affine=False)


class GradualStyleEncoder(nn.Module):
    """E_W+: photo -> [N, n_styles, 512] W+ codes."""

    num_layers: int = 18
    mode: str = "ir_se"
    n_styles: int = 14
    input_nc: int = 3
    coarse_ind: int = 3
    middle_ind: int = 7
    input_size: int = 256  # reference hardcodes spatials 16/32/64 for 256 input
    width: int = 64  # stem width; sub-64 = smoke/dryrun knob (see get_blocks)
    style_dim: int = 512  # W+ code dim (must stay 8*width for the FPN adds)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.num_layers in (18, 50), "FPN tap indices defined for 18/50"
        use_se = self.mode == "ir_se"
        blocks = get_blocks(self.num_layers, self.width)

        x = nn.Conv(
            self.width, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
            name="input_conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="input_bn",
        )(x)
        x = PReLU(name="input_prelu")(x)

        # Flattened unit list; taps per reference (psp_encoders.py:106-109).
        taps = {18: (3, 5, 7), 50: (6, 20, 23)}[self.num_layers]
        c1 = c2 = c3 = None
        unit_idx = 0
        for stage in blocks:
            for (_, depth, stride) in stage:
                x = BottleneckIRSE(
                    depth, stride, use_se=use_se, dtype=self.dtype,
                    name=f"body_{unit_idx}",
                )(x, train)
                if unit_idx == taps[0]:
                    c1 = x
                elif unit_idx == taps[1]:
                    c2 = x
                elif unit_idx == taps[2]:
                    c3 = x
                unit_idx += 1

        sp_c3 = self.input_size // 16
        sp_c2 = self.input_size // 8
        sp_c1 = self.input_size // 4
        fpn_c = 8 * self.width  # stage-4 depth (512 at the reference width)
        latents = []
        for j in range(self.coarse_ind):
            latents.append(
                GradualStyleBlock(self.style_dim, sp_c3, dtype=self.dtype,
                                  name=f"style_{j}")(c3)
            )
        lat1 = nn.Conv(fpn_c, (1, 1), dtype=self.dtype, name="latlayer1")(c2)
        p2 = (
            bilinear_resize_align_corners(c3, lat1.shape[1], lat1.shape[2])
            + lat1
        )
        for j in range(self.coarse_ind, self.middle_ind):
            latents.append(GradualStyleBlock(self.style_dim, sp_c2,
                                             dtype=self.dtype,
                                             name=f"style_{j}")(p2))
        lat2 = nn.Conv(fpn_c, (1, 1), dtype=self.dtype, name="latlayer2")(c1)
        p1 = (
            bilinear_resize_align_corners(p2, lat2.shape[1], lat2.shape[2])
            + lat2
        )
        for j in range(self.middle_ind, self.n_styles):
            latents.append(GradualStyleBlock(self.style_dim, sp_c1,
                                             dtype=self.dtype,
                                             name=f"style_{j}")(p1))

        return jnp.stack(latents, axis=1)
