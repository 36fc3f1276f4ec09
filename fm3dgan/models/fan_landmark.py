"""FAN 2D facial-landmark network (heatmap regressor), NHWC.

Counterpart of the reference's external ``face_alignment`` dependency
(imported via sys.path hack, train_3_encoder.py:40-41; used through
Util/landmark_util.py:19-233): a 4-stack hourglass FAN producing 68 landmark
heatmaps at 64x64, plus the heatmap->landmark decoding with quarter-pixel
refinement (landmark_util.py:125-164).

Scope notes:
  * The SFD face detector stage (landmark_util.py:19-51) is replaced by
    ``center_crop_for_fan`` — the training/eval images here are already
    aligned 256px face crops (FFHQ / DiscoFaceGAN renders), for which the
    reference's detector effectively returns a full-image box fallback
    (landmark_util.py:45-48).  An explicit bbox can be supplied instead.
  * Pretrained FAN weights load via ``convert_fan`` from the public
    face-alignment 2DFAN-4 checkpoint; random init otherwise (heatmap losses
    are disabled by default in the shipped config, hmap_loss_lambda=0).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class ConvBlock(nn.Module):
    """FAN residual block: 3 bn-relu-convs at C/2, C/4, C/4, concatenated."""

    out_planes: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_planes = x.shape[-1]
        bn = lambda name: nn.BatchNorm(
            use_running_average=True, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        o2, o4 = self.out_planes // 2, self.out_planes // 4
        y = nn.relu(bn("bn1")(x))
        y1 = nn.Conv(o2, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                     name="conv1")(y)
        y = nn.relu(bn("bn2")(y1))
        y2 = nn.Conv(o4, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                     name="conv2")(y)
        y = nn.relu(bn("bn3")(y2))
        y3 = nn.Conv(o4, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                     name="conv3")(y)
        out = jnp.concatenate([y1, y2, y3], axis=-1)
        if in_planes != self.out_planes:
            sc = nn.relu(bn("downsample_bn")(x))
            sc = nn.Conv(
                self.out_planes, (1, 1), use_bias=False, dtype=self.dtype,
                name="downsample_conv",
            )(sc)
        else:
            sc = x
        return out + sc


class HourGlass(nn.Module):
    """Recursive hourglass of depth 4 over 256 features."""

    depth: int = 4
    features: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        def level(n, inp):
            up1 = ConvBlock(self.features, dtype=self.dtype, name=f"b1_{n}")(inp)
            low1 = nn.avg_pool(inp, (2, 2), strides=(2, 2))
            low1 = ConvBlock(self.features, dtype=self.dtype, name=f"b2_{n}")(low1)
            if n > 1:
                low2 = level(n - 1, low1)
            else:
                low2 = ConvBlock(
                    self.features, dtype=self.dtype, name=f"b2_plus_{n}"
                )(low1)
            low3 = ConvBlock(self.features, dtype=self.dtype, name=f"b3_{n}")(low2)
            # Nearest-neighbor 2x upsample.
            up2 = jnp.repeat(jnp.repeat(low3, 2, axis=1), 2, axis=2)
            return up1 + up2

        return level(self.depth, x)


class FAN(nn.Module):
    """[N, 256, 256, 3] RGB in [0,1] -> [N, 64, 64, 68] heatmaps."""

    num_modules: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        bn = lambda name: nn.BatchNorm(
            use_running_average=True, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, dtype=self.dtype,
                    name="conv1")(x)
        x = nn.relu(bn("bn1")(x))
        x = ConvBlock(128, dtype=self.dtype, name="conv2")(x)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = ConvBlock(128, dtype=self.dtype, name="conv3")(x)
        x = ConvBlock(256, dtype=self.dtype, name="conv4")(x)

        previous = x
        outputs = []
        for i in range(self.num_modules):
            hg = HourGlass(dtype=self.dtype, name=f"m{i}")(previous)
            ll = ConvBlock(256, dtype=self.dtype, name=f"top_m_{i}")(hg)
            ll = nn.Conv(256, (1, 1), use_bias=False, dtype=self.dtype,
                         name=f"conv_last{i}")(ll)
            ll = nn.relu(bn(f"bn_end{i}")(ll))
            heatmap = nn.Conv(68, (1, 1), dtype=self.dtype, name=f"l{i}")(ll)
            outputs.append(heatmap)
            if i < self.num_modules - 1:
                ll_branch = nn.Conv(256, (1, 1), use_bias=False,
                                    dtype=self.dtype, name=f"bl{i}")(ll)
                hm_branch = nn.Conv(256, (1, 1), use_bias=False,
                                    dtype=self.dtype, name=f"al{i}")(heatmap)
                previous = previous + ll_branch + hm_branch
        return outputs[-1]


def heatmaps_to_landmarks(heatmaps: jax.Array) -> jax.Array:
    """[N, 64, 64, 68] -> [N, 68, 2] (x, y) with quarter-pixel refinement
    (landmark_util.py:125-164 / face_alignment get_preds_fromhm)."""
    n, h, w, c = heatmaps.shape
    hm = jnp.transpose(heatmaps, (0, 3, 1, 2)).reshape(n, c, h * w)
    idx = jnp.argmax(hm, axis=-1)
    ys = idx // w
    xs = idx % w

    def refine(hm_2d, x, y):
        # +-0.25 px toward the larger neighbor.
        xm = jnp.clip(x - 1, 0, w - 1)
        xp = jnp.clip(x + 1, 0, w - 1)
        ym = jnp.clip(y - 1, 0, h - 1)
        yp = jnp.clip(y + 1, 0, h - 1)
        dx = jnp.sign(hm_2d[y, xp] - hm_2d[y, xm]) * 0.25
        dy = jnp.sign(hm_2d[yp, x] - hm_2d[ym, x]) * 0.25
        return x + dx, y + dy

    hm4 = jnp.transpose(heatmaps, (0, 3, 1, 2))  # [N, 68, H, W]
    rx, ry = jax.vmap(jax.vmap(refine))(hm4, xs, ys)
    return jnp.stack([rx, ry], axis=-1)


def landmarks_68_to_5(lm68):
    """68-point iBUG landmarks [N, 68, 2] -> 5-point MTCNN-convention
    landmarks [N, 5, 2]: left eye, right eye, nose tip, left mouth corner,
    right mouth corner — the keypoint set (and write order) of the
    reference's landmark extractor
    (DiscoFaceGAN_related_scripts/landmark_extractor.py:27-30), which the
    DiscoFaceGAN/Deep3DFace alignment preprocessing consumes.  Eyes are the
    centroid of the 6-point eye contour; nose/mouth are single iBUG points
    (30, 48, 54)."""
    import numpy as np

    lm68 = np.asarray(lm68)
    left_eye = lm68[:, 36:42].mean(axis=1)
    right_eye = lm68[:, 42:48].mean(axis=1)
    nose = lm68[:, 30]
    mouth_left = lm68[:, 48]
    mouth_right = lm68[:, 54]
    return np.stack(
        [left_eye, right_eye, nose, mouth_left, mouth_right], axis=1
    )


def center_crop_for_fan(
    images: jax.Array,
    bbox: Optional[Tuple[float, float, float, float]] = None,
    target_size: int = 256,
) -> jax.Array:
    """[-1,1] NHWC face crops -> FAN input ([0,1], target_size²; 256 for the
    pretrained 2DFAN-4 weights).

    The reference detects faces with SFD and crops with a 0.12 vertical
    offset (landmark_util.py:96-98); for already-aligned 256px crops the
    full-image fallback box (landmark_util.py:45-48) makes the crop an
    identity up to rescaling, reproduced here."""
    x = (images + 1.0) / 2.0
    if x.shape[1] != target_size or x.shape[2] != target_size:
        x = jax.image.resize(
            x, (x.shape[0], target_size, target_size, x.shape[3]),
            method="bilinear",
        )
    return x


def fan_heatmap_fn(fan_module: FAN, variables, target_size: int = 256):
    """Build heatmap_fn(images NHWC [-1,1]) -> [N,64,64,68] for the heatmap
    loss (fm3dgan/losses/geometry.py)."""

    def fn(images):
        return fan_module.apply(
            variables, center_crop_for_fan(images, target_size=target_size)
        )

    return fn


def convert_fan(sd: Dict[str, Any]) -> Dict[str, Any]:
    """face-alignment 2DFAN-4 state dict -> FAN variables."""
    import numpy as np

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def _set(tree, path, value):
        node = tree
        keys = path.split("/")
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = np.asarray(value)

    def conv(dst, src_w, src_b=None):
        _set(params, f"{dst}/kernel", np.transpose(sd[src_w], (2, 3, 1, 0)))
        if src_b and src_b in sd:
            _set(params, f"{dst}/bias", sd[src_b])

    def bn(dst, src):
        _set(params, f"{dst}/scale", sd[f"{src}.weight"])
        _set(params, f"{dst}/bias", sd[f"{src}.bias"])
        _set(stats, f"{dst}/mean", sd[f"{src}.running_mean"])
        _set(stats, f"{dst}/var", sd[f"{src}.running_var"])

    def convblock(dst, src):
        for i in (1, 2, 3):
            bn(f"{dst}/bn{i}", f"{src}.bn{i}")
            conv(f"{dst}/conv{i}", f"{src}.conv{i}.weight")
        if f"{src}.downsample.0.weight" in sd:
            bn(f"{dst}/downsample_bn", f"{src}.downsample.0")
            conv(f"{dst}/downsample_conv", f"{src}.downsample.2.weight")

    conv("conv1", "conv1.weight", "conv1.bias")
    bn("bn1", "bn1")
    convblock("conv2", "conv2")
    convblock("conv3", "conv3")
    convblock("conv4", "conv4")
    for i in range(4):
        # Hourglass blocks: b1_n, b2_n, b2_plus_n, b3_n for n=1..4.
        for n in range(1, 5):
            for b in ("b1", "b2", "b3"):
                if f"m{i}.{b}_{n}.bn1.weight" in sd:
                    convblock(f"m{i}/{b}_{n}", f"m{i}.{b}_{n}")
            if f"m{i}.b2_plus_{n}.bn1.weight" in sd:
                convblock(f"m{i}/b2_plus_{n}", f"m{i}.b2_plus_{n}")
        convblock(f"top_m_{i}", f"top_m_{i}")
        conv(f"conv_last{i}", f"conv_last{i}.weight")
        bn(f"bn_end{i}", f"bn_end{i}")
        conv(f"l{i}", f"l{i}.weight", f"l{i}.bias")
        if f"bl{i}.weight" in sd:
            conv(f"bl{i}", f"bl{i}.weight")
        if f"al{i}.weight" in sd:
            conv(f"al{i}", f"al{i}.weight")
    return {"params": params, "batch_stats": stats}
