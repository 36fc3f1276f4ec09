"""S3FD single-shot face detector, NHWC — the SFD stage of the reference's
landmark stack.

Counterpart of the external ``face_alignment.detection.sfd`` dependency used
by /root/reference/Util/landmark_util.py:19-101: batched detection (BGR flip
+ mean subtraction, landmark_util.py:30-31; softmax over score maps, :36-38;
full-image fallback box, :45-48) and the bbox -> center/scale crop with the
0.12 vertical offset (:96-98) that feeds the FAN landmark net.

Split of labor (mirrors the reference, which decodes on host numpy after
``.cpu()``, landmark_util.py:38):
  * the conv net runs on device (jit; MXU-dense VGG),
  * SSD box decode / NMS / score filtering are tiny data-dependent loops and
    run on the host over the fetched score maps.

Weights load from the public s3fd checkpoint via ``convert_s3fd``; with
random weights detection falls back to the full-image box — exactly the
reference's behavior for undetected faces — so the crop+FAN pipeline stays
exercisable without the binary asset.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

SFD_MEANS_BGR = (104.0, 117.0, 123.0)
REFERENCE_SCALE = 195.0  # face_alignment SFDDetector.reference_scale


class L2Norm(nn.Module):
    """Per-channel learned-scale L2 normalization (s3fd conv*_norm)."""

    n_channels: int
    initial_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        scale = self.param(
            "weight",
            lambda key, shape: jnp.full(shape, self.initial_scale),
            (self.n_channels,),
        )
        norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True) + 1e-10)
        return x / norm * scale[None, None, None, :]


class S3FD(nn.Module):
    """[N, H, W, 3] BGR mean-subtracted -> 12 maps [cls1, reg1, ..., cls6,
    reg6] at strides 4/8/16/32/64/128 (public s3fd net architecture)."""

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        conv = lambda ch, k, s, p, name: nn.Conv(
            ch, (k, k), strides=(s, s), padding=p, name=name
        )
        pool = lambda h: nn.max_pool(h, (2, 2), strides=(2, 2))

        h = nn.relu(conv(64, 3, 1, 1, "conv1_1")(x))
        h = nn.relu(conv(64, 3, 1, 1, "conv1_2")(h))
        h = pool(h)
        h = nn.relu(conv(128, 3, 1, 1, "conv2_1")(h))
        h = nn.relu(conv(128, 3, 1, 1, "conv2_2")(h))
        h = pool(h)
        h = nn.relu(conv(256, 3, 1, 1, "conv3_1")(h))
        h = nn.relu(conv(256, 3, 1, 1, "conv3_2")(h))
        h = nn.relu(conv(256, 3, 1, 1, "conv3_3")(h))
        f3_3 = h
        h = pool(h)
        h = nn.relu(conv(512, 3, 1, 1, "conv4_1")(h))
        h = nn.relu(conv(512, 3, 1, 1, "conv4_2")(h))
        h = nn.relu(conv(512, 3, 1, 1, "conv4_3")(h))
        f4_3 = h
        h = pool(h)
        h = nn.relu(conv(512, 3, 1, 1, "conv5_1")(h))
        h = nn.relu(conv(512, 3, 1, 1, "conv5_2")(h))
        h = nn.relu(conv(512, 3, 1, 1, "conv5_3")(h))
        f5_3 = h
        h = pool(h)
        h = nn.relu(conv(1024, 3, 1, 3, "fc6")(h))
        h = nn.relu(conv(1024, 1, 1, 0, "fc7")(h))
        ffc7 = h
        h = nn.relu(conv(256, 1, 1, 0, "conv6_1")(h))
        h = nn.relu(conv(512, 3, 2, 1, "conv6_2")(h))
        f6_2 = h
        h = nn.relu(conv(128, 1, 1, 0, "conv7_1")(h))
        h = nn.relu(conv(256, 3, 2, 1, "conv7_2")(h))
        f7_2 = h

        f3_3 = L2Norm(256, 10.0, name="conv3_3_norm")(f3_3)
        f4_3 = L2Norm(512, 8.0, name="conv4_3_norm")(f4_3)
        f5_3 = L2Norm(512, 5.0, name="conv5_3_norm")(f5_3)

        cls1 = conv(4, 3, 1, 1, "conv3_3_norm_mbox_conf")(f3_3)
        reg1 = conv(4, 3, 1, 1, "conv3_3_norm_mbox_loc")(f3_3)
        cls2 = conv(2, 3, 1, 1, "conv4_3_norm_mbox_conf")(f4_3)
        reg2 = conv(4, 3, 1, 1, "conv4_3_norm_mbox_loc")(f4_3)
        cls3 = conv(2, 3, 1, 1, "conv5_3_norm_mbox_conf")(f5_3)
        reg3 = conv(4, 3, 1, 1, "conv5_3_norm_mbox_loc")(f5_3)
        cls4 = conv(2, 3, 1, 1, "fc7_mbox_conf")(ffc7)
        reg4 = conv(4, 3, 1, 1, "fc7_mbox_loc")(ffc7)
        cls5 = conv(2, 3, 1, 1, "conv6_2_mbox_conf")(f6_2)
        reg5 = conv(4, 3, 1, 1, "conv6_2_mbox_loc")(f6_2)
        cls6 = conv(2, 3, 1, 1, "conv7_2_mbox_conf")(f7_2)
        reg6 = conv(4, 3, 1, 1, "conv7_2_mbox_loc")(f7_2)

        # Max-out background label on the stride-4 map (s3fd paper §3.3).
        bmax = jnp.maximum(
            jnp.maximum(cls1[..., 0:1], cls1[..., 1:2]), cls1[..., 2:3]
        )
        cls1 = jnp.concatenate([bmax, cls1[..., 3:4]], axis=-1)

        # Softmax over the 2 class channels (landmark_util.py:36-38).
        out = []
        for cls, reg in (
            (cls1, reg1), (cls2, reg2), (cls3, reg3),
            (cls4, reg4), (cls5, reg5), (cls6, reg6),
        ):
            out.append(jax.nn.softmax(cls, axis=-1))
            out.append(reg)
        return out


def preprocess_sfd(images_rgb_255: jax.Array) -> jax.Array:
    """RGB [0,255] NHWC -> BGR mean-subtracted (landmark_util.py:30-31)."""
    bgr = images_rgb_255[..., ::-1]
    return bgr - jnp.asarray(SFD_MEANS_BGR, bgr.dtype)[None, None, None, :]


# ---------------------------------------------------------------------------
# Host-side SSD decode (face_alignment.detection.sfd.detect.get_predictions)
# ---------------------------------------------------------------------------


def _decode_ssd(loc: np.ndarray, prior: np.ndarray) -> np.ndarray:
    """Standard SSD box decode, variances (0.1, 0.2)."""
    var0, var1 = 0.1, 0.2
    cxcy = prior[:2] + loc[:2] * var0 * prior[2:]
    wh = prior[2:] * np.exp(loc[2:] * var1)
    x1y1 = cxcy - wh / 2.0
    x2y2 = x1y1 + wh
    return np.concatenate([x1y1, x2y2])


def _nms(boxes: np.ndarray, thresh: float = 0.3) -> List[int]:
    if len(boxes) == 0:
        return []
    x1, y1, x2, y2, scores = boxes.T
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        ovr = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][ovr <= thresh]
    return keep


def decode_sfd_maps(
    olist: Sequence[np.ndarray],
    score_thresh: float = 0.05,
    nms_thresh: float = 0.3,
    filter_thresh: float = 0.5,
) -> List[np.ndarray]:
    """Per-image detections from ONE image's 12 maps ([H,W,C] each).

    Returns [x1, y1, x2, y2, score] rows sorted by score after NMS +
    score filtering (SFDDetector._filter_bboxes)."""
    bboxes = []
    for i in range(len(olist) // 2):
        ocls, oreg = olist[i * 2], olist[i * 2 + 1]
        stride = 2 ** (i + 2)  # 4, 8, 16, 32, 64, 128
        hs, ws = np.where(ocls[..., 1] > score_thresh)
        for hind, wind in zip(hs, ws):
            axc = stride / 2.0 + wind * stride
            ayc = stride / 2.0 + hind * stride
            score = ocls[hind, wind, 1]
            loc = oreg[hind, wind, :]
            prior = np.array([axc, ayc, stride * 4.0, stride * 4.0])
            box = _decode_ssd(loc, prior)
            bboxes.append(np.concatenate([box, [score]]))
    if not bboxes:
        return []
    arr = np.stack(bboxes)
    keep = _nms(arr, nms_thresh)
    arr = arr[keep]
    return [b for b in arr if b[-1] > filter_thresh]


def batch_face_detection(
    detector_fn,
    images_rgb_255: np.ndarray,
) -> List[List[float]]:
    """N single-face bboxes for N images (Batch_Img_Face_Detection,
    landmark_util.py:19-51): top detection per image; full-image fallback
    when nothing is found or the box leaves the frame."""
    h, w = images_rgb_255.shape[1:3]
    olist = [np.asarray(o) for o in detector_fn(preprocess_sfd(
        jnp.asarray(images_rgb_255)
    ))]
    out = []
    for n in range(images_rgb_255.shape[0]):
        dets = decode_sfd_maps([o[n] for o in olist])
        if not dets:
            out.append([0.0, 0.0, w - 1.0, h - 1.0, 1.0])
        elif (
            dets[0][0] < 0 or dets[0][1] < 0
            or dets[0][2] > w - 1 or dets[0][3] > h - 1
        ):
            out.append([0.0, 0.0, w - 1.0, h - 1.0, 1.0])
        else:
            out.append([float(v) for v in dets[0]])
    return out


# ---------------------------------------------------------------------------
# bbox -> crop (face_alignment.utils.transform / Crop_An_Image)
# ---------------------------------------------------------------------------


def fa_transform(
    point: Sequence[float],
    center: Sequence[float],
    scale: float,
    resolution: int,
    invert: bool = False,
) -> np.ndarray:
    """face_alignment.utils.transform: crop-frame <-> original-frame point
    mapping through the 200*scale reference square."""
    pt = np.array([point[0], point[1], 1.0])
    hh = 200.0 * scale
    t = np.eye(3)
    t[0, 0] = resolution / hh
    t[1, 1] = resolution / hh
    t[0, 2] = resolution * (-center[0] / hh + 0.5)
    t[1, 2] = resolution * (-center[1] / hh + 0.5)
    if invert:
        t = np.linalg.inv(t)
    new_pt = t @ pt
    return new_pt[:2].astype(np.int32)


def bbox_center_scale(
    bbox: Sequence[float], reference_scale: float = REFERENCE_SCALE
) -> Tuple[np.ndarray, float]:
    """Center (with the 0.12 vertical offset) and scale from a bbox
    (Crop_An_Image, landmark_util.py:96-98)."""
    center = np.array(
        [
            bbox[2] - (bbox[2] - bbox[0]) / 2.0,
            bbox[3] - (bbox[3] - bbox[1]) / 2.0,
        ]
    )
    center[1] = center[1] - (bbox[3] - bbox[1]) * 0.12
    scale = (bbox[2] - bbox[0] + bbox[3] - bbox[1]) / reference_scale
    return center, float(scale)


def crop_image(
    image_rgb_255: np.ndarray,
    center: np.ndarray,
    scale: float,
    resolution: int = 256,
) -> np.ndarray:
    """Crop one [H,W,3] image around center/scale to resolution²
    (Crop_PyTorch, landmark_util.py:54-82): zero-pad out-of-frame regions,
    bilinear resize."""
    ul = fa_transform([1, 1], center, scale, resolution, True)
    br = fa_transform([resolution, resolution], center, scale, resolution, True)
    ht, wd = image_rgb_255.shape[:2]
    new_h, new_w = br[1] - ul[1], br[0] - ul[0]
    out = np.zeros((new_h, new_w, 3), image_rgb_255.dtype)
    new_x = [max(1, -ul[0] + 1), min(br[0], wd) - ul[0]]
    new_y = [max(1, -ul[1] + 1), min(br[1], ht) - ul[1]]
    old_x = [max(1, ul[0] + 1), min(br[0], wd)]
    old_y = [max(1, ul[1] + 1), min(br[1], ht)]
    out[new_y[0] - 1 : new_y[1], new_x[0] - 1 : new_x[1]] = image_rgb_255[
        old_y[0] - 1 : old_y[1], old_x[0] - 1 : old_x[1]
    ]
    resized = jax.image.resize(
        jnp.asarray(out)[None], (1, resolution, resolution, 3),
        method="bilinear",
    )
    return np.asarray(resized[0])


def detect_and_crop(
    detector_fn,
    images_minus1_1: np.ndarray,
    resolution: int = 256,
    reference_scale: float = REFERENCE_SCALE,
) -> Tuple[np.ndarray, List[np.ndarray], List[float]]:
    """[-1,1] NHWC faces -> (FAN-ready [0,1] crops, centers, scales)
    (Get_HeatMap_PyTorch, landmark_util.py:171-199)."""
    images_255 = (np.asarray(images_minus1_1) + 1.0) * 255.0 / 2.0
    bboxes = batch_face_detection(detector_fn, images_255)
    crops, centers, scales = [], [], []
    for i, bbox in enumerate(bboxes):
        center, scale = bbox_center_scale(bbox, reference_scale)
        crops.append(crop_image(images_255[i], center, scale, resolution))
        centers.append(center)
        scales.append(scale)
    return np.stack(crops) / 255.0, centers, scales


def landmarks_to_original_frame(
    landmarks_hm: np.ndarray,
    centers: List[np.ndarray],
    scales: List[float],
    heatmap_size: int = 64,
) -> np.ndarray:
    """Heatmap-frame landmarks [N,68,2] -> original-image coordinates via the
    inverse crop transform (_get_preds_fromhm_torch, landmark_util.py:155-162).

    Matches the reference convention: heatmap coords are 1-indexed center-
    refined minus 0.5 before the inverse transform."""
    out = np.zeros_like(landmarks_hm)
    for i in range(landmarks_hm.shape[0]):
        for j in range(landmarks_hm.shape[1]):
            out[i, j] = fa_transform(
                landmarks_hm[i, j], centers[i], scales[i], heatmap_size, True
            )
    return out


def make_heatmap_landmark_fn(detector_fn, fan_fn):
    """images [-1,1] NHWC -> (heatmaps [N,64,64,68], landmarks [N,68,2] in
    original-image coordinates) — the full SFD+FAN stack for
    fm3dgan.eval.quant_eval.get_edit_score (Get_HeatMap_Landmark_PyTorch,
    landmark_util.py:204-233)."""
    from fm3dgan.models.fan_landmark import heatmaps_to_landmarks

    def fn(images):
        crops, centers, scales = detect_and_crop(detector_fn, images)
        heatmaps = fan_fn(jnp.asarray(crops, jnp.float32))
        lm_hm = np.asarray(heatmaps_to_landmarks(heatmaps))
        # heatmaps_to_landmarks returns 0-indexed refined coords; the
        # reference decodes 1-indexed then subtracts 0.5 (net offset +0.5).
        lm = landmarks_to_original_frame(lm_hm + 0.5, centers, scales)
        return heatmaps, lm

    return fn


# ---------------------------------------------------------------------------
# Weight conversion (public s3fd checkpoint)
# ---------------------------------------------------------------------------


def convert_s3fd(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Public s3fd torch state dict -> S3FD flax variables (NCHW->NHWC
    kernel transpose; L2Norm scales pass through)."""
    params: Dict[str, Any] = {}
    for key, value in sd.items():
        value = np.asarray(value)
        mod, kind = key.rsplit(".", 1)
        entry = params.setdefault(mod, {})
        if value.ndim == 4:
            entry["kernel" if kind == "weight" else kind] = np.transpose(
                value, (2, 3, 1, 0)
            )
        elif kind == "weight":  # L2Norm scale
            entry["weight"] = value
        else:
            entry["bias"] = value
    return {"params": params}
