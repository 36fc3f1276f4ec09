"""SFD face-detector stack tests: SSD decode math, fallback behavior, crop
geometry, converter round-trip, and the SFD+FAN heatmap/landmark pipeline
(reference counterpart: Util/landmark_util.py:19-101, 171-233)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fm3dgan.models.sfd_detector import (
    S3FD,
    batch_face_detection,
    bbox_center_scale,
    convert_s3fd,
    crop_image,
    decode_sfd_maps,
    detect_and_crop,
    fa_transform,
    make_heatmap_landmark_fn,
    preprocess_sfd,
)


def _empty_olist(size=256):
    """12 maps for one image, all background."""
    olist = []
    for i in range(6):
        stride = 2 ** (i + 2)
        hw = size // stride
        cls = np.zeros((hw, hw, 2), np.float32)
        cls[..., 0] = 1.0  # background
        reg = np.zeros((hw, hw, 4), np.float32)
        olist += [cls, reg]
    return olist


def test_decode_known_box():
    """A single confident anchor on the stride-8 map decodes to the SSD
    prior box (zero loc offsets -> box = anchor square of side 4*stride)."""
    olist = _empty_olist()
    # stride-8 map is pair index 1; put a face at (hind, wind) = (16, 16).
    olist[2][16, 16, 1] = 0.9
    dets = decode_sfd_maps(olist)
    assert len(dets) == 1
    x1, y1, x2, y2, score = dets[0]
    axc = 8 / 2.0 + 16 * 8  # 132
    np.testing.assert_allclose([x1, y1, x2, y2], [axc - 16, axc - 16,
                                                  axc + 16, axc + 16])
    assert score == pytest.approx(0.9)


def test_decode_off_center_face_with_offsets():
    """Location offsets shift/scale the anchor (variances 0.1/0.2)."""
    olist = _empty_olist()
    olist[2][4, 20, 1] = 0.8
    olist[3][4, 20] = [1.0, -0.5, np.log(2.0) / 0.2, 0.0]
    dets = decode_sfd_maps(olist)
    (d,) = dets
    axc, ayc, pw = 8 / 2.0 + 20 * 8, 8 / 2.0 + 4 * 8, 32.0
    cx = axc + 1.0 * 0.1 * pw   # +3.2
    cy = ayc - 0.5 * 0.1 * pw   # -1.6
    w = pw * 2.0
    np.testing.assert_allclose(
        d[:4], [cx - w / 2, cy - pw / 2, cx + w / 2, cy + pw / 2], rtol=1e-5
    )


def test_nms_suppresses_overlaps():
    olist = _empty_olist()
    olist[2][16, 16, 1] = 0.9
    olist[2][16, 17, 1] = 0.8  # heavily overlapping neighbor anchor
    dets = decode_sfd_maps(olist)
    assert len(dets) == 1 and dets[0][-1] == pytest.approx(0.9)


def test_batch_detection_fallback_full_image():
    """No detection -> full-image box (landmark_util.py:45-48)."""

    def detector_fn(x):
        n = x.shape[0]
        return [
            np.broadcast_to(o, (n,) + o.shape).copy() for o in _empty_olist()
        ]

    imgs = np.zeros((2, 256, 256, 3), np.float32)
    boxes = batch_face_detection(detector_fn, imgs)
    assert boxes == [[0.0, 0.0, 255.0, 255.0, 1.0]] * 2


def test_bbox_center_scale_offset():
    """0.12 vertical offset and reference-scale division
    (landmark_util.py:96-98)."""
    center, scale = bbox_center_scale([40, 60, 140, 200], reference_scale=195)
    assert center[0] == pytest.approx(90.0)
    assert center[1] == pytest.approx(130.0 - 140 * 0.12)
    assert scale == pytest.approx((100 + 140) / 195)


def test_fa_transform_roundtrip():
    center = np.array([120.0, 100.0])
    scale = 1.3
    # invert(transform(p)) stays near p (int floors both ways; allow px slop).
    p0 = [130.0, 90.0]
    fwd = fa_transform(p0, center, scale, 256, invert=True)
    back = fa_transform([float(fwd[0]), float(fwd[1])], center, scale, 256,
                        invert=False)
    assert abs(back[0] - p0[0]) <= 3 and abs(back[1] - p0[1]) <= 3


def test_crop_pulls_right_region():
    """Cropping around an off-center bbox samples that region of the image."""
    img = np.zeros((256, 256, 3), np.float32)
    img[40:120, 160:240, :] = 200.0  # bright block top-right
    bbox = [160, 40, 240, 120, 1.0]
    center, scale = bbox_center_scale(bbox)
    crop = crop_image(img, center, scale, resolution=64)
    assert crop.shape == (64, 64, 3)
    # The bright block must dominate the crop center.
    assert crop[32, 32].mean() > 100.0
    # And a crop around the opposite corner must not see it.
    center2, scale2 = bbox_center_scale([0, 128, 80, 208, 1.0])
    crop2 = crop_image(img, center2, scale2, resolution=64)
    assert crop2[32, 32].mean() < 10.0


def test_preprocess_bgr_mean():
    x = jnp.ones((1, 8, 8, 3)) * jnp.asarray([10.0, 20.0, 30.0])
    y = np.asarray(preprocess_sfd(x))
    np.testing.assert_allclose(y[0, 0, 0], [30 - 104.0, 20 - 117.0, 10 - 123.0])


@pytest.mark.slow
def test_s3fd_module_shapes_and_converter():
    net = S3FD()
    x = jnp.zeros((1, 256, 256, 3))
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    outs = jax.jit(lambda v, x: net.apply(v, x))(variables, x)
    assert len(outs) == 12
    # fc6 (k=3, pad=3) grows the post-pool5 map by 4 (8 -> 12), so the last
    # three scales are 12/6/3 rather than 8/4/2 — matching the torch s3fd.
    expected_hw = (64, 32, 16, 12, 6, 3)
    for i, hw in enumerate(expected_hw):
        assert outs[2 * i].shape == (1, hw, hw, 2), (i, outs[2 * i].shape)
        assert outs[2 * i + 1].shape == (1, hw, hw, 4)
        s = np.asarray(jnp.sum(outs[2 * i], axis=-1))
        np.testing.assert_allclose(s, 1.0, rtol=1e-5)  # softmaxed

    # Converter round-trip: synthesize a torch-layout state dict from the
    # flax params and convert back.
    sd = {}
    for mod, entry in variables["params"].items():
        for kind, v in entry.items():
            v = np.asarray(v)
            if kind == "kernel":
                sd[f"{mod}.weight"] = np.transpose(v, (3, 2, 0, 1))
            elif kind == "weight":
                sd[f"{mod}.weight"] = v
            else:
                sd[f"{mod}.bias"] = v
    conv = convert_s3fd(sd)
    for mod, entry in variables["params"].items():
        for kind, v in entry.items():
            np.testing.assert_array_equal(
                np.asarray(v), np.asarray(conv["params"][mod][kind]), err_msg=f"{mod}.{kind}"
            )


@pytest.mark.slow
def test_heatmap_landmark_fn_off_center_face():
    """End-to-end SFD+FAN plumbing: a detector that reports an off-center
    bbox plus a FAN stub with a delta peak yields landmarks mapped back into
    the original frame near the face region."""

    face_box = [160.0, 40.0, 240.0, 120.0]

    def detector_fn(x):
        # Synthesize maps with one confident anchor whose decoded box ~= the
        # face box: use the stride-16 map (anchor side 64) near the face
        # center (200, 80) -> grid (h, w) = (4, 12): centers 72, 200.
        n = x.shape[0]
        olist = _empty_olist()
        cx, cy, side = 200.0, 80.0, 80.0
        stride, idx = 16, 2
        hind, wind = 4, 12
        axc = stride / 2.0 + wind * stride
        ayc = stride / 2.0 + hind * stride
        prior_wh = stride * 4.0
        olist[2 * idx][hind, wind, 1] = 0.95
        olist[2 * idx + 1][hind, wind] = [
            (cx - axc) / (0.1 * prior_wh),
            (cy - ayc) / (0.1 * prior_wh),
            np.log(side / prior_wh) / 0.2,
            np.log(side / prior_wh) / 0.2,
        ]
        return [np.broadcast_to(o, (n,) + o.shape).copy() for o in olist]

    def fan_fn(crops):
        # Delta heatmaps at the heatmap center (crop center).
        n = crops.shape[0]
        hm = np.zeros((n, 64, 64, 68), np.float32)
        hm[:, 32, 32, :] = 1.0
        return jnp.asarray(hm)

    rng = np.random.RandomState(0)
    imgs = rng.uniform(-1, 1, (1, 256, 256, 3)).astype(np.float32)
    fn = make_heatmap_landmark_fn(detector_fn, fan_fn)
    heatmaps, landmarks = fn(imgs)
    assert heatmaps.shape == (1, 64, 64, 68)
    assert landmarks.shape == (1, 68, 2)
    # Crop center = detection center shifted up by 0.12*box_h; landmarks in
    # the original frame must land near it.
    cx, cy = 200.0, 80.0 - 0.12 * 80.0
    assert abs(landmarks[0, 0, 0] - cx) < 8, landmarks[0, 0]
    assert abs(landmarks[0, 0, 1] - cy) < 8, landmarks[0, 0]


def test_landmarks_68_to_5_mapping():
    """iBUG-68 -> MTCNN 5-point reduction: eye centroids, nose tip 30,
    mouth corners 48/54, in the reference extractor's write order
    (landmark_extractor.py:27-30)."""
    from fm3dgan.models.fan_landmark import landmarks_68_to_5

    lm = np.zeros((1, 68, 2), np.float32)
    lm[0, 36:42] = [10.0, 20.0]   # left-eye contour
    lm[0, 42:48] = [30.0, 20.0]   # right-eye contour
    lm[0, 30] = [20.0, 30.0]      # nose tip
    lm[0, 48] = [12.0, 40.0]      # left mouth corner
    lm[0, 54] = [28.0, 40.0]      # right mouth corner
    out = landmarks_68_to_5(lm)
    assert out.shape == (1, 5, 2)
    np.testing.assert_allclose(
        out[0],
        [[10, 20], [30, 20], [20, 30], [12, 40], [28, 40]],
        atol=1e-5,
    )


def test_extract_landmarks_cli_contract(tmp_path, monkeypatch):
    """tools/extract_landmarks.py writes one <name>.txt per image with 5
    'x y' lines scaled back to the original frame (the reference's
    Write_Detection_Result contract, landmark_extractor.py:18-45) — stack
    stubbed with a full-image-fallback detector and a delta-peak FAN."""
    import importlib.util
    import os
    import sys

    from PIL import Image

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "extract_landmarks", os.path.join(repo, "tools/extract_landmarks.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    img_dir = tmp_path / "imgs"
    out_dir = tmp_path / "lms"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    # Two sizes: one native 256, one 512 to exercise the resize + rescale.
    Image.fromarray(rng.randint(0, 255, (256, 256, 3), np.uint8)).save(
        img_dir / "a.png"
    )
    Image.fromarray(rng.randint(0, 255, (512, 512, 3), np.uint8)).save(
        img_dir / "b.png"
    )

    def fake_build_stack(args):
        def detector_fn(x):
            n = int(x.shape[0])
            olist = _empty_olist(int(x.shape[1]))
            return [np.broadcast_to(o, (n,) + o.shape).copy() for o in olist]

        def fan_fn(crops):
            n = int(crops.shape[0])
            hm = np.zeros((n, 64, 64, 68), np.float32)
            hm[:, 32, 32, :] = 1.0
            return jnp.asarray(hm)

        return detector_fn, fan_fn

    monkeypatch.setattr(mod, "build_stack", fake_build_stack)
    monkeypatch.setattr(
        sys, "argv",
        ["extract_landmarks.py", "--img_dir", str(img_dir),
         "--out_dir", str(out_dir), "--random_init", "--batch", "2"],
    )
    mod.main()

    for name, orig in (("a", 256), ("b", 512)):
        txt = out_dir / f"{name}.txt"
        assert txt.exists()
        lines = txt.read_text().strip().splitlines()
        assert len(lines) == 5
        pts = np.array([[float(v) for v in ln.split()] for ln in lines])
        # Delta peak at the heatmap center of a full-image crop -> all 5
        # points near the image center, in the ORIGINAL frame.
        np.testing.assert_allclose(
            pts, np.full((5, 2), orig / 2.0), atol=0.125 * orig
        )
