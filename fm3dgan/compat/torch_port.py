"""PyTorch checkpoint -> flax variables converters.

Counterpart of the reference's checkpoint machinery
(``Build_Generator_From_Dict``, Util/network_util.py:101-115; checkpoint dict
layout train_3_encoder.py:735-753): converts reference state dicts into this
framework's NHWC parameter pytrees so reference-trained weights run here for
parity testing and inference.

Conventions handled:
  * conv weights  OIHW -> HWIO
  * linear weights [out,in] -> [in,out]
  * BatchNorm (weight,bias,running_mean,running_var) ->
    params (scale,bias) + batch_stats (mean,var)
  * NCHW -> NHWC flatten permutations for linears consuming flattened maps
  * nn.DataParallel 'module.' prefixes stripped

All functions take plain numpy-valued state dicts ({key: np.ndarray}); use
``load_torch_state_dict`` to read a .pt/.pth file (torch CPU required only
there).
"""

from __future__ import annotations

import math
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    out = {}
    for k, v in sd.items():
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
    return out


def _strip_module(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    return {re.sub(r"^module\.", "", k): v for k, v in sd.items()}


def _conv(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _bn(sd, prefix) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {
        "mean": sd[f"{prefix}.running_mean"],
        "var": sd[f"{prefix}.running_var"],
    }
    return params, stats


def _set(tree: Dict, path: str, value):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = np.asarray(value)


# ---------------------------------------------------------------------------
# Generator
# ---------------------------------------------------------------------------


def convert_generator(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference StyleGAN2 Generator state dict -> {'params':..., 'noises':...}.

    Key map (reference stylegan2.py:407-527 -> fm3dgan/models/generator.py):
      style.{i+1}           -> style/fc{i}
      input.input [1,C,4,4] -> input/input [1,4,4,C]
      conv1|convs.{i}: .conv.weight [1,O,I,k,k] -> conv/weight HWIO,
        .conv.modulation.{weight,bias}, .noise.weight [1] -> scalar,
        .activate.bias
      to_rgb1|to_rgbs.{i}: .conv.*, .bias [1,3,1,1] -> [1,1,1,3]
      noises.noise_{l} [1,1,H,W] -> noises/noise_{l} [1,H,W,1]
    """
    sd = _strip_module(sd)
    params: Dict[str, Any] = {}
    noises: Dict[str, Any] = {}

    for k, v in sd.items():
        if k.startswith("style."):
            idx = int(k.split(".")[1])
            leaf = k.split(".")[-1]
            if leaf == "weight":
                _set(params, f"style/fc{idx-1}/weight", _linear(v))
            else:
                _set(params, f"style/fc{idx-1}/bias", v)
        elif k == "input.input":
            _set(params, "input/input", np.transpose(v, (0, 2, 3, 1)))
        elif k.startswith("noises.noise_"):
            l = k.split("noise_")[1]
            noises[f"noise_{l}"] = np.transpose(v, (0, 2, 3, 1))
        else:
            m = re.match(
                r"(conv1|convs\.(\d+))\.(conv|noise|activate)\.(.*)", k
            )
            if m:
                base = "conv1" if m.group(1) == "conv1" else f"convs_{m.group(2)}"
                sub, leaf = m.group(3), m.group(4)
                if sub == "conv":
                    if leaf == "weight":
                        _set(params, f"{base}/conv/weight", _conv(v[0]))
                    elif leaf == "modulation.weight":
                        _set(params, f"{base}/conv/modulation/weight", _linear(v))
                    elif leaf == "modulation.bias":
                        _set(params, f"{base}/conv/modulation/bias", v)
                    elif leaf.startswith("blur"):
                        pass  # blur kernels are constants here
                elif sub == "noise" and leaf == "weight":
                    _set(params, f"{base}/noise/weight", v.reshape(()))
                elif sub == "activate" and leaf == "bias":
                    _set(params, f"{base}/activate/bias", v)
                continue
            m = re.match(r"(to_rgb1|to_rgbs\.(\d+))\.(.*)", k)
            if m:
                base = (
                    "to_rgb1" if m.group(1) == "to_rgb1" else f"to_rgbs_{m.group(2)}"
                )
                leaf = m.group(3)
                if leaf == "bias":
                    _set(params, f"{base}/bias", np.transpose(v, (0, 2, 3, 1)))
                elif leaf == "conv.weight":
                    _set(params, f"{base}/conv/weight", _conv(v[0]))
                elif leaf == "conv.modulation.weight":
                    _set(params, f"{base}/conv/modulation/weight", _linear(v))
                elif leaf == "conv.modulation.bias":
                    _set(params, f"{base}/conv/modulation/bias", v)
                elif "upsample" in leaf or "blur" in leaf:
                    pass
    out = {"params": params}
    if noises:
        out["noises"] = noises
    return out


def infer_net_shape(sd: Dict[str, np.ndarray]) -> Tuple[int, ...]:
    """Per-layer channel widths from conv shapes (Get_Network_Shape,
    network_util.py:39-50): input-channel of conv1 + each convs.{i}, then the
    out-channel of the last conv."""
    sd = _strip_module(sd)
    keys = ["conv1.conv.weight"]
    idx = 0
    while f"convs.{idx}.conv.weight" in sd:
        keys.append(f"convs.{idx}.conv.weight")
        idx += 1
    shape = [int(sd[k].shape[2]) for k in keys]  # [1,O,I,kh,kw] -> I
    shape.append(int(sd[keys[-1]].shape[1]))
    return tuple(shape)


# ---------------------------------------------------------------------------
# Discriminator
# ---------------------------------------------------------------------------


def convert_discriminator(
    sd: Dict[str, np.ndarray], size: int
) -> Dict[str, Any]:
    """Reference Discriminator (stylegan2.py:762-820) -> flax variables.

    convs.0 -> from_rgb; convs.{i>=1} -> res_{size/2^(i-1)}; final_conv;
    final_linear.0/.1 -> final_linear0/1 (with the NCHW->NHWC flatten
    permutation on final_linear0's input dimension)."""
    sd = _strip_module(sd)
    params: Dict[str, Any] = {}
    log_size = int(math.log2(size))

    def conv_layer(dst, src):
        _set(params, f"{dst}/conv/weight", _conv(sd[f"{src}.0.weight"]))
        if f"{src}.1.bias" in sd:
            _set(params, f"{dst}/activate/bias", sd[f"{src}.1.bias"])

    def conv_layer_blur(dst, src):
        # Downsampling ConvLayer: [0]=Blur, [1]=EqualConv2d, [2]=activate.
        _set(params, f"{dst}/conv/weight", _conv(sd[f"{src}.1.weight"]))
        if f"{src}.2.bias" in sd:
            _set(params, f"{dst}/activate/bias", sd[f"{src}.2.bias"])

    conv_layer("from_rgb", "convs.0")
    n_res = log_size - 2
    for i in range(1, n_res + 1):
        res_name = f"res_{2 ** (log_size - i + 1)}"
        src = f"convs.{i}"
        conv_layer(f"{res_name}/conv1", f"{src}.conv1")
        conv_layer_blur(f"{res_name}/conv2", f"{src}.conv2")
        _set(
            params,
            f"{res_name}/skip/conv/weight",
            _conv(sd[f"{src}.skip.1.weight"]),
        )

    conv_layer("final_conv", "final_conv")
    # final_linear.0: [512, C*4*4] over NCHW flatten -> NHWC (H,W,C) flatten.
    w0 = sd["final_linear.0.weight"]  # [out, C*16]
    c = w0.shape[1] // 16
    w0 = w0.reshape(w0.shape[0], c, 4, 4)
    w0 = np.transpose(w0, (0, 2, 3, 1)).reshape(w0.shape[0], -1)
    _set(params, "final_linear0/weight", _linear(w0))
    _set(params, "final_linear0/bias", sd["final_linear.0.bias"])
    _set(params, "final_linear1/weight", _linear(sd["final_linear.1.weight"]))
    _set(params, "final_linear1/bias", sd["final_linear.1.bias"])
    return {"params": params}


# ---------------------------------------------------------------------------
# ResNet-18 encoders (E_Tsr / E_W)
# ---------------------------------------------------------------------------


def convert_resnet18_encoder(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """torchvision-style ResNet18 (resnet_encoder.py:152-311) -> flax."""
    sd = _strip_module(sd)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def bn(dst, src):
        p, s = _bn(sd, src)
        _set(params, f"{dst}/scale", p["scale"])
        _set(params, f"{dst}/bias", p["bias"])
        _set(stats, f"{dst}/mean", s["mean"])
        _set(stats, f"{dst}/var", s["var"])

    _set(params, "conv1/kernel", _conv(sd["conv1.weight"]))
    bn("bn1", "bn1")
    for li in range(1, 5):
        for bi in range(2):
            dst = f"layer{li}_{bi}"
            src = f"layer{li}.{bi}"
            _set(params, f"{dst}/conv1/kernel", _conv(sd[f"{src}.conv1.weight"]))
            bn(f"{dst}/bn1", f"{src}.bn1")
            _set(params, f"{dst}/conv2/kernel", _conv(sd[f"{src}.conv2.weight"]))
            bn(f"{dst}/bn2", f"{src}.bn2")
            if f"{src}.downsample.0.weight" in sd:
                _set(
                    params,
                    f"{dst}/downsample_conv/kernel",
                    _conv(sd[f"{src}.downsample.0.weight"]),
                )
                bn(f"{dst}/downsample_bn", f"{src}.downsample.1")
    if "ten_fc.weight" in sd:
        # 512*4*4 flatten: NCHW -> NHWC permutation.
        w = sd["ten_fc.weight"].reshape(-1, 512, 4, 4)
        w = np.transpose(w, (0, 2, 3, 1)).reshape(w.shape[0], -1)
        _set(params, "ten_fc/kernel", _linear(w))
        _set(params, "ten_fc/bias", sd["ten_fc.bias"])
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# pSp GradualStyleEncoder (E_W+)
# ---------------------------------------------------------------------------


def convert_psp_encoder(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """pSp GradualStyleEncoder (psp_encoders.py:44-132) -> flax."""
    sd = _strip_module(sd)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def bn(dst, src):
        p, s = _bn(sd, src)
        _set(params, f"{dst}/scale", p["scale"])
        _set(params, f"{dst}/bias", p["bias"])
        _set(stats, f"{dst}/mean", s["mean"])
        _set(stats, f"{dst}/var", s["var"])

    _set(params, "input_conv/kernel", _conv(sd["input_layer.0.weight"]))
    bn("input_bn", "input_layer.1")
    _set(params, "input_prelu/alpha", sd["input_layer.2.weight"])

    body_idx = 0
    while f"body.{body_idx}.res_layer.1.weight" in sd:
        dst = f"body_{body_idx}"
        src = f"body.{body_idx}"
        if f"{src}.shortcut_layer.0.weight" in sd:
            _set(
                params,
                f"{dst}/shortcut_conv/kernel",
                _conv(sd[f"{src}.shortcut_layer.0.weight"]),
            )
            bn(f"{dst}/shortcut_bn", f"{src}.shortcut_layer.1")
        bn(f"{dst}/bn0", f"{src}.res_layer.0")
        _set(params, f"{dst}/conv1/kernel", _conv(sd[f"{src}.res_layer.1.weight"]))
        _set(params, f"{dst}/prelu/alpha", sd[f"{src}.res_layer.2.weight"])
        _set(params, f"{dst}/conv2/kernel", _conv(sd[f"{src}.res_layer.3.weight"]))
        bn(f"{dst}/bn2", f"{src}.res_layer.4")
        if f"{src}.res_layer.5.fc1.weight" in sd:
            _set(
                params,
                f"{dst}/se/fc1/kernel",
                _conv(sd[f"{src}.res_layer.5.fc1.weight"]),
            )
            _set(
                params,
                f"{dst}/se/fc2/kernel",
                _conv(sd[f"{src}.res_layer.5.fc2.weight"]),
            )
        body_idx += 1

    style_idx = 0
    while f"styles.{style_idx}.linear.weight" in sd:
        dst = f"style_{style_idx}"
        src = f"styles.{style_idx}"
        ci = 0
        while f"{src}.convs.{2 * ci}.weight" in sd:
            _set(
                params,
                f"{dst}/conv{ci}/kernel",
                _conv(sd[f"{src}.convs.{2 * ci}.weight"]),
            )
            _set(params, f"{dst}/conv{ci}/bias", sd[f"{src}.convs.{2 * ci}.bias"])
            ci += 1
        _set(params, f"{dst}/linear/weight", _linear(sd[f"{src}.linear.weight"]))
        _set(params, f"{dst}/linear/bias", sd[f"{src}.linear.bias"])
        style_idx += 1

    for lat in ("latlayer1", "latlayer2"):
        _set(params, f"{lat}/kernel", _conv(sd[f"{lat}.weight"]))
        _set(params, f"{lat}/bias", sd[f"{lat}.bias"])
    return {"params": params, "batch_stats": stats}


def convert_ir_backbone(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """IR/IR-SE recognition Backbone (model_irse.py:18-57) -> flax.

    output_layer = [BatchNorm2d, Dropout, Flatten, Linear, BatchNorm1d]
    (model_irse.py:32-43); BatchNorm1d may be affine=False (IR_50 etc.), in
    which case only running stats exist.  The Linear needs no NCHW-flatten
    reorder because the flax Backbone transposes to NCHW before flattening.
    """
    sd = _strip_module(sd)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def bn(dst, src):
        if f"{src}.weight" in sd:
            _set(params, f"{dst}/scale", sd[f"{src}.weight"])
            _set(params, f"{dst}/bias", sd[f"{src}.bias"])
        _set(stats, f"{dst}/mean", sd[f"{src}.running_mean"])
        _set(stats, f"{dst}/var", sd[f"{src}.running_var"])

    _set(params, "input_conv/kernel", _conv(sd["input_layer.0.weight"]))
    bn("input_bn", "input_layer.1")
    _set(params, "input_prelu/alpha", sd["input_layer.2.weight"])

    body_idx = 0
    while f"body.{body_idx}.res_layer.1.weight" in sd:
        dst = f"body_{body_idx}"
        src = f"body.{body_idx}"
        if f"{src}.shortcut_layer.0.weight" in sd:
            _set(
                params,
                f"{dst}/shortcut_conv/kernel",
                _conv(sd[f"{src}.shortcut_layer.0.weight"]),
            )
            bn(f"{dst}/shortcut_bn", f"{src}.shortcut_layer.1")
        bn(f"{dst}/bn0", f"{src}.res_layer.0")
        _set(params, f"{dst}/conv1/kernel", _conv(sd[f"{src}.res_layer.1.weight"]))
        _set(params, f"{dst}/prelu/alpha", sd[f"{src}.res_layer.2.weight"])
        _set(params, f"{dst}/conv2/kernel", _conv(sd[f"{src}.res_layer.3.weight"]))
        bn(f"{dst}/bn2", f"{src}.res_layer.4")
        if f"{src}.res_layer.5.fc1.weight" in sd:
            _set(
                params,
                f"{dst}/se/fc1/kernel",
                _conv(sd[f"{src}.res_layer.5.fc1.weight"]),
            )
            _set(
                params,
                f"{dst}/se/fc2/kernel",
                _conv(sd[f"{src}.res_layer.5.fc2.weight"]),
            )
        body_idx += 1

    bn("output_bn", "output_layer.0")
    _set(params, "output_fc/kernel", _linear(sd["output_layer.3.weight"]))
    _set(params, "output_fc/bias", sd["output_layer.3.bias"])
    bn("output_bn1d", "output_layer.4")
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# ArcFace ResNetFace-18
# ---------------------------------------------------------------------------


def convert_arcface(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """ResNetFace(IRBlock,[2,2,2,2]) (resnet_face_recognition.py:170-230)."""
    sd = _strip_module(sd)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def bn(dst, src):
        p, s = _bn(sd, src)
        _set(params, f"{dst}/scale", p["scale"])
        _set(params, f"{dst}/bias", p["bias"])
        _set(stats, f"{dst}/mean", s["mean"])
        _set(stats, f"{dst}/var", s["var"])

    _set(params, "conv1/kernel", _conv(sd["conv1.weight"]))
    bn("bn1", "bn1")
    _set(params, "prelu/alpha", sd["prelu.weight"])
    for li in range(1, 5):
        for bi in range(2):
            dst = f"layer{li}_{bi}"
            src = f"layer{li}.{bi}"
            bn(f"{dst}/bn0", f"{src}.bn0")
            _set(params, f"{dst}/conv1/kernel", _conv(sd[f"{src}.conv1.weight"]))
            bn(f"{dst}/bn1", f"{src}.bn1")
            _set(params, f"{dst}/prelu/alpha", sd[f"{src}.prelu.weight"])
            _set(params, f"{dst}/conv2/kernel", _conv(sd[f"{src}.conv2.weight"]))
            bn(f"{dst}/bn2", f"{src}.bn2")
            if f"{src}.downsample.0.weight" in sd:
                _set(
                    params,
                    f"{dst}/downsample_conv/kernel",
                    _conv(sd[f"{src}.downsample.0.weight"]),
                )
                bn(f"{dst}/downsample_bn", f"{src}.downsample.1")
    bn("bn4", "bn4")
    # fc5 consumes an NCHW flatten; ResNetFace18 transposes to NCHW before
    # flattening, so the weight ports directly.
    _set(params, "fc5/kernel", _linear(sd["fc5.weight"]))
    _set(params, "fc5/bias", sd["fc5.bias"])
    bn("bn5", "bn5")
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# LPIPS (VGG16 + linear heads)
# ---------------------------------------------------------------------------

_VGG_TORCHVISION_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


def convert_lpips(
    heads_sd: Dict[str, np.ndarray],
    backbone_sd: Optional[Dict[str, np.ndarray]] = None,
    lpips_params: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """LPIPS v0.1 linear heads (+ optional torchvision VGG16 backbone) ->
    fm3dgan.models.lpips.LPIPS variables.

    heads_sd keys: lin{k}.model.1.weight [1,C,1,1] (networks_basic.py:113-120).
    backbone_sd keys: features.{idx}.weight/bias (torchvision VGG16).
    lpips_params: existing random-init variables to fill (required when
    backbone_sd is None so the backbone stays random-init)."""
    params: Dict[str, Any] = (
        {} if lpips_params is None else dict(lpips_params["params"])
    )
    for k in range(5):
        key = f"lin{k}.model.1.weight"
        if key not in heads_sd:
            key = f"lin{k}.weight"
        params[f"lin{k}"] = np.asarray(heads_sd[key]).reshape(-1)
    if backbone_sd is not None:
        net = {}
        for ci, idx in enumerate(_VGG_TORCHVISION_CONV_IDX):
            net[f"conv{ci}"] = {
                "kernel": _conv(backbone_sd[f"features.{idx}.weight"]),
                "bias": backbone_sd[f"features.{idx}.bias"],
            }
        params["net"] = net
    return {"params": params}
