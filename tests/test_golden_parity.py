"""Golden ACTIVATION parity tests: the reference's importable torch modules
(random weights, eval mode) run side-by-side with our flax modules through
the compat.torch_port converters — values, not just shapes.

Oracles are the actual reference modules, imported CUDA-free from
/root/reference (resnet_encoder.py:302, psp_encoders.py:44,
resnet_face_recognition.py:350).  The pSp import needs a tiny torch
EqualLinear stand-in for ``from stylegan2 import EqualLinear`` because
importing the reference stylegan2 JIT-compiles CUDA ops; the stand-in
reimplements the documented semantics (stylegan2.py:146-180).

LPIPS: the reference lpips package needs torchvision/skimage (absent), so
the oracle is a functional torch reimplementation of PNetLin
(networks_basic.py:36-110) over a hand-built torchvision-layout VGG16 —
run with the SHIPPED real linear heads (lpips/weights/v0.1/vgg.pth).

FID InceptionV3 golden parity is not feasible here: Evaluation/inception.py
imports torchvision (absent) and downloads weights (no egress).
"""

import math
import sys
import types

import jax
import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def ref_modules():
    import torch

    for p in (REF, f"{REF}/Util/arcface_pytorch"):
        if p not in sys.path:
            sys.path.insert(0, p)

    # Stand-in for `from stylegan2 import EqualLinear` (stylegan2.py:146-180;
    # GradualStyleBlock uses it without activation).
    class EqualLinear(torch.nn.Module):
        def __init__(self, in_dim, out_dim, bias=True, bias_init=0,
                     lr_mul=1, activation=None):
            super().__init__()
            self.weight = torch.nn.Parameter(
                torch.randn(out_dim, in_dim).div_(lr_mul)
            )
            self.bias = (
                torch.nn.Parameter(torch.zeros(out_dim).fill_(bias_init))
                if bias else None
            )
            self.scale = (1 / math.sqrt(in_dim)) * lr_mul
            self.lr_mul = lr_mul
            assert activation is None

        def forward(self, x):
            return torch.nn.functional.linear(
                x, self.weight * self.scale,
                bias=None if self.bias is None else self.bias * self.lr_mul,
            )

    stub = types.ModuleType("stylegan2")
    stub.EqualLinear = EqualLinear
    had = sys.modules.get("stylegan2")
    sys.modules["stylegan2"] = stub

    import resnet_encoder as ref_resnet  # noqa: E402
    import psp_encoder_model.encoders.psp_encoders as ref_psp  # noqa: E402
    import resnet_face_recognition as ref_arcface  # noqa: E402

    yield types.SimpleNamespace(
        torch=torch, resnet=ref_resnet, psp=ref_psp, arcface=ref_arcface
    )
    if had is None:
        sys.modules.pop("stylegan2", None)
    else:
        sys.modules["stylegan2"] = had


def _sd_numpy(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def _nchw(x_nhwc):
    # .copy() (not ascontiguousarray) to normalize strides: for size-1 dims
    # numpy keeps the transposed strides, which torch then reads as a
    # channels_last layout and the reference's `.view` flatten rejects.
    return np.transpose(x_nhwc, (0, 3, 1, 2)).copy()


@pytest.mark.parametrize("mode", ["tensor", "vector", "transform"])
def test_resnet18_encoder_golden(ref_modules, mode):
    torch = ref_modules.torch
    torch.manual_seed(0)
    from fm3dgan.compat.torch_port import convert_resnet18_encoder
    from fm3dgan.models.resnet_encoder import ResNet18Encoder

    kwargs = dict(
        tensor_encoding=mode in ("tensor", "transform"),
        tensor_transform=mode == "transform",
    )
    ref = ref_modules.resnet.resnet18(**kwargs).eval()
    variables = convert_resnet18_encoder(_sd_numpy(ref))
    ours = ResNet18Encoder(**kwargs)

    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, (2, 256, 256, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(_nchw(x)))
    out = jax.jit(lambda v, x: ours.apply(v, x))(variables, x)

    if mode == "tensor":
        np.testing.assert_allclose(
            np.asarray(out),
            np.transpose(ref_out.numpy(), (0, 2, 3, 1)),
            atol=2e-4, rtol=1e-3,
        )
    elif mode == "vector":
        np.testing.assert_allclose(
            np.asarray(out), ref_out.numpy(), atol=2e-4, rtol=1e-3
        )
    else:
        t_ref, v_ref = ref_out
        t, v = out
        np.testing.assert_allclose(
            np.asarray(t), np.transpose(t_ref.numpy(), (0, 2, 3, 1)),
            atol=2e-4, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(v), v_ref.numpy(), atol=2e-4, rtol=1e-3
        )


def test_psp_encoder_golden(ref_modules):
    torch = ref_modules.torch
    torch.manual_seed(1)
    from fm3dgan.compat.torch_port import convert_psp_encoder
    from fm3dgan.models.psp_encoder import GradualStyleEncoder

    opts = types.SimpleNamespace(input_nc=3, n_styles=14)
    ref = ref_modules.psp.GradualStyleEncoder(18, "ir_se", opts).eval()
    variables = convert_psp_encoder(_sd_numpy(ref))
    ours = GradualStyleEncoder(num_layers=18, mode="ir_se", n_styles=14,
                               input_size=256)

    rng = np.random.RandomState(1)
    x = rng.uniform(-1, 1, (2, 256, 256, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(_nchw(x))).numpy()  # [N,14,512]
    out = np.asarray(jax.jit(lambda v, x: ours.apply(v, x))(variables, x))
    np.testing.assert_allclose(out, ref_out, atol=5e-4, rtol=1e-3)


def test_arcface_golden(ref_modules):
    torch = ref_modules.torch
    torch.manual_seed(2)
    from fm3dgan.compat.torch_port import convert_arcface
    from fm3dgan.models.arcface import ResNetFace18

    ref = ref_modules.arcface.resnet_face18(use_se=False).eval()
    variables = convert_arcface(_sd_numpy(ref))
    ours = ResNetFace18(use_se=False)

    rng = np.random.RandomState(2)
    x = rng.uniform(-1, 1, (2, 128, 128, 1)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(_nchw(x))).numpy()  # [N,512]
    out = np.asarray(jax.jit(lambda v, x: ours.apply(v, x))(variables, x))
    np.testing.assert_allclose(out, ref_out, atol=5e-4, rtol=1e-3)


def test_ir50_backbone_golden(ref_modules):
    torch = ref_modules.torch
    torch.manual_seed(4)
    import psp_encoder_model.encoders.model_irse as ref_irse

    from fm3dgan.compat.torch_port import convert_ir_backbone
    from fm3dgan.models.psp_encoder import IR_50

    ref = ref_irse.IR_50(112).eval()
    variables = convert_ir_backbone(_sd_numpy(ref))
    ours = IR_50(112)

    rng = np.random.RandomState(4)
    x = rng.uniform(-1, 1, (2, 112, 112, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(_nchw(x))).numpy()  # [N,512] l2-normed
    out = np.asarray(jax.jit(lambda v, x: ours.apply(v, x))(variables, x))
    np.testing.assert_allclose(out, ref_out, atol=5e-4, rtol=1e-3)


def _build_torch_vgg16_features(torch):
    """torchvision VGG16 `.features` layout as a plain Sequential
    (pretrained_networks.py:106-147 slices it at relu indices
    4/9/16/23/30)."""
    nn = torch.nn
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers = []
    in_c = 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(in_c, v, 3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            in_c = v
    wrapper = nn.Module()
    wrapper.features = nn.Sequential(*layers)
    return wrapper


def _torch_lpips_oracle(torch, features, heads_sd, x0, x1):
    """Functional PNetLin forward (networks_basic.py:36-110): scaling layer,
    5 VGG slices, unit-normalize, squared diff, 1x1 head conv, spatial mean,
    sum over layers."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    slice_ends = (4, 9, 16, 23, 30)

    def slices(x):
        h = (x - shift) / scale
        outs = []
        start = 0
        for end in slice_ends:
            for layer in list(features.features)[start:end]:
                h = layer(h)
            outs.append(h)
            start = end
        return outs

    def unit_norm(t):
        n = torch.sqrt(torch.sum(t ** 2, dim=1, keepdim=True))
        return t / (n + 1e-10)

    f0, f1 = slices(x0), slices(x1)
    val = 0.0
    for k in range(5):
        diff = (unit_norm(f0[k]) - unit_norm(f1[k])) ** 2
        w = torch.from_numpy(
            np.asarray(heads_sd[f"lin{k}.model.1.weight"])
        ).float()  # [1,C,1,1]
        head = torch.nn.functional.conv2d(diff, w)
        val = val + head.mean(dim=(2, 3), keepdim=False)
    return val.reshape(-1)


def test_lpips_golden_with_shipped_heads(ref_modules):
    torch = ref_modules.torch
    torch.manual_seed(3)
    from fm3dgan.compat.torch_port import convert_lpips
    from fm3dgan.models.lpips import LPIPS

    heads_sd = {
        k: v.detach().cpu().numpy()
        for k, v in torch.load(
            f"{REF}/lpips/weights/v0.1/vgg.pth", map_location="cpu"
        ).items()
    }
    vgg = _build_torch_vgg16_features(torch).eval()
    variables = convert_lpips(heads_sd, backbone_sd=_sd_numpy(vgg))

    rng = np.random.RandomState(3)
    a = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref_val = _torch_lpips_oracle(
            torch, vgg, heads_sd,
            torch.from_numpy(_nchw(a)), torch.from_numpy(_nchw(b)),
        ).numpy()

    ours = LPIPS()
    val = np.asarray(
        jax.jit(lambda v, a, b: ours.apply(v, a, b))(variables, a, b)
    ).reshape(-1)
    np.testing.assert_allclose(val, ref_val, atol=1e-5, rtol=1e-4)
