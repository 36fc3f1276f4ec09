"""Shared helpers for golden-parity tests against the reference torch code.

The reference's stylegan2.py imports ``from op import FusedLeakyReLU,
fused_leaky_relu, upfirdn2d`` which JIT-compiles CUDA at import time;
``make_op_stub`` registers a torch ``op`` module implementing the reference's
*documented CPU-fallback semantics* (op/fused_act.py:113-128:
leaky_relu(x + bias.view(1,C,1..)) * scale; op/upfirdn2d.py:168-209:
zero-stuff by up, pad incl. negative pads, conv with the flipped kernel,
stride-slice by down) so the reference imports CUDA-free.  The stub is a
fresh reimplementation of those semantics, not a copy.
"""

import contextlib
import importlib.util
import sys
import types

import numpy as np

REF = "/root/reference"


def make_op_stub(torch):
    """Torch module exposing the three symbols stylegan2.py imports, with the
    reference CPU-fallback semantics (reimplemented)."""
    F = torch.nn.functional
    mod = types.ModuleType("op")

    def fused_leaky_relu(input, bias=None, negative_slope=0.2,
                         scale=2 ** 0.5):
        if bias is not None:
            rest = [1] * (input.ndim - 2)
            input = input + bias.view(1, bias.shape[0], *rest)
        return F.leaky_relu(input, negative_slope) * scale

    class FusedLeakyReLU(torch.nn.Module):
        def __init__(self, channel, negative_slope=0.2, scale=2 ** 0.5):
            super().__init__()
            self.bias = torch.nn.Parameter(torch.zeros(channel))
            self.negative_slope = negative_slope
            self.scale = scale

        def forward(self, x):
            return fused_leaky_relu(
                x, self.bias, self.negative_slope, self.scale
            )

    def upfirdn2d(input, kernel, up=1, down=1, pad=(0, 0)):
        n, c, h, w = input.shape
        x = input.reshape(n * c, 1, h, w)
        if up > 1:
            z = x.new_zeros(n * c, 1, h * up, w * up)
            z[:, :, ::up, ::up] = x
            x = z
        p0, p1 = pad
        x = F.pad(x, (max(p0, 0), max(p1, 0), max(p0, 0), max(p1, 0)))
        x = x[
            :, :,
            max(-p0, 0): x.shape[2] - max(-p1, 0),
            max(-p0, 0): x.shape[3] - max(-p1, 0),
        ]
        k = torch.flip(kernel, [0, 1]).reshape(1, 1, *kernel.shape)
        x = F.conv2d(x, k)
        x = x[:, :, ::down, ::down]
        return x.reshape(n, c, x.shape[2], x.shape[3])

    mod.fused_leaky_relu = fused_leaky_relu
    mod.FusedLeakyReLU = FusedLeakyReLU
    mod.upfirdn2d = upfirdn2d
    return mod


@contextlib.contextmanager
def ref_stylegan2(torch, with_network_util=False):
    """Import the reference stylegan2.py (and optionally Util/network_util.py)
    CUDA-free.  Yields a namespace with .sg2 (and .network_util).

    network_util additionally needs a torchvision stub (absent from this
    environment; only ``utils.make_grid`` is referenced, by code paths these
    tests don't hit) and the real reference ``stylegan2`` importable by name.
    """
    saved = {
        name: sys.modules.get(name)
        for name in ("op", "stylegan2", "torchvision", "ref_network_util")
    }
    path_added = REF not in sys.path
    sys.modules["op"] = make_op_stub(torch)
    if path_added:
        sys.path.insert(0, REF)
    try:
        spec = importlib.util.spec_from_file_location(
            "stylegan2", f"{REF}/stylegan2.py"
        )
        sg2 = importlib.util.module_from_spec(spec)
        sys.modules["stylegan2"] = sg2
        spec.loader.exec_module(sg2)
        ns = types.SimpleNamespace(torch=torch, sg2=sg2)
        if with_network_util:
            tv = types.ModuleType("torchvision")
            tv.utils = types.ModuleType("torchvision.utils")
            tv.utils.make_grid = None
            sys.modules["torchvision"] = tv
            nu_spec = importlib.util.spec_from_file_location(
                "ref_network_util", f"{REF}/Util/network_util.py"
            )
            nu = importlib.util.module_from_spec(nu_spec)
            nu_spec.loader.exec_module(nu)
            ns.network_util = nu
        yield ns
    finally:
        for name, mod in saved.items():
            if mod is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = mod
        if path_added and REF in sys.path:
            sys.path.remove(REF)


def sd_numpy(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def grads_numpy(model):
    """named_parameters() -> {name: grad} for params that received one."""
    return {
        k: p.grad.detach().cpu().numpy()
        for k, p in model.named_parameters()
        if p.grad is not None
    }


def grads_numpy_padded(model):
    """state_dict-shaped gradient dict: params whose torch grad is None
    (disconnected from the loss, e.g. a bias under an input-gradient penalty)
    and non-param buffers map to zeros, so the weight-layout converters —
    which expect every state_dict key — can be reused for gradients."""
    grads = {k: p.grad for k, p in model.named_parameters()}
    out = {}
    for k, v in model.state_dict().items():
        g = grads.get(k)
        out[k] = (
            g.detach().cpu().numpy()
            if g is not None
            else np.zeros_like(v.detach().cpu().numpy())
        )
    return out


def nchw(x_nhwc):
    # .copy() normalizes strides: for size-1 dims numpy keeps the transposed
    # strides, which torch reads as channels_last and `.view` flatten rejects.
    return np.transpose(x_nhwc, (0, 3, 1, 2)).copy()


def noise_arrays(size, rng):
    """Per-layer generator noise, shapes from stylegan2.py:532-538 (layer l
    at resolution 2**((l+5)//2))."""
    import math

    log_size = int(math.log2(size))
    num_layers = (log_size - 2) * 2 + 1
    out = [rng.normal(0, 1, (1, 1, 4, 4)).astype(np.float32)]
    for l in range(1, num_layers):
        res = 2 ** ((l + 5) // 2)
        out.append(rng.normal(0, 1, (1, 1, res, res)).astype(np.float32))
    return out
