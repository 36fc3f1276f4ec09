"""FID InceptionV3 (pool3 features), NHWC.

Parity with /root/reference/Evaluation/inception.py:25-199 — the pytorch-fid
port of the TF-FID InceptionV3: torchvision InceptionV3 topology with the FID
patches (InceptionA/C/E avg-pools exclude padding; the last InceptionE uses a
max pool), returning 2048-dim pool3 features.  Instantiated for eval as
``normalize_input=False`` with inputs already in [-1,1]
(Evaluation/calc_inception.py:59-65), optional internal bilinear resize to
299 (inception.py:155-159).

Weights: load the pytorch-fid checkpoint via
fm3dgan.compat.torch_port-style conversion (convert_fid_inception below);
without weights the features are random-init (FID values then only comparable
within this framework).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

Dtype = Any


def avg_pool_no_pad_count(x, window: int, stride: int = 1, padding: int = 0):
    """AvgPool with count_include_pad=False (the TF/FID convention)."""
    sums = lax.reduce_window(
        x,
        0.0,
        lax.add,
        (1, window, window, 1),
        (1, stride, stride, 1),
        [(0, 0), (padding, padding), (padding, padding), (0, 0)],
    )
    ones = jnp.ones_like(x[..., :1])
    counts = lax.reduce_window(
        ones,
        0.0,
        lax.add,
        (1, window, window, 1),
        (1, stride, stride, 1),
        [(0, 0), (padding, padding), (padding, padding), (0, 0)],
    )
    return sums / counts


class BasicConv2d(nn.Module):
    out_channels: int
    kernel: Sequence[int]
    stride: int = 1
    padding: Any = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        elif isinstance(pad, tuple) and isinstance(pad[0], int):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        x = nn.Conv(
            self.out_channels,
            tuple(self.kernel),
            strides=(self.stride, self.stride),
            padding=pad,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=1e-3, dtype=self.dtype, name="bn"
        )(x)
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1", dtype=self.dtype)(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1", dtype=self.dtype)(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, name="branch5x5_2", dtype=self.dtype)(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1", dtype=self.dtype)(x)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2", dtype=self.dtype)(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_3", dtype=self.dtype)(b3)
        # FID patch: avg pool excludes padding (inception.py FIDInceptionA).
        bp = avg_pool_no_pad_count(x, 3, 1, 1)
        bp = BasicConv2d(
            self.pool_features, (1, 1), name="branch_pool", dtype=self.dtype
        )(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3", dtype=self.dtype)(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1", dtype=self.dtype)(x)
        bd = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2", dtype=self.dtype)(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3", dtype=self.dtype)(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1", dtype=self.dtype)(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1", dtype=self.dtype)(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2", dtype=self.dtype)(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3", dtype=self.dtype)(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1", dtype=self.dtype)(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2", dtype=self.dtype)(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3", dtype=self.dtype)(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4", dtype=self.dtype)(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5", dtype=self.dtype)(bd)
        bp = avg_pool_no_pad_count(x, 3, 1, 1)  # FID patch
        bp = BasicConv2d(192, (1, 1), name="branch_pool", dtype=self.dtype)(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1", dtype=self.dtype)(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2", dtype=self.dtype)(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1", dtype=self.dtype)(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2", dtype=self.dtype)(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3", dtype=self.dtype)(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4", dtype=self.dtype)(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    use_max_pool: bool = False  # FID patch: last block pools with max
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1", dtype=self.dtype)(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1", dtype=self.dtype)(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a", dtype=self.dtype)(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b", dtype=self.dtype)(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1", dtype=self.dtype)(x)
        bd = BasicConv2d(384, (3, 3), padding=1, name="branch3x3dbl_2", dtype=self.dtype)(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a", dtype=self.dtype)(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b", dtype=self.dtype)(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.use_max_pool:
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        else:
            bp = avg_pool_no_pad_count(x, 3, 1, 1)
        bp = BasicConv2d(192, (1, 1), name="branch_pool", dtype=self.dtype)(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Pool3(nn.Module):
    """Images [N,H,W,3] -> [N,2048] pool3 features.

    normalize_input=False convention: inputs already in [-1,1]
    (calc_inception.py:63).  resize_input resizes to 299 bilinear
    (align_corners=False, matching F.interpolate defaults, inception.py:155-159).
    """

    resize_input: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.resize_input and (x.shape[1] != 299 or x.shape[2] != 299):
            x = jax.image.resize(
                x, (x.shape[0], 299, 299, x.shape[3]), method="bilinear"
            )
        c = lambda *a, **k: BasicConv2d(*a, dtype=self.dtype, **k)
        x = c(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = c(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = c(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = c(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = c(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, name="Mixed_5b", dtype=self.dtype)(x)
        x = InceptionA(64, name="Mixed_5c", dtype=self.dtype)(x)
        x = InceptionA(64, name="Mixed_5d", dtype=self.dtype)(x)
        x = InceptionB(name="Mixed_6a", dtype=self.dtype)(x)
        x = InceptionC(128, name="Mixed_6b", dtype=self.dtype)(x)
        x = InceptionC(160, name="Mixed_6c", dtype=self.dtype)(x)
        x = InceptionC(160, name="Mixed_6d", dtype=self.dtype)(x)
        x = InceptionC(192, name="Mixed_6e", dtype=self.dtype)(x)
        x = InceptionD(name="Mixed_7a", dtype=self.dtype)(x)
        x = InceptionE(name="Mixed_7b", dtype=self.dtype)(x)
        x = InceptionE(use_max_pool=True, name="Mixed_7c", dtype=self.dtype)(x)
        return jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> [N, 2048]


def convert_fid_inception(sd: Dict[str, Any]) -> Dict[str, Any]:
    """pytorch-fid InceptionV3 state dict -> InceptionV3Pool3 variables."""
    import re

    import numpy as np

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def _set(tree, path, value):
        node = tree
        keys = path.split("/")
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = np.asarray(value)

    for k, v in sd.items():
        if k.endswith("num_batches_tracked") or k.startswith(("fc.", "AuxLogits")):
            continue
        m = re.match(r"(.+)\.(conv|bn)\.(weight|bias|running_mean|running_var)$", k)
        if not m:
            continue
        mod, sub, leaf = m.groups()
        mod = mod.replace(".", "/")
        if sub == "conv" and leaf == "weight":
            _set(params, f"{mod}/conv/kernel", np.transpose(v, (2, 3, 1, 0)))
        elif sub == "bn":
            if leaf == "weight":
                _set(params, f"{mod}/bn/scale", v)
            elif leaf == "bias":
                _set(params, f"{mod}/bn/bias", v)
            elif leaf == "running_mean":
                _set(stats, f"{mod}/bn/mean", v)
            elif leaf == "running_var":
                _set(stats, f"{mod}/bn/var", v)
    return {"params": params, "batch_stats": stats}
