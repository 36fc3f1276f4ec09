"""StyleGAN2 generator, NHWC / TPU-native.

Functional parity with the reference Generator
(/root/reference/stylegan2.py:407-688): mapping MLP, truncation, style mixing,
per-layer noise control, external input tensor (the 3D-FM-GAN E_Tsr injection
point, ``:628-632``), pruned/custom channel shapes via ``net_shape``
(``:461-527``), per-resolution RGB list and style-scalar returns.

Differences by design (TPU-first):
  * layouts are NHWC; modulated convs never materialize per-sample weights
    (see fm3dgan/nn/modulated.py).
  * noise is drawn from an explicit 'noise' PRNG stream instead of implicit
    ``new_empty().normal_()`` (``stylegan2.py:307-311``).
  * style mixing takes an explicit ``inject_index`` (host-side randomness);
    traced code cannot call ``random.randint`` (``stylegan2.py:620``).
  * the PPL forward lives in fm3dgan/losses/path_reg.py as a jax.vjp of this
    forward rather than autograd-inside-forward (``stylegan2.py:683-688``).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from fm3dgan.nn.layers import EqualLinear, PixelNorm
from fm3dgan.nn.modulated import ConstantInput, StyledConv, ToRGB

Dtype = Any


def channel_table(
    channel_multiplier: int = 2, width_mult: float = 1.0
) -> Dict[int, int]:
    """Per-resolution channel widths (stylegan2.py:441-451).

    width_mult uniformly scales every width (floor 4) — a smoke/dryrun knob
    with no reference counterpart: sharding and step semantics are
    width-independent, so tiny-width configs prove the multi-chip program
    cheaply.  Production (checkpoint-parity) configs use 1.0.
    """
    scale = lambda c: max(4, int(c * width_mult))
    return {
        4: scale(512),
        8: scale(512),
        16: scale(512),
        32: scale(512),
        64: scale(256 * channel_multiplier),
        128: scale(128 * channel_multiplier),
        256: scale(64 * channel_multiplier),
        512: scale(32 * channel_multiplier),
        1024: scale(16 * channel_multiplier),
    }


def default_net_shape(
    size: int, channel_multiplier: int = 2, width_mult: float = 1.0
) -> Tuple[int, ...]:
    """Flatten the channel table into the net_shape list layout the reference
    uses for checkpoint-shape-driven rebuilds (stylegan2.py:461-527):
    [const_in, conv1_out, (up_out, conv_out) per resolution 8..size]."""
    ch = channel_table(channel_multiplier, width_mult)
    log_size = int(math.log2(size))
    shape = [ch[4], ch[4]]
    for i in range(3, log_size + 1):
        shape += [ch[2**i], ch[2**i]]
    return tuple(shape)


class MappingNetwork(nn.Module):
    """PixelNorm + n_mlp EqualLinear(fused_lrelu, lr_mul) (stylegan2.py:430-439)."""

    style_dim: int = 512
    n_mlp: int = 8
    lr_mlp: float = 0.01
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        x = PixelNorm()(z)
        for i in range(self.n_mlp):
            x = EqualLinear(
                self.style_dim,
                lr_mul=self.lr_mlp,
                activation="fused_lrelu",
                dtype=self.dtype,
                name=f"fc{i}",
            )(x)
        return x


class Generator(nn.Module):
    """Synthesis + mapping. ``size`` must be a power of two >= 8."""

    size: int
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    lr_mlp: float = 0.01
    net_shape: Optional[Tuple[int, ...]] = None  # generator_net_shape
    width_mult: float = 1.0  # smoke/dryrun width scale (see channel_table)
    dtype: Dtype = jnp.float32

    @property
    def log_size(self) -> int:
        return int(math.log2(self.size))

    @property
    def n_latent(self) -> int:
        return self.log_size * 2 - 2

    @property
    def num_layers(self) -> int:
        return (self.log_size - 2) * 2 + 1

    def setup(self):
        shape = (
            tuple(self.net_shape)
            if self.net_shape is not None
            else default_net_shape(
                self.size, self.channel_multiplier, self.width_mult
            )
        )
        assert len(shape) == 2 * (self.log_size - 2) + 2, (shape, self.size)
        self._shape = shape

        self.style = MappingNetwork(
            self.style_dim, self.n_mlp, self.lr_mlp, dtype=self.dtype
        )
        self.input = ConstantInput(shape[0])
        self.conv1 = StyledConv(
            shape[1], 3, self.style_dim, blur_kernel=self.blur_kernel,
            dtype=self.dtype,
        )
        self.to_rgb1 = ToRGB(self.style_dim, upsample=False, dtype=self.dtype)

        convs = []
        to_rgbs = []
        for i in range(1, len(shape) // 2):
            convs.append(
                StyledConv(
                    shape[2 * i],
                    3,
                    self.style_dim,
                    upsample=True,
                    blur_kernel=self.blur_kernel,
                    dtype=self.dtype,
                )
            )
            convs.append(
                StyledConv(
                    shape[2 * i + 1],
                    3,
                    self.style_dim,
                    blur_kernel=self.blur_kernel,
                    dtype=self.dtype,
                )
            )
            to_rgbs.append(ToRGB(self.style_dim, dtype=self.dtype))
        self.convs = convs
        self.to_rgbs = to_rgbs

        # Fixed per-layer noise buffers for deterministic synthesis, the
        # counterpart of the reference's registered noise buffers
        # (stylegan2.py:474-477).  Stored in the 'noises' collection so they
        # ride along in checkpoints; initialized from a fixed key.
        self.noise_buffers = [
            self.variable(
                "noises",
                f"noise_{l}",
                lambda l=l: jax.random.normal(
                    jax.random.PRNGKey(l),
                    (1, 2 ** ((l + 5) // 2), 2 ** ((l + 5) // 2), 1),
                ),
            )
            for l in range(self.num_layers)
        ]

    # -- helpers ---------------------------------------------------------

    def get_latent(self, z):
        return self.style(z)

    def mean_latent(self, key, n_latent: int):
        """Mean mapped W over n_latent random z (stylegan2.py:540-547)."""
        z = jax.random.normal(key, (n_latent, self.style_dim))
        return jnp.mean(self.style(z), axis=0, keepdims=True)

    def make_noise(self, key):
        """Fixed per-layer noise pytree [1,H,W,1] (stylegan2.py:532-538)."""
        keys = jax.random.split(key, self.num_layers)
        noises = [jax.random.normal(keys[0], (1, 4, 4, 1))]
        idx = 1
        for i in range(3, self.log_size + 1):
            for _ in range(2):
                noises.append(
                    jax.random.normal(keys[idx], (1, 2**i, 2**i, 1))
                )
                idx += 1
        return noises

    # -- forward ---------------------------------------------------------

    def __call__(
        self,
        styles: Optional[Union[jax.Array, List[jax.Array]]] = None,
        *,
        input_is_latent: bool = False,
        latent_styles: Optional[List[jax.Array]] = None,
        inject_index: Optional[int] = None,
        truncation: float = 1.0,
        truncation_latent: Optional[jax.Array] = None,
        noise: Optional[List[Optional[jax.Array]]] = None,
        randomize_noise: bool = True,
        external_input_tensor: Optional[jax.Array] = None,
        return_rgb_list: bool = False,
        return_style_scalars: bool = False,
        return_latent: bool = False,
    ):
        """Synthesize images.

        styles: one z [N, D] / list of z to map; or (with input_is_latent)
          pass ``latent_styles``: list of W [N, D] or W+ [N, n_latent, D].
        external_input_tensor: [N, 4, 4, C0] replacing the constant input.
        noise: explicit per-layer noise list; otherwise drawn from the
          'noise' RNG stream when randomize_noise, else zeros (deterministic).
        """
        if input_is_latent:
            assert latent_styles is not None
            styles_list = list(latent_styles)
        else:
            if isinstance(styles, (list, tuple)):
                styles_list = [self.style(s) for s in styles]
            else:
                styles_list = [self.style(styles)]

        if noise is None:
            if randomize_noise:
                noise = [None] * self.num_layers
            else:
                noise = [buf.value for buf in self.noise_buffers]

        if truncation < 1.0:
            assert truncation_latent is not None
            styles_list = [
                truncation_latent + truncation * (s - truncation_latent)
                for s in styles_list
            ]

        if len(styles_list) < 2:
            if styles_list[0].ndim < 3:
                latent = jnp.repeat(
                    styles_list[0][:, None, :], self.n_latent, axis=1
                )
            else:
                latent = styles_list[0]
        else:
            assert inject_index is not None, (
                "style mixing needs an explicit inject_index (host randomness)"
            )
            l1 = jnp.repeat(styles_list[0][:, None, :], inject_index, axis=1)
            l2 = jnp.repeat(
                styles_list[1][:, None, :], self.n_latent - inject_index, axis=1
            )
            latent = jnp.concatenate([l1, l2], axis=1)

        if external_input_tensor is not None:
            out = external_input_tensor
        else:
            out = self.input(latent.shape[0])

        styles_scalars = []
        if return_style_scalars:
            out, s = self.conv1(
                out, latent[:, 0], noise=noise[0], return_style_scalars=True
            )
            styles_scalars.append(s)
        else:
            out = self.conv1(out, latent[:, 0], noise=noise[0])

        rgb_list = []
        skip = self.to_rgb1(out, latent[:, 1])
        rgb_list.append(skip)

        i = 1
        for idx in range(len(self.to_rgbs)):
            conv_up = self.convs[2 * idx]
            conv = self.convs[2 * idx + 1]
            n1 = noise[1 + 2 * idx]
            n2 = noise[2 + 2 * idx]
            to_rgb = self.to_rgbs[idx]
            if return_style_scalars:
                out, s = conv_up(
                    out, latent[:, i], noise=n1, return_style_scalars=True
                )
                styles_scalars.append(s)
                out, s = conv(
                    out, latent[:, i + 1], noise=n2, return_style_scalars=True
                )
                styles_scalars.append(s)
            else:
                out = conv_up(out, latent[:, i], noise=n1)
                out = conv(out, latent[:, i + 1], noise=n2)
            if return_style_scalars and (i + 3) == latent.shape[1]:
                skip, s = to_rgb(
                    out, latent[:, i + 2], skip, return_style_scalars=True
                )
                styles_scalars.append(s)
            else:
                skip = to_rgb(out, latent[:, i + 2], skip)
            rgb_list.append(skip)
            i += 2

        image = skip
        returns: Any = rgb_list if return_rgb_list else image
        if return_style_scalars:
            returns = (returns, styles_scalars)
        if return_latent:
            returns = (returns, latent) if not isinstance(returns, tuple) else (
                *returns,
                latent,
            )
        return returns
