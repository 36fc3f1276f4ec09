"""Generator introspection utilities.

Parity with /root/reference/Util/network_util.py:22-99,118-210:
conv-key/channel-shape readers for checkpoints, per-layer activation taps,
effective (post-modulation/demodulation) kernels, and style-scalar extraction.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def get_conv_kernel_keys(g_params: Dict[str, Any]) -> List[str]:
    """Main-flow conv weight paths (Get_Conv_Kernel_Key,
    network_util.py:22-37): conv1 then convs_0..N."""
    keys = ["conv1"]
    idx = 0
    while f"convs_{idx}" in g_params:
        keys.append(f"convs_{idx}")
        idx += 1
    return keys


def get_network_shape(g_params: Dict[str, Any]) -> List[int]:
    """Per-layer channel widths from conv weights (Get_Network_Shape,
    network_util.py:39-50).  HWIO: in-channels at axis 2."""
    keys = get_conv_kernel_keys(g_params)
    shape = [int(g_params[k]["conv"]["weight"].shape[2]) for k in keys]
    shape.append(int(g_params[keys[-1]]["conv"]["weight"].shape[3]))
    return shape


def get_layer_output(
    generator, g_variables, sample_z: jax.Array, layer_id: int
) -> np.ndarray:
    """Activation after layer `layer_id` in a noise=None manner
    (Get_Layer_Output, network_util.py:66-99): 0 = constant input,
    1 = conv1 output, k>1 = convs[k-2] output.  Returns NHWC numpy."""
    outs = {}

    def run(m):
        w = m.style(sample_z)
        out = m.input(sample_z.shape[0])
        outs[0] = out
        out = m.conv1(out, w, noise=jnp.zeros((1, 4, 4, 1)))
        outs[1] = out
        for i, conv in enumerate(m.convs):
            if i + 2 > layer_id:
                break
            sz = out.shape[1] * (2 if conv.upsample else 1)
            out = conv(out, w, noise=jnp.zeros((1, sz, sz, 1)))
            outs[i + 2] = out
        return out

    generator.apply(g_variables, method=run)
    return np.asarray(outs[layer_id])


def get_generator_effective_weights(
    generator, g_variables, sample_z: jax.Array
) -> List[np.ndarray]:
    """Post-modulation/demodulation kernels for one style vector
    (Get_Generator_Effective_Weights, network_util.py:118-168).

    Returns a list of [k, k, in, out] kernels (batch folded out, single z)."""
    g_params = g_variables["params"]
    w = generator.apply(
        g_variables, method=lambda m: m.get_latent(sample_z)
    )
    effective = []
    for key in get_conv_kernel_keys(g_params):
        node = g_params[key]["conv"]
        weight = np.asarray(node["weight"])  # HWIO
        kh, kw, cin, cout = weight.shape
        scale = 1.0 / math.sqrt(cin * kh * kw)
        mod_w = np.asarray(node["modulation"]["weight"])  # [D, cin]
        mod_b = np.asarray(node["modulation"]["bias"])
        d = mod_w.shape[0]
        s = np.asarray(w)[0] @ (mod_w / math.sqrt(d)) + mod_b  # [cin]
        wmod = scale * weight * s[None, None, :, None]
        demod = 1.0 / np.sqrt(np.sum(wmod**2, axis=(0, 1, 2)) + 1e-8)
        effective.append(wmod * demod[None, None, None, :])
    return effective


def get_generator_styles(
    generator, g_variables, sample_z: jax.Array
) -> List[np.ndarray]:
    """Per-layer modulation scalars (Get_Generator_Styles,
    network_util.py:171-210)."""
    _, scalars = generator.apply(
        g_variables,
        sample_z,
        return_style_scalars=True,
        randomize_noise=False,
    )
    return [np.asarray(s) for s in scalars]
