"""Checkpoint-converter round-trip tests.

For each model family: build flax variables via init, synthesize a
reference-layout torch state dict with the matching shapes (NCHW/OIHW, torch
key names), run the converter, and require the result to match the flax init
tree exactly in structure and shapes.  This pins the full key mapping without
needing real reference checkpoints (which are absent from the mount).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fm3dgan.compat import torch_port


def _tree_paths(tree, prefix=()):
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            out.update(_tree_paths(v, prefix + (k,)))
        return out
    return {prefix: np.shape(tree)}


def _assert_same_structure(converted, expected, collection):
    got = _tree_paths(converted.get(collection, {}))
    want = _tree_paths(expected.get(collection, {}))
    missing = set(want) - set(got)
    extra = set(got) - set(want)
    assert not missing, f"{collection}: converter missing {sorted(missing)[:8]}"
    assert not extra, f"{collection}: converter extra {sorted(extra)[:8]}"
    for k in want:
        assert got[k] == want[k], (k, got[k], want[k])


def _synth_generator_sd(size=16, style_dim=64, n_mlp=2, cm=2):
    """Torch-layout Generator state dict with reference key names
    (stylegan2.py:407-527)."""
    from fm3dgan.models.generator import default_net_shape

    shape = default_net_shape(size, cm)
    log_size = int(math.log2(size))
    sd = {}
    for i in range(1, n_mlp + 1):
        sd[f"style.{i}.weight"] = np.zeros((style_dim, style_dim), np.float32)
        sd[f"style.{i}.bias"] = np.zeros((style_dim,), np.float32)
    sd["input.input"] = np.zeros((1, shape[0], 4, 4), np.float32)

    def conv_block(prefix, cin, cout, k):
        sd[f"{prefix}.conv.weight"] = np.zeros((1, cout, cin, k, k), np.float32)
        sd[f"{prefix}.conv.modulation.weight"] = np.zeros(
            (cin, style_dim), np.float32
        )
        sd[f"{prefix}.conv.modulation.bias"] = np.zeros((cin,), np.float32)
        sd[f"{prefix}.noise.weight"] = np.zeros((1,), np.float32)
        sd[f"{prefix}.activate.bias"] = np.zeros((cout,), np.float32)

    def to_rgb(prefix, cin):
        sd[f"{prefix}.conv.weight"] = np.zeros((1, 3, cin, 1, 1), np.float32)
        sd[f"{prefix}.conv.modulation.weight"] = np.zeros(
            (cin, style_dim), np.float32
        )
        sd[f"{prefix}.conv.modulation.bias"] = np.zeros((cin,), np.float32)
        sd[f"{prefix}.bias"] = np.zeros((1, 3, 1, 1), np.float32)

    conv_block("conv1", shape[0], shape[1], 3)
    to_rgb("to_rgb1", shape[1])
    for i in range(1, len(shape) // 2):
        conv_block(f"convs.{2*i-2}", shape[2 * i - 1], shape[2 * i], 3)
        conv_block(f"convs.{2*i-1}", shape[2 * i], shape[2 * i + 1], 3)
        to_rgb(f"to_rgbs.{i-1}", shape[2 * i + 1])
    num_layers = (log_size - 2) * 2 + 1
    for l in range(num_layers):
        r = 2 ** ((l + 5) // 2)
        sd[f"noises.noise_{l}"] = np.zeros((1, 1, r, r), np.float32)
    return sd


def test_generator_converter_round_trip():
    from fm3dgan.models import Generator

    g = Generator(size=16, style_dim=64, n_mlp=2)
    expected = jax.eval_shape(
        lambda k: g.init({"params": k, "noise": k}, jnp.zeros((1, 64))),
        jax.random.PRNGKey(0),
    )
    sd = _synth_generator_sd()
    converted = torch_port.convert_generator(sd)
    _assert_same_structure(converted, expected, "params")
    _assert_same_structure(converted, expected, "noises")
    assert torch_port.infer_net_shape(sd) == tuple(
        __import__("fm3dgan.models.generator", fromlist=["default_net_shape"])
        .default_net_shape(16, 2)
    )


def test_discriminator_converter_round_trip():
    from fm3dgan.models import Discriminator
    from fm3dgan.models.generator import channel_table

    size = 16
    d = Discriminator(size=size)
    expected = jax.eval_shape(
        lambda k: d.init(k, jnp.zeros((1, size, size, 3))),
        jax.random.PRNGKey(0),
    )
    ch = channel_table(2)
    log_size = int(math.log2(size))
    sd = {}
    # convs.0: ConvLayer k1 (EqualConv2d + FusedLeakyReLU).
    sd["convs.0.0.weight"] = np.zeros((ch[size], 3, 1, 1), np.float32)
    sd["convs.0.1.bias"] = np.zeros((ch[size],), np.float32)
    in_ch = ch[size]
    for i, res in enumerate(range(log_size, 2, -1), start=1):
        out_ch = ch[2 ** (res - 1)]
        sd[f"convs.{i}.conv1.0.weight"] = np.zeros((in_ch, in_ch, 3, 3), np.float32)
        sd[f"convs.{i}.conv1.1.bias"] = np.zeros((in_ch,), np.float32)
        sd[f"convs.{i}.conv2.1.weight"] = np.zeros((out_ch, in_ch, 3, 3), np.float32)
        sd[f"convs.{i}.conv2.2.bias"] = np.zeros((out_ch,), np.float32)
        sd[f"convs.{i}.skip.1.weight"] = np.zeros((out_ch, in_ch, 1, 1), np.float32)
        in_ch = out_ch
    sd["final_conv.0.weight"] = np.zeros((ch[4], in_ch + 1, 3, 3), np.float32)
    sd["final_conv.1.bias"] = np.zeros((ch[4],), np.float32)
    sd["final_linear.0.weight"] = np.zeros((ch[4], ch[4] * 16), np.float32)
    sd["final_linear.0.bias"] = np.zeros((ch[4],), np.float32)
    sd["final_linear.1.weight"] = np.zeros((1, ch[4]), np.float32)
    sd["final_linear.1.bias"] = np.zeros((1,), np.float32)

    converted = torch_port.convert_discriminator(sd, size)
    _assert_same_structure(converted, expected, "params")


def _bn_sd(sd, prefix, c):
    sd[f"{prefix}.weight"] = np.zeros((c,), np.float32)
    sd[f"{prefix}.bias"] = np.zeros((c,), np.float32)
    sd[f"{prefix}.running_mean"] = np.zeros((c,), np.float32)
    sd[f"{prefix}.running_var"] = np.ones((c,), np.float32)


def test_resnet18_encoder_converter_round_trip():
    from fm3dgan.models.resnet_encoder import ResNet18Encoder

    enc = ResNet18Encoder(tensor_encoding=True)
    expected = jax.eval_shape(
        lambda k: enc.init(k, jnp.zeros((1, 256, 256, 3))),
        jax.random.PRNGKey(0),
    )
    sd = {}
    sd["conv1.weight"] = np.zeros((64, 3, 7, 7), np.float32)
    _bn_sd(sd, "bn1", 64)
    planes = [(64, 64), (64, 128), (128, 256), (256, 512)]
    for li, (cin, cout) in enumerate(planes, start=1):
        for bi in range(2):
            pin = cin if bi == 0 else cout
            p = f"layer{li}.{bi}"
            sd[f"{p}.conv1.weight"] = np.zeros((cout, pin, 3, 3), np.float32)
            _bn_sd(sd, f"{p}.bn1", cout)
            sd[f"{p}.conv2.weight"] = np.zeros((cout, cout, 3, 3), np.float32)
            _bn_sd(sd, f"{p}.bn2", cout)
            if bi == 0 and (cin != cout or li > 1):
                sd[f"{p}.downsample.0.weight"] = np.zeros(
                    (cout, pin, 1, 1), np.float32
                )
                _bn_sd(sd, f"{p}.downsample.1", cout)
    converted = torch_port.convert_resnet18_encoder(sd)
    _assert_same_structure(converted, expected, "params")
    _assert_same_structure(converted, expected, "batch_stats")


def test_arcface_converter_round_trip():
    from fm3dgan.models.arcface import ResNetFace18

    m = ResNetFace18(use_se=False)
    expected = jax.eval_shape(
        lambda k: m.init(k, jnp.zeros((1, 128, 128, 1))),
        jax.random.PRNGKey(0),
    )
    sd = {}
    sd["conv1.weight"] = np.zeros((64, 1, 3, 3), np.float32)
    _bn_sd(sd, "bn1", 64)
    sd["prelu.weight"] = np.zeros((1,), np.float32)
    planes = [(64, 64), (64, 128), (128, 256), (256, 512)]
    for li, (cin, cout) in enumerate(planes, start=1):
        for bi in range(2):
            pin = cin if bi == 0 else cout
            p = f"layer{li}.{bi}"
            _bn_sd(sd, f"{p}.bn0", pin)
            sd[f"{p}.conv1.weight"] = np.zeros((pin, pin, 3, 3), np.float32)
            _bn_sd(sd, f"{p}.bn1", pin)
            sd[f"{p}.prelu.weight"] = np.zeros((1,), np.float32)
            sd[f"{p}.conv2.weight"] = np.zeros((cout, pin, 3, 3), np.float32)
            _bn_sd(sd, f"{p}.bn2", cout)
            if bi == 0 and (pin != cout or li > 1):
                sd[f"{p}.downsample.0.weight"] = np.zeros(
                    (cout, pin, 1, 1), np.float32
                )
                _bn_sd(sd, f"{p}.downsample.1", cout)
    _bn_sd(sd, "bn4", 512)
    sd["fc5.weight"] = np.zeros((512, 512 * 8 * 8), np.float32)
    sd["fc5.bias"] = np.zeros((512,), np.float32)
    _bn_sd(sd, "bn5", 512)
    converted = torch_port.convert_arcface(sd)
    _assert_same_structure(converted, expected, "params")
    _assert_same_structure(converted, expected, "batch_stats")


def test_lpips_heads_converter():
    from fm3dgan.models.lpips import LPIPS, LPIPS_CHANNELS

    m = LPIPS()
    init_vars = jax.eval_shape(
        lambda k: m.init(k, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3))),
        jax.random.PRNGKey(0),
    )
    init_vars = jax.tree.map(lambda l: np.zeros(l.shape, l.dtype), init_vars)
    heads = {
        f"lin{k}.model.1.weight": np.full((1, c, 1, 1), 0.5, np.float32)
        for k, c in enumerate(LPIPS_CHANNELS)
    }
    converted = torch_port.convert_lpips(heads, None, init_vars)
    for k, c in enumerate(LPIPS_CHANNELS):
        assert converted["params"][f"lin{k}"].shape == (c,)
        np.testing.assert_allclose(converted["params"][f"lin{k}"], 0.5)


def test_psp_converter_round_trip():
    from fm3dgan.models.psp_encoder import GradualStyleEncoder, get_blocks

    enc = GradualStyleEncoder(num_layers=18, n_styles=10, input_size=256)
    expected = jax.eval_shape(
        lambda k: enc.init(k, jnp.zeros((1, 256, 256, 3))),
        jax.random.PRNGKey(0),
    )
    sd = {}
    sd["input_layer.0.weight"] = np.zeros((64, 3, 3, 3), np.float32)
    _bn_sd(sd, "input_layer.1", 64)
    sd["input_layer.2.weight"] = np.zeros((64,), np.float32)
    unit = 0
    for stage in get_blocks(18):
        for (cin, depth, stride) in stage:
            p = f"body.{unit}"
            if cin != depth:
                sd[f"{p}.shortcut_layer.0.weight"] = np.zeros(
                    (depth, cin, 1, 1), np.float32
                )
                _bn_sd(sd, f"{p}.shortcut_layer.1", depth)
            _bn_sd(sd, f"{p}.res_layer.0", cin)
            sd[f"{p}.res_layer.1.weight"] = np.zeros((depth, cin, 3, 3), np.float32)
            sd[f"{p}.res_layer.2.weight"] = np.zeros((depth,), np.float32)
            sd[f"{p}.res_layer.3.weight"] = np.zeros(
                (depth, depth, 3, 3), np.float32
            )
            _bn_sd(sd, f"{p}.res_layer.4", depth)
            sd[f"{p}.res_layer.5.fc1.weight"] = np.zeros(
                (depth // 16, depth, 1, 1), np.float32
            )
            sd[f"{p}.res_layer.5.fc2.weight"] = np.zeros(
                (depth, depth // 16, 1, 1), np.float32
            )
            unit += 1
    for j in range(10):
        spatial = 16 if j < 3 else (32 if j < 7 else 64)
        n_convs = int(math.log2(spatial))
        cin = 512
        for ci in range(n_convs):
            sd[f"styles.{j}.convs.{2*ci}.weight"] = np.zeros(
                (512, cin, 3, 3), np.float32
            )
            sd[f"styles.{j}.convs.{2*ci}.bias"] = np.zeros((512,), np.float32)
            cin = 512
        sd[f"styles.{j}.linear.weight"] = np.zeros((512, 512), np.float32)
        sd[f"styles.{j}.linear.bias"] = np.zeros((512,), np.float32)
    sd["latlayer1.weight"] = np.zeros((512, 256, 1, 1), np.float32)
    sd["latlayer1.bias"] = np.zeros((512,), np.float32)
    sd["latlayer2.weight"] = np.zeros((512, 128, 1, 1), np.float32)
    sd["latlayer2.bias"] = np.zeros((512,), np.float32)

    converted = torch_port.convert_psp_encoder(sd)
    _assert_same_structure(converted, expected, "params")
    _assert_same_structure(converted, expected, "batch_stats")
