"""2-encoder co-modulation pipeline + generator introspection utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fm3dgan.models import Generator
from fm3dgan.models.psp_encoder import GradualStyleEncoder
from fm3dgan.models.resnet_encoder import ResNet18Encoder
from fm3dgan.pipeline import forward_2_encoder
from fm3dgan.pipeline.introspect import (
    get_generator_effective_weights,
    get_generator_styles,
    get_layer_output,
    get_network_shape,
)

SIZE = 16


@pytest.fixture(scope="module")
def small_gen():
    g = Generator(size=SIZE, style_dim=64, n_mlp=2)
    vs = jax.jit(g.init)(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, 64)),
    )
    return g, vs


def test_get_network_shape(small_gen):
    g, vs = small_gen
    shape = get_network_shape(vs["params"])
    # size 16 -> net_shape (512, 512, 512, 512, 512, 512): conv1 + 2 up-pairs.
    assert shape == [512, 512, 512, 512, 512, 512]


def test_get_layer_output(small_gen):
    g, vs = small_gen
    z = jnp.asarray(np.random.RandomState(0).randn(2, 64).astype(np.float32))
    const = get_layer_output(g, vs, z, 0)
    assert const.shape == (2, 4, 4, 512)
    out1 = get_layer_output(g, vs, z, 1)
    assert out1.shape == (2, 4, 4, 512)
    out2 = get_layer_output(g, vs, z, 2)
    assert out2.shape == (2, 8, 8, 512)  # first upsample conv


def test_effective_weights_demodulated(small_gen):
    g, vs = small_gen
    z = jnp.asarray(np.random.RandomState(1).randn(1, 64).astype(np.float32))
    eff = get_generator_effective_weights(g, vs, z)
    assert len(eff) == 5  # conv1 + 4 convs
    for w in eff:
        # Demodulation: each output filter has (approx) unit L2 norm.
        norms = np.sqrt(np.sum(w**2, axis=(0, 1, 2)))
        np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_get_generator_styles(small_gen):
    g, vs = small_gen
    z = jnp.asarray(np.random.RandomState(2).randn(2, 64).astype(np.float32))
    styles = get_generator_styles(g, vs, z)
    assert len(styles) == 1 + 2 * (g.log_size - 2) + 1
    assert styles[0].shape == (2, 512)


def test_forward_2_encoder_modes():
    # Tiny stack: 128px encoders, 8px generator.
    gen = Generator(size=8, style_dim=512, n_mlp=1)
    e_tsr = ResNet18Encoder(tensor_encoding=True)
    e_w = ResNet18Encoder(tensor_encoding=False)
    rng = np.random.RandomState(0)
    photo = jnp.asarray(rng.randn(1, 128, 128, 3).astype(np.float32))
    render = jnp.asarray(rng.randn(1, 128, 128, 3).astype(np.float32))
    variables = {
        "tensor_encoder": jax.jit(e_tsr.init)(jax.random.PRNGKey(0), photo),
        "modulation_encoder": jax.jit(e_w.init)(jax.random.PRNGKey(1), photo),
        "g": jax.jit(gen.init)(
            {"params": jax.random.PRNGKey(2), "noise": jax.random.PRNGKey(3)},
            jnp.zeros((1, 512)),
        ),
    }
    # Plain mode (no co-modulation): tensor from photo, W from render.
    img, _ = forward_2_encoder(
        e_tsr, e_w, gen, variables, photo, render, mod_encode="Render Image"
    )
    assert img.shape == (1, 8, 8, 3)

    # Multiplication co-modulation: W-vector encoder x W+ codes.
    e_wp = GradualStyleEncoder(num_layers=18, n_styles=4, input_size=128)
    variables2 = {
        "tensor_encoder": variables["modulation_encoder"],  # vector encoder
        "modulation_encoder": jax.jit(e_wp.init)(jax.random.PRNGKey(4), photo),
        "g": variables["g"],
    }
    img2, _ = forward_2_encoder(
        e_w, e_wp, gen, variables2, photo, render,
        co_modulation="Multiplication",
    )
    assert img2.shape == (1, 8, 8, 3)

    # Tensor Transform: tensor encoder returns (tensor, vector).
    e_tt = ResNet18Encoder(tensor_encoding=True, tensor_transform=True)
    variables3 = {
        "tensor_encoder": jax.jit(e_tt.init)(jax.random.PRNGKey(5), photo),
        "modulation_encoder": variables2["modulation_encoder"],
        "g": jax.jit(
            Generator(size=8, style_dim=1024, n_mlp=1).init
        )(
            {"params": jax.random.PRNGKey(6), "noise": jax.random.PRNGKey(7)},
            jnp.zeros((1, 1024)),
        ),
    }
    img3, _ = forward_2_encoder(
        e_tt,
        e_wp,
        Generator(size=8, style_dim=1024, n_mlp=1),
        variables3,
        photo,
        render,
        co_modulation="Tensor Transform",
    )
    assert img3.shape == (1, 8, 8, 3)
