"""Generator/Discriminator structural parity tests.

Parity figures from SURVEY.md §2.2: n_latent = 2*log2(size)-2 (=14 @256),
num_layers = 13 @256, channel table stylegan2.py:441-451.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fm3dgan.models import Discriminator, Generator, default_net_shape

SIZE = 32  # small power of two for fast CI; parity figures scale with log2


@pytest.fixture(scope="module")
def gen_and_params():
    g = Generator(size=SIZE, style_dim=64, n_mlp=2)
    z = jnp.ones((2, 64))
    params = g.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, z
    )
    return g, params


def test_generator_structure_parity():
    g256 = Generator(size=256)
    assert g256.n_latent == 14
    assert g256.num_layers == 13
    assert default_net_shape(256, 2) == (
        512, 512, 512, 512, 512, 512, 512, 512, 512, 512, 256, 256, 128, 128,
    )


def test_generator_forward_shapes(gen_and_params):
    g, params = gen_and_params
    z = jnp.asarray(np.random.RandomState(0).randn(2, 64).astype(np.float32))
    img = g.apply(params, z, rngs={"noise": jax.random.PRNGKey(2)})
    assert img.shape == (2, SIZE, SIZE, 3)


def test_generator_deterministic_noise(gen_and_params):
    g, params = gen_and_params
    # NoiseInjection weights init to zero (stylegan2.py:304) so noise is a
    # no-op at init; bump them to expose the noise path.
    params = jax.tree_util.tree_map_with_path(
        lambda path, x: x + 0.5
        if any(getattr(p, "key", None) == "noise" for p in path)
        else x,
        params,
    )
    z = jnp.asarray(np.random.RandomState(1).randn(2, 64).astype(np.float32))
    a = g.apply(params, z, randomize_noise=False)
    b = g.apply(params, z, randomize_noise=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = g.apply(params, z, rngs={"noise": jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_generator_latent_input_and_wplus(gen_and_params):
    g, params = gen_and_params
    w = jnp.asarray(np.random.RandomState(2).randn(2, 64).astype(np.float32))
    img = g.apply(
        params, input_is_latent=True, latent_styles=[w], randomize_noise=False
    )
    assert img.shape == (2, SIZE, SIZE, 3)
    # W+ [N, n_latent, D] path: broadcasting W to W+ must match.
    wp = jnp.repeat(w[:, None, :], g.n_latent, axis=1)
    img2 = g.apply(
        params, input_is_latent=True, latent_styles=[wp], randomize_noise=False
    )
    np.testing.assert_allclose(np.asarray(img), np.asarray(img2), atol=1e-6)


def test_generator_external_input_tensor(gen_and_params):
    g, params = gen_and_params
    w = jnp.asarray(np.random.RandomState(3).randn(2, 64).astype(np.float32))
    ext = jnp.asarray(np.random.RandomState(4).randn(2, 4, 4, 512).astype(np.float32))
    img = g.apply(
        params,
        input_is_latent=True,
        latent_styles=[w],
        external_input_tensor=ext,
        randomize_noise=False,
    )
    assert img.shape == (2, SIZE, SIZE, 3)
    # Different external tensors must give different images.
    img2 = g.apply(
        params,
        input_is_latent=True,
        latent_styles=[w],
        external_input_tensor=ext * 2.0,
        randomize_noise=False,
    )
    assert not np.allclose(np.asarray(img), np.asarray(img2))


def test_generator_style_mixing_and_rgb_list(gen_and_params):
    g, params = gen_and_params
    rs = np.random.RandomState(5)
    z1 = jnp.asarray(rs.randn(2, 64).astype(np.float32))
    z2 = jnp.asarray(rs.randn(2, 64).astype(np.float32))
    img = g.apply(
        params, [z1, z2], inject_index=3, randomize_noise=False
    )
    assert img.shape == (2, SIZE, SIZE, 3)
    rgbs = g.apply(params, z1, return_rgb_list=True, randomize_noise=False)
    assert len(rgbs) == g.log_size - 1  # one per resolution 4..SIZE
    assert rgbs[0].shape == (2, 4, 4, 3)
    assert rgbs[-1].shape == (2, SIZE, SIZE, 3)


def test_generator_truncation(gen_and_params):
    g, params = gen_and_params
    z = jnp.asarray(np.random.RandomState(6).randn(2, 64).astype(np.float32))
    mean_w = g.apply(
        params, method=lambda m: m.mean_latent(jax.random.PRNGKey(7), 64)
    )
    img_full = g.apply(params, z, randomize_noise=False)
    img_trunc = g.apply(
        params, z, truncation=0.5, truncation_latent=mean_w, randomize_noise=False
    )
    # truncation=0 collapses to the mean image regardless of z.
    z2 = jnp.asarray(np.random.RandomState(8).randn(2, 64).astype(np.float32))
    img_t0_a = g.apply(
        params, z, truncation=1e-8, truncation_latent=mean_w, randomize_noise=False
    )
    img_t0_b = g.apply(
        params, z2, truncation=1e-8, truncation_latent=mean_w, randomize_noise=False
    )
    assert not np.allclose(np.asarray(img_full), np.asarray(img_trunc))
    np.testing.assert_allclose(
        np.asarray(img_t0_a), np.asarray(img_t0_b), atol=1e-4
    )


def test_generator_style_scalars(gen_and_params):
    g, params = gen_and_params
    z = jnp.asarray(np.random.RandomState(9).randn(2, 64).astype(np.float32))
    img, scalars = g.apply(
        params, z, return_style_scalars=True, randomize_noise=False
    )
    # conv1 + 2 per upsample block + final ToRGB (stylegan2.py:637-664).
    assert len(scalars) == 1 + 2 * (g.log_size - 2) + 1
    assert scalars[0].shape == (2, 512)


def test_discriminator_shapes_and_batch_dependence():
    d = Discriminator(size=SIZE)
    x = jnp.asarray(np.random.RandomState(10).randn(4, SIZE, SIZE, 3).astype(np.float32))
    params = d.init(jax.random.PRNGKey(0), x)
    out = d.apply(params, x)
    assert out.shape == (4, 1)
    # minibatch-stddev makes logits batch-dependent: same sample in a
    # different batch context gives a different logit.
    x2 = x.at[1:].set(0.0)
    out2 = d.apply(params, x2)
    assert not np.allclose(np.asarray(out[0]), np.asarray(out2[0]))


def test_generator_custom_net_shape():
    shape = (64, 48, 32, 32, 24, 24)  # pruned widths, size 16
    g = Generator(size=16, style_dim=32, n_mlp=1, net_shape=shape)
    z = jnp.ones((1, 32))
    params = g.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, z
    )
    img = g.apply(params, z, randomize_noise=False)
    assert img.shape == (1, 16, 16, 3)
    p = params["params"]
    assert p["input"]["input"].shape == (1, 4, 4, 64)
    assert p["conv1"]["conv"]["weight"].shape == (3, 3, 64, 48)


def test_discriminator_vmapped_pair_matches_separate_calls():
    """The D-step batches D over the stacked (fake, ref) pair with vmap
    (train/steps.py); minibatch-stddev must still see each half alone."""
    d = Discriminator(size=SIZE)
    rng = np.random.RandomState(11)
    x1 = jnp.asarray(rng.randn(4, SIZE, SIZE, 3).astype(np.float32))
    x2 = jnp.asarray(rng.randn(4, SIZE, SIZE, 3).astype(np.float32))
    params = d.init(jax.random.PRNGKey(0), x1)

    sep = [d.apply(params, x) for x in (x1, x2)]
    vm = jax.vmap(lambda xb: d.apply(params, xb))(jnp.stack([x1, x2]))
    np.testing.assert_allclose(np.asarray(vm[0]), np.asarray(sep[0]), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(vm[1]), np.asarray(sep[1]), rtol=2e-5, atol=2e-5)


def test_tiny_width_mult_pipeline_shapes():
    """width_mult shrinks every net consistently (the multichip-dryrun
    config, __graft_entry__.py): E_Tsr tensor channels == generator
    net_shape[0], E_W vector dim == style_dim == W+ code dim.  Shape-level
    only (jax.eval_shape — no compiles) so the dryrun config has cheap
    direct coverage."""
    from fm3dgan.pipeline.forward import FaceManipulator, forward_3_encoder

    wm = 1 / 16
    models = FaceManipulator.create(
        size=8, style_dim=int(512 * wm), n_mlp=2, input_size=128,
        width_mult=wm,
    )
    variables = jax.eval_shape(
        lambda k: models.init_variables(k), jax.random.PRNGKey(0)
    )
    photo = jax.ShapeDtypeStruct((2, 128, 128, 3), jnp.float32)
    render = jax.ShapeDtypeStruct((2, 128, 128, 3), jnp.float32)
    img, _ = jax.eval_shape(
        lambda v, p, r: forward_3_encoder(models, v, p, r),
        variables, photo, render,
    )
    assert img.shape == (2, 8, 8, 3)

    d = Discriminator(size=8, width_mult=wm)
    x = jax.ShapeDtypeStruct((2, 8, 8, 3), jnp.float32)
    v_d = jax.eval_shape(d.init, jax.random.PRNGKey(0), x)
    out = jax.eval_shape(d.apply, v_d, x)
    assert out.shape == (2, 1)
