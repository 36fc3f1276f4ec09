"""Golden GRADIENT parity for the training losses against the reference
torch implementations (/root/reference/Util/training_util.py:24-58) run on
the actual reference StyleGAN2 modules.

These close the second-order-autodiff proof: the R1 gradient penalty
(training_util.py:46-52, applied in D_Reg_BackProp train_3_encoder.py:485-492)
and the path-length regularizer (training_util.py:24-37) are grad-of-grad
losses — value parity of the forward alone would not catch a wrong
double-backward.  Each test computes the torch loss AND its parameter
gradients via autograd.grad(create_graph=True)+backward, converts the torch
gradient state-dict through the SAME layout converters used for weights
(pure transposes/reshapes, so gradients map identically), and asserts
elementwise agreement with jax.grad of our loss.

Also: the full production composition Forward_Inference_3_Encoder
(Util/network_util.py:293-338) run end-to-end (3 reference encoders +
reference generator, fixed noise buffers) vs our forward_3_encoder.
"""

import sys
import types

import jax
import numpy as np
import pytest

from golden_utils import (
    grads_numpy_padded,
    noise_arrays,
    ref_stylegan2,
    sd_numpy,
)

pytestmark = pytest.mark.slow

SIZE = 64  # second-order tests run at 64px: same code paths, minutes not hours


@pytest.fixture(scope="module")
def torch():
    import torch as t

    return t


def _assert_tree_close(jax_tree, ref_tree, elem_tol, l2_tol, allow_zero=()):
    """Compare two nested gradient dicts leaf-by-leaf.  Leaves present only
    in jax_tree (torch grad was None: params unused by this loss, e.g. the
    mapping MLP under input_is_latent) must be ~0 and are listed in
    ``allow_zero`` by path prefix.

    Two checks per leaf, each targeting what it can actually detect:
      * relative L2 error <= l2_tol — a layout/scale/sign converter bug
        perturbs a macroscopic fraction of the leaf's energy (O(1) rel-L2);
      * max |a - b| <= elem_tol * max|b| — any single element knocked out of
        place by a converter bug moves by O(leaf scale).  A plain elementwise
        rtol is the wrong shape here: isolated barely-significant elements of
        a second-order fp32 gradient are cancellation residue whose RELATIVE
        error is unbounded noise (observed: 65/1.4M elements at 21% rel but
        <0.4% of leaf scale, XLA-CPU vs MKL summation order), while their
        ABSOLUTE error stays far below any real-bug displacement."""
    flat_jax = jax.tree_util.tree_flatten_with_path(jax_tree)[0]
    checked = 0
    for path, leaf in flat_jax:
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        name = "/".join(keys)
        node = ref_tree
        missing = False
        for k in keys:
            if isinstance(node, dict) and k in node:
                node = node[k]
            else:
                missing = True
                break
        a = np.asarray(leaf, np.float64)
        if missing:
            assert any(name.startswith(p) for p in allow_zero), (
                f"no reference gradient for {name} and not in allow_zero"
            )
            np.testing.assert_allclose(a, 0.0, atol=1e-12)
            continue
        b = np.asarray(node, np.float64)
        scale = float(np.abs(b).max())
        rel_l2 = float(np.linalg.norm(a - b)) / max(
            float(np.linalg.norm(b)), 1e-30
        )
        assert rel_l2 <= l2_tol, (
            f"gradient rel-L2 error {rel_l2:.3e} > {l2_tol} at {name}"
        )
        max_abs = float(np.abs(a - b).max())
        assert max_abs <= elem_tol * max(scale, 1e-30), (
            f"gradient max-abs error {max_abs:.3e} > {elem_tol} * leaf scale "
            f"{scale:.3e} at {name}"
        )
        checked += 1
    assert checked > 0


def test_d_r1_param_gradient_golden(torch):
    """R1 = mean ||dD/dx||^2; its gradient w.r.t. D params (double backward)
    must match the reference's D_Reg_BackProp weighting r1/2 * R1 *
    d_reg_every (train_3_encoder.py:485-492)."""
    from fm3dgan.compat.torch_port import convert_discriminator
    from fm3dgan.losses.gan import d_r1_penalty
    from fm3dgan.models.discriminator import Discriminator

    r1_weight, d_reg_every = 10.0, 16
    with ref_stylegan2(torch) as ref:
        torch.manual_seed(20)
        d_ref = ref.sg2.Discriminator(SIZE)
        rng = np.random.RandomState(20)
        x = rng.uniform(-1, 1, (4, 3, SIZE, SIZE)).astype(np.float32)

        xt = torch.from_numpy(x).requires_grad_(True)
        real_pred = d_ref(xt)
        (grad_real,) = torch.autograd.grad(
            outputs=real_pred.sum(), inputs=xt, create_graph=True
        )
        penalty = grad_real.pow(2).reshape(grad_real.shape[0], -1).sum(1).mean()
        weighted = r1_weight / 2.0 * penalty * d_reg_every
        weighted.backward()
        ref_penalty = float(penalty.detach())
        ref_grads = convert_discriminator(
            grads_numpy_padded(d_ref), size=SIZE
        )["params"]
        variables = convert_discriminator(sd_numpy(d_ref), size=SIZE)

    ours = Discriminator(size=SIZE)
    x_nhwc = np.transpose(x, (0, 2, 3, 1)).copy()

    def loss_fn(params):
        d_fn = lambda img: ours.apply({"params": params}, img)
        r1 = d_r1_penalty(d_fn, x_nhwc)
        return r1_weight / 2.0 * r1 * d_reg_every, r1

    (_, r1), grads = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(
        variables["params"]
    )
    np.testing.assert_allclose(float(r1), ref_penalty, rtol=1e-3)
    _assert_tree_close(grads, ref_grads, elem_tol=1e-2, l2_tol=3e-3)


def test_path_regularize_param_gradient_golden(torch):
    """g_path_regularize (training_util.py:24-37): path_lengths, penalty,
    running mean, AND the generator-parameter gradients of the weighted
    penalty (G_Reg_BackProp weighting path_reg_weight * g_reg_every,
    train_3_encoder.py:588-591) — with the identical injected noise image."""
    from fm3dgan.compat.torch_port import convert_generator
    from fm3dgan.losses.path_reg import path_regularize
    from fm3dgan.models.generator import Generator

    path_reg_weight, g_reg_every = 2.0, 4
    mean_path_length = 0.3
    rng = np.random.RandomState(21)
    n_latent = 10  # 2*log2(64)-2
    latent = rng.normal(0, 1, (2, n_latent, 512)).astype(np.float32)
    layer_noise = noise_arrays(SIZE, rng)
    # Pre-scaled white-noise image, as the reference draws it
    # (training_util.py:25-27).
    y = (
        rng.normal(0, 1, (2, 3, SIZE, SIZE)).astype(np.float32)
        / np.sqrt(SIZE * SIZE)
    ).astype(np.float32)

    with ref_stylegan2(torch) as ref:
        torch.manual_seed(21)
        g_ref = ref.sg2.Generator(SIZE, 512, 8, channel_multiplier=2)
        lat_t = torch.from_numpy(latent).requires_grad_(True)
        fake = g_ref(
            None,
            latent_styles=[lat_t],
            input_is_latent=True,
            noise=[torch.from_numpy(n) for n in layer_noise],
        )
        # The reference loss formula (training_util.py:24-37), with the
        # pre-drawn noise instead of randn_like:
        (grad,) = torch.autograd.grad(
            outputs=(fake * torch.from_numpy(y)).sum(),
            inputs=lat_t,
            create_graph=True,
        )
        path_lengths = torch.sqrt(grad.pow(2).sum(2).mean(1))
        path_mean = mean_path_length + 0.01 * (
            path_lengths.mean() - mean_path_length
        )
        penalty = (path_lengths - path_mean).pow(2).mean()
        (path_reg_weight * g_reg_every * penalty).backward()
        ref_penalty = float(penalty.detach())
        ref_pl = path_lengths.detach().numpy()
        ref_mean = float(path_mean.detach())
        ref_grads = convert_generator(grads_numpy_padded(g_ref))["params"]
        variables = convert_generator(sd_numpy(g_ref))

    ours = Generator(size=SIZE, style_dim=512, n_mlp=8, channel_multiplier=2)
    noise_nhwc = [np.transpose(n, (0, 2, 3, 1)) for n in layer_noise]
    y_nhwc = np.transpose(y, (0, 2, 3, 1)).copy()

    # Non-param collections (the stored noise buffers) ride along untouched;
    # gradients are taken w.r.t. params only.
    aux = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(params):
        def g_fn(lat):
            return ours.apply(
                {"params": params, **aux},
                input_is_latent=True,
                latent_styles=[lat],
                noise=noise_nhwc,
            )

        pen, new_mean, pl = path_regularize(
            g_fn,
            latent,
            np.float32(mean_path_length),
            key=jax.random.PRNGKey(0),
            noise=y_nhwc,
        )
        return path_reg_weight * g_reg_every * pen, (pen, new_mean, pl)

    (_, (pen, new_mean, pl)), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(variables["params"])
    np.testing.assert_allclose(float(pen), ref_penalty, rtol=2e-3)
    np.testing.assert_allclose(float(new_mean), ref_mean, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(pl), ref_pl, rtol=1e-3)
    # input_is_latent skips the mapping MLP: its torch grads are None and the
    # jax grads must be exactly zero.
    # l2_tol 1e-2: the noise-strength scalars are mixed second derivatives
    # (d2 img / d latent d strength) and carry ~0.6% reordered-sum noise in
    # fp32; converter/semantic bugs show up at O(1) relative, not percent.
    _assert_tree_close(
        grads, ref_grads, elem_tol=1e-2, l2_tol=1e-2, allow_zero=("style/",)
    )


def test_forward_inference_3_encoder_e2e_golden(torch):
    """THE production path (network_util.py:293-338) end-to-end: reference
    E_Tsr + E_W + E_W_Plus + Generator composed by the reference's own
    Forward_Inference_3_Encoder vs our forward_3_encoder, converted weights,
    fixed noise buffers, W (.) W+ on sliced layers 4-9."""
    with ref_stylegan2(torch, with_network_util=True) as ref:
        import resnet_encoder as ref_resnet  # noqa: E402 (REF on sys.path)
        import psp_encoder_model.encoders.psp_encoders as ref_psp  # noqa: E402

        from fm3dgan.compat.torch_port import (
            convert_generator,
            convert_psp_encoder,
            convert_resnet18_encoder,
        )
        from fm3dgan.pipeline.forward import FaceManipulator, forward_3_encoder

        torch.manual_seed(22)
        size = 256
        g_ref = ref.sg2.Generator(size, 512, 8, channel_multiplier=2).eval()
        e_tsr = ref_resnet.resnet18(tensor_encoding=True).eval()
        e_w = ref_resnet.resnet18(tensor_encoding=False).eval()
        opts = types.SimpleNamespace(input_nc=3, n_styles=14)
        e_wp = ref_psp.GradualStyleEncoder(18, "ir_se", opts).eval()

        class FixedNoiseG(torch.nn.Module):
            """Delegate that pins the stored noise buffers (randomize_noise
            =False) so both frameworks generate deterministically; exposes
            .module for the DataParallel-shaped access in network_util."""

            def __init__(self, g):
                super().__init__()
                self.g = g
                self.module = g

            def forward(self, noise_z=None, **kw):
                kw.setdefault("randomize_noise", False)
                return self.g(noise_z, **kw)

        rng = np.random.RandomState(22)
        photo = rng.uniform(-1, 1, (1, 3, size, size)).astype(np.float32)
        render = rng.uniform(-1, 1, (1, 3, size, size)).astype(np.float32)
        sliced = [4, 5, 6, 7, 8, 9]

        with torch.no_grad():
            ref_img = ref.network_util.Forward_Inference_3_Encoder(
                torch.from_numpy(photo),
                torch.from_numpy(render),
                e_tsr,
                e_w,
                e_wp,
                FixedNoiseG(g_ref),
                tsr_encode="Photo Image",
                sliced_layer=sliced,
                use_tanh=True,
            ).numpy()

        variables = {
            "g": convert_generator(sd_numpy(g_ref)),
            "e_tsr": convert_resnet18_encoder(sd_numpy(e_tsr)),
            "e_w": convert_resnet18_encoder(sd_numpy(e_w)),
            "e_w_plus": convert_psp_encoder(sd_numpy(e_wp)),
        }

    models = FaceManipulator.create(size=size, input_size=size)
    photo_nhwc = np.transpose(photo, (0, 2, 3, 1)).copy()
    render_nhwc = np.transpose(render, (0, 2, 3, 1)).copy()
    img, _ = jax.jit(
        lambda v, p, r: forward_3_encoder(
            models,
            v,
            p,
            r,
            tsr_encode="Photo Image",
            sliced_layer=sliced,
            use_tanh=True,
        )
    )(variables, photo_nhwc, render_nhwc)
    np.testing.assert_allclose(
        np.asarray(img),
        np.transpose(ref_img, (0, 2, 3, 1)),
        atol=5e-3,
        rtol=1e-3,
    )
