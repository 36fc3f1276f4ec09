"""Encoder shape/structure parity and 3-encoder pipeline smoke tests.

Parity figures (SURVEY.md §2.3): E_Tsr -> [N,4,4,512] @256 input; E_W ->
[N,512]; E_W+ -> [N, n_styles, 512]; IR-SE-18 taps at units (3,5,7)."""

import jax
import jax.numpy as jnp
import numpy as np

from fm3dgan.models.psp_encoder import (
    GradualStyleEncoder,
    bilinear_resize_align_corners,
    get_blocks,
)
from fm3dgan.models.resnet_encoder import ResNet18Encoder
from fm3dgan.pipeline import FaceManipulator, forward_3_encoder


def test_get_blocks_structure():
    b18 = get_blocks(18)
    assert [len(s) for s in b18] == [2, 2, 2, 2]
    assert b18[0][0] == (64, 64, 2)
    assert b18[3][0] == (256, 512, 2)
    b50 = get_blocks(50)
    assert [len(s) for s in b50] == [3, 4, 14, 3]


def test_bilinear_align_corners_identity_and_interp():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    up = bilinear_resize_align_corners(x, 7, 7)
    # Corners preserved under align_corners=True.
    assert float(up[0, 0, 0, 0]) == 0.0
    assert float(up[0, -1, -1, 0]) == 15.0
    # Midpoints are exact averages on a linear ramp.
    np.testing.assert_allclose(float(up[0, 0, 1, 0]), 0.5, atol=1e-6)


def test_resnet18_tensor_and_vector_heads():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 256, 256, 3).astype(np.float32))
    e_tsr = ResNet18Encoder(tensor_encoding=True)
    v = e_tsr.init(jax.random.PRNGKey(0), x)
    t = e_tsr.apply(v, x)
    assert t.shape == (2, 4, 4, 512)

    e_w = ResNet18Encoder(tensor_encoding=False)
    v2 = e_w.init(jax.random.PRNGKey(1), x)
    w = e_w.apply(v2, x)
    assert w.shape == (2, 512)

    # tensor_transform returns (tensor, vector) (resnet_encoder.py:275-278).
    e_tt = ResNet18Encoder(tensor_encoding=True, tensor_transform=True)
    v3 = e_tt.init(jax.random.PRNGKey(2), x)
    t2, vec = e_tt.apply(v3, x)
    assert t2.shape == (2, 4, 4, 512) and vec.shape == (2, 512)

    # BatchNorm stats update in train mode.
    _, upd = e_w.apply(v2, x, train=True, mutable=["batch_stats"])
    before = v2["batch_stats"]["bn1"]["mean"]
    after = upd["batch_stats"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_psp_encoder_wplus_shape():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    enc = GradualStyleEncoder(num_layers=18, n_styles=10, input_size=64)
    v = enc.init(jax.random.PRNGKey(0), x)
    out = enc.apply(v, x)
    assert out.shape == (1, 10, 512)
    # 8 IR-SE units in the 18-layer body.
    assert sum(1 for k in v["params"] if k.startswith("body_")) == 8


def test_forward_3_encoder_pipeline():
    # Full production path: 256px encoders feeding an 8px generator (tensor
    # interface is resolution-independent: [N,4,4,512]).
    models = FaceManipulator.create(size=8, input_size=256)
    variables = models.init_variables(jax.random.PRNGKey(0))
    rng = np.random.RandomState(2)
    photo = jnp.asarray(rng.randn(1, 256, 256, 3).astype(np.float32))
    render = jnp.asarray(rng.randn(1, 256, 256, 3).astype(np.float32))

    img, upd = forward_3_encoder(models, variables, photo, render)
    assert img.shape == (1, 8, 8, 3)
    assert upd == {}

    # tanh clipping + train-mode stats updates.
    img2, upd2 = forward_3_encoder(
        models, variables, photo, render, use_tanh=True, train=True
    )
    assert float(jnp.max(jnp.abs(img2))) <= 1.0
    assert set(upd2) == {"e_tsr", "e_w", "e_w_plus"}

    # Render-vs-photo tensor encoding differ (tsr_encode switch).
    img3, _ = forward_3_encoder(
        models, variables, photo, render, tsr_encode="Photo Image"
    )
    assert not np.allclose(np.asarray(img), np.asarray(img3))

    # sliced_layer=[] means pure-W modulation everywhere.
    img4, _ = forward_3_encoder(models, variables, photo, render, sliced_layer=[])
    assert img4.shape == (1, 8, 8, 3)
