"""Composition layer: (photo, render) -> edited image.

Parity with /root/reference/Util/network_util.py:212-338:

* ``forward_3_encoder`` — THE production forward
  (``Forward_Inference_3_Encoder``, network_util.py:293-338):
  tensor = E_Tsr(photo or render), W = E_W(render) [N,512],
  W+ = E_W_Plus(photo) [N,14,512]; combined latent[i] = W * W+[:, i] on
  ``sliced_layer`` indices else W; generator runs with the external input
  tensor.  Default ``tsr_encode`` follows the shipped 3-encoder config
  ('Render Image', train_3_encoder_hyperparams.py:29).

* ``forward_2_encoder`` — plain + Multiplication / Concatenation /
  Tensor-Transform co-modulation modes (network_util.py:212-290).

All functions are pure: they take the module definitions + variables and
return (image, updated_batch_stats).  Pass ``train=True`` to update encoder
BatchNorm statistics; pass a 'noise' rng for randomized generator noise.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from fm3dgan.models.generator import Generator
from fm3dgan.models.psp_encoder import GradualStyleEncoder
from fm3dgan.models.resnet_encoder import ResNet18Encoder

MODULATION_ENCODING = ("Render Image", "Photo Image")
CO_MODULATION_MODE = ("Multiplication", "Concatenation", "Tensor Transform")


@dataclasses.dataclass(frozen=True)
class FaceManipulator:
    """Module bundle for the 3-encoder manipulation pipeline."""

    generator: Generator
    e_tsr: ResNet18Encoder
    e_w: ResNet18Encoder
    e_w_plus: GradualStyleEncoder

    input_size: int = 256  # photo/render resolution fed to the encoders

    @classmethod
    def create(
        cls,
        size: int = 256,
        style_dim: int = 512,
        n_mlp: int = 8,
        channel_multiplier: int = 2,
        w_plus_layers: int = 18,
        input_size: int = 256,
        width_mult: float = 1.0,
        dtype=jnp.float32,
    ) -> "FaceManipulator":
        """width_mult < 1 uniformly shrinks every net (generator channel
        table, encoder stem widths) — a smoke/dryrun knob; sharding and step
        semantics are width-independent.  style_dim must equal the encoders'
        output width (8 * 64*width_mult) so the W * W+ combine types check.
        Checkpoint-parity configs use 1.0."""
        import math

        n_styles = 2 * int(math.log2(size)) - 2
        enc_width = int(64 * width_mult)
        assert enc_width >= 1 and 64 * width_mult == enc_width, (
            f"width_mult {width_mult} must give an integer encoder width"
        )
        assert style_dim == 8 * enc_width, (
            f"style_dim {style_dim} must equal the encoder output width "
            f"{8 * enc_width} (= 8 * 64*width_mult)"
        )
        return cls(
            generator=Generator(
                size=size,
                style_dim=style_dim,
                n_mlp=n_mlp,
                channel_multiplier=channel_multiplier,
                width_mult=width_mult,
                dtype=dtype,
            ),
            e_tsr=ResNet18Encoder(
                tensor_encoding=True, width=enc_width, dtype=dtype
            ),
            e_w=ResNet18Encoder(
                tensor_encoding=False, width=enc_width, dtype=dtype
            ),
            e_w_plus=GradualStyleEncoder(
                num_layers=w_plus_layers,
                n_styles=n_styles,
                input_size=input_size,
                width=enc_width,
                style_dim=style_dim,
                dtype=dtype,
            ),
            input_size=input_size,
        )

    def init_variables_fast(self, seed: int = 0) -> Dict[str, Any]:
        """Structurally-correct variables WITHOUT compiling the init programs.

        Uses jax.eval_shape over the real inits to get the exact pytrees, then
        fills leaves host-side (BatchNorm var -> 1, means/biases -> 0, weights
        -> small normal).  Use for benchmarking / shape tooling where the
        values don't matter; use init_variables for real training inits."""
        import numpy as np

        shapes = jax.eval_shape(
            lambda k: self.init_variables(k), jax.random.PRNGKey(0)
        )
        rng = np.random.RandomState(seed)

        def fill(path, leaf):
            name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            if name == "var":
                return jnp.ones(leaf.shape, leaf.dtype)
            if name in ("mean", "bias"):
                return jnp.zeros(leaf.shape, leaf.dtype)
            return jnp.asarray(
                rng.normal(0, 0.05, leaf.shape).astype(leaf.dtype)
            )

        return jax.tree_util.tree_map_with_path(fill, shapes)

    def init_variables(self, key: jax.Array) -> Dict[str, Any]:
        """Initialize all four variable collections on dummy inputs.

        Each init runs under jit (one fused XLA program per model) — eager
        op-by-op init dispatches ~100 separate compiles, which is
        pathologically slow on small hosts."""
        size = self.input_size
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        img = jnp.zeros((1, size, size, 3), jnp.float32)
        v_tsr = jax.jit(self.e_tsr.init)(k1, img)
        v_w = jax.jit(self.e_w.init)(k2, img)
        v_wp = jax.jit(self.e_w_plus.init)(k3, img)
        z = jnp.zeros((1, self.generator.style_dim), jnp.float32)
        v_g = jax.jit(self.generator.init)({"params": k4, "noise": k5}, z)
        return {"g": v_g, "e_tsr": v_tsr, "e_w": v_w, "e_w_plus": v_wp}


def _combine_w_wplus(
    w: jax.Array, w_plus: jax.Array, sliced_layer: Optional[Sequence[int]]
) -> jax.Array:
    """latent[:, i] = W * W+[:, i] for i in sliced_layer else W
    (network_util.py:320-327)."""
    n_latent = w_plus.shape[1]
    if sliced_layer is None:
        sliced_layer = range(n_latent)
    mask = jnp.asarray(
        [1.0 if i in set(sliced_layer) else 0.0 for i in range(n_latent)],
        w.dtype,
    )[None, :, None]
    w_b = w[:, None, :]
    return jnp.where(mask > 0, w_b * w_plus, w_b)


def forward_3_encoder(
    models: FaceManipulator,
    variables: Dict[str, Any],
    photo: jax.Array,
    render: jax.Array,
    *,
    tsr_encode: str = "Render Image",
    sliced_layer: Optional[Sequence[int]] = None,
    use_tanh: bool = False,
    train: bool = False,
    noise_rng: Optional[jax.Array] = None,
    return_latent: bool = False,
) -> Tuple[jax.Array, Dict[str, Any]]:
    """(photo, render) [N,H,W,3] in [-1,1] -> edited image [N,H,W,3].

    Returns (image, updated_variable_collections) where the update contains
    refreshed encoder batch_stats when train=True (else empty).
    """
    assert tsr_encode in MODULATION_ENCODING
    tsr_input = photo if tsr_encode == "Photo Image" else render
    updates: Dict[str, Any] = {}

    def apply_enc(module, key, x):
        if train:
            out, upd = module.apply(
                variables[key], x, train=True, mutable=["batch_stats"]
            )
            updates[key] = upd
            return out
        return module.apply(variables[key], x)

    encoded_tensor = apply_enc(models.e_tsr, "e_tsr", tsr_input)
    encoded_w = apply_enc(models.e_w, "e_w", render)
    encoded_w_plus = apply_enc(models.e_w_plus, "e_w_plus", photo)

    latent = _combine_w_wplus(encoded_w, encoded_w_plus, sliced_layer)

    rngs = {"noise": noise_rng} if noise_rng is not None else None
    out = models.generator.apply(
        variables["g"],
        input_is_latent=True,
        latent_styles=[latent],
        external_input_tensor=encoded_tensor,
        randomize_noise=noise_rng is not None,
        rngs=rngs,
        return_latent=return_latent,
    )
    if return_latent:
        image, latent_out = out
    else:
        image = out
    if use_tanh:
        image = jnp.tanh(image)
    if return_latent:
        return image, latent_out, updates
    return image, updates


def encode_2_encoder(
    tensor_encoder: ResNet18Encoder,
    modulation_encoder,
    generator: Generator,
    variables: Dict[str, Any],
    photo: jax.Array,
    render: jax.Array,
    *,
    mod_encode: str = "Render Image",
    co_modulation: Optional[str] = None,
    sliced_layer: Optional[Sequence[int]] = None,
    train: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array], Dict[str, Any]]:
    """Encoder half of the 2-encoder modes (network_util.py:232-282).

    Returns (latent [N, n_latent, D], external_input_tensor or None,
    batch-stats updates).  Shared by the forward and the PPL regularizer,
    which differentiates the generator w.r.t. this latent.
    """
    assert mod_encode in MODULATION_ENCODING
    updates: Dict[str, Any] = {}

    def apply_enc(module, key, x):
        if train:
            out, upd = module.apply(
                variables[key], x, train=True, mutable=["batch_stats"]
            )
            updates[key] = upd
            return out
        return module.apply(variables[key], x)

    if co_modulation is None:
        if mod_encode == "Render Image":
            encoded_tensor = apply_enc(tensor_encoder, "tensor_encoder", photo)
            encoded_w = apply_enc(modulation_encoder, "modulation_encoder", render)
        else:
            encoded_tensor = apply_enc(tensor_encoder, "tensor_encoder", render)
            encoded_w = apply_enc(modulation_encoder, "modulation_encoder", photo)
        latent = jnp.repeat(encoded_w[:, None, :], generator.n_latent, axis=1)
        return latent, encoded_tensor, updates

    assert co_modulation in CO_MODULATION_MODE
    if co_modulation == "Multiplication":
        # W vector from the render-path encoder times W+ per-layer codes.
        encoded_vec = apply_enc(tensor_encoder, "tensor_encoder", render)
        encoded_wp = apply_enc(modulation_encoder, "modulation_encoder", photo)
        latent = _combine_w_wplus(encoded_vec, encoded_wp, sliced_layer)
        return latent, None, updates
    if co_modulation == "Concatenation":
        encoded_vec = apply_enc(tensor_encoder, "tensor_encoder", render)
        encoded_wp = apply_enc(modulation_encoder, "modulation_encoder", photo)
        rep = jnp.repeat(encoded_vec[:, None, :], encoded_wp.shape[1], axis=1)
        latent = jnp.concatenate([rep, encoded_wp], axis=2)
        return latent, None, updates
    # Tensor Transform
    encoded_tensor, encoded_vec = apply_enc(
        tensor_encoder, "tensor_encoder", render
    )
    encoded_wp = apply_enc(modulation_encoder, "modulation_encoder", photo)
    rep = jnp.repeat(encoded_vec[:, None, :], encoded_wp.shape[1], axis=1)
    latent = jnp.concatenate([rep, encoded_wp], axis=2)
    return latent, encoded_tensor, updates


def forward_2_encoder(
    tensor_encoder: ResNet18Encoder,
    modulation_encoder,
    generator: Generator,
    variables: Dict[str, Any],
    photo: jax.Array,
    render: jax.Array,
    *,
    mod_encode: str = "Render Image",
    co_modulation: Optional[str] = None,
    sliced_layer: Optional[Sequence[int]] = None,
    use_tanh: bool = False,
    train: bool = False,
    noise_rng: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Dict[str, Any]]:
    """2-encoder inference incl. co-modulation modes (network_util.py:212-290).

    variables keys: 'tensor_encoder', 'modulation_encoder', 'g'.
    """
    latent, encoded_tensor, updates = encode_2_encoder(
        tensor_encoder,
        modulation_encoder,
        generator,
        variables,
        photo,
        render,
        mod_encode=mod_encode,
        co_modulation=co_modulation,
        sliced_layer=sliced_layer,
        train=train,
    )
    rngs = {"noise": noise_rng} if noise_rng is not None else None
    g_kwargs = dict(
        input_is_latent=True,
        randomize_noise=noise_rng is not None,
        rngs=rngs,
    )
    if encoded_tensor is not None:
        g_kwargs["external_input_tensor"] = encoded_tensor
    image = generator.apply(
        variables["g"], latent_styles=[latent], **g_kwargs
    )
    if use_tanh:
        image = jnp.tanh(image)
    return image, updates
