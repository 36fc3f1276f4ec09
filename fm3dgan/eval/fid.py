"""FID computation (parity with /root/reference/Evaluation/fid.py:28-130).

calc_fid reproduces the reference's Fréchet distance incl. the
singular-matrix eps fallback; feature extraction runs the jitted InceptionV3
pool3 head (fm3dgan/models/inception.py).
"""

from __future__ import annotations

import pickle
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def calc_fid(
    sample_mean: np.ndarray,
    sample_cov: np.ndarray,
    real_mean: np.ndarray,
    real_cov: np.ndarray,
    eps: float = 1e-6,
) -> float:
    """Fréchet distance with scipy sqrtm + eps fallback (fid.py:50-73)."""
    from scipy import linalg

    cov_sqrt, _ = linalg.sqrtm(sample_cov @ real_cov, disp=False)
    if not np.isfinite(cov_sqrt).all():
        offset = np.eye(sample_cov.shape[0]) * eps
        cov_sqrt = linalg.sqrtm(
            (sample_cov + offset) @ (real_cov + offset)
        )
    if np.iscomplexobj(cov_sqrt):
        if not np.allclose(np.diagonal(cov_sqrt).imag, 0, atol=1e-3):
            m = np.max(np.abs(cov_sqrt.imag))
            raise ValueError(f"Imaginary component {m}")
        cov_sqrt = cov_sqrt.real
    mean_diff = sample_mean - real_mean
    mean_norm = mean_diff @ mean_diff
    trace = np.trace(sample_cov) + np.trace(real_cov) - 2 * np.trace(cov_sqrt)
    return float(mean_norm + trace)


def compute_inception_stats(
    features: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """features [N, 2048] -> (mean, cov) (calc_inception.py:108-112)."""
    return np.mean(features, axis=0), np.cov(features, rowvar=False)


def save_stats(path: str, mean: np.ndarray, cov: np.ndarray) -> None:
    with open(path, "wb") as f:
        pickle.dump({"mean": mean, "cov": cov}, f)


def load_stats(path: str) -> Tuple[np.ndarray, np.ndarray]:
    with open(path, "rb") as f:
        d = pickle.load(f)
    return d["mean"], d["cov"]


def extract_features_from_samples(
    generator_fn: Callable[[jax.Array], jax.Array],
    inception_fn: Callable[[jax.Array], jax.Array],
    key: jax.Array,
    latent_dim: int,
    n_sample: int,
    batch_size: int,
) -> np.ndarray:
    """Batched z-sample -> generator -> inception features (fid.py:28-47)."""
    n_batches = n_sample // batch_size
    resid = n_sample - n_batches * batch_size
    feats = []
    for i in range(n_batches + (1 if resid else 0)):
        bsz = batch_size if i < n_batches else resid
        key, sub = jax.random.split(key)
        z = jax.random.normal(sub, (bsz, latent_dim))
        img = generator_fn(z)
        feats.append(np.asarray(inception_fn(img)))
    return np.concatenate(feats, axis=0)


def make_sharded_feature_fn(
    feature_apply: Callable[..., jax.Array],
    mesh,
    axis_name: str = "data",
):
    """Shard eval feature extraction over the device mesh.

    TPU-native counterpart of the reference's pickle-based eval
    ``all_gather`` (/root/reference/Miscellaneous/distributed.py:93-110):
    the image batch is split over the mesh's ``axis_name``, each device runs
    ``feature_apply(variables, local_images)``, and ``jax.lax.all_gather``
    reassembles the full [N, F] feature matrix on every device — all inside
    one jitted program, collectives riding ICI.

    feature_apply: (variables, images [B_local, H, W, C]) -> [B_local, F],
    e.g. a bound InceptionV3 pool3 head.  The global batch must divide the
    mesh size.
    """
    from jax.sharding import PartitionSpec as P

    try:
        shard_map = jax.shard_map
    except AttributeError:  # older jax
        from jax.experimental.shard_map import shard_map

    def run(variables, images):
        local = feature_apply(variables, images)
        return jax.lax.all_gather(local, axis_name, axis=0, tiled=True)

    # The tiled all_gather leaves every device holding the identical [N, F]
    # matrix, but jax's varying-manual-axes checker cannot statically prove
    # all_gather output replication (jax 0.9: "could not infer replication
    # over any axes"), so the replication check must be disabled for the
    # P() out_spec; older jax spells the flag check_rep.
    kwargs = dict(
        mesh=mesh, in_specs=(P(), P(axis_name)), out_specs=P()
    )
    try:
        wrapped = shard_map(run, check_vma=False, **kwargs)
    except TypeError:  # pre-vma jax
        wrapped = shard_map(run, check_rep=False, **kwargs)
    return jax.jit(wrapped)


def make_mesh_feature_fn(
    feature_fn: Callable[[jax.Array], jax.Array], mesh
) -> Callable[[jax.Array], jax.Array]:
    """images -> features, sharded over the mesh's 'data' axis.

    Wraps a bound single-argument feature extractor (e.g. an InceptionV3
    pool3 closure) in :func:`make_sharded_feature_fn`'s shard_map +
    all_gather program.  Batch sizes need not divide the mesh (the FID
    default is 100 on mesh(8), plus the ``n_sample % batch_size`` residual
    batch): inputs are zero-padded to the next multiple and the padded
    rows' features trimmed.
    """
    sharded = make_sharded_feature_fn(lambda _v, img: feature_fn(img), mesh)
    n_dev = mesh.devices.size

    def run(img):
        b = img.shape[0]
        pad = (-b) % n_dev
        if pad:
            img = jnp.concatenate(
                [img, jnp.zeros((pad,) + img.shape[1:], img.dtype)], axis=0
            )
        return sharded({}, img)[:b]

    return run


def get_model_fid_score(
    generator_fn: Callable[[jax.Array], jax.Array],
    inception_fn: Callable[[jax.Array], jax.Array],
    real_stats_path: str,
    key: Optional[jax.Array] = None,
    latent_dim: int = 512,
    n_sample: int = 50_000,
    batch_size: int = 100,
    mesh=None,
) -> float:
    """Unconditional 50k-sample FID of a z->image generator (fid.py:76-130).

    mesh: optional device mesh — the per-batch images are then sharded over
    the mesh's 'data' axis for feature extraction (50k inception forwards are
    the eval bottleneck) and gathered with jax.lax.all_gather.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    if mesh is not None:
        inception_fn = make_mesh_feature_fn(inception_fn, mesh)
    features = extract_features_from_samples(
        generator_fn, inception_fn, key, latent_dim, n_sample, batch_size
    )
    sample_mean, sample_cov = compute_inception_stats(features)
    real_mean, real_cov = load_stats(real_stats_path)
    return calc_fid(sample_mean, sample_cov, real_mean, real_cov)
