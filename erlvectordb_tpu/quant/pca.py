"""PCA dimensionality reduction, trained on device.

The reference's "PCA" is a placeholder — it truncates the vector to half
length and zero-pads on decompress (src/vector_compression.erl:207-229).
This is the honest version its API advertises: an orthogonal projection
trained from data (eigendecomposition of the covariance, computed with
matmuls on the MXU), with ``transform``/``inverse_transform`` and a
single-vector fallback that degrades gracefully to truncation when no
training data is available (preserving the reference's one-shot
compress_vector(pca) behavior).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("n_components",))
def pca_fit(x: jax.Array, *, n_components: int) -> Tuple[jax.Array, jax.Array]:
    """[N, D] f32 -> (mean [D], components [n_components, D])."""
    x = jnp.asarray(x, jnp.float32)
    mean = jnp.mean(x, axis=0)
    xc = x - mean[None, :]
    cov = jnp.dot(xc.T, xc, preferred_element_type=jnp.float32) / jnp.maximum(
        x.shape[0] - 1, 1
    )
    eigvals, eigvecs = jnp.linalg.eigh(cov)  # ascending
    comps = eigvecs[:, ::-1][:, :n_components].T  # [n_components, D]
    return mean, comps


class PCAModel:
    """Trained PCA projection with transform / inverse_transform."""

    def __init__(self, mean: jax.Array, components: jax.Array):
        self.mean = jnp.asarray(mean, jnp.float32)
        self.components = jnp.asarray(components, jnp.float32)

    @classmethod
    def fit(cls, data, n_components: int) -> "PCAModel":
        mean, comps = pca_fit(jnp.asarray(data, jnp.float32), n_components=n_components)
        return cls(mean, comps)

    @property
    def n_components(self) -> int:
        return self.components.shape[0]

    @property
    def dim(self) -> int:
        return self.components.shape[1]

    def transform(self, x) -> jax.Array:
        x = jnp.asarray(x, jnp.float32)
        return jnp.dot(x - self.mean, self.components.T, preferred_element_type=jnp.float32)

    def inverse_transform(self, z) -> jax.Array:
        z = jnp.asarray(z, jnp.float32)
        return jnp.dot(z, self.components, preferred_element_type=jnp.float32) + self.mean

    def to_arrays(self) -> dict:
        return {"mean": np.asarray(self.mean), "components": np.asarray(self.components)}

    @classmethod
    def from_arrays(cls, d: dict) -> "PCAModel":
        return cls(jnp.asarray(d["mean"]), jnp.asarray(d["components"]))


def truncate_project(x: jax.Array, n_components: Optional[int] = None) -> jax.Array:
    """Data-free fallback: keep the first half of the coordinates."""
    x = jnp.asarray(x, jnp.float32)
    n = n_components or max(1, x.shape[-1] // 2)
    return x[..., :n]


def truncate_restore(z: jax.Array, dim: int) -> jax.Array:
    pad = dim - z.shape[-1]
    cfg = [(0, 0)] * (z.ndim - 1) + [(0, pad)]
    return jnp.pad(jnp.asarray(z, jnp.float32), cfg)
