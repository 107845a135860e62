"""Vector math primitives (capability parity with the reference's L0 layer).

The reference implements cosine/euclidean/manhattan distances, dot product,
norms and elementwise arithmetic as interpreted Erlang list folds
(reference: src/vector_utils.erl:15-66).  Here the same nine operations are
JAX functions: they batch, they JIT, and on TPU the reductions map onto the
VPU (and the batched forms in `core.search` onto the MXU).

Semantics preserved from the reference:
  * ``cosine_similarity`` of a zero-norm vector is 0.0 (and the derived
    cosine *distance* is therefore 1.0, matching
    src/vector_store.erl:238-246).
  * distances are plain float32 scalars for 1-D inputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "cosine_similarity",
    "cosine_distance",
    "euclidean_distance",
    "manhattan_distance",
    "dot_product",
    "normalize",
    "vector_norm",
    "vector_add",
    "vector_subtract",
    "vector_multiply",
]


def _as_f32(x) -> jax.Array:
    return jnp.asarray(x, dtype=jnp.float32)


def dot_product(a, b) -> jax.Array:
    a, b = _as_f32(a), _as_f32(b)
    return jnp.sum(a * b, axis=-1)


def vector_norm(a) -> jax.Array:
    a = _as_f32(a)
    return jnp.sqrt(jnp.sum(a * a, axis=-1))


def cosine_similarity(a, b) -> jax.Array:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    a, b = _as_f32(a), _as_f32(b)
    denom = vector_norm(a) * vector_norm(b)
    sim = jnp.where(denom > 0, dot_product(a, b) / jnp.where(denom > 0, denom, 1.0), 0.0)
    return sim


def cosine_distance(a, b) -> jax.Array:
    """1 - cosine_similarity; zero-norm input gives distance 1.0."""
    return 1.0 - cosine_similarity(a, b)


def euclidean_distance(a, b) -> jax.Array:
    a, b = _as_f32(a), _as_f32(b)
    d = a - b
    return jnp.sqrt(jnp.sum(d * d, axis=-1))


def manhattan_distance(a, b) -> jax.Array:
    a, b = _as_f32(a), _as_f32(b)
    return jnp.sum(jnp.abs(a - b), axis=-1)


def normalize(a) -> jax.Array:
    """Unit-normalize; a zero vector normalizes to itself (all zeros)."""
    a = _as_f32(a)
    # keepdims: for batched [B, D] input the (B,) norm would otherwise
    # broadcast along the WRONG (trailing) axis — crashing for B != D and
    # silently dividing columns by the wrong norms for B == D
    n = jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True))
    return jnp.where(n > 0, a / jnp.where(n > 0, n, 1.0), a)


def vector_add(a, b) -> jax.Array:
    return _as_f32(a) + _as_f32(b)


def vector_subtract(a, b) -> jax.Array:
    return _as_f32(a) - _as_f32(b)


def vector_multiply(a, scalar) -> jax.Array:
    return _as_f32(a) * jnp.float32(scalar)
