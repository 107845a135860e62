"""Batched k-means on TPU — the codebook trainer for product quantization.

The reference's "product quantization" never trains anything (its quantize is
``round(first_element*10) rem 256`` — src/vector_compression.erl:256-290, a
placeholder).  Real PQ needs real codebooks; Lloyd's algorithm maps perfectly
onto the MXU: the assignment step is one ``X @ C^T`` distance matmul and the
update step is a one-hot-matmul mean — both batched over subspaces, so all M
codebooks of a PQ train in ONE jitted program with no host round-trips.

All shapes are static: iteration count is fixed (``lax.fori_loop``), empty
clusters are re-seeded deterministically from the points worst-served by the
current codebook.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _assign(x: jax.Array, cents: jax.Array) -> jax.Array:
    """x [N, D], cents [K, D] -> nearest-centroid index [N] (squared L2)."""
    dots = jnp.dot(x, cents.T, preferred_element_type=jnp.float32)  # [N, K]
    cn = jnp.sum(cents * cents, axis=-1)  # [K]
    d2 = cn[None, :] - 2.0 * dots  # x-norm is constant per row; argmin unaffected
    return jnp.argmin(d2, axis=-1)


def _update(x: jax.Array, assign: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Mean per cluster via one-hot matmul. Returns (centroids [K,D], counts [K])."""
    onehot = jax.nn.one_hot(assign, k, dtype=jnp.float32)  # [N, K]
    sums = jnp.dot(onehot.T, x, preferred_element_type=jnp.float32)  # [K, D]
    counts = jnp.sum(onehot, axis=0)  # [K]
    cents = sums / jnp.maximum(counts, 1.0)[:, None]
    return cents, counts


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def kmeans_fit(
    x: jax.Array,          # [N, D] float32 training points
    seed: jax.Array,       # scalar uint32 PRNG key seed
    *,
    k: int,
    iters: int = 25,
) -> Tuple[jax.Array, jax.Array]:
    """Lloyd k-means. Returns (centroids [k, D], assignments [N])."""
    n = x.shape[0]
    key = jax.random.PRNGKey(seed)
    init_idx = jax.random.choice(key, n, shape=(k,), replace=n < k)
    cents0 = x[init_idx]

    def body(_, cents):
        assign = _assign(x, cents)
        new_cents, counts = _update(x, assign, k)
        # Re-seed empty clusters with the points farthest from their centroid.
        d_to_own = jnp.sum((x - new_cents[assign]) ** 2, axis=-1)  # [N]
        _, worst = lax.top_k(d_to_own, k)  # [k] farthest points
        empty = counts < 0.5
        return jnp.where(empty[:, None], x[worst], new_cents)

    cents = lax.fori_loop(0, iters, body, cents0)
    return cents, _assign(x, cents)


@functools.partial(jax.jit, static_argnames=("k", "iters", "m"))
def kmeans_fit_subspaces(
    x: jax.Array,          # [N, D] float32; D divisible by m
    seed: jax.Array,
    *,
    m: int,                # number of subspaces
    k: int,                # centroids per subspace
    iters: int = 25,
) -> jax.Array:
    """Train all M PQ codebooks in one program via vmap over subspaces.

    Returns centroids [m, k, D//m].
    """
    n, d = x.shape
    dsub = d // m
    xs = x.reshape(n, m, dsub).transpose(1, 0, 2)  # [m, N, dsub]
    seeds = seed + jnp.arange(m, dtype=jnp.uint32)

    def fit_one(xsub, s):
        cents, _ = kmeans_fit(xsub, s, k=k, iters=iters)
        return cents

    return jax.vmap(fit_one)(xs, seeds)
