"""Dimension-sharded search — the tensor-parallel axis of the design.

SURVEY §2.3's TPU-native mapping calls for two sharding axes over a store:
rows (the primary, parallel/sharded_store.py) and, when D is too large for
one chip's HBM, the FEATURE dimension: each device holds ``vectors[:, d0:d1]``
and computes partial dot products that a ``psum`` over the mesh combines —
exactly how tensor parallelism splits a matmul's contraction dimension.

Cosine / dot / euclidean all reduce to the dot ``q . x`` plus per-row norms
(replicated, they are O(N) not O(N·D)), so one psum per query batch gives
exact results.  Manhattan sums |q_d - x_d| over D, which is also a psum of
per-device partials.

This module provides the compiled kernel; it composes with row sharding by
using a mesh whose DATA axis splits rows and whose model axis splits D.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"

_INF = float("inf")  # python float: a module-level jnp array would initialize
# the XLA backend at import, breaking jax.distributed.initialize


def make_dim_mesh(n_model: int, devices=None) -> Mesh:
    """1-D mesh over the feature dimension."""
    import numpy as np

    devices = list(devices) if devices is not None else list(jax.devices())
    if n_model > len(devices):
        raise ValueError(f"need {n_model} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n_model]), (MODEL_AXIS,))


def shard_by_dim(mesh: Mesh, vectors: jax.Array) -> jax.Array:
    """Place [N, D] with D split across the model axis (D % n_model == 0)."""
    return jax.device_put(vectors, NamedSharding(mesh, P(None, MODEL_AXIS)))


@functools.lru_cache(maxsize=None)
def _build(mesh: Mesh, metric: str, k: int):
    def local(vecs, nrm, vld, q):
        # vecs [N, D_local], q [B, D_local]; nrm/vld replicated [N]
        pdots = jnp.dot(q, vecs.T, preferred_element_type=jnp.float32)
        if metric == "manhattan":
            # partial L1 over the local dims, then psum
            def per_query(qq):
                return jnp.sum(jnp.abs(vecs - qq[None, :]), axis=-1)

            partial = lax.map(per_query, q)
            dists = lax.psum(partial, MODEL_AXIS)
        else:
            dots = lax.psum(pdots, MODEL_AXIS)                      # [B, N]
            pq2 = jnp.sum(q * q, axis=-1)
            qsq = lax.psum(pq2, MODEL_AXIS)                         # [B]
            if metric == "dot":
                dists = -dots
            elif metric == "cosine":
                qn = jnp.sqrt(qsq)
                denom = qn[:, None] * nrm[None, :]
                sim = jnp.where(denom > 0, dots / jnp.where(denom > 0, denom, 1.0), 0.0)
                dists = 1.0 - sim
            elif metric == "euclidean":
                d2 = qsq[:, None] - 2.0 * dots + (nrm * nrm)[None, :]
                dists = jnp.sqrt(jnp.maximum(d2, 0.0))
            else:
                raise ValueError(metric)
        dists = jnp.where(vld[None, :], dists, _INF)
        neg, rows = lax.top_k(-dists, k)
        return -neg, rows

    shd = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, MODEL_AXIS), P(None), P(None), P(None, MODEL_AXIS)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    return jax.jit(shd)


def dim_sharded_topk(
    mesh: Mesh,
    vectors: jax.Array,  # [N, D] sharded P(None, 'model') (or host array)
    norms: jax.Array,    # [N] f32 (replicated)
    valid: jax.Array,    # [N] bool
    queries: jax.Array,  # [B, D]
    *,
    metric: str = "cosine",
    k: int = 10,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k with the feature dimension split across the mesh."""
    n_model = mesh.shape[MODEL_AXIS]
    if vectors.shape[1] % n_model:
        raise ValueError(
            f"D={vectors.shape[1]} not divisible by model axis {n_model}"
        )
    vecs = shard_by_dim(mesh, vectors)
    q = jax.device_put(queries, NamedSharding(mesh, P(None, MODEL_AXIS)))
    rep = NamedSharding(mesh, P(None))
    fn = _build(mesh, metric, min(k, vectors.shape[0]))
    return fn(vecs, jax.device_put(norms, rep), jax.device_put(valid, rep), q)
