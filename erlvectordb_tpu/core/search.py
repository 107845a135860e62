"""Batched exact-scan distance + top-k — the hot path, TPU-first.

The reference's search is an interpreted O(N*D) fold over every vector plus a
full O(N log N) sort per query, serialized through one process per store
(reference: src/vector_store.erl:227-236 and :143-150).  Here the same exact
semantics become ONE jitted XLA program per (capacity, dim, metric, k-bucket):

  * cosine / dot:   a single ``Q @ X^T`` matmul on the MXU, scaled by
                    precomputed row norms;
  * euclidean:      the ``|x|^2 - 2 q.x + |q|^2`` expansion, i.e. the same
                    matmul plus rank-1 corrections (XLA fuses them);
  * manhattan:      a VPU scan tiled over queries (no matmul form exists).

followed by ``jax.lax.top_k`` over masked distances.  Queries are batched
[B, D] so one compiled program serves any number of concurrent clients —
there is no per-store serialization.

Static-shape discipline: ``k`` is bucketed to the next power of two and
result rows are trimmed on the host, so changing ``k`` between 1 and the
bucket bound never recompiles.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

Metric = str  # "cosine" | "euclidean" | "manhattan" | "dot"

VALID_METRICS = ("cosine", "euclidean", "manhattan", "dot")

_INF = float("inf")  # python float: a module-level jnp array would initialize
# the XLA backend at import, breaking jax.distributed.initialize


def k_bucket(k: int, n_cap: int) -> int:
    """Round k up to a power of two (capped at capacity) to limit recompiles."""
    if k >= n_cap:
        return n_cap
    b = 1
    while b < k:
        b *= 2
    return min(b, n_cap)


def pairwise_distances(
    vectors: jax.Array,  # [N, D] f32 (or int8 codes already dequant-scaled)
    norms: jax.Array,    # [N]    f32 — precomputed L2 norms of rows
    queries: jax.Array,  # [B, D] f32
    metric: Metric,
) -> jax.Array:          # [B, N] f32 distances (smaller = closer)
    if metric == "manhattan":
        # No matmul form: tile over queries to bound the [B, N, D] intermediate.
        def per_query(q):
            return jnp.sum(jnp.abs(vectors - q[None, :]), axis=-1)

        return lax.map(per_query, queries)

    # All remaining metrics ride one MXU matmul: [B, D] @ [D, N].
    dots = jnp.dot(queries, vectors.T, preferred_element_type=jnp.float32)  # [B, N]

    if metric == "dot":
        # Higher dot = closer; negate so smaller = closer, like the others.
        return -dots
    if metric == "cosine":
        qn = jnp.sqrt(jnp.sum(queries * queries, axis=-1))  # [B]
        denom = qn[:, None] * norms[None, :]
        sim = jnp.where(denom > 0, dots / jnp.where(denom > 0, denom, 1.0), 0.0)
        # Zero-norm rows/queries get similarity 0 → distance 1.0
        # (semantics of reference src/vector_store.erl:238-246).
        return 1.0 - sim
    if metric == "euclidean":
        qsq = jnp.sum(queries * queries, axis=-1)  # [B]
        d2 = qsq[:, None] - 2.0 * dots + (norms * norms)[None, :]
        return jnp.sqrt(jnp.maximum(d2, 0.0))
    raise ValueError(f"unknown metric {metric!r}")


@functools.partial(jax.jit, static_argnames=("metric", "k"))
def exact_topk(
    vectors: jax.Array,  # [N_cap, D] f32
    norms: jax.Array,    # [N_cap]    f32
    valid: jax.Array,    # [N_cap]    bool
    queries: jax.Array,  # [B, D]     f32
    *,
    metric: Metric,
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k nearest rows. Returns (distances [B, k], rows [B, k]).

    Invalid (deleted / never-written) rows surface as distance +inf; the host
    trims them, which reproduces the reference's "return at most N results"
    behavior (src/vector_store.erl:234-236 sublist semantics).
    """
    dists = pairwise_distances(vectors, norms, queries, metric)
    dists = jnp.where(valid[None, :], dists, _INF)
    neg, rows = lax.top_k(-dists, k)
    return -neg, rows


def int8_distances(
    codes: jax.Array,    # [N, D] int8 symmetric-quantized rows
    scales: jax.Array,   # [N]    f32 per-row scale
    norms: jax.Array,    # [N]    f32 norms of the ORIGINAL f32 rows
    queries: jax.Array,  # [B, D] f32
    metric: Metric,
) -> jax.Array:          # [B, N] f32 distances (smaller = closer)
    """Distances against int8 rows, computed in the quantized domain
    (int8 x int8 -> int32 on the MXU; scales correct the result)."""
    q_absmax = jnp.max(jnp.abs(queries), axis=-1, keepdims=True)
    q_scale = jnp.where(q_absmax > 0, q_absmax / 127.0, 1.0)  # [B, 1]
    q_codes = jnp.clip(jnp.round(queries / q_scale), -127, 127).astype(jnp.int8)

    idots = jnp.dot(q_codes, codes.T, preferred_element_type=jnp.int32)  # [B, N]
    dots = idots.astype(jnp.float32) * q_scale * scales[None, :]

    if metric == "dot":
        return -dots
    if metric == "cosine":
        qn = jnp.sqrt(jnp.sum(queries * queries, axis=-1))
        denom = qn[:, None] * norms[None, :]
        sim = jnp.where(denom > 0, dots / jnp.where(denom > 0, denom, 1.0), 0.0)
        return 1.0 - sim
    if metric == "euclidean":
        qsq = jnp.sum(queries * queries, axis=-1)
        d2 = qsq[:, None] - 2.0 * dots + (norms * norms)[None, :]
        return jnp.sqrt(jnp.maximum(d2, 0.0))
    if metric == "manhattan":
        deq = codes.astype(jnp.float32) * scales[:, None]

        def per_query(q):
            return jnp.sum(jnp.abs(deq - q[None, :]), axis=-1)

        return lax.map(per_query, queries)
    raise ValueError(f"unknown metric {metric!r}")


def unpack_int4(packed: jax.Array) -> jax.Array:
    """[N, W/2] uint8 (two signed nibbles per byte, first value in the high
    nibble) -> [N, W] int8 codes in [-8, 7]."""
    hi = (packed >> 4).astype(jnp.int8)
    lo = (packed & 0xF).astype(jnp.int8)
    hi = jnp.where(hi > 7, hi - 16, hi)
    lo = jnp.where(lo > 7, lo - 16, lo)
    return jnp.stack([hi, lo], axis=-1).reshape(packed.shape[0], -1)


@functools.partial(jax.jit, static_argnames=("metric", "k"))
def exact_topk_int4(
    packed: jax.Array,   # [N_cap, W/2] uint8 packed signed nibbles
    scales: jax.Array,   # [N_cap] f32 per-row scale (x ~= scale * code4)
    norms: jax.Array,    # [N_cap] f32 norms of the ORIGINAL f32 rows
    valid: jax.Array,    # [N_cap] bool
    queries: jax.Array,  # [B, W] f32
    *,
    metric: Metric,
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Top-k over a packed int4 store: unpack nibbles to int8 on device and
    run the quantized-domain scan.  Memory at rest is half of int8; the
    unpacked codes are a transient (fused-away where possible)."""
    codes = unpack_int4(packed)
    dists = int8_distances(codes, scales, norms, queries, metric)
    dists = jnp.where(valid[None, :], dists, _INF)
    neg, rows = lax.top_k(-dists, k)
    return -neg, rows


@functools.partial(jax.jit, static_argnames=("metric", "k", "cell_cap"))
def exact_topk_int4r(
    packed: jax.Array,     # [N_cap, W/2] packed signed nibbles (RESIDUALS)
    scales: jax.Array,     # [N_cap] f32 residual scales
    norms: jax.Array,      # [N_cap] f32 norms of the ORIGINAL rows
    valid: jax.Array,      # [N_cap] bool
    centroids: jax.Array,  # [K, W] f32 cell centroids
    queries: jax.Array,    # [B, W] f32
    *,
    metric: Metric,
    k: int,
    cell_cap: int,         # rows per cell; N_cap == K * cell_cap
) -> Tuple[jax.Array, jax.Array]:
    """Top-k over a cell-residual int4 store (XLA path; the fused Pallas
    version is ops/fused_topk.fused_topk_residual).  Row r's vector is
    ``centroids[r // cell_cap] + unpack(packed[r]) * scales[r]``, so the raw
    dot decomposes into the centroid table plus the quantized residual dot —
    4-bit codes quantize only the (much smaller) residual."""
    codes = unpack_int4(packed)
    n = packed.shape[0]
    q_absmax = jnp.max(jnp.abs(queries), axis=-1, keepdims=True)
    q_scale = jnp.where(q_absmax > 0, q_absmax / 127.0, 1.0)
    q_codes = jnp.clip(jnp.round(queries / q_scale), -127, 127).astype(jnp.int8)
    rdots = jnp.dot(q_codes, codes.T, preferred_element_type=jnp.int32
                    ).astype(jnp.float32) * q_scale * scales[None, :]
    table = jnp.dot(queries, centroids.T, preferred_element_type=jnp.float32)
    cells = jnp.arange(n, dtype=jnp.int32) // cell_cap
    dots = rdots + table[:, cells]

    if metric == "dot":
        dists = -dots
    elif metric == "cosine":
        qn = jnp.sqrt(jnp.sum(queries * queries, axis=-1))
        denom = qn[:, None] * norms[None, :]
        sim = jnp.where(denom > 0, dots / jnp.where(denom > 0, denom, 1.0), 0.0)
        dists = 1.0 - sim
    elif metric == "euclidean":
        qsq = jnp.sum(queries * queries, axis=-1)
        d2 = qsq[:, None] - 2.0 * dots + (norms * norms)[None, :]
        dists = jnp.sqrt(jnp.maximum(d2, 0.0))
    elif metric == "manhattan":
        deq = centroids[cells] + codes.astype(jnp.float32) * scales[:, None]

        def per_query(q):
            return jnp.sum(jnp.abs(deq - q[None, :]), axis=-1)

        dists = lax.map(per_query, queries)
    else:
        raise ValueError(f"unknown metric {metric!r}")
    dists = jnp.where(valid[None, :], dists, _INF)
    neg, rows = lax.top_k(-dists, k)
    return -neg, rows


@functools.partial(jax.jit, static_argnames=("metric", "k"))
def exact_topk_int8(
    codes: jax.Array,    # [N_cap, D] int8 symmetric-quantized rows
    scales: jax.Array,   # [N_cap]    f32 per-row scale (x ~= scale * code)
    norms: jax.Array,    # [N_cap]    f32 norms of the ORIGINAL f32 rows
    valid: jax.Array,    # [N_cap]    bool
    queries: jax.Array,  # [B, D]     f32
    *,
    metric: Metric,
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Top-k over an int8-quantized store, computed in the quantized domain.

    The query is symmetrically quantized on device, the code-vs-code dot runs
    as an int8 x int8 -> int32 MXU matmul (the TPU's highest-throughput path),
    and per-row/per-query scales rescale the result.  This is what replaces
    searching decompressed vectors in the reference (it decompresses before
    search — src/vector_persistence.erl:276-283; we never do).
    """
    dists = int8_distances(codes, scales, norms, queries, metric)
    dists = jnp.where(valid[None, :], dists, _INF)
    neg, rows = lax.top_k(-dists, k)
    return -neg, rows
