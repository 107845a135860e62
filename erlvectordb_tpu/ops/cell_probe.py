"""Multiprobe cell-gather search — the sub-linear path over cell-residual
layouts.

The brute-force fused scan (ops/fused_topk.py) reads every code row per
batch: at 10M x 768 that is ~4-8 GB of HBM per dispatch, so a SINGLE query
costs the same ~10 ms as a thousand — great throughput, terrible latency.
This op is the other end of the tradeoff, the capability the reference's
``hnsw`` index type advertises (src/vector_index_manager.erl:25-31 — never
implemented there): route each query to its ``nprobe`` nearest cells by one
tiny [B, K] centroid matmul, GATHER only those cells' code blocks
(nprobe * cell_cap rows ~ a few MB), and score them exactly with the raw
f32 query.  Traffic per query drops from O(N) to O(nprobe * cell_cap * W):
sub-linear in the corpus, which is what makes small-batch / low-latency
serving possible at flagship scale.

Graph indexes (HNSW proper) are pointer-chasing — the anti-pattern on a
systolic-array machine.  This partition + residual-quantize + exact-rerank
design is the TPU-native occupant of that slot (the same architecture as
SCaNN's recommended config: coarse partitions, quantized residuals, f32
rescore).  Recall is the classic IVF tradeoff controlled by ``nprobe``;
the balanced assignment (core/ivf.py::_balanced_assign) bounds cell skew so
the fixed-capacity gather loses nothing.

Layouts accepted (detected by ``codes.dtype``):
  * uint8 — packed int4 nibble pairs [N, W/2], dims 2p in the high nibble:
    the int4r VectorStore's own buffers (zero extra memory — the store IS
    the index);
  * int8  — full-width residual codes [N, W] with per-row scales: the
    CellProbeIndex build (index-grade recall; int4's 15 levels cap recall
    ~0.84 on clustered corpora, int8 residuals push quantization error far
    below the routing loss).

Scoring matches fused_topk_residual's exact rescore: q.x decomposes as
q.c_cell + q.res, with the centroid term read straight from the routing
table — the residual dot is the only gathered compute.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

_NEG = -1e30


@functools.partial(jax.jit,
                   static_argnames=("metric", "k", "nprobe", "cell_cap"))
def multiprobe_topk(
    codes: jax.Array,       # [K*cell_cap, W] int8 residual or [.., W/2] uint8
    scales: jax.Array,      # [K*cell_cap] f32 per-row residual scales
    norms: jax.Array,       # [K*cell_cap] f32 norms of the (reconstructed) rows
    valid: jax.Array,       # [K*cell_cap] bool
    centroids: jax.Array,   # [K, W] f32 cell centroids
    queries: jax.Array,     # [B, W] f32 raw queries
    *,
    metric: str,
    k: int,
    nprobe: int,
    cell_cap: int,
) -> Tuple[jax.Array, jax.Array]:
    """Sub-linear multiprobe search. Returns (distances [B, k], rows [B, k]);
    rows are device-row indices into the cell-major layout, distances inf
    past the valid hits."""
    if metric not in ("cosine", "euclidean", "dot"):
        raise ValueError(f"multiprobe does not support metric {metric!r}")
    b, w = queries.shape
    n_cells = centroids.shape[0]
    nprobe = min(nprobe, n_cells)

    # ---- route: top-nprobe cells by the metric's centroid proxy ----------
    table = jnp.dot(queries, centroids.T,
                    preferred_element_type=jnp.float32)        # [B, K]
    cn2 = jnp.sum(centroids * centroids, axis=-1)              # [K]
    # cells with no valid row are routed around (their slots would all be
    # masked anyway — a wasted probe)
    active = valid.reshape(n_cells, cell_cap).any(axis=1)      # [K]
    if metric == "euclidean":
        route = 2.0 * table - cn2[None, :]
    elif metric == "cosine":
        cnorm = jnp.sqrt(cn2)
        route = jnp.where(cnorm > 0,
                          table / jnp.where(cnorm > 0, cnorm, 1.0), 0.0)
    else:  # dot
        route = table
    route = jnp.where(active[None, :], route, _NEG)
    _, probe = lax.top_k(route, nprobe)                        # [B, nprobe]

    # ---- gather: only the probed cells' code blocks ----------------------
    slot = lax.broadcasted_iota(jnp.int32, (1, nprobe, cell_cap), 2)
    rows = (probe[:, :, None] * cell_cap + slot).reshape(b, -1)  # [B, P]
    cand = codes[rows]                                         # [B, P, Wc]
    if codes.dtype == jnp.uint8:                               # packed int4
        hi = (cand >> 4).astype(jnp.int8)
        lo = (cand & 0xF).astype(jnp.int8)
        hi = jnp.where(hi > 7, hi - 16, hi)
        lo = jnp.where(lo > 7, lo - 16, lo)
        cand = jnp.stack([hi, lo], axis=-1).reshape(b, rows.shape[1], -1)
    # residual dot with the RAW f32 query (no query quantization noise)
    dots_res = jnp.einsum(
        "bpw,bw->bp", cand.astype(jnp.float32), queries,
        preferred_element_type=jnp.float32,
    ) * scales[rows]                                           # [B, P]
    tgath = jnp.take_along_axis(table, probe, axis=1)          # [B, nprobe]
    qx = dots_res + jnp.repeat(tgath, cell_cap, axis=1)        # q . x

    # ---- exact distances + top-k ----------------------------------------
    vmask = valid[rows]
    rnorm = norms[rows]
    if metric == "cosine":
        qn = jnp.sqrt(jnp.sum(queries * queries, axis=-1, keepdims=True))
        denom = qn * rnorm
        sim = jnp.where(denom > 0, qx / jnp.where(denom > 0, denom, 1.0), 0.0)
        score = jnp.where(vmask, sim, _NEG)
        dist_of = lambda s: 1.0 - s
    elif metric == "euclidean":
        qsq = jnp.sum(queries * queries, axis=-1, keepdims=True)
        score = jnp.where(vmask, 2.0 * qx - rnorm * rnorm, _NEG)
        dist_of = lambda s: jnp.sqrt(jnp.maximum(qsq - s, 0.0))
    else:  # dot
        score = jnp.where(vmask, qx, _NEG)
        dist_of = lambda s: -s
    kk = min(k, score.shape[1])
    best, sel = lax.top_k(score, kk)
    out_rows = jnp.take_along_axis(rows, sel, axis=1)
    dists = dist_of(best)
    dists = jnp.where(best <= _NEG / 2, jnp.inf, dists)
    return dists, out_rows
