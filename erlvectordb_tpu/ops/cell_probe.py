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
q.c_cell + q.res; the centroid term is recomputed in f32 for the probed
cells only, so the bf16 routing matmul never touches reported distances.

Measured (v5e, synthetic 8M x 768 int8 cell store, nprobe=64, bq=8,
T-slope to exclude the rig's tunnel RTT): 0.62 ms per query-program vs
8.5 ms for the brute fused scan — ~14x.  Two lowering details carry that
number: the gather must be CELL-granularity (B*nprobe contiguous ~100 KB
blocks; per-row descriptors measured ~6x slower for the same bytes), and
the routing table must be a PERSISTENT bf16 copy (an in-program astype
makes XLA read the full f32 table anyway).  At 1.2M x 100 the corpus is
only ~60 MB and the brute MXU scan is already ~1.8 ms — multiprobe pays
off above roughly 1 GB of codes, exactly the flagship-scale regime.
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
    centroids_route: jax.Array | None = None,  # persistent bf16 [K, W] copy
) -> Tuple[jax.Array, jax.Array]:
    """Sub-linear multiprobe search. Returns (distances [B, k], rows [B, k]);
    rows are device-row indices into the cell-major layout, distances inf
    past the valid hits.

    ``centroids_route``: optional pre-converted bf16 centroid table for the
    routing matmul.  Without it the in-program astype makes XLA read the
    full f32 table anyway; callers that search repeatedly should keep a
    persistent bf16 copy (halves the dominant HBM read at large K)."""
    if metric not in ("cosine", "euclidean", "dot"):
        raise ValueError(f"multiprobe does not support metric {metric!r}")
    b, w = queries.shape
    n_cells = centroids.shape[0]
    nprobe = min(nprobe, n_cells)

    # ---- route: top-nprobe cells by the metric's centroid proxy ----------
    # The [B, K] routing matmul reads the whole centroid table per program
    # — at 62k cells x 768 dims that is 192 MB f32, 3x the probed data.
    # Route in BF16 (ranking-grade; half the HBM read) and recompute the
    # probed cells' centroid dots exactly in f32 below (1-2 MB gather), so
    # scoring precision is unaffected.
    cr = (centroids_route if centroids_route is not None
          else centroids.astype(jnp.bfloat16))
    table_r = jnp.dot(queries.astype(jnp.bfloat16), cr.T,
                      preferred_element_type=jnp.float32)      # [B, K]
    cn2 = jnp.sum(centroids * centroids, axis=-1)              # [K]
    # cells with no valid row are routed around (their slots would all be
    # masked anyway — a wasted probe)
    active = valid.reshape(n_cells, cell_cap).any(axis=1)      # [K]
    if metric == "euclidean":
        route = 2.0 * table_r - cn2[None, :]
    elif metric == "cosine":
        cnorm = jnp.sqrt(cn2)
        route = jnp.where(cnorm > 0,
                          table_r / jnp.where(cnorm > 0, cnorm, 1.0), 0.0)
    else:  # dot
        route = table_r
    route = jnp.where(active[None, :], route, _NEG)
    _, probe = lax.top_k(route, nprobe)                        # [B, nprobe]

    # ---- gather: only the probed cells' code blocks ----------------------
    # CELL-granularity gather: B*nprobe contiguous (cell_cap * W)-byte
    # blocks instead of B*nprobe*cell_cap per-row descriptors — TPU gather
    # throughput is descriptor-bound, and a row-granularity gather of the
    # same bytes measured ~6x slower at 8M x 768.
    slot = lax.broadcasted_iota(jnp.int32, (1, nprobe, cell_cap), 2)
    rows = (probe[:, :, None] * cell_cap + slot).reshape(b, -1)  # [B, P]
    codes3 = codes.reshape(n_cells, cell_cap, codes.shape[1])
    cand = codes3[probe]                               # [B, np, cap, Wc]
    if codes.dtype == jnp.uint8:                               # packed int4
        hi = (cand >> 4).astype(jnp.int8)
        lo = (cand & 0xF).astype(jnp.int8)
        hi = jnp.where(hi > 7, hi - 16, hi)
        lo = jnp.where(lo > 7, lo - 16, lo)
        cand = jnp.stack([hi, lo], axis=-1).reshape(
            b, nprobe, cell_cap, -1)
    # residual dot in bf16 accumulated f32: the residual term is a small
    # fraction of the score (|res| << |x|), so bf16's 2^-8 relative error
    # on it is far below the int8/int4 code quantization already present
    pscales = scales.reshape(n_cells, cell_cap)[probe]  # [B, np, cap]
    dots_res = jnp.einsum(
        "bpcw,bw->bpc", cand.astype(jnp.bfloat16),
        queries.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).reshape(b, -1) * pscales.reshape(b, -1)                  # [B, P]
    # exact f32 centroid dots for the PROBED cells only (the bf16 routing
    # table is ranking-grade, not scoring-grade)
    pcents = centroids[probe]                                  # [B, np, W]
    tgath = jnp.einsum("bpw,bw->bp", pcents, queries,
                       preferred_element_type=jnp.float32)     # [B, nprobe]
    qx = dots_res + jnp.repeat(tgath, cell_cap, axis=1)        # q . x

    # ---- exact distances + top-k ----------------------------------------
    vmask = valid.reshape(n_cells, cell_cap)[probe].reshape(b, -1)
    rnorm = norms.reshape(n_cells, cell_cap)[probe].reshape(b, -1)
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
