"""IVF index — inverted-file search with MoE-style query dispatch.

The reference's index manager advertises ``hnsw | ivf | flat`` index types
but implements none of them (simulated builds, never consulted by search —
src/vector_index_manager.erl:25-31, :58-66).  This is a real IVF, built
TPU-first:

  * build: k-means coarse centroids (ops/kmeans.py); rows grouped by cell
    into a PADDED [n_cells, cell_cap, D] block layout (static shapes —
    overflow rows spill into their next-nearest cell with free capacity);
  * search: queries pick their top-``nprobe`` cells from a tiny
    [B, n_cells] centroid matmul, then are DISPATCHED to those cells
    exactly like MoE tokens to experts: per cell, up to ``q_cap`` probing
    queries are gathered, one batched [n_cells, q_cap, cell_cap] matmul
    scores every (query, cell) pair, and results scatter back per query.

FLOPs ~ nprobe/n_cells of the exact scan (e.g. 8/256 = 32x less); recall is
the classic IVF tradeoff, controlled by nprobe.  This is also the
expert-parallel (EP) blueprint: cells are experts; sharding cells across a
mesh axis turns the dispatch into a routed collective (round 2).

HNSW is deliberately NOT implemented: pointer-chasing graph traversal is
the anti-pattern on a systolic-array machine; IVF(+PQ) delivers the same
speed-recall tradeoff with dense math.

SCALE LIMIT (round-1 state): the build does not yet balance cells, so at
million-row scale a skewed k-means makes cell_cap explode and the bounded
dispatch capacity drops most (query, cell) pairs — recall collapses.
Validated for stores up to ~100k rows; million-scale needs the balanced
build (capacity-constrained assignment + nearest-with-space spill) and a
skew-aware q_cap, tracked for round 2.  The fused exact kernels remain the
recommended path at any scale (155k QPS at 1.2M without an index).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from erlvectordb_tpu.ops.kmeans import kmeans_fit

_NEG = -1e30


class IVFIndex:
    """Cell-grouped rows + coarse centroids."""

    def __init__(self, centroids, cells, cell_rows, cell_norms, cell_valid,
                 row_map):
        self.centroids = jnp.asarray(centroids, jnp.float32)  # [C, D]
        self.cells = cells            # [C, cap, D] f32 rows grouped by cell
        self.cell_rows = cell_rows    # [C, cap] i32 original store rows
        self.cell_norms = cell_norms  # [C, cap] f32
        self.cell_valid = cell_valid  # [C, cap] bool
        self.row_map = row_map        # np [C, cap] copy for stats
        self.n_cells = self.centroids.shape[0]
        self.cell_cap = cells.shape[1]

    # ------------------------------------------------------------------ build

    @classmethod
    def build(
        cls,
        data: np.ndarray,          # [N, D] f32 (store rows, already padded)
        rows: np.ndarray,          # [N] original store row ids
        norms: np.ndarray,         # [N]
        n_cells: int = 64,
        iters: int = 15,
        seed: int = 0,
    ) -> "IVFIndex":
        n, d = data.shape
        n_cells = min(n_cells, max(1, n // 4))
        cents, assign = kmeans_fit(jnp.asarray(data), jnp.uint32(seed),
                                   k=n_cells, iters=iters)
        cents = np.asarray(cents)
        assign = np.asarray(assign)

        counts = np.bincount(assign, minlength=n_cells)
        cell_cap = max(8, int(-(-counts.max() // 8) * 8))  # pad to x8 rows

        # overflow spill: rows beyond a cell's capacity go to the emptiest
        # cell (keeps shapes static; recall impact negligible at sane caps)
        order = np.argsort(assign, kind="stable")
        cells = np.zeros((n_cells, cell_cap, d), np.float32)
        cell_rows = np.full((n_cells, cell_cap), -1, np.int32)
        cell_norms = np.zeros((n_cells, cell_cap), np.float32)
        fill = np.zeros(n_cells, np.int64)
        for idx in order:
            c = assign[idx]
            if fill[c] >= cell_cap:
                c = int(np.argmin(fill))
            cells[c, fill[c]] = data[idx]
            cell_rows[c, fill[c]] = rows[idx]
            cell_norms[c, fill[c]] = norms[idx]
            fill[c] += 1
        cell_valid = cell_rows >= 0
        return cls(cents, jnp.asarray(cells), jnp.asarray(cell_rows),
                   jnp.asarray(cell_norms), jnp.asarray(cell_valid),
                   cell_rows)

    # ----------------------------------------------------------------- search

    def search(self, queries, k: int = 10, nprobe: int = 8,
               metric: str = "euclidean") -> Tuple[np.ndarray, np.ndarray]:
        """Returns (distances [B, k], store-rows [B, k]; -1 rows = no hit)."""
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None, :]
        nprobe = min(nprobe, self.n_cells)
        b = q.shape[0]
        # q_cap: how many queries one cell serves per batch (MoE capacity)
        q_cap = max(8, int(-(-b * nprobe * 2 // self.n_cells) // 8 * 8 + 8))
        q_cap = min(q_cap, b)
        d, r = _ivf_search(
            self.cells, self.cell_rows, self.cell_norms, self.cell_valid,
            self.centroids, q, k=min(k, self.cell_cap * nprobe),
            nprobe=nprobe, q_cap=q_cap, metric=metric,
        )
        return np.asarray(d), np.asarray(r)

    def stats(self) -> dict:
        fill = (self.row_map >= 0).sum(axis=1)
        return {
            "kind": "ivf",
            "n_cells": int(self.n_cells),
            "cell_cap": int(self.cell_cap),
            "rows": int(fill.sum()),
            "min_cell": int(fill.min()),
            "max_cell": int(fill.max()),
        }


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "q_cap", "metric"))
def _ivf_search(cells, cell_rows, cell_norms, cell_valid, centroids, q,
                *, k, nprobe, q_cap, metric):
    b, d = q.shape
    n_cells, cap, _ = cells.shape

    # 1. route: top-nprobe cells per query (tiny matmul)
    cdots = jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)
    cn = jnp.sum(centroids * centroids, axis=-1)
    cdist = cn[None, :] - 2.0 * cdots                      # [B, C] (+|q|² const)
    _, probe = lax.top_k(-cdist, nprobe)                   # [B, nprobe]

    # 2. dispatch: per cell, gather up to q_cap probing queries (MoE-style)
    onehot = jax.nn.one_hot(probe, n_cells, dtype=jnp.int32).sum(axis=1)  # [B, C]
    position = jnp.cumsum(onehot, axis=0) - 1              # [B, C] slot per query
    keep = (onehot > 0) & (position < q_cap)
    # dispatch mask [B, C, q_cap]
    disp = keep[:, :, None] & (
        position[:, :, None] == jnp.arange(q_cap)[None, None, :]
    )
    disp_f = disp.astype(jnp.float32)
    q_per_cell = jnp.einsum("bcq,bd->cqd", disp_f, q)      # [C, q_cap, D]

    # 3. expert compute: one batched matmul scores every (cell, slot, row)
    dots = jnp.einsum("cqd,crd->cqr", q_per_cell, cells,
                      preferred_element_type=jnp.float32)  # [C, q_cap, cap]
    if metric in ("euclidean", "l2"):
        qsq = jnp.sum(q_per_cell * q_per_cell, axis=-1)    # [C, q_cap]
        sc = -(qsq[:, :, None] - 2.0 * dots + (cell_norms**2)[:, None, :])
    elif metric == "dot":
        sc = dots
    elif metric == "cosine":
        qn = jnp.sqrt(jnp.sum(q_per_cell * q_per_cell, axis=-1))
        denom = qn[:, :, None] * cell_norms[:, None, :]
        sc = jnp.where(denom > 0, dots / jnp.where(denom > 0, denom, 1.0), 0.0)
    else:
        raise ValueError(metric)
    sc = jnp.where(cell_valid[:, None, :], sc, _NEG)       # mask padding rows

    # 4. per-(query, probed cell) top-k', then combine across cells
    kk = min(k, cap)
    top_sc, top_i = lax.top_k(sc, kk)                      # [C, q_cap, kk]
    top_rows = jnp.take_along_axis(
        jnp.broadcast_to(cell_rows[:, None, :], sc.shape), top_i, axis=2
    )
    # combine: route each cell-slot's results back to its query
    # cand score [B, C, kk]: for each query, its slot's results in cell c
    cand_sc = jnp.einsum("bcq,cqk->bck", disp_f, top_sc)
    cand_sc = jnp.where(keep[:, :, None], cand_sc, _NEG)
    cand_rows = jnp.einsum("bcq,cqk->bck", disp_f, top_rows.astype(jnp.float32))
    cand_sc = cand_sc.reshape(b, n_cells * kk)
    cand_rows = cand_rows.reshape(b, n_cells * kk).astype(jnp.int32)

    kf = min(k, cand_sc.shape[1])
    best, sel = lax.top_k(cand_sc, kf)
    rows_out = jnp.take_along_axis(cand_rows, sel, axis=1)
    rows_out = jnp.where(best > _NEG / 2, rows_out, -1)

    # scores back to distances
    if metric in ("euclidean", "l2"):
        dist = jnp.sqrt(jnp.maximum(-best, 0.0))
    elif metric == "dot":
        dist = -best
    else:  # cosine
        dist = 1.0 - best
    dist = jnp.where(rows_out >= 0, dist, jnp.inf)
    return dist, rows_out
