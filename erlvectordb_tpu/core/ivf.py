"""IVF index — inverted-file search with MoE-style query dispatch.

The reference's index manager advertises ``hnsw | ivf | flat`` index types
but implements none of them (simulated builds, never consulted by search —
src/vector_index_manager.erl:25-31, :58-66).  This is a real IVF, built
TPU-first:

  * build: coarse centroids from k-means on a sample (ops/kmeans.py), then
    a BALANCED assignment: every row gets its nearest centroid among its
    top-J choices subject to a per-cell capacity (closest-first greedy,
    vectorized) — balance is what keeps the padded [n_cells, cell_cap, D]
    block layout tight and the dispatch skew bounded;
  * search: queries pick their top-``nprobe`` cells from a tiny
    [B, n_cells] centroid matmul; (query, cell) pairs are sorted by cell
    and scattered into per-cell query buckets (sort-based MoE dispatch — no
    [B, C, q_cap] tensor), one batched [C, q_cap, cell_cap] matmul scores
    every pair, and results merge back per query.

FLOPs ~ (beta * nprobe / n_cells) of the exact scan; recall is the classic
IVF tradeoff, controlled by nprobe.  Cells are experts: sharding them
across a mesh axis turns the dispatch into a routed collective — the
expert-parallel axis of the design (round 2).

A pointer-chasing HNSW graph is deliberately NOT implemented (graph
traversal is the anti-pattern on a systolic-array machine); the ``hnsw``
index TYPE is still served — by the cell-probe design (core/cell_probe.py):
balanced partitions + int8 residual codes + multiprobe gather, the
TPU-native occupant of the sub-linear slot.

WHEN TO USE (measured, v5e single chip): at 1.2M x 100-d the fused exact
scan (ops/fused_topk.py) runs the whole corpus in ~6.5 ms per 1024-query
batch — the routed dispatch here (sorts + scatters + bucketed matmuls)
costs ~120 ms, i.e. IVF is ~18x SLOWER than brute force at that scale even
before its recall loss.  The MXU makes exhaustive scanning absurdly cheap;
selective indexes only pay off when the corpus cannot be scanned at all
(hundreds of millions of rows, or cells sharded across a mesh as experts —
the round-2 EP design).  IVF is kept as a correct, tested index type and
the routing substrate for that work; for anything that fits on a chip,
prefer the fused scan or PQ+rerank.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from erlvectordb_tpu.ops.kmeans import kmeans_fit

_NEG = -1e30


@functools.partial(jax.jit, static_argnames=("j",))
def _top_choices(chunk, centroids, *, j):
    """Nearest-j centroids for a row chunk: ([chunk, j] dists², ids)."""
    dots = jnp.dot(chunk, centroids.T, preferred_element_type=jnp.float32)
    cn = jnp.sum(centroids * centroids, axis=-1)
    d2 = cn[None, :] - 2.0 * dots  # +|x|² is row-constant
    neg, ids = lax.top_k(-d2, j)
    return -neg, ids


@functools.partial(jax.jit, donate_argnums=(0, 1),
                   static_argnames=("j", "chunk"))
def _top_choices_chunk(d_acc, i_acc, dp, centroids, cn, dscale, c,
                       *, j, chunk):
    """One row chunk's nearest-j centroids into donated accumulators."""
    rows = lax.dynamic_slice(dp, (c * chunk, 0), (chunk, dp.shape[1]))
    dots = jnp.dot(rows, centroids.T, preferred_element_type=jnp.float32)
    negd, ids = lax.approx_max_k(-(cn[None, :] - 2.0 * dots), j)
    d_acc = lax.dynamic_update_slice(
        d_acc, (-negd * dscale).astype(jnp.float16), (c * chunk, 0))
    i_acc = lax.dynamic_update_slice(
        i_acc, ids.astype(i_acc.dtype), (c * chunk, 0))
    return d_acc, i_acc


def _top_choices_all(data, centroids, *, j, chunk):
    """All rows' nearest-j centroids with ONE readback — the per-chunk
    dispatch+READBACK loop cost ~130 s per balanced assignment at 1.2M x
    12.5k on the tunneled rig; the dispatches here are async (no
    per-chunk readback), so host-chunking is free.  approx_max_k is fine:
    these are preference lists, a 95%-recall miss still yields a
    near-nearest cell.

    Host-chunked rather than one lax.map program: a two-output
    approx_max_k inside a scan stacks the [chunk, 128] partial-reduce
    val+idx tables across ALL iterations as one scan-wide temp (measured
    8 GiB at 8M rows) — see ops/cell_build.py::_choices_all.

    The readback is the build's wall-clock wall on tunneled rigs (~2 MB/s
    measured), so the outputs are SHRUNK on device: dists as f16 (they
    only order rows within a greedy round) and ids as int16 when the cell
    count fits — 4x fewer bytes than f32+int32."""
    n, d = data.shape
    c = centroids.shape[0]
    pad = (-n) % chunk
    dp = jnp.pad(data, ((0, pad), (0, 0))) if pad else data
    cn = jnp.sum(centroids * centroids, axis=-1)
    id_t = jnp.int16 if c <= 32767 else jnp.int32
    # global order-preserving scale so the f16 cast cannot overflow: |dist|
    # <= cn_max + 2*sqrt(xn2_max*cn_max); unnormalized corpora (norms over
    # ~256) would otherwise saturate every distance to +/-inf and the
    # greedy's closest-first ordering would be destroyed silently
    cn_max = jnp.maximum(jnp.max(cn), 1e-9)
    xn2_max = jnp.max(jnp.sum(dp * dp, axis=-1))
    dscale = 1.0 / (cn_max + 2.0 * jnp.sqrt(xn2_max * cn_max) + 1.0)

    npad_rows = dp.shape[0]
    if jax.default_backend() != "tpu":
        # buffer donation is unsupported on CPU, so the per-chunk dispatch
        # loop below would COPY both full [N, j] accumulators per chunk
        # (O(n_chunks * N * j)).  The scan-stacked approx_max_k temp the
        # loop exists to avoid is a TPU/XLA-scan behavior; on host
        # backends one lax.map program is both safe and linear.
        def one(rows):
            dots = jnp.dot(rows, centroids.T,
                           preferred_element_type=jnp.float32)
            negd, cids = lax.approx_max_k(-(cn[None, :] - 2.0 * dots), j)
            return ((-negd * dscale).astype(jnp.float16),
                    cids.astype(id_t))
        d3, i3 = lax.map(one, dp.reshape(-1, chunk, d))
        return d3.reshape(-1, j)[:n], i3.reshape(-1, j)[:n]
    dists = jnp.zeros((npad_rows, j), jnp.float16)
    ids = jnp.zeros((npad_rows, j), id_t)
    # device-resident chunk indices: a host scalar per dispatch costs a
    # tunnel H2D round-trip each — see cell_build._choices_all
    cis = jnp.arange(npad_rows // chunk, dtype=jnp.int32)
    for ci in range(npad_rows // chunk):
        dists, ids = _top_choices_chunk(
            dists, ids, dp, centroids, cn, dscale, cis[ci],
            j=j, chunk=chunk)
    return dists[:n], ids[:n]


def _balanced_assign(data: np.ndarray, centroids: np.ndarray, cap: int,
                     j: int = 32, chunk: int = 131072) -> np.ndarray:
    """owner[i] = cell of row i; closest-first greedy over J choice rounds
    with per-cell capacity.

    Placement quality is what routing recall lives or dies by: a row parked
    far from its natural cell is findable only by luck.  So bumped rows walk
    DOWN THEIR OWN preference list (J deep), and the rare stragglers get a
    genuine nearest-cell-with-space pass — never an arbitrary dump."""
    n = data.shape[0]
    c = centroids.shape[0]
    j = min(j, c)
    # bound the [chunk, C] distance intermediate for large cell counts
    chunk = min(chunk, max(4096, (1 << 27) // max(c, 1)))
    cj = jnp.asarray(centroids)
    d_all, i_all = _top_choices_all(jnp.asarray(data), cj, j=j,
                                    chunk=min(chunk, n))
    ch_d = np.asarray(d_all)
    ch_i = np.asarray(i_all).astype(np.int32)

    owner = np.full(n, -1, np.int64)
    fill = np.zeros(c, np.int64)
    remaining = np.arange(n)
    for round_j in range(j):
        if remaining.size == 0:
            break
        cells = ch_i[remaining, round_j].astype(np.int64)
        dists = ch_d[remaining, round_j]
        by_dist = np.argsort(dists, kind="stable")       # closest first
        rr, cc = remaining[by_dist], cells[by_dist]
        by_cell = np.argsort(cc, kind="stable")          # keeps dist order
        rr, cc = rr[by_cell], cc[by_cell]
        starts = np.searchsorted(cc, np.arange(c))
        rank = np.arange(rr.size) - starts[cc]
        accept = rank < (cap - fill[cc])
        owner[rr[accept]] = cc[accept]
        fill += np.bincount(cc[accept], minlength=c)
        remaining = rr[~accept]
    if remaining.size:
        # stragglers: nearest cell WITH SPACE (full distance row, masked)
        open_cells = np.where(fill < cap)[0]
        dists_all = np.asarray(
            jnp.dot(jnp.asarray(data[remaining]),
                    cj[open_cells].T, preferred_element_type=jnp.float32)
        )
        cn = (centroids[open_cells] ** 2).sum(axis=1)
        d2 = cn[None, :] - 2.0 * dists_all
        order = np.argsort(d2.min(axis=1), kind="stable")
        for ri in order:  # small set: per-row greedy is fine
            row = remaining[ri]
            for oc in np.argsort(d2[ri], kind="stable"):
                cell = open_cells[oc]
                if fill[cell] < cap:
                    owner[row] = cell
                    fill[cell] += 1
                    break
        # anything still unplaced (cap exhausted in open set) -> emptiest
        left = remaining[owner[remaining] < 0]
        if left.size:
            space_cells = np.repeat(np.arange(c), np.maximum(cap - fill, 0))
            owner[left] = space_cells[: left.size]
    return owner


class IVFIndex:
    """Cell-grouped rows + coarse centroids (balanced cells)."""

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
        iters: int = 20,
        seed: int = 0,
        beta: float = 1.3,         # capacity factor over perfect balance
        max_train: int = 200_000,
    ) -> "IVFIndex":
        n, d = data.shape
        n_cells = min(n_cells, max(1, n // 4))
        train = data
        if n > max_train:
            idx = np.random.default_rng(seed).choice(n, max_train, replace=False)
            train = data[idx]
        cents, _ = kmeans_fit(jnp.asarray(train), jnp.uint32(seed),
                              k=n_cells, iters=iters, init="kpp")
        cents = np.asarray(cents)

        cell_cap = int(-(-beta * n / n_cells // 8) * 8)
        cell_cap = max(8, min(cell_cap, n))
        owner = _balanced_assign(data, cents, cell_cap)

        order = np.argsort(owner, kind="stable")
        oc = owner[order]
        starts = np.searchsorted(oc, np.arange(n_cells))
        slot = np.arange(n) - starts[oc]

        cells = np.zeros((n_cells, cell_cap, d), np.float32)
        cell_rows = np.full((n_cells, cell_cap), -1, np.int32)
        cell_norms = np.zeros((n_cells, cell_cap), np.float32)
        cells[oc, slot] = data[order]
        cell_rows[oc, slot] = rows[order]
        cell_norms[oc, slot] = norms[order]
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
        # per-cell query bucket size: 4x the uniform share absorbs routing
        # skew (balanced cells keep it bounded); pairs past it are dropped
        q_cap = int(-(-4 * b * nprobe / self.n_cells // 8) * 8 + 8)
        q_cap = max(8, min(q_cap, b))
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

    def to_arrays(self) -> dict:
        return {
            "centroids": np.asarray(self.centroids),
            "cells": np.asarray(self.cells),
            "cell_rows": np.asarray(self.cell_rows),
            "cell_norms": np.asarray(self.cell_norms),
        }

    @classmethod
    def from_arrays(cls, d: dict) -> "IVFIndex":
        cell_rows = np.asarray(d["cell_rows"])
        return cls(
            jnp.asarray(d["centroids"]),
            jnp.asarray(d["cells"]),
            jnp.asarray(cell_rows),
            jnp.asarray(d["cell_norms"]),
            jnp.asarray(cell_rows >= 0),
            cell_rows,
        )


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "q_cap", "metric"))
def _ivf_search(cells, cell_rows, cell_norms, cell_valid, centroids, q,
                *, k, nprobe, q_cap, metric):
    b, d = q.shape
    n_cells, cap, _ = cells.shape
    p = b * nprobe

    # 1. route: top-nprobe cells per query (tiny matmul)
    cdots = jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)
    cn = jnp.sum(centroids * centroids, axis=-1)
    cdist = cn[None, :] - 2.0 * cdots
    _, probe = lax.top_k(-cdist, nprobe)                   # [B, nprobe]

    # 2. sort-based dispatch: (query, cell) pairs bucketed per cell
    pair_cell = probe.reshape(-1)                          # [P]
    pair_query = jnp.repeat(jnp.arange(b, dtype=jnp.int32), nprobe)
    order = jnp.argsort(pair_cell, stable=True)
    pc = pair_cell[order]
    pq = pair_query[order]
    starts = jnp.searchsorted(pc, jnp.arange(n_cells))
    rank = jnp.arange(p, dtype=jnp.int32) - starts[pc].astype(jnp.int32)
    keep = rank < q_cap
    q_per_cell = jnp.zeros((n_cells, q_cap, d), jnp.float32).at[
        pc, rank
    ].set(q[pq], mode="drop")                              # [C, q_cap, D]

    # 3. expert compute: one batched matmul scores every bucketed pair
    dots = jnp.einsum("cqd,crd->cqr", q_per_cell, cells,
                      preferred_element_type=jnp.float32)  # [C, q_cap, cap]
    if metric in ("euclidean", "l2"):
        qsq = jnp.sum(q_per_cell * q_per_cell, axis=-1)
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

    # 4. per-(cell, slot) top-k', gathered back per pair, merged per query
    kk = min(k, cap)
    top_sc, top_i = lax.top_k(sc, kk)                      # [C, q_cap, kk]
    top_rows = jnp.take_along_axis(
        jnp.broadcast_to(cell_rows[:, None, :], sc.shape), top_i, axis=2
    )
    rank_c = jnp.minimum(rank, q_cap - 1)
    pair_sc = jnp.where(keep[:, None], top_sc[pc, rank_c], _NEG)   # [P, kk]
    pair_rows = jnp.where(keep[:, None], top_rows[pc, rank_c], -1)
    # un-sort: back to (query-major, probe-slot) order
    cand_sc = jnp.zeros((p, kk), jnp.float32).at[order].set(pair_sc)
    cand_rows = jnp.full((p, kk), -1, jnp.int32).at[order].set(pair_rows)
    cand_sc = cand_sc.reshape(b, nprobe * kk)
    cand_rows = cand_rows.reshape(b, nprobe * kk)

    kf = min(k, cand_sc.shape[1])
    best, sel = lax.top_k(cand_sc, kf)
    rows_out = jnp.take_along_axis(cand_rows, sel, axis=1)
    rows_out = jnp.where(best > _NEG / 2, rows_out, -1)

    if metric in ("euclidean", "l2"):
        dist = jnp.sqrt(jnp.maximum(-best, 0.0))
    elif metric == "dot":
        dist = -best
    else:  # cosine
        dist = 1.0 - best
    dist = jnp.where(rows_out >= 0, dist, jnp.inf)
    return dist, rows_out
