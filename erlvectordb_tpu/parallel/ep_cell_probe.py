"""Expert-parallel cell-probe — the hnsw slot, sharded over the mesh.

Scale-out form of core/cell_probe.py (which is itself the TPU-native
occupant of the reference's advertised-but-never-implemented ``hnsw``
index type, src/vector_index_manager.erl:25-31).  Where EPIVFIndex shards
f32 row blocks, this shards the cell-probe's INT8 RESIDUAL codes — 4x the
rows per shard at equal HBM, with the same exact-f32-query rescoring:

    shard_map:  route = top-nprobe over a replicated bf16 [B, C] centroid
                matmul (identical on every device — no dispatch traffic)
                -> per probe slot: gather MY probed cells' int8 residual
                   blocks, bf16 residual dot + exact f32 centroid term
                -> local top-k over my (slot, row) candidates
                -> all_gather (k dists, k store-rows) over the data axis
                -> replicated global top-k merge

Only k candidates per device cross ICI (candidates-not-corpus, like the
sharded exact store); the routing decision is compute-replicated.  Unlike
the single-chip sort-based IVF dispatch there is no q_cap — no (query,
cell) pair is ever dropped — so recall >= single-chip at equal nprobe.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from erlvectordb_tpu.core.calibration import CalibrationSet, measure_curve
from erlvectordb_tpu.core.cell_probe import CellProbeIndex
from erlvectordb_tpu.parallel.mesh import DATA_AXIS

_NEG = -1e30


@functools.lru_cache(maxsize=None)
def _build_ep_probe(mesh: Mesh, metric: str, k: int, nprobe: int,
                    c_local: int):
    """Compiled EP multiprobe over codes sharded P(data, None, None)."""

    def local_scan(codes, scales, norms, valid, rows, centroids, cents_bf,
                   active, q):
        # block views: codes [c_local, cap, W] int8; centroids/cents_bf
        # [C, W] and q [B, W] replicated
        b = q.shape[0]
        shard = lax.axis_index(DATA_AXIS)
        base = shard * c_local

        # route on the replicated bf16 table (ranking-grade)
        table_r = jnp.dot(q.astype(jnp.bfloat16), cents_bf.T,
                          preferred_element_type=jnp.float32)   # [B, C]
        cn2 = jnp.sum(centroids * centroids, axis=-1)
        if metric == "euclidean":
            route = 2.0 * table_r - cn2[None, :]
        elif metric == "cosine":
            cnorm = jnp.sqrt(cn2)
            route = jnp.where(cnorm > 0,
                              table_r / jnp.where(cnorm > 0, cnorm, 1.0),
                              0.0)
        elif metric == "dot":
            route = table_r
        else:
            raise ValueError(metric)
        # empty/padding cells must never win a probe: shard-count padding
        # fills centroids with 1e6, which would DOMINATE dot/cosine routing
        route = jnp.where(active[None, :], route, _NEG)
        _, probe = lax.top_k(route, nprobe)                     # [B, np]
        # exact f32 centroid dots for the probed cells (scoring-grade)
        pcents = centroids[probe]                               # [B, np, W]
        tgath = jnp.einsum("bpw,bw->bp", pcents, q,
                           preferred_element_type=jnp.float32)

        qbf = q.astype(jnp.bfloat16)
        qsq = jnp.sum(q * q, axis=-1, keepdims=True)
        qn = jnp.sqrt(qsq)

        def one_slot(slot):
            cell_ids, tdot = slot                 # [B] ids, [B] exact q.c
            lidx = cell_ids - base
            mine = (lidx >= 0) & (lidx < c_local)
            li = jnp.clip(lidx, 0, c_local - 1)
            sub = codes[li]                       # [B, cap, W] my int8 cells
            dots = jnp.einsum("bcw,bw->bc", sub.astype(jnp.bfloat16), qbf,
                              preferred_element_type=jnp.float32)
            qx = dots * scales[li] + tdot[:, None]             # [B, cap]
            rnorm = norms[li]
            if metric == "euclidean":
                sc = 2.0 * qx - rnorm * rnorm
            elif metric == "dot":
                sc = qx
            else:  # cosine
                denom = qn * rnorm
                sc = jnp.where(denom > 0,
                               qx / jnp.where(denom > 0, denom, 1.0), 0.0)
            sc = jnp.where(valid[li] & mine[:, None], sc, _NEG)
            return sc, rows[li]

        scs, rws = lax.map(one_slot, (probe.T, tgath.T))   # [np, B, cap]
        scs = scs.transpose(1, 0, 2).reshape(b, -1)        # [B, np*cap]
        rws = rws.transpose(1, 0, 2).reshape(b, -1)
        kk = min(k, scs.shape[1])
        top_sc, sel = lax.top_k(scs, kk)
        top_rows = jnp.take_along_axis(rws, sel, axis=1)

        # candidates-only merge over ICI
        sc_all = lax.all_gather(top_sc, DATA_AXIS)         # [S, B, kk]
        rw_all = lax.all_gather(top_rows, DATA_AXIS)
        s = sc_all.shape[0]
        sc_flat = sc_all.transpose(1, 0, 2).reshape(b, s * kk)
        rw_flat = rw_all.transpose(1, 0, 2).reshape(b, s * kk)
        kf = min(k, s * kk)
        best, sel2 = lax.top_k(sc_flat, kf)
        rows_out = jnp.take_along_axis(rw_flat, sel2, axis=1)
        rows_out = jnp.where(best > _NEG / 2, rows_out, -1)
        if metric == "euclidean":
            dist = jnp.sqrt(jnp.maximum(qsq - best, 0.0))
        elif metric == "dot":
            dist = -best
        else:
            dist = 1.0 - best
        dist = jnp.where(rows_out >= 0, dist, jnp.inf)
        return dist, rows_out

    shd = jax.shard_map(
        local_scan,
        mesh=mesh,
        in_specs=(
            P(DATA_AXIS, None, None),   # codes [C, cap, W] int8
            P(DATA_AXIS, None),         # scales [C, cap]
            P(DATA_AXIS, None),         # norms [C, cap]
            P(DATA_AXIS, None),         # valid [C, cap]
            P(DATA_AXIS, None),         # store rows [C, cap]
            P(None, None),              # centroids f32 (replicated)
            P(None, None),              # centroids bf16 (replicated)
            P(None),                    # active cells [C] (replicated)
            P(None, None),              # queries (replicated)
        ),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    return jax.jit(shd)


class EPCellProbeIndex:
    """Cell-probe int8 residual cells as experts over a mesh's data axis."""

    def __init__(self, mesh: Mesh, centroids, codes, scales, norms, valid,
                 row_map, cell_cap: int):
        self.mesh = mesh
        self.n_shards = mesh.shape[DATA_AXIS]
        n_cells = np.asarray(centroids).shape[0]
        if n_cells % self.n_shards:
            raise ValueError(f"{n_cells} cells not divisible by "
                             f"{self.n_shards} shards")
        self.n_cells = n_cells
        self.cell_cap = int(cell_cap)
        w = np.asarray(centroids).shape[1]
        c3 = NamedSharding(mesh, P(DATA_AXIS, None, None))
        c2 = NamedSharding(mesh, P(DATA_AXIS, None))
        repl = NamedSharding(mesh, P(None, None))
        cents = np.asarray(centroids, np.float32)
        self.centroids = jax.device_put(cents, repl)
        self.cents_bf = jax.device_put(cents.astype(jnp.bfloat16), repl)
        self.codes = jax.device_put(
            np.asarray(codes, np.int8).reshape(n_cells, cell_cap, w), c3)
        self.scales = jax.device_put(
            np.asarray(scales, np.float32).reshape(n_cells, cell_cap), c2)
        self.norms = jax.device_put(
            np.asarray(norms, np.float32).reshape(n_cells, cell_cap), c2)
        self.valid = jax.device_put(
            np.asarray(valid, bool).reshape(n_cells, cell_cap), c2)
        self.rows = jax.device_put(
            np.asarray(row_map, np.int32).reshape(n_cells, cell_cap), c2)
        self.row_map = np.asarray(row_map)
        repl1 = NamedSharding(mesh, P(None))
        self.active = jax.device_put(
            np.asarray(valid, bool).reshape(n_cells, cell_cap).any(axis=1),
            repl1)
        # recall_target calibration curves, keyed (k, metric)
        self._calib = CalibrationSet()

    # ------------------------------------------------------------------ build

    @classmethod
    def build(cls, data, rows, mesh: Mesh, **kw) -> "EPCellProbeIndex":
        # no hierarchy: the EP route is already sharded and from_cell_probe
        # drops super_route — the hierarchy's ~25% cell padding would only
        # inflate every shard's codes for zero benefit
        kw.setdefault("hierarchy", False)
        base = CellProbeIndex.build(np.asarray(data), np.asarray(rows), **kw)
        return cls.from_cell_probe(base, mesh)

    @classmethod
    def from_cell_probe(cls, cp: CellProbeIndex,
                        mesh: Mesh) -> "EPCellProbeIndex":
        """Distribute a single-chip cell-probe index (pads the cell count to
        a shard multiple with empty far-away cells)."""
        s = mesh.shape[DATA_AXIS]
        c = cp.n_cells
        cap = cp.cell_cap
        pad = -(-c // s) * s - c
        cents = np.asarray(cp.centroids)
        codes = np.asarray(cp.codes)
        scales = np.asarray(cp.scales)
        norms = np.asarray(cp.norms)
        row_map = cp.row_map
        if pad:
            w = cents.shape[1]
            cents = np.concatenate(
                [cents, np.full((pad, w), 1e6, np.float32)])
            codes = np.concatenate(
                [codes, np.zeros((pad * cap, w), np.int8)])
            scales = np.concatenate([scales, np.ones(pad * cap, np.float32)])
            norms = np.concatenate([norms, np.zeros(pad * cap, np.float32)])
            row_map = np.concatenate(
                [row_map, np.full(pad * cap, -1, np.int64)])
        idx = cls(mesh, cents, codes, scales, norms, row_map >= 0, row_map,
                  cap)
        # single-chip curves are a CONSERVATIVE transfer: EP drops no
        # (query, cell) pair, so EP recall >= single-chip at equal nprobe
        if getattr(cp, "_calib", None):
            idx._calib = CalibrationSet.from_json(cp._calib.to_json())
        return idx

    # ----------------------------------------------------------------- search

    def _member_queries(self, n_sample: int) -> np.ndarray:
        """Decode up to n_sample live rows via a small on-device gather of
        only the sampled cells; at pod scale that gather crosses ICI once
        per calibration — pass held-out traffic to avoid it (and for
        SLA-grade targeting)."""
        valid = np.asarray(jax.device_get(self.valid)).reshape(-1)
        live = np.flatnonzero(valid)
        if len(live) == 0:
            raise ValueError("cannot calibrate an empty index")
        rng = np.random.default_rng(len(live))
        sel = rng.choice(live, size=min(n_sample, len(live)),
                         replace=False)
        cells = sel // self.cell_cap
        slots = sel % self.cell_cap
        codes = np.asarray(jax.device_get(
            self.codes[cells, slots]), np.float32)      # [S, W]
        scales = np.asarray(jax.device_get(self.scales[cells, slots]))
        cents = np.asarray(jax.device_get(self.centroids))[cells]
        return cents + codes * scales[:, None]

    def calibrate_nprobe(self, queries=None, n_sample: int = 256,
                         k: int = 10, metric: str = "cosine",
                         ground_truth=None) -> dict:
        """Measure the recall@k-vs-nprobe curve so ``search(recall_target=
        ...)`` can pick the smallest qualifying GLOBAL nprobe — same
        mode semantics as CellProbeIndex.calibrate_nprobe (pass
        ``ground_truth`` exact rows for EXACT/absolute mode; default is
        CEILING mode against this index's own deep probe).  EP drops no
        (query, cell) pair, so curves transfer shard-count-free."""
        if queries is None:
            if ground_truth is not None:
                raise ValueError("ground_truth requires explicit queries")
            queries = self._member_queries(n_sample)
        queries = np.asarray(queries, np.float32)
        deep = min(self.n_cells, 512)

        def search_rows(qs, kk, nprobe):
            _, got = self.search(qs, k=kk, nprobe=nprobe, metric=metric)
            return got

        curve = measure_curve(search_rows, queries, k=k, metric=metric,
                              deep=deep, ground_truth=ground_truth)
        self._calib.put(curve)
        return dict(curve.curve)

    def nprobe_for(self, recall_target: float, k: int = 10,
                   metric: str = "cosine") -> int:
        """Smallest calibrated global nprobe meeting the recall@k target
        under the curve's mode (exact-mode curves raise
        RecallUnachievable above the quantization ceiling); lazily
        self-calibrates (ceiling mode) on first use per (k, metric)."""
        if not (0.0 < recall_target <= 1.0):
            raise ValueError("recall_target must be in (0, 1]")

        def compute():
            self.calibrate_nprobe(k=k, metric=metric)
            return self._calib.get(k, metric)

        cur = self._calib.get(k, metric)
        if cur is None:
            cur = self._calib.get_or_compute(k, metric, compute)
        return cur.nprobe_for(recall_target)

    def search(self, queries, k: int = 10, nprobe: int = 32,
               metric: str = "cosine",
               recall_target: float = None) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (distances [B, k], store rows [B, k]; -1 = no hit).
        ``recall_target`` overrides ``nprobe`` with the smallest
        calibrated value meeting the target (see calibrate_nprobe)."""
        if recall_target is not None:
            nprobe = self.nprobe_for(recall_target, k=k, metric=metric)
        q = np.asarray(queries, np.float32)
        if q.ndim == 1:
            q = q[None, :]
        w = self.centroids.shape[1]
        if q.shape[1] != w:
            qp = np.zeros((q.shape[0], w), np.float32)
            qp[:, : q.shape[1]] = q
            q = qp
        nprobe = min(nprobe, self.n_cells)
        fn = _build_ep_probe(self.mesh, metric,
                             min(k, self.cell_cap * nprobe), nprobe,
                             self.n_cells // self.n_shards)
        d, r = fn(self.codes, self.scales, self.norms, self.valid, self.rows,
                  self.centroids, self.cents_bf, self.active,
                  jax.device_put(q, NamedSharding(self.mesh, P(None, None))))
        return np.asarray(d)[:, :k], np.asarray(r)[:, :k]

    # ------------------------------------------------------------------ misc

    def to_arrays(self) -> dict:
        out = {
            "centroids": np.asarray(self.centroids),
            "codes": np.asarray(self.codes).reshape(
                self.n_cells * self.cell_cap, -1),
            "scales": np.asarray(self.scales).reshape(-1),
            "norms": np.asarray(self.norms).reshape(-1),
            "row_map": self.row_map,
            "cell_cap": np.asarray(self.cell_cap),
        }
        if self._calib:
            out["calibrations"] = np.asarray(self._calib.to_json())
            self._calib.mark_clean()
        return out

    @classmethod
    def from_arrays(cls, d: dict,
                    mesh: Optional[Mesh] = None) -> "EPCellProbeIndex":
        from erlvectordb_tpu.parallel.mesh import make_mesh

        return cls.from_cell_probe(CellProbeIndex.from_arrays(d),
                                   mesh or make_mesh(n_replica=1))

    def stats(self) -> dict:
        fill = ((self.row_map >= 0)
                .reshape(self.n_cells, self.cell_cap).sum(1))
        return {
            "kind": "ep_cellprobe",
            "calibration": self._calib.summaries(),
            "shards": int(self.n_shards),
            "n_cells": int(self.n_cells),
            "cell_cap": int(self.cell_cap),
            "rows": int(fill.sum()),
            "cells_per_shard": int(self.n_cells // self.n_shards),
            "memory_bytes": int(
                self.n_cells * self.cell_cap
                * (np.asarray(self.centroids).shape[1] + 8)),
        }
