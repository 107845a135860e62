"""CellProbeIndex — the sub-linear index occupying the reference's ``hnsw``
slot (src/vector_index_manager.erl:25-31 advertises hnsw|ivf|flat but
implements none; this one is real and TPU-native).

Build: k-means coarse centroids (ops/kmeans.py, device Lloyd) -> BALANCED
capacity-bounded assignment (core/ivf.py::_balanced_assign — skew is what
breaks fixed-capacity gathers) -> per-row int8 RESIDUAL encode against the
owning centroid.  int8 residuals keep quantization error far below the
routing loss (unlike the int4r store's 15-level codes), so index recall is
governed by ``nprobe`` alone.

Search: ops/cell_probe.py::multiprobe_topk — one [B, K] routing matmul,
gather of the probed cells only (O(nprobe * cell_cap * W) HBM traffic,
sub-linear in N), exact f32-query rescore.  See that module's docstring
for why this design, not a pointer-chasing graph, is the TPU answer to
"hnsw".
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

import jax

from erlvectordb_tpu.core.calibration import (
    CalibrationSet,
    measure_curve,
)
from erlvectordb_tpu.core.ivf import _balanced_assign
from erlvectordb_tpu.ops.cell_probe import multiprobe_topk
from erlvectordb_tpu.ops.kmeans import kmeans_fit


@jax.jit
def _rows_to_store(row_map_dev, dev_rows):
    """Slot rows -> store rows on device (streaming builds keep the map
    device-resident; empty slots carry -1 already)."""
    return row_map_dev[jnp.clip(dev_rows, 0, row_map_dev.shape[0] - 1)]


class CellProbeIndex:
    """Cell-major int8 residual codes + coarse centroids.

    At >= HIER_MIN_CELLS the build adds a ROUTING HIERARCHY: cell
    centroids are clustered into supercells, cells permuted
    supercell-major (padded with empty cells to a fixed child count), and
    search routes L1-over-supercentroids -> L2-over-probed-children.
    Measured (8M x 768, 62.5k cells): with the fused Pallas gather+dot
    kernel the hierarchy's extra gathers cost slightly more than the flat
    route they replace — so the threshold sits where the flat [B, K]
    matmul read (~1.5 KB/cell bf16) again dominates, roughly 128k cells
    (~16M rows at cap 128).
    ``_with_hierarchy`` can be applied explicitly below that."""

    HIER_MIN_CELLS = 131072

    def __init__(self, centroids, codes, scales, norms, valid, row_map,
                 cell_cap: int, super_cents=None, child_cap: int = 0,
                 row_map_dev=None):
        self.centroids = jnp.asarray(centroids, jnp.float32)   # [K, W]
        self.cents_route = self.centroids.astype(jnp.bfloat16)  # routing copy
        self.cn2 = jnp.sum(self.centroids * self.centroids, axis=-1)
        self.codes = jnp.asarray(codes)                        # [K*cap, W] i8
        self.scales = jnp.asarray(scales, jnp.float32)         # [K*cap]
        self.norms = jnp.asarray(norms, jnp.float32)           # [K*cap]
        self.valid = jnp.asarray(valid)                        # [K*cap] bool
        # slot -> store row.  Streaming builds keep it on DEVICE
        # (row_map_dev) so results map without an O(N) readback; the host
        # copy is then fetched lazily (stats/persistence only).
        self._row_map_np = (None if row_map is None
                            else np.asarray(row_map))          # [K*cap] i64
        self.row_map_dev = row_map_dev                         # [K*cap] i32
        self.cell_cap = int(cell_cap)
        self.n_cells = int(self.centroids.shape[0])
        self.child_cap = int(child_cap)
        self.super_route = (jnp.asarray(super_cents, jnp.float32)
                            .astype(jnp.bfloat16)
                            if super_cents is not None else None)
        # multi-assigned (SOAR-spill) layouts carry duplicate rows: search
        # over-fetches and dedups per query (ops/cell_probe.dedup_rows_topk)
        self.spilled = False
        # recall_target calibration curves, keyed (k, metric); lazy
        # first-use calibration is serialized by the set's lock
        self._calib = CalibrationSet()

    @property
    def row_map(self) -> np.ndarray:
        if self._row_map_np is None:
            self._row_map_np = np.asarray(self.row_map_dev).astype(np.int64)
        return self._row_map_np

    # ------------------------------------------------------------------ build

    @classmethod
    def build(
        cls,
        data: np.ndarray,           # [N, D] f32 rows (dim-padded ok)
        rows: np.ndarray,           # [N] original store row ids
        *,
        cell_rows: int = 96,        # target valid rows per cell
        cell_cap: int = 128,        # physical slots per cell (>= cell_rows)
        iters: int = 15,
        seed: int = 0,
        max_train: int = 200_000,
        hierarchy: bool = True,     # auto-hierarchy past HIER_MIN_CELLS
    ) -> "CellProbeIndex":
        n, d = data.shape
        cell_cap = max(8, cell_cap)
        if cell_cap < cell_rows:
            raise ValueError(
                f"cell_cap ({cell_cap}) must be >= cell_rows ({cell_rows}): "
                "total capacity would be smaller than the corpus")
        n_cells = max(1, -(-n // max(8, cell_rows)))
        train = data
        if n > max_train:
            idx = np.random.default_rng(seed).choice(n, max_train,
                                                     replace=False)
            train = data[idx]
        cents, _ = kmeans_fit(jnp.asarray(train), jnp.uint32(seed),
                              k=min(n_cells, max(1, train.shape[0])),
                              iters=iters, init="kpp")
        cents = np.asarray(cents)
        n_cells = cents.shape[0]
        if n_cells * cell_cap < n:
            # k-means can return fewer centroids than asked (e.g. the
            # training sample capped k) — fail loudly, not deep inside the
            # greedy assignment with a shape mismatch
            raise ValueError(
                f"{n_cells} cells x {cell_cap} slots < {n} rows; raise "
                "cell_cap or max_train")
        owner = _balanced_assign(data, cents, cell_cap)

        order = np.argsort(owner, kind="stable")
        oc = owner[order]
        starts = np.searchsorted(oc, np.arange(n_cells))
        slot = np.arange(n) - starts[oc]

        res = data[order] - cents[oc]                          # residuals
        absmax = np.abs(res).max(axis=1)
        scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
        codes_rows = np.clip(np.round(res / scale[:, None]),
                             -127, 127).astype(np.int8)

        total = n_cells * cell_cap
        codes = np.zeros((total, d), np.int8)
        scales = np.ones((total,), np.float32)
        out_norms = np.zeros((total,), np.float32)
        row_map = np.full((total,), -1, np.int64)
        dest = oc * cell_cap + slot
        codes[dest] = codes_rows
        scales[dest] = scale
        # score with RECONSTRUCTION norms (what the codes actually encode),
        # mirroring the int4r store's semantics
        recon = cents[oc] + codes_rows.astype(np.float32) * scale[:, None]
        out_norms[dest] = np.linalg.norm(recon, axis=1)
        row_map[dest] = rows[order]
        valid = row_map >= 0
        idx = cls(cents, codes, scales, out_norms, valid, row_map, cell_cap)
        if hierarchy and n_cells >= cls.HIER_MIN_CELLS:
            idx = idx._with_hierarchy(seed=seed, iters=iters)
        return idx

    @classmethod
    def build_streaming(
        cls,
        chunks,
        *,
        n: int,
        dim: int,
        cell_rows: int = 96,
        cell_cap: int = 128,
        **build_kw,
    ) -> "CellProbeIndex":
        """Flagship-scale build through the device-side streaming engine
        (ops/cell_build.py): int8 residual codes, balanced cells, and a
        DEVICE-resident slot->row map — no O(N) host round-trip anywhere
        (the round-2 host-greedy build paid ~[N, j] choice-list readbacks
        and ran at 5.6k vec/s on tunneled rigs).

        Store rows are implicit arrival order 0..n-1 (the index maps slots
        back to them on device at search time).  Build phase timings land
        in ``idx.build_stats``."""
        from erlvectordb_tpu.ops.cell_build import build_cells_streaming

        res = build_cells_streaming(
            chunks, n=n, dim=dim, cell_rows=cell_rows, cell_cap=cell_cap,
            residual_bits=8, **build_kw)
        idx = cls(res.centroids, res.codes, res.scales, res.norms,
                  res.valid, None, res.cell_cap, row_map_dev=res.perm)
        idx.build_stats = res.stats
        idx.spilled = res.stats.get("spilled_rows", 0) > 0
        return idx

    def _with_hierarchy(self, *, seed: int = 0, iters: int = 10,
                        child_target: int = 192) -> "CellProbeIndex":
        """Cluster cell centroids into supercells, permute cells
        supercell-major, pad with empty cells to a fixed child count."""
        cents = np.asarray(self.centroids)
        k0, w = cents.shape
        cap = self.cell_cap
        s_count = max(2, -(-k0 // child_target))
        sc, _ = kmeans_fit(jnp.asarray(cents), jnp.uint32(seed + 1),
                           k=s_count, iters=iters, init="kpp")
        sc = np.asarray(sc)
        s_count = sc.shape[0]
        child_cap = -(-max(child_target + child_target // 4,
                           -(-k0 // s_count)) // 8) * 8
        owner = _balanced_assign(cents, sc, child_cap)
        order = np.argsort(owner, kind="stable")
        oc = owner[order]
        starts = np.searchsorted(oc, np.arange(s_count))
        slot = np.arange(k0) - starts[oc]
        dest_cell = oc * child_cap + slot                  # new cell index
        k_new = s_count * child_cap

        def scatter_cells(arr, fill):
            out = np.full((k_new,) + arr.shape[1:], fill, arr.dtype)
            out[dest_cell] = arr
            return out

        new_cents = scatter_cells(cents, 1e6)              # pad cells far away
        codes = np.asarray(self.codes).reshape(k0, cap, -1)
        scales = np.asarray(self.scales).reshape(k0, cap)
        norms = np.asarray(self.norms).reshape(k0, cap)
        row_map = self.row_map.reshape(k0, cap)
        new_codes = scatter_cells(codes, 0).reshape(k_new * cap, -1)
        new_scales = scatter_cells(scales, 1.0).reshape(-1)
        new_norms = scatter_cells(norms, 0.0).reshape(-1)
        new_rows = np.full((k_new, cap), -1, row_map.dtype)
        new_rows[dest_cell] = row_map
        new_rows = new_rows.reshape(-1)
        return type(self)(new_cents, new_codes, new_scales, new_norms,
                          new_rows >= 0, new_rows, cap,
                          super_cents=sc, child_cap=child_cap)

    # ----------------------------------------------------------------- search

    def _member_queries(self, n_sample: int) -> np.ndarray:
        """Decode up to n_sample live rows for self-calibration."""
        valid = np.asarray(self.valid)
        rows = np.flatnonzero(valid)
        if len(rows) == 0:
            raise ValueError("cannot calibrate an empty index")
        rng = np.random.default_rng(len(rows))
        rows = rng.choice(rows, size=min(n_sample, len(rows)),
                          replace=False)
        res = (np.asarray(self.codes[rows]).astype(np.float32)
               * np.asarray(self.scales[rows])[:, None])
        return res + np.asarray(self.centroids[rows // self.cell_cap])

    def calibrate_nprobe(self, queries=None, n_sample: int = 256,
                         k: int = 10, metric: str = "cosine",
                         ground_truth=None) -> dict:
        """Measure the recall@k-vs-nprobe curve so
        ``search(recall_target=...)`` can pick the smallest qualifying
        nprobe.  Two modes (core/calibration.py):

        * pass ``ground_truth`` ([S, >=k] exact store rows for
          ``queries``, e.g. from calibration.exact_ground_truth over the
          original f32 corpus — IndexManager.calibrate_index does this
          automatically for f32 stores) -> EXACT mode: curve values are
          absolute recall@k and the deep probe's value is the
          quantization CEILING, which recall_target refuses to exceed;
        * otherwise -> CEILING mode against the index's own deep probe
          (nprobe = min(n_cells, 512)): recall at deep == 1.0 by
          construction, quantization loss invisible.

        ``queries`` defaults to sampled live rows decoded on host
        (member queries slightly flatter the curve — pass held-out
        traffic for SLA-grade targeting).  Curves are keyed by
        (k, metric) and persist with the artifact."""
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
        """Smallest calibrated nprobe meeting the recall@k target under
        the curve's mode (absolute for exact-mode curves, which raise
        RecallUnachievable above the ceiling; deep-probe-relative for
        ceiling-mode).  Lazily self-calibrates (ceiling mode) on first
        use per (k, metric)."""
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
               sprobe: int = 0,
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
        # spilled layouts: over-fetch, then dedup duplicate rows per query
        k_eff = min(2 * k, self.n_cells * self.cell_cap) if self.spilled else k
        dists, dev_rows = multiprobe_topk(
            self.codes, self.scales, self.norms, self.valid, self.centroids,
            jnp.asarray(q), metric=metric, k=k_eff,
            nprobe=min(nprobe, self.n_cells), cell_cap=self.cell_cap,
            centroids_route=self.cents_route, cn2=self.cn2,
            super_route=self.super_route, child_cap=self.child_cap,
            sprobe=sprobe,
        )
        # ONE fused device->host readback ([dists | row-hi | row-lo] f32,
        # exact value-cast — see core.store._pack_results): each
        # np.asarray costs a full link round-trip on tunneled rigs
        from erlvectordb_tpu.core.store import _pack_results

        if self.row_map_dev is not None:
            dev_rows = _rows_to_store(self.row_map_dev, dev_rows)
        kk2 = dists.shape[1]
        arr = np.asarray(_pack_results(dists, dev_rows))
        dists = arr[:, :kk2]
        raw_rows = (arr[:, kk2:2 * kk2].astype(np.int64) * 4096
                    + arr[:, 2 * kk2:3 * kk2].astype(np.int64))
        if self.row_map_dev is not None:
            store_rows = raw_rows
        else:
            store_rows = self.row_map[raw_rows]
        store_rows = np.where(np.isfinite(dists), store_rows, -1)
        if k_eff > k:
            from erlvectordb_tpu.ops.cell_probe import dedup_rows_topk

            dists, store_rows = dedup_rows_topk(dists, store_rows, k)
        return dists, store_rows

    # ------------------------------------------------------------------ misc

    def stats(self) -> dict:
        fill = (self.row_map >= 0).reshape(self.n_cells, self.cell_cap).sum(1)
        return {
            "kind": "cell_probe",
            "calibration": self._calib.summaries(),
            "hierarchical": self.super_route is not None,
            "supercells": (int(self.super_route.shape[0])
                           if self.super_route is not None else 0),
            "n_cells": self.n_cells,
            "cell_cap": self.cell_cap,
            "rows": int(fill.sum()),
            "min_cell": int(fill.min()),
            "max_cell": int(fill.max()),
            "memory_bytes": int(self.codes.size + self.scales.size * 4
                                + self.norms.size * 4
                                + np.asarray(self.centroids).size * 4),
        }

    def to_arrays(self) -> dict:
        out = {
            "centroids": np.asarray(self.centroids),
            "codes": np.asarray(self.codes),
            "scales": np.asarray(self.scales),
            "norms": np.asarray(self.norms),
            "row_map": self.row_map,
            "cell_cap": np.asarray(self.cell_cap),
        }
        if self.spilled:
            out["spilled"] = np.asarray(1)
        if self.super_route is not None:
            out["super_cents"] = np.asarray(
                self.super_route.astype(jnp.float32))
            out["child_cap"] = np.asarray(self.child_cap)
        if self._calib:
            out["calibrations"] = np.asarray(self._calib.to_json())
            self._calib.mark_clean()
        return out

    @classmethod
    def from_arrays(cls, d: dict) -> "CellProbeIndex":
        from erlvectordb_tpu.core.calibration import CalibrationSet

        row_map = np.asarray(d["row_map"])
        idx = cls(d["centroids"], d["codes"], d["scales"], d["norms"],
                  row_map >= 0, row_map, int(d["cell_cap"]),
                  super_cents=d.get("super_cents"),
                  child_cap=int(d["child_cap"]) if "child_cap" in d else 0)
        idx.spilled = bool(int(d.get("spilled", 0)))
        if "calibrations" in d:
            idx._calib = CalibrationSet.from_json(
                np.asarray(d["calibrations"]).item())
            idx._calib.mark_clean()
        elif "curve_nprobe" in d:  # pre-round-5 single un-keyed curve
            idx._calib = CalibrationSet.from_legacy({
                int(p): float(r)
                for p, r in zip(np.asarray(d["curve_nprobe"]),
                                np.asarray(d["curve_recall"]))})
            idx._calib.mark_clean()
        return idx
