"""Index manager — descriptor registry with REAL async index builds.

The reference's vector_index_manager is scaffolding: ``build_index`` spawns a
sleep(1000) and writes fake stats; no index is ever consulted by search
(src/vector_index_manager.erl:58-66, :102-110).  This one is real:

  * ``flat``  — descriptor only (the store's exact scan IS the index);
  * ``int8``  — symmetric per-row quantization searched on the int8 MXU
                path (built from a float32 store's rows);
  * ``pq``    — product quantization: k-means codebooks trained on device
                (ops/kmeans.py), rows encoded to uint8 codes, searched with
                the ADC scan (ops/adc.py);
  * ``opq``   — PQ with a learned orthogonal rotation (quant/opq.py) for
                lower quantization error on anisotropic data;
  * ``ivf``   — inverted-file index with MoE-style query dispatch
                (core/ivf.py): ~nprobe/n_cells of the exact scan's FLOPs;
  * ``hnsw`` / ``cellprobe`` — the sub-linear slot (the reference
                advertises ``hnsw`` but implements nothing): a cell-probe
                index (core/cell_probe.py) — balanced k-means partitions,
                int8 residual codes, multiprobe GATHER of only the probed
                cells + exact f32 rescore.  O(nprobe*cell_cap) HBM traffic
                per query instead of O(N) — the low-latency capability the
                hnsw name promises, built with dense math instead of the
                pointer-chasing graph a systolic-array machine can't run.

Builds run on a background thread (the reference's async-build capability),
record real build time and memory stats, and are stamped with the store
version so staleness is detectable (``is_stale``); ``search`` consults the
built artifact.
"""

from __future__ import annotations

import logging
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

LOG = logging.getLogger(__name__)

from erlvectordb_tpu.core.store import VectorStore

INDEX_TYPES = ("flat", "int8", "pq", "opq", "ivf", "ep_ivf", "hnsw",
               "cellprobe", "ep_cellprobe")


class IndexError_(ValueError):
    pass


@dataclass
class IndexInfo:
    name: str
    store: str
    type: str
    parameters: Dict[str, Any] = field(default_factory=dict)
    built: bool = False
    building: bool = False
    built_at: Optional[float] = None
    built_version: Optional[int] = None
    build_seconds: Optional[float] = None
    error: Optional[str] = None
    stats: Dict[str, Any] = field(default_factory=dict)
    artifact: Any = None  # the built object (codebook+codes for pq, ...)

    def to_dict(self) -> dict:
        d = {
            "name": self.name,
            "store": self.store,
            "type": self.type,
            "parameters": self.parameters,
            "built": self.built,
            "building": self.building,
            "built_at": self.built_at,
            "build_seconds": self.build_seconds,
            "error": self.error,
            "stats": self.stats,
        }
        idx = self.probe_artifact()
        calib = getattr(idx, "_calib", None)
        if calib:
            # which guarantee recall_target gives on this index: exact
            # (absolute recall, ceiling enforced) vs ceiling (relative
            # to the index's own deep probe)
            d["calibration"] = calib.summaries()
        return d

    def probe_artifact(self):
        """The cellprobe-family index object, if this is one."""
        if isinstance(self.artifact, dict):
            return (self.artifact.get("cell_probe")
                    or self.artifact.get("ep_cellprobe"))
        return None


class IndexManager:
    def __init__(self, registry):
        self._registry = registry  # StoreRegistry
        self._indexes: Dict[str, IndexInfo] = {}
        self._lock = threading.RLock()

    # ------------------------------------------------------------- registry

    def create_index(self, name: str, store: str, index_type: str,
                     parameters: Optional[dict] = None) -> dict:
        if index_type not in INDEX_TYPES:
            raise IndexError_(
                f"index type must be one of {INDEX_TYPES}, got {index_type!r}"
            )
        self._registry.get(store)  # must exist
        with self._lock:
            if name in self._indexes:
                raise IndexError_(f"index {name!r} already exists")
            info = IndexInfo(name, store, index_type, parameters or {})
            if index_type == "flat":
                info.built = True  # exact scan needs no build
                info.built_at = time.time()
                info.build_seconds = 0.0
            self._indexes[name] = info
            return info.to_dict()

    def drop_index(self, name: str) -> bool:
        with self._lock:
            return self._indexes.pop(name, None) is not None

    def drop_for_store(self, store: str) -> List[str]:
        """Drop every index built over ``store`` (called when the store is
        deleted — orphaned indexes would raise raw StoreNotFound from deep
        inside search and re-load their artifacts forever)."""
        with self._lock:
            doomed = [n for n, i in self._indexes.items() if i.store == store]
            for n in doomed:
                self._indexes.pop(n, None)
            return doomed

    def list_indexes(self) -> List[dict]:
        with self._lock:
            return [i.to_dict() for i in self._indexes.values()]

    def get_index_info(self, name: str) -> Optional[dict]:
        with self._lock:
            info = self._indexes.get(name)
            return info.to_dict() if info else None

    # ---------------------------------------------------------------- build

    def build_index(self, name: str, wait: bool = True,
                    timeout: float = 300.0) -> dict:
        """Build (or rebuild) an index. ``wait=False`` returns immediately
        with the build running in the background — the reference's async
        build, but real."""
        with self._lock:
            info = self._indexes.get(name)
            if info is None:
                raise IndexError_(f"index {name!r} not found")
            if info.building:
                raise IndexError_(f"index {name!r} is already building")
            info.building = True
            info.error = None
        done = threading.Event()

        def run():
            try:
                self._build(info)
            except Exception as e:  # noqa: BLE001 — surfaced in info.error
                with self._lock:
                    info.error = f"{type(e).__name__}: {e}"
                    info.built = False
            finally:
                with self._lock:
                    info.building = False
                done.set()

        threading.Thread(target=run, name=f"evdb-index-{name}", daemon=True).start()
        if wait:
            if not done.wait(timeout):
                raise IndexError_(f"index {name!r} build timed out")
        return self.get_index_info(name)

    def _build(self, info: IndexInfo) -> None:
        store: VectorStore = self._registry.get(info.store)
        t0 = time.perf_counter()
        if info.type == "flat":
            artifact, stats = None, {"kind": "exact-scan"}
        elif info.type == "int8":
            artifact, stats = self._build_int8(store)
        elif info.type in ("pq", "opq"):
            artifact, stats = self._build_pq(store, info.parameters,
                                             rotated=info.type == "opq")
        elif info.type == "ivf":
            artifact, stats = self._build_ivf(store, info.parameters)
        elif info.type == "ep_ivf":
            artifact, stats = self._build_ep_ivf(store, info.parameters)
        elif info.type in ("hnsw", "cellprobe"):
            artifact, stats = self._build_cell_probe(store, info.parameters)
        elif info.type == "ep_cellprobe":
            artifact, stats = self._build_ep_cell_probe(store,
                                                        info.parameters)
        else:  # pragma: no cover
            raise IndexError_(f"unknown type {info.type}")
        dt = time.perf_counter() - t0
        with self._lock:
            info.artifact = artifact
            info.stats = {**stats, "rows": store.count}
            info.built = True
            info.built_at = time.time()
            info.built_version = store.version
            info.build_seconds = round(dt, 4)

    def _build_int8(self, store: VectorStore):
        if store._vectors is None or store.count == 0:
            raise IndexError_("store is empty")
        if store.dtype == "int8":
            return None, {"kind": "native-int8"}  # store already quantized
        if store.dtype != "float32":
            # int4/int4r buffers are PACKED NIBBLE BYTES — quantizing them
            # as float rows builds a silently-garbage index
            raise IndexError_(
                f"int8 index requires a float32 store (got {store.dtype}; "
                "quantized stores are already searched natively)")
        vecs = store._vectors
        absmax = jnp.max(jnp.abs(vecs), axis=-1)
        scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
        codes = jnp.clip(jnp.round(vecs / scale[:, None]), -127, 127).astype(jnp.int8)
        # SNAPSHOT norms/valid with REAL COPIES: scoring build-time codes
        # against the LIVE arrays breaks after a capacity grow (shape
        # mismatch) and silently mis-scores after any mutation — and a
        # no-copy alias (jnp.asarray) would be DELETED by the next
        # same-capacity insert's buffer donation
        artifact = {"codes": codes, "scales": scale,
                    "norms": jnp.array(store._norms, copy=True),
                    "valid": jnp.array(store._valid, copy=True)}
        return artifact, {
            "kind": "int8",
            "memory_bytes": int(codes.size + scale.size * 4),
        }

    @staticmethod
    def _store_matrix(store: VectorStore, pad128: bool = False):
        """Extract (matrix, store-rows, norms) from a store for an index
        build — the shared front half of every builder."""
        if store.count == 0:
            raise IndexError_("store is empty")
        allv = store.get_all_vectors()
        mat = np.stack([v[1] for v in allv]).astype(np.float32)
        if pad128 and mat.shape[1] % 128:
            mat = np.pad(mat, ((0, 0), (0, 128 - mat.shape[1] % 128)))
        rows = np.asarray([store._id_to_row[v[0]] for v in allv], np.int64)
        norms = np.linalg.norm(mat, axis=1).astype(np.float32)
        return mat, rows, norms

    def _build_pq(self, store: VectorStore, params: dict, rotated: bool = False):
        from erlvectordb_tpu.quant.opq import OPQCodebook
        from erlvectordb_tpu.quant.pq import PQCodebook

        mat, rows, _norms = self._store_matrix(store)
        m = int(params.get("m", 8))
        k = int(params.get("k", 256))
        iters = int(params.get("iters", 15))
        d = mat.shape[1]
        if d % m:  # pad dims so D % M == 0
            mat = np.pad(mat, ((0, 0), (0, m - d % m)))
        kk = min(k, max(16, mat.shape[0] // 4))
        if rotated:
            cb = OPQCodebook.fit(mat, m=m, k=kk, iters=iters,
                                 opq_iters=int(params.get("opq_iters", 4)))
        else:
            cb = PQCodebook.fit(mat, m=m, k=kk, iters=iters)
        codes = np.asarray(cb.encode(mat))
        artifact = {"codebook": cb, "codes": jnp.asarray(codes),
                    "rows": rows, "pad_dim": mat.shape[1]}
        return artifact, {
            "kind": "opq" if rotated else "pq",
            "m": cb.m,
            "k": cb.k,
            "code_bytes_per_vector": cb.m,
            "memory_bytes": int(codes.size + np.asarray(cb.codebooks).size * 4),
        }

    def _build_ivf(self, store: VectorStore, params: dict):
        from erlvectordb_tpu.core.ivf import IVFIndex

        mat, rows, norms = self._store_matrix(store)
        idx = IVFIndex.build(
            mat, rows, norms,
            n_cells=int(params.get("n_cells", 64)),
            iters=int(params.get("iters", 15)),
        )
        artifact = {"ivf": idx, "nprobe": int(params.get("nprobe", 8))}
        return artifact, idx.stats()

    def _build_ep_ivf(self, store: VectorStore, params: dict):
        """Expert-parallel IVF: cells sharded across the data axis of the
        (all-devices) mesh — the scale-out form of the ivf type."""
        import jax

        from erlvectordb_tpu.parallel.ep_ivf import EPIVFIndex
        from erlvectordb_tpu.parallel.mesh import make_mesh

        mat, rows, norms = self._store_matrix(store)
        mesh = make_mesh(n_data=len(jax.devices()), n_replica=1)
        idx = EPIVFIndex.build(
            mat, rows, norms, mesh,
            n_cells=int(params.get("n_cells", 64)),
            iters=int(params.get("iters", 15)),
        )
        artifact = {"ep_ivf": idx, "nprobe": int(params.get("nprobe", 8))}
        return artifact, idx.stats()

    def _build_cell_probe(self, store: VectorStore, params: dict):
        """The hnsw-slot build: balanced cells + int8 residual codes, served
        by the sub-linear multiprobe gather (core/cell_probe.py)."""
        from erlvectordb_tpu.core.cell_probe import CellProbeIndex

        mat, rows, _norms = self._store_matrix(store, pad128=True)
        idx = CellProbeIndex.build(
            mat, rows,
            cell_rows=int(params.get("cell_rows", 96)),
            cell_cap=int(params.get("cell_cap", 128)),
            iters=int(params.get("iters", 15)),
        )
        artifact = {"cell_probe": idx,
                    "nprobe": int(params.get("nprobe", 32))}
        return artifact, idx.stats()

    def _build_ep_cell_probe(self, store: VectorStore, params: dict):
        """Scale-out hnsw slot: int8 residual cells sharded over the data
        axis of the (all-devices) mesh (parallel/ep_cell_probe.py)."""
        import jax

        from erlvectordb_tpu.parallel.ep_cell_probe import EPCellProbeIndex
        from erlvectordb_tpu.parallel.mesh import make_mesh

        mat, rows, _norms = self._store_matrix(store, pad128=True)
        mesh = make_mesh(n_data=len(jax.devices()), n_replica=1)
        idx = EPCellProbeIndex.build(
            mat, rows, mesh,
            cell_rows=int(params.get("cell_rows", 96)),
            cell_cap=int(params.get("cell_cap", 128)),
            iters=int(params.get("iters", 15)),
        )
        artifact = {"ep_cellprobe": idx,
                    "nprobe": int(params.get("nprobe", 32))}
        return artifact, idx.stats()

    # ---------------------------------------------------------- calibration

    CALIBRATABLE = ("hnsw", "cellprobe", "ep_cellprobe")

    def calibrate_index(self, name: str, queries=None, n_sample: int = 256,
                        k: int = 10, mode: str = "exact",
                        metric: Optional[str] = None) -> dict:
        """Calibrate a cellprobe-family index's recall_target curve.

        ``mode="exact"`` (default): sample (or take) queries, compute
        EXACT ground truth with one brute f32 device scan over the
        backing store's rows (core/calibration.exact_ground_truth), and
        record an absolute recall@k curve whose deep-probe value is the
        index's quantization ceiling — recall_target searches then
        guarantee measured absolute recall and REFUSE targets above the
        ceiling.  ``mode="ceiling"``: the index's cheap self-relative
        curve (deep probe == 1.0 by construction; quantization loss
        invisible).  ``queries`` default to sampled store rows — pass
        held-out traffic for SLA-grade targeting.  The curve persists
        with the index artifact (Database.calibrate_index re-saves it).
        Returns {"curve", "mode", "ceiling", "k", "metric", ...}."""
        with self._lock:
            info = self._indexes.get(name)
        if info is None:
            raise IndexError_(f"index {name!r} not found")
        if info.type not in self.CALIBRATABLE:
            raise IndexError_(
                f"index {name!r} ({info.type}) has no recall_target "
                "calibration — cellprobe-family only")
        if not info.built:
            raise IndexError_(f"index {name!r} is not built")
        idx = info.probe_artifact()
        store = self._registry.get(info.store)
        metric = metric or (store.metric if store.metric != "manhattan"
                            else "euclidean")
        gt = None
        if mode == "exact":
            from erlvectordb_tpu.core.calibration import exact_ground_truth

            mat, rows, _norms = self._store_matrix(store, pad128=True)
            if queries is None:
                rng = np.random.default_rng(n_sample)
                sel = rng.choice(mat.shape[0],
                                 size=min(n_sample, mat.shape[0]),
                                 replace=False)
                queries = mat[sel]
            gt = exact_ground_truth(mat, np.asarray(queries, np.float32),
                                    k=k, metric=metric, rows=rows)
        elif mode != "ceiling":
            raise ValueError("mode must be 'exact' or 'ceiling'")
        curve = idx.calibrate_nprobe(queries=queries, n_sample=n_sample,
                                     k=k, metric=metric, ground_truth=gt)
        out = idx._calib.get(k, metric).summary()
        out["curve"] = {str(p): r for p, r in sorted(curve.items())}
        return out

    def dirty_calibrations(self) -> List[str]:
        """Built cellprobe-family indexes whose calibration curves were
        (lazily) computed since their artifact was last persisted."""
        with self._lock:
            out = []
            for info in self._indexes.values():
                idx = info.probe_artifact()
                calib = getattr(idx, "_calib", None)
                if info.built and calib is not None and calib.dirty:
                    out.append(info.name)
            return out

    # --------------------------------------------------------------- search

    def is_stale(self, name: str) -> bool:
        with self._lock:
            info = self._indexes.get(name)
            if info is None or not info.built:
                return True
            store = self._registry.get(info.store)
            return info.built_version is not None and info.built_version != store.version

    def search(self, name: str, query, k: int = 10,
               nprobe: Optional[int] = None,
               recall_target: Optional[float] = None):
        """Search through a built index; returns [(id, metadata, distance)].

        ``nprobe`` overrides the build-time probe width per request
        (ivf/cellprobe families); ``recall_target`` instead picks the
        smallest calibrated nprobe meeting a recall@k target (cellprobe
        family only).  The guarantee depends on the curve's mode: after
        ``calibrate_index(mode="exact")`` targets are ABSOLUTE recall
        vs exact f32 ground truth (targets above the quantization
        ceiling raise); an uncalibrated index lazily self-calibrates in
        ceiling mode, where the target is relative to the index's own
        deep probe (see calibrate_index)."""
        if nprobe is not None and recall_target is not None:
            raise ValueError("pass either nprobe or recall_target, not both")
        if nprobe is not None and int(nprobe) < 1:
            raise ValueError("nprobe must be >= 1")
        with self._lock:
            info = self._indexes.get(name)
        if info is None:
            raise IndexError_(f"index {name!r} not found")
        if not info.built:
            raise IndexError_(f"index {name!r} is not built")
        probed = info.type in ("ivf", "ep_ivf", "hnsw", "cellprobe",
                               "ep_cellprobe")
        if (nprobe is not None or recall_target is not None) and not probed:
            raise ValueError(
                f"index {name!r} ({info.type}) has no probe knob — "
                "nprobe/recall_target apply to ivf/cellprobe-family indexes")
        store: VectorStore = self._registry.get(info.store)
        if info.type == "flat" or (info.type == "int8" and info.artifact is None):
            return store.search(query, k=k)
        q = np.asarray(query, np.float32)
        if info.type in ("ivf", "ep_ivf"):
            if recall_target is not None:
                raise ValueError(
                    "recall_target calibration is cellprobe-family only; "
                    "pass an explicit nprobe for ivf/ep_ivf indexes")
            a = info.artifact
            dists, rows = a[info.type].search(
                q, k=k, nprobe=a["nprobe"] if nprobe is None else int(nprobe),
                metric=store.metric if store.metric != "manhattan" else "euclidean",
            )
            return self._rows_to_hits(store, dists[0], rows[0])
        if info.type in ("hnsw", "cellprobe", "ep_cellprobe"):
            a = info.artifact
            key = "ep_cellprobe" if info.type == "ep_cellprobe" else "cell_probe"
            kw = {"nprobe": a["nprobe"] if nprobe is None else int(nprobe)}
            if recall_target is not None:
                kw = {"recall_target": float(recall_target)}
            dists, rows = a[key].search(
                q, k=k,
                metric=store.metric if store.metric != "manhattan" else "euclidean",
                **kw,
            )
            return self._rows_to_hits(store, dists[0], rows[0])
        if info.type == "int8":
            from erlvectordb_tpu.core.search import exact_topk_int8

            a = info.artifact
            qp = np.zeros((1, a["codes"].shape[1]), np.float32)
            qp[0, : q.shape[0]] = q
            dists, rows = exact_topk_int8(
                a["codes"], a["scales"], a["norms"], a["valid"],
                jnp.asarray(qp), metric=store.metric, k=min(k, store.count),
            )
            from erlvectordb_tpu.core.store import _pack_results
            kk0 = dists.shape[1]
            arr = np.asarray(_pack_results(dists, rows))  # one link RTT
            rr = (arr[:, kk0:2 * kk0].astype(np.int64) * 4096
                  + arr[:, 2 * kk0:3 * kk0].astype(np.int64))
            return self._rows_to_hits(store, arr[0, :kk0], rr[0])
        # pq/opq: ADC scan over codes; artifact rows map code index -> row
        from erlvectordb_tpu.ops.adc import adc_search_exact_topk

        a = info.artifact
        qp = np.zeros(a["pad_dim"], np.float32)
        qp[: q.shape[0]] = q
        qj = jnp.asarray(qp)[None, :]
        cbk = a["codebook"]
        if hasattr(cbk, "rotate"):  # OPQ: search in the rotated space
            qj = cbk.rotate(qj)
        kk = min(k, a["codes"].shape[0])
        dists, idx = adc_search_exact_topk(
            a["codes"], cbk.codebooks, qj, k=kk
        )
        from erlvectordb_tpu.core.store import _pack_results
        arr = np.asarray(_pack_results(dists, idx))      # one link RTT
        ii = (arr[:, kk:2 * kk].astype(np.int64) * 4096
              + arr[:, 2 * kk:3 * kk].astype(np.int64))
        dists = np.sqrt(np.maximum(arr[0, :kk], 0.0))
        rows = a["rows"][ii[0]]
        return self._rows_to_hits(store, dists, rows)

    # ----------------------------------------------------------- persistence

    def save_index(self, name: str, root) -> str:
        """Persist one built index (meta.json + arrays.npz) under
        ``root/idx_<name>/`` — atomic like store snapshots."""
        import json
        import os
        from pathlib import Path

        with self._lock:
            info = self._indexes.get(name)
            if info is None or not info.built:
                raise IndexError_(f"index {name!r} not found or not built")
            meta = info.to_dict()
            a = info.artifact
        arrays = {}
        if info.type == "int8" and a is not None:
            arrays = {"codes": np.asarray(a["codes"]),
                      "scales": np.asarray(a["scales"]),
                      "norms": np.asarray(a["norms"]),
                      "valid": np.asarray(a["valid"])}
        elif info.type in ("pq", "opq") and a is not None:
            arrays = dict(a["codebook"].to_arrays())
            arrays["codes"] = np.asarray(a["codes"])
            arrays["rows"] = np.asarray(a["rows"])
            meta["pad_dim"] = int(a["pad_dim"])
        elif info.type in ("ivf", "ep_ivf") and a is not None:
            arrays = a[info.type].to_arrays()
            meta["nprobe"] = int(a["nprobe"])
        elif info.type in ("hnsw", "cellprobe") and a is not None:
            arrays = a["cell_probe"].to_arrays()
            meta["nprobe"] = int(a["nprobe"])
        elif info.type == "ep_cellprobe" and a is not None:
            arrays = a["ep_cellprobe"].to_arrays()
            meta["nprobe"] = int(a["nprobe"])
        idir = Path(root) / f"idx_{name}"
        idir.mkdir(parents=True, exist_ok=True)
        import io

        buf = io.BytesIO()
        np.savez(buf, **arrays)
        (idir / ".arrays.npz.tmp").write_bytes(buf.getvalue())
        (idir / ".meta.json.tmp").write_text(json.dumps(meta))
        os.replace(idir / ".arrays.npz.tmp", idir / "arrays.npz")
        os.replace(idir / ".meta.json.tmp", idir / "meta.json")
        return str(idir)

    def load_indexes(self, root) -> List[str]:
        """Re-hydrate every persisted index whose store exists."""
        import json
        from pathlib import Path

        root = Path(root)
        loaded = []
        if not root.exists():
            return loaded
        for idir in sorted(root.glob("idx_*")):
            try:
                name = self._load_one_index(idir)
            except Exception:  # noqa: BLE001 — one bad artifact must not
                LOG.exception("skipping corrupt index artifact %s", idir)
                continue  # abort Database.start(); skip it (stays stale)
            if name is not None:
                loaded.append(name)
        return loaded

    def _load_one_index(self, idir):
        """Re-hydrate a single persisted index dir; returns its name or None."""
        import json

        meta_path = idir / "meta.json"
        if not meta_path.exists():
            return None
        meta = json.loads(meta_path.read_text())
        if self._registry.get_or_none(meta["store"]) is None:
            return None
        arrays = {}
        if (idir / "arrays.npz").exists():
            with np.load(idir / "arrays.npz") as z:
                arrays = {k: z[k] for k in z.files}
        info = IndexInfo(meta["name"], meta["store"], meta["type"],
                         meta.get("parameters") or {})
        info.built = bool(meta.get("built"))
        info.built_at = meta.get("built_at")
        info.build_seconds = meta.get("build_seconds")
        info.stats = meta.get("stats") or {}
        if info.type == "int8" and arrays:
            # Artifacts written before norms/valid were persisted lack
            # those keys — fall back to the live store's buffers rather
            # than raising KeyError and aborting startup (ADVICE r2).
            store = self._registry.get_or_none(meta["store"])
            norms = arrays.get("norms")
            valid = arrays.get("valid")
            if norms is None:
                norms = store._norms
            if valid is None:
                valid = store._valid
            info.artifact = {"codes": jnp.asarray(arrays["codes"]),
                             "scales": jnp.asarray(arrays["scales"]),
                             "norms": jnp.asarray(norms),
                             "valid": jnp.asarray(valid)}
        elif info.type in ("pq", "opq") and arrays:
            if info.type == "opq":
                from erlvectordb_tpu.quant.opq import OPQCodebook

                cb = OPQCodebook.from_arrays(arrays)
            else:
                from erlvectordb_tpu.quant.pq import PQCodebook

                cb = PQCodebook.from_arrays(arrays)
            info.artifact = {
                "codebook": cb,
                "codes": jnp.asarray(arrays["codes"]),
                "rows": np.asarray(arrays["rows"]),
                "pad_dim": int(meta["pad_dim"]),
            }
        elif info.type == "ivf" and arrays:
            from erlvectordb_tpu.core.ivf import IVFIndex

            info.artifact = {"ivf": IVFIndex.from_arrays(arrays),
                             "nprobe": int(meta.get("nprobe", 8))}
        elif info.type == "ep_ivf" and arrays:
            from erlvectordb_tpu.parallel.ep_ivf import EPIVFIndex

            info.artifact = {"ep_ivf": EPIVFIndex.from_arrays(arrays),
                             "nprobe": int(meta.get("nprobe", 8))}
        elif info.type in ("hnsw", "cellprobe") and arrays:
            from erlvectordb_tpu.core.cell_probe import CellProbeIndex

            info.artifact = {
                "cell_probe": CellProbeIndex.from_arrays(arrays),
                "nprobe": int(meta.get("nprobe", 32)),
            }
        elif info.type == "ep_cellprobe" and arrays:
            from erlvectordb_tpu.parallel.ep_cell_probe import (
                EPCellProbeIndex,
            )

            info.artifact = {
                "ep_cellprobe": EPCellProbeIndex.from_arrays(arrays),
                "nprobe": int(meta.get("nprobe", 32)),
            }
        with self._lock:
            self._indexes.setdefault(meta["name"], info)
        return meta["name"]

    def save_all(self, root) -> int:
        n = 0
        with self._lock:
            names = [i.name for i in self._indexes.values()
                     if i.built and i.type != "flat"]
        for name in names:
            self.save_index(name, root)
            n += 1
        return n

    @staticmethod
    def _rows_to_hits(store: VectorStore, dists, rows):
        hits = []
        for d, r in zip(dists, rows):
            if not np.isfinite(d):
                break
            vid = store._rid(int(r))
            if vid is None:
                continue
            hits.append((vid, store._metadata.get(vid, {}), float(d)))
        return hits
