"""Public API facade — the 23-verb surface of the reference's erlvectordb.erl.

One :class:`Database` object wires together the registry, persistence,
backup, compression, cluster, and OAuth subsystems, exposing the same verbs
the reference exports (src/erlvectordb.erl:16-44): store CRUD,
insert/search/delete, sync, backup/restore/export/import, OAuth client ops,
cluster ops, and compression ops.  The network frontends (serve/) all call
through this facade.
"""

from __future__ import annotations

import logging
import threading
from pathlib import Path
from typing import Any, List, Optional, Sequence, Tuple

LOG = logging.getLogger(__name__)

from erlvectordb_tpu.core import StoreRegistry, VectorStore
from erlvectordb_tpu.core.registry import StoreNotFound
from erlvectordb_tpu.infra.config import Config, load_config
from erlvectordb_tpu.persist import backup as backup_mod
from erlvectordb_tpu.persist.snapshot import PersistenceManager, list_persisted
from erlvectordb_tpu.quant import compression as compression_mod
from erlvectordb_tpu.serve.oauth import OAuthServer


class Database:
    """A running erlvectordb-tpu instance (the `application` analogue)."""

    def __init__(self, config: Optional[Config] = None):
        self.config = config or load_config()
        self.registry = StoreRegistry()
        self.persistence: Optional[PersistenceManager] = None
        if self.config.persistence_enabled:
            self.persistence = PersistenceManager(
                self.config.persistence_dir,
                sync_interval=self.config.sync_interval,
                compression=(
                    self.config.compression_algorithm
                    if self.config.compression_enabled
                    else None
                ),
            )
            # maintenance tick: staleness-driven cell refit (the
            # reference's index manager never refits anything —
            # src/vector_index_manager.erl:58-66) + persistence of
            # lazily-computed calibration curves
            self.persistence.maintenance_cb = self._maintenance_tick
        self.oauth = OAuthServer(
            enabled=self.config.oauth_enabled,
            access_lifetime=self.config.access_token_lifetime,
            refresh_lifetime=self.config.refresh_token_lifetime,
            default_client=(
                self.config.default_client_id,
                self.config.default_client_secret,
                ["read", "write", "admin"],
            ),
        )
        from erlvectordb_tpu.core.index_manager import IndexManager
        from erlvectordb_tpu.serve.batcher import QueryBatcher

        self.indexes = IndexManager(self.registry)
        self.batcher = QueryBatcher(self.any_store)
        self._cluster = None  # lazy: ClusterManager touches jax devices
        self._lock = threading.RLock()
        self._started = False

    # ------------------------------------------------------------ lifecycle

    def start(self) -> "Database":
        """Load persisted stores and start the sync loop (the app-start
        analogue; reference store init reload src/vector_store.erl:63-103)."""
        with self._lock:
            if self._started:
                return self
            if self.persistence is not None:
                from erlvectordb_tpu.parallel.sharded_store import ShardedVectorStore
                from erlvectordb_tpu.persist.snapshot import get_store_info

                for name in list_persisted(self.config.persistence_dir):
                    if self.registry.exists(name):
                        continue
                    info = get_store_info(name, self.config.persistence_dir) or {}
                    mesh = self.cluster.mesh if info.get("sharded") else None
                    store = self.persistence.open_store(name, mesh=mesh)
                    if isinstance(store, ShardedVectorStore):
                        self.cluster.distribute_store(store)
                    elif store is not None:
                        self.registry.adopt(store)
                self.persistence.start()
                self.indexes.load_indexes(
                    Path(self.config.persistence_dir) / "indexes")
            self.batcher.start()
            if self.config.warmup_on_start:
                try:
                    self.warmup()
                except Exception:  # noqa: BLE001 — warmup is best-effort
                    pass
            self._started = True
            return self

    def stop(self) -> None:
        with self._lock:
            self.batcher.stop()
            if self.persistence is not None:
                self.persistence.close()
                self.indexes.save_all(
                    Path(self.config.persistence_dir) / "indexes")
            self._started = False

    # ------------------------------------------------------------ store ops

    def create_store(self, name: str, dim: Optional[int] = None,
                     metric: str = "cosine", dtype: str = "float32",
                     intkey: bool = False) -> dict:
        from erlvectordb_tpu.core.registry import StoreExists

        if self._cluster is not None and self._cluster.get_store(name) is not None:
            raise StoreExists(f"store {name!r} already exists (distributed)")
        store = self.registry.create(name, dim=dim, metric=metric,
                                     dtype=dtype, intkey=intkey)
        if self.persistence is not None:
            self.persistence.track(store)
        return store.get_stats()

    def create_store_streaming(self, name: str, chunks, *, n: int,
                               dim: int, metric: str = "cosine",
                               **build_kw) -> dict:
        """Flagship-scale bulk build: stream [CH, dim] f32 chunks (host or
        device arrays) through the device-side cell build engine into an
        int4r store (VectorStore.from_chunks) — the whole corpus never
        exists as one host array and no O(N) table crosses the host link.
        Ids are implicit "0".."n-1" by arrival order.  Extra kwargs reach
        ops/cell_build.py (cell_rows, cell_cap, spill_mult, aniso_eta...).
        """
        from erlvectordb_tpu.core.registry import StoreExists

        if self.registry.exists(name) or (
                self._cluster is not None
                and self._cluster.get_store(name) is not None):
            raise StoreExists(f"store {name!r} already exists")
        store = VectorStore.from_chunks(name, chunks, n=n, dim=dim,
                                        metric=metric, **build_kw)
        self.registry.adopt(store)
        if self.persistence is not None:
            self.persistence.track(store)
        return store.get_stats()

    def delete_store(self, name: str) -> bool:
        if self.persistence is not None:
            self.persistence.untrack(name)
        self.indexes.drop_for_store(name)
        hit = self.registry.drop(name)
        if self._cluster is not None:
            hit = self._cluster.undistribute_store(name) or hit
        return hit

    def list_stores(self) -> List[str]:
        names = set(self.registry.list())
        if self._cluster is not None:
            names.update(self._cluster.get_cluster_stats()["stores"])
        return sorted(names)

    def get_store(self, name: str) -> VectorStore:
        return self.registry.get(name)

    def insert(self, store: str, vector_id: str, vector,
               metadata: Optional[dict] = None) -> None:
        self.any_store(store).insert(vector_id, vector, metadata)

    def insert_batch(self, store: str, ids: Sequence[str], vectors,
                     metadatas: Optional[Sequence[Optional[dict]]] = None) -> None:
        self.any_store(store).insert_batch(ids, vectors, metadatas)

    def search(self, store: str, query, k: int = 10,
               metric: Optional[str] = None,
               nprobe: Optional[int] = None,
               recall_target: Optional[float] = None,
               ) -> List[Tuple[str, Any, float]]:
        """``nprobe`` (local int4r stores only) switches to the sub-linear
        multiprobe gather — O(nprobe*cell_cap) HBM traffic per query, the
        low-latency path at large N (ops/cell_probe.py).
        ``recall_target`` instead picks the smallest calibrated nprobe
        meeting a ceiling-relative recall@k target
        (VectorStore.calibrate_nprobe; lazily calibrated on first use)."""
        st = self.any_store(store)
        kw = {}
        if nprobe is not None:
            self._check_nprobe(st)
            kw["nprobe"] = nprobe
        if recall_target is not None:
            self._check_nprobe(st)
            kw["recall_target"] = recall_target
        return st.search(query, k=k, metric=metric, **kw)

    def search_batch(self, store: str, queries, k: int = 10,
                     metric: Optional[str] = None,
                     nprobe: Optional[int] = None,
                     recall_target: Optional[float] = None):
        st = self.any_store(store)
        kw = {}
        if nprobe is not None:
            self._check_nprobe(st)
            kw["nprobe"] = nprobe
        if recall_target is not None:
            self._check_nprobe(st)
            kw["recall_target"] = recall_target
        return st.search_batch(queries, k=k, metric=metric, **kw)

    def calibrate_store(self, store: str, queries=None, n_sample: int = 256,
                        k: int = 10, metric: Optional[str] = None,
                        ground_truth=None) -> dict:
        """Measure a local int4r store's recall-vs-nprobe curve (see
        VectorStore.calibrate_nprobe); returns {nprobe: recall}.  Pass
        ``queries`` + ``ground_truth`` (exact rows over the ORIGINAL f32
        data, core/calibration.exact_ground_truth) for an exact-mode
        curve whose recall_target guarantee is absolute; without it the
        curve is ceiling-relative (the store holds only int4 residuals,
        so it cannot self-measure its own quantization loss)."""
        st = self.any_store(store)
        self._check_nprobe(st)
        return st.calibrate_nprobe(queries=queries, n_sample=n_sample, k=k,
                                   metric=metric, ground_truth=ground_truth)

    @staticmethod
    def _check_nprobe(st) -> None:
        """nprobe rides VectorStore's dispatch (which validates the int4r
        layout itself); distributed store classes don't accept it — raise
        the domain error, not a TypeError from the signature."""
        from erlvectordb_tpu.core.store import VectorStore

        if not isinstance(st, VectorStore):
            raise ValueError(
                "nprobe requires a local int4r store; distributed stores "
                "do not support multiprobe")

    def delete(self, store: str, vector_id: str) -> bool:
        return self.any_store(store).delete(vector_id)

    def get_stats(self, store: str) -> dict:
        return self.any_store(store).get_stats()

    def get_all_vectors(self, store: str):
        return self.any_store(store).get_all_vectors()

    def warmup(self, store: Optional[str] = None) -> int:
        """Pre-compile search programs (cold-start mitigation). With no
        store name, warms every local store."""
        names = [store] if store else self.list_stores()
        n = 0
        for name in names:
            s = self.registry.get_or_none(name)
            if s is not None and hasattr(s, "warmup"):
                n += s.warmup()
        return n

    def sync(self, store: str) -> bool:
        """Force a persistence sync (reference sync/1)."""
        self.any_store(store)  # raises StoreNotFound if absent
        if self.persistence is None:
            return False
        return self.persistence.sync(store)

    # --------------------------------------------------------------- backup

    def backup_store(self, store: str, backup_name: str) -> str:
        s = self.any_store(store)  # local or distributed
        return backup_mod.backup_store(s, backup_name, self.config.backup_dir)

    def restore_store(self, backup_file: str, new_name: Optional[str] = None) -> dict:
        from erlvectordb_tpu.parallel.sharded_store import ShardedVectorStore

        path = Path(self.config.backup_dir) / Path(backup_file).name
        if not path.exists():
            path = Path(backup_file)
        mesh = self._cluster.mesh if self._cluster is not None else None
        store = backup_mod.restore_store(path, new_name=new_name, mesh=mesh)
        if isinstance(store, ShardedVectorStore):
            self.cluster.distribute_store(store)
        else:
            self.registry.adopt(store)
        if self.persistence is not None:
            self.persistence.track(store)
        return store.get_stats()

    def list_backups(self) -> List[dict]:
        return backup_mod.list_backups(self.config.backup_dir)

    def delete_backup(self, backup_file: str) -> bool:
        return backup_mod.delete_backup(backup_file, self.config.backup_dir)

    def export_store(self, store: str, path: str) -> str:
        return backup_mod.export_store(self.any_store(store), path)

    def import_store(self, path: str, new_name: Optional[str] = None) -> dict:
        store = backup_mod.import_store(path, new_name=new_name)
        self.registry.adopt(store)
        if self.persistence is not None:
            self.persistence.track(store)
        return store.get_stats()

    # -------------------------------------------------------------- cluster

    @property
    def cluster(self):
        if self._cluster is None:
            from erlvectordb_tpu.parallel.cluster import ClusterManager

            self._cluster = ClusterManager(
                replication_factor=self.config.replication_factor
            )
        return self._cluster

    def create_distributed_store(self, name: str, dim: Optional[int] = None,
                                 metric: str = "cosine",
                                 dtype: str = "float32") -> dict:
        """Create a store sharded across the device mesh
        (reference create_distributed_store, src/erlvectordb.erl:57-63)."""
        from erlvectordb_tpu.core.registry import StoreExists
        from erlvectordb_tpu.parallel.sharded_store import ShardedVectorStore

        if self.registry.exists(name) or self.cluster.get_store(name) is not None:
            raise StoreExists(f"store {name!r} already exists")
        sharded = ShardedVectorStore(name, self.cluster.mesh, dim=dim,
                                     metric=metric, dtype=dtype)
        self.cluster.distribute_store(sharded)
        if self.persistence is not None:
            self.persistence.track(sharded)
        return sharded.get_stats()

    def create_dim_sharded_store(self, name: str, dim: Optional[int] = None,
                                 metric: str = "cosine",
                                 n_model: Optional[int] = None) -> dict:
        """Create a store whose FEATURE dimension is split across devices
        (tensor-parallel axis; for embeddings too wide for one chip's HBM).
        Full store API applies; searches psum partial dot products."""
        import jax

        from erlvectordb_tpu.core.registry import StoreExists
        from erlvectordb_tpu.parallel.dim_sharded import (
            DimShardedVectorStore,
            make_dim_mesh,
        )

        if self.registry.exists(name) or (
            self._cluster is not None and self.cluster.get_store(name)
        ):
            raise StoreExists(f"store {name!r} already exists")
        mesh = make_dim_mesh(n_model or len(jax.devices()))
        store = DimShardedVectorStore(name, mesh, dim=dim, metric=metric)
        self.registry.adopt(store)
        if self.persistence is not None:
            self.persistence.track(store)
        return store.get_stats()

    def distribute_store(self, name: str) -> dict:
        """Move an existing local store onto the mesh."""
        local = self.registry.get(name)
        sharded = self.cluster.distribute_store(local)
        self.registry.drop(name)
        if self.persistence is not None:
            self.persistence.untrack(name)
            self.persistence.track(sharded)
        return sharded.get_stats()

    def get_store_location(self, name: str):
        return self.cluster.get_store_location(name)

    def get_cluster_nodes(self):
        return self.cluster.get_cluster_nodes()

    def get_cluster_stats(self):
        return self.cluster.get_cluster_stats()

    def join_cluster(self, coordinator_address=None, num_processes=None,
                     process_id=None):
        return self.cluster.join_cluster(coordinator_address, num_processes,
                                         process_id)

    def leave_cluster(self):
        return self.cluster.leave_cluster()

    # -------------------------------------------------------- store routing

    def any_store(self, name: str):
        """A store by name, local or distributed (search/insert routing for
        the network frontends)."""
        local = self.registry.get_or_none(name)
        if local is not None:
            return local
        if self._cluster is not None:
            sharded = self._cluster.get_store(name)
            if sharded is not None:
                return sharded
        raise StoreNotFound(f"store {name!r} not found")

    def _maintenance_tick(self) -> None:
        """Runs on the persistence thread every sync interval."""
        self._refit_stale_stores()
        self._persist_dirty_calibrations()

    def _persist_dirty_calibrations(self) -> int:
        """Re-save index artifacts whose recall_target curves were lazily
        computed since the last write, so a restart keeps them (ADVICE
        r4: a lazily computed curve re-ran after every restart)."""
        if self.persistence is None:
            return 0
        n = 0
        for name in self.indexes.dirty_calibrations():
            try:
                self.indexes.save_index(
                    name, Path(self.config.persistence_dir) / "indexes")
                n += 1
            except Exception:  # noqa: BLE001 — keep the tick alive
                LOG.exception("persisting calibration for index %r", name)
        return n

    def _refit_stale_stores(self) -> int:
        """Maintenance tick: refit int4r stores whose cell-layout churn
        crossed ``refit_threshold`` (VectorStore.is_stale).  Runs on the
        persistence thread; one store per tick bounds the pause."""
        threshold = getattr(self.config, "refit_threshold", 0.0)
        if not threshold:
            return 0
        from erlvectordb_tpu.utils.metrics import metrics

        for name in self.registry.list():
            store = self.registry.get_or_none(name)
            if isinstance(store, VectorStore) and store.is_stale(threshold):
                drift = store.drift()
                store.rebuild_cells()
                metrics.inc("store.cell_refit_total")
                LOG.info("refit stale int4r store %r (churn %.0f%%)",
                         store.name, 100 * drift["fraction"])
                return 1
        return 0

    # --------------------------------------------------------------- indexes

    def create_index(self, name: str, store: str, index_type: str,
                     parameters: Optional[dict] = None) -> dict:
        return self.indexes.create_index(name, store, index_type, parameters)

    def build_index(self, name: str, wait: bool = True) -> dict:
        info = self.indexes.build_index(name, wait=wait)
        if (self.persistence is not None and info.get("built")
                and info.get("type") != "flat"):
            self.indexes.save_index(
                name, Path(self.config.persistence_dir) / "indexes")
        return info

    def list_indexes(self) -> List[dict]:
        return self.indexes.list_indexes()

    def get_index_info(self, name: str):
        return self.indexes.get_index_info(name)

    def drop_index(self, name: str) -> bool:
        hit = self.indexes.drop_index(name)
        if hit and self.persistence is not None:
            import shutil

            idir = Path(self.config.persistence_dir) / "indexes" / f"idx_{name}"
            shutil.rmtree(idir, ignore_errors=True)
        return hit

    def search_index(self, name: str, query, k: int = 10,
                     nprobe: Optional[int] = None,
                     recall_target: Optional[float] = None):
        """``nprobe`` overrides the build-time probe width per request
        (ivf/cellprobe families); ``recall_target`` auto-picks the
        smallest calibrated nprobe (cellprobe family; absolute after
        calibrate_index(mode='exact'), deep-probe-relative otherwise)."""
        return self.indexes.search(name, query, k=k, nprobe=nprobe,
                                   recall_target=recall_target)

    def calibrate_index(self, name: str, queries=None, n_sample: int = 256,
                        k: int = 10, mode: str = "exact",
                        metric: Optional[str] = None) -> dict:
        """Calibrate a cellprobe-family index's recall_target curve and
        persist it with the artifact.  ``mode="exact"`` (default)
        measures ABSOLUTE recall@k against exact f32 ground truth from
        the backing store (one brute device scan) and enforces the
        quantization ceiling; ``mode="ceiling"`` is the cheap
        self-relative curve (IndexManager.calibrate_index)."""
        out = self.indexes.calibrate_index(
            name, queries=queries, n_sample=n_sample, k=k, mode=mode,
            metric=metric)
        if self.persistence is not None:
            self.indexes.save_index(
                name, Path(self.config.persistence_dir) / "indexes")
        return out

    # ----------------------------------------------------------- compression

    def compress_vector(self, vector, algorithm: str, **kw):
        return compression_mod.compress_vector(vector, algorithm, **kw)

    def decompress_vector(self, compressed, **kw):
        return compression_mod.decompress_vector(compressed, **kw)

    def get_supported_algorithms(self):
        return compression_mod.get_supported_algorithms()

    def benchmark_compression(self, vector, algorithm: str, **kw):
        return compression_mod.benchmark_compression(vector, algorithm, **kw)

    # ---------------------------------------------------------------- oauth

    def register_oauth_client(self, client_id: str, secret: str,
                              scopes: Optional[List[str]] = None) -> dict:
        return self.oauth.register_client(client_id, secret, scopes)

    def get_access_token(self, client_id: str, secret: str,
                         scopes: Optional[List[str]] = None) -> dict:
        return self.oauth.grant_client_credentials(client_id, secret, scopes)

    def validate_token(self, token: str):
        return self.oauth.validate_token(token)


_default_db: Optional[Database] = None
_default_lock = threading.Lock()


def default_database() -> Database:
    """Process-wide default instance (the `erlvectordb:start()` analogue)."""
    global _default_db
    with _default_lock:
        if _default_db is None:
            _default_db = Database().start()
        return _default_db
