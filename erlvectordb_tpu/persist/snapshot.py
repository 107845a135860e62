"""Snapshot persistence — device→host checkpoint/restore of store state.

Capability parity with the reference's persistence layer
(reference: src/vector_persistence.erl): there, every write lands in ETS with
a dirty flag and a 30 s timer rewrites the whole DETS table
(src/vector_persistence.erl:221-273); on store start the table is read back
(src/vector_store.erl:63-103).  Here:

  * the "live" tier is the store's device arrays themselves (HBM);
  * ``save_store`` snapshots them to host and writes an atomic
    ``state.npz`` + ``meta.json`` pair (write-to-temp + rename, so a crash
    mid-sync never corrupts the previous snapshot — an upgrade over the
    reference's delete-all-then-rewrite);
  * ``PersistenceManager`` runs the dirty-flag sync loop (default 30 s,
    configurable ``sync_interval`` like the reference) on a background
    thread and re-hydrates stores on open.

Optional at-rest compression (``compression="zlib"``) uses numpy's deflate
container — the analogue of the reference's write-time compression hook
(src/vector_persistence.erl:106-120).
"""

from __future__ import annotations

import io
import json
import os
import threading
import time
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from erlvectordb_tpu.core.store import VectorStore

SNAPSHOT_FORMAT = 1
DEFAULT_SYNC_INTERVAL = 30.0

_ARRAY_KEYS = ("vectors", "norms", "valid", "scales")


def _store_dir(root: Path, name: str) -> Path:
    # Store names are API-validated; belt-and-braces against traversal.
    safe = name.replace("/", "_").replace("\\", "_").replace("..", "_")
    return root / safe


def save_store(store: VectorStore, root: str | os.PathLike, compression: Optional[str] = None) -> str:
    """Atomically snapshot one store under ``root/<name>/``."""
    root = Path(root)
    sdir = _store_dir(root, store.name)
    sdir.mkdir(parents=True, exist_ok=True)
    state = store.export_state()

    arrays = {k: state.pop(k) for k in _ARRAY_KEYS if k in state}
    meta = dict(state)
    meta["snapshot_format"] = SNAPSHOT_FORMAT
    meta["saved_at"] = time.time()
    meta["compression"] = compression or "none"

    buf = io.BytesIO()
    if compression == "zlib":
        np.savez_compressed(buf, **arrays)
    else:
        np.savez(buf, **arrays)

    tmp_npz = sdir / ".state.npz.tmp"
    tmp_meta = sdir / ".meta.json.tmp"
    tmp_npz.write_bytes(buf.getvalue())
    tmp_meta.write_text(json.dumps(meta))
    os.replace(tmp_npz, sdir / "state.npz")
    os.replace(tmp_meta, sdir / "meta.json")
    return str(sdir)


def load_store(name: str, root: str | os.PathLike, mesh=None):
    """Re-hydrate a store from its snapshot; None if no snapshot exists.
    Sharded snapshots re-hydrate onto ``mesh`` (default: all devices)."""
    sdir = _store_dir(Path(root), name)
    meta_path = sdir / "meta.json"
    npz_path = sdir / "state.npz"
    if not meta_path.exists():
        return None
    state = json.loads(meta_path.read_text())
    if npz_path.exists():
        with np.load(npz_path) as z:
            for k in z.files:
                state[k] = z[k]
    if state.get("sharded"):
        from erlvectordb_tpu.parallel.mesh import make_mesh
        from erlvectordb_tpu.parallel.sharded_store import ShardedVectorStore

        return ShardedVectorStore.from_state(state, mesh or make_mesh())
    return VectorStore.from_state(state)


def list_persisted(root: str | os.PathLike) -> List[str]:
    root = Path(root)
    if not root.exists():
        return []
    return sorted(p.name for p in root.iterdir() if (p / "meta.json").exists())


def delete_persisted(name: str, root: str | os.PathLike) -> bool:
    sdir = _store_dir(Path(root), name)
    if not sdir.exists():
        return False
    for f in list(sdir.iterdir()):
        f.unlink()
    sdir.rmdir()
    return True


def get_store_info(name: str, root: str | os.PathLike) -> Optional[dict]:
    """Snapshot header without loading arrays (reference get_store_info)."""
    sdir = _store_dir(Path(root), name)
    meta_path = sdir / "meta.json"
    if not meta_path.exists():
        return None
    meta = json.loads(meta_path.read_text())
    return {
        "name": meta.get("name", name),
        "dimension": meta.get("dim"),
        "count": len(meta.get("id_to_row") or meta.get("id_to_slot") or {})
        + int(meta.get("contig", 0)),
        "metric": meta.get("metric"),
        "dtype": meta.get("dtype"),
        "sharded": bool(meta.get("sharded", False)),
        "saved_at": meta.get("saved_at"),
        "compression": meta.get("compression", "none"),
    }


class PersistenceManager:
    """Dirty-flag periodic sync of a set of stores (ETS→DETS timer analogue).

    Tracks (store, last-synced-version); the background thread snapshots any
    store whose version moved since its last sync.  ``sync`` forces it, and
    ``close`` does a final sync + stops the thread — the reference's
    ``sync/1`` and ``close_store/1`` (src/vector_persistence.erl:19-20).
    """

    def __init__(
        self,
        root: str | os.PathLike,
        sync_interval: float = DEFAULT_SYNC_INTERVAL,
        compression: Optional[str] = None,
    ):
        self.root = Path(root)
        self.sync_interval = float(sync_interval)
        self.compression = compression
        self._tracked: Dict[str, VectorStore] = {}
        self._synced_version: Dict[str, int] = {}
        self._lock = threading.RLock()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> None:
        if self._thread is not None:
            return
        self._stop.clear()
        self._thread = threading.Thread(target=self._loop, name="evdb-persist", daemon=True)
        self._thread.start()

    def close(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=self.sync_interval + 5)
            self._thread = None
        self.sync_all()

    def _loop(self) -> None:
        while not self._stop.wait(self.sync_interval):
            try:
                self.sync_all()
            except Exception:  # pragma: no cover - keep the loop alive
                pass

    # -- tracking ----------------------------------------------------------

    def track(self, store: VectorStore) -> None:
        with self._lock:
            self._tracked[store.name] = store
            self._synced_version.setdefault(store.name, -1)

    def untrack(self, name: str) -> None:
        with self._lock:
            self._tracked.pop(name, None)
            self._synced_version.pop(name, None)

    def open_store(self, name: str, mesh=None):
        """Load a snapshot if present and start tracking the store."""
        store = load_store(name, self.root, mesh=mesh)
        if store is not None:
            self.track(store)
            with self._lock:
                self._synced_version[name] = store.version
        return store

    # -- syncing -----------------------------------------------------------

    def sync(self, name: str) -> bool:
        with self._lock:
            store = self._tracked.get(name)
        if store is None:
            return False
        save_store(store, self.root, compression=self.compression)
        with self._lock:
            self._synced_version[name] = store.version
        store.dirty = False
        return True

    def sync_all(self) -> int:
        with self._lock:
            pending = [
                s for s in self._tracked.values()
                if s.version != self._synced_version.get(s.name, -1)
            ]
        n = 0
        for store in pending:
            save_store(store, self.root, compression=self.compression)
            with self._lock:
                self._synced_version[store.name] = store.version
            store.dirty = False
            n += 1
        return n
