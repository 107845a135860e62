"""Snapshot persistence — device→host checkpoint/restore of store state.

Capability parity with the reference's persistence layer
(reference: src/vector_persistence.erl): there, every write lands in ETS with
a dirty flag and a 30 s timer rewrites the whole DETS table
(src/vector_persistence.erl:221-273); on store start the table is read back
(src/vector_store.erl:63-103).  Here:

  * the "live" tier is the store's device arrays themselves (HBM);
  * ``save_store`` snapshots them to host as a GENERATION-NUMBERED
    ``state_<gen>.npz`` + ``meta_<gen>.json`` pair (write-to-temp +
    rename, npz first).  The npz embeds a ``__saved_at__`` echo of the
    meta's timestamp, so the loader can PROVE a pair is consistent; it
    picks the newest pair whose meta parses, whose npz opens, and whose
    echo matches, then deletes nothing.  Older generations are removed
    only after the new pair is fully committed — so a crash at ANY
    point (between the two renames, mid-write, mid-cleanup) leaves a
    previous consistent pair for the loader to fall back to.  The
    reference rewrites its whole DETS table in place every sync
    (delete-all-then-insert, src/vector_persistence.erl:255-273) — a
    crash mid-rewrite there loses the table;
  * ``PersistenceManager`` runs the dirty-flag sync loop (default 30 s,
    configurable ``sync_interval`` like the reference) on a background
    thread and re-hydrates stores on open.

Fault-injection coverage for these claims lives in
``tests/test_crash_safety.py`` (kill -9 mid-sync, torn rename windows,
truncated npz, meta/state skew, orphan tmp files).

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

_ARRAY_KEYS = ("vectors", "norms", "valid", "scales", "centroids")


def _store_dir(root: Path, name: str) -> Path:
    # Store names are API-validated; belt-and-braces against traversal.
    safe = name.replace("/", "_").replace("\\", "_").replace("..", "_")
    return root / safe


def _pair_gen(p: Path) -> int:
    try:
        return int(p.stem.rsplit("_", 1)[1])
    except (IndexError, ValueError):
        return -1


def _resolve_snapshot(sdir: Path):
    """Newest PROVABLY-consistent (meta, npz, meta_dict) snapshot pair.

    A pair is consistent when the meta parses, the npz zip opens, and the
    npz's ``__saved_at__`` echo equals the meta's ``saved_at``.  Torn
    renames, truncated npz files, and meta/state skew all fail one of
    those checks and fall through to the previous generation (or the
    pre-round-5 legacy unversioned pair).  Returns None when no
    consistent snapshot exists."""
    candidates = sorted(sdir.glob("meta_*.json"), key=_pair_gen,
                        reverse=True)
    for mp in candidates:
        npz = sdir / f"state_{mp.stem.rsplit('_', 1)[1]}.npz"
        try:
            meta = json.loads(mp.read_text())
        except (json.JSONDecodeError, OSError):
            continue
        if not npz.exists():
            continue  # crash between the npz and meta renames... of a
            # PREVIOUS cleanup; or manual deletion — either way unusable
        try:
            with np.load(npz) as z:
                if "__saved_at__" not in z.files:
                    continue
                echo = float(z["__saved_at__"][0])
        except Exception:  # noqa: BLE001 — truncated/corrupt zip
            continue
        if meta.get("saved_at") != echo:
            continue  # skewed pair (e.g. new arrays + old meta)
        return mp, npz, meta
    # legacy unversioned pair (pre-generation snapshots): best effort
    mp = sdir / "meta.json"
    if mp.exists():
        try:
            meta = json.loads(mp.read_text())
        except (json.JSONDecodeError, OSError):
            return None
        npz = sdir / "state.npz"
        return mp, (npz if npz.exists() else None), meta
    return None


def save_store(store: VectorStore, root: str | os.PathLike, compression: Optional[str] = None) -> str:
    """Snapshot one store under ``root/<name>/`` as a new generation pair
    (crash-safe: the previous pair survives until this one is fully
    committed — see module docstring)."""
    root = Path(root)
    sdir = _store_dir(root, store.name)
    sdir.mkdir(parents=True, exist_ok=True)
    # clear BEFORE export: a row touched after this clear is re-recorded by
    # its own mutation (which the export's read lock excludes until done),
    # so at worst a row lands in both the base and the next delta — never
    # in neither
    if hasattr(store, "_touched_rows"):
        store._touched_rows.clear()
    state = store.export_state()

    arrays = {k: state.pop(k) for k in _ARRAY_KEYS if k in state}
    meta = dict(state)
    meta["snapshot_format"] = SNAPSHOT_FORMAT
    meta["saved_at"] = time.time()
    meta["compression"] = compression or "none"
    # consistency echo: the loader accepts a pair only when this matches
    # the meta's saved_at (json round-trips the exact float)
    arrays["__saved_at__"] = np.asarray([meta["saved_at"]], np.float64)

    buf = io.BytesIO()
    if compression == "zlib":
        np.savez_compressed(buf, **arrays)
    else:
        np.savez(buf, **arrays)

    old_metas = list(sdir.glob("meta_*.json"))
    gen = max((_pair_gen(p) for p in old_metas), default=0) + 1
    tmp_npz = sdir / f".state_{gen:08d}.npz.tmp"
    tmp_meta = sdir / f".meta_{gen:08d}.json.tmp"
    tmp_npz.write_bytes(buf.getvalue())
    tmp_meta.write_text(json.dumps(meta))
    # npz first: the loader keys on meta files, so a meta implies its npz
    # already landed; a crash between the renames leaves an ignored
    # npz-only generation and the previous pair still loads
    os.replace(tmp_npz, sdir / f"state_{gen:08d}.npz")
    os.replace(tmp_meta, sdir / f"meta_{gen:08d}.json")
    # the new pair is committed: retire older generations, the legacy
    # unversioned pair, superseded deltas, and any orphan tmp files
    for p in old_metas:
        p.unlink(missing_ok=True)
    for p in sdir.glob("state_*.npz"):
        if _pair_gen(p) < gen:
            p.unlink(missing_ok=True)
    (sdir / "meta.json").unlink(missing_ok=True)
    (sdir / "state.npz").unlink(missing_ok=True)
    clear_deltas(sdir)
    for p in sdir.glob(".*.tmp"):
        p.unlink(missing_ok=True)
    if hasattr(store, "_touched_rows"):
        store._touched_reliable = True
    return str(sdir)


def save_delta(store: VectorStore, root: str | os.PathLike, seq: int) -> int:
    """Write an incremental snapshot covering only the rows touched since
    the last sync — O(delta) device gather + disk write instead of the
    reference's O(N) full rewrite every 30 s
    (src/vector_persistence.erl:255-273).  Returns the number of rows
    written.  Caller guarantees a matching base snapshot exists."""
    sdir = _store_dir(Path(root), store.name)
    resolved = _resolve_snapshot(sdir)
    if resolved is None:
        raise FileNotFoundError(f"no base snapshot under {sdir}")
    base_meta = resolved[2]  # anchor to the pair the loader will resolve
    with store._lock.read():
        rows = np.fromiter(sorted(store._touched_rows), np.int64,
                           len(store._touched_rows))
        rows_j = rows.astype(np.int32)
        arrays = {
            "rows": rows,
            "vectors": np.asarray(store._vectors[rows_j]),
            "norms": np.asarray(store._norms[rows_j]),
            "valid": np.asarray(store._valid[rows_j]),
        }
        if store._scales is not None:
            arrays["scales"] = np.asarray(store._scales[rows_j])
        ids = store._ids_view()[rows]
        meta = {
            "version": store.version,
            "base_saved_at": base_meta["saved_at"],
            "next_row": store._next_row,
            "free_rows": list(store._free_rows),
            "ids": [None if v is None else str(v) for v in ids.tolist()],
            "metadata": {
                str(v): store._metadata.get(str(v), {})
                for v in ids.tolist() if v is not None
            },
        }
        store._touched_rows.clear()
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    tmp_npz = sdir / f".delta_{seq:06d}.npz.tmp"
    tmp_meta = sdir / f".delta_{seq:06d}.json.tmp"
    tmp_npz.write_bytes(buf.getvalue())
    tmp_meta.write_text(json.dumps(meta))
    # json first: a crash between the renames leaves an npz-less delta that
    # the loader skips, never a half-described one
    os.replace(tmp_meta, sdir / f"delta_{seq:06d}.json")
    os.replace(tmp_npz, sdir / f"delta_{seq:06d}.npz")
    return int(rows.size)


def _delta_files(sdir: Path):
    return sorted(p for p in sdir.glob("delta_*.json"))


def clear_deltas(sdir: Path) -> None:
    for p in list(sdir.glob("delta_*.json")) + list(sdir.glob("delta_*.npz")):
        try:
            p.unlink()
        except OSError:
            pass


def _apply_deltas(state: dict, sdir: Path) -> None:
    """Fold delta files into a loaded base state (arrays + id/metadata)."""
    base_saved_at = state.get("saved_at")
    row_to_id = {int(r): i for i, r in state.get("id_to_row", {}).items()}
    for jpath in _delta_files(sdir):
        npz_path = jpath.with_suffix(".npz")
        if not npz_path.exists():
            continue  # torn write: json landed, npz didn't
        dmeta = json.loads(jpath.read_text())
        if dmeta.get("base_saved_at") != base_saved_at:
            continue  # stale delta from a previous base
        with np.load(npz_path) as z:
            rows = z["rows"]
            for key in ("vectors", "norms", "valid", "scales"):
                if key in z.files and key in state:
                    state[key][rows] = z[key]
        ids = dmeta["ids"]
        id_to_row = state.setdefault("id_to_row", {})
        metadata = state.setdefault("metadata", {})
        for r, vid in zip(rows.tolist(), ids):
            old = row_to_id.get(r)
            if old is not None and old != vid:
                id_to_row.pop(old, None)
                metadata.pop(old, None)
            if vid is None:
                row_to_id.pop(r, None)
            else:
                id_to_row[vid] = r
                row_to_id[r] = vid
                metadata[vid] = dmeta["metadata"].get(vid, {})
        state["next_row"] = dmeta["next_row"]
        state["free_rows"] = dmeta["free_rows"]
        state["version"] = dmeta["version"]
        state["contig"] = 0  # deltas imply targeted mutations happened


def load_store(name: str, root: str | os.PathLike, mesh=None):
    """Re-hydrate a store from its snapshot (base + any incremental deltas);
    None if no snapshot exists.  Sharded snapshots re-hydrate onto ``mesh``
    (default: all devices)."""
    sdir = _store_dir(Path(root), name)
    if not sdir.exists():
        return None
    resolved = _resolve_snapshot(sdir)
    if resolved is None:
        return None
    _mp, npz_path, state = resolved
    if npz_path is not None and npz_path.exists():
        with np.load(npz_path) as z:
            for k in z.files:
                if k != "__saved_at__":
                    state[k] = z[k]
    if state.get("sharded"):
        from erlvectordb_tpu.parallel.mesh import make_mesh
        from erlvectordb_tpu.parallel.sharded_store import ShardedVectorStore

        return ShardedVectorStore.from_state(state, mesh or make_mesh())
    _apply_deltas(state, sdir)
    if state.get("dim_sharded"):
        from erlvectordb_tpu.parallel.dim_sharded import DimShardedVectorStore

        return DimShardedVectorStore.from_state(state)
    return VectorStore.from_state(state)


def list_persisted(root: str | os.PathLike) -> List[str]:
    root = Path(root)
    if not root.exists():
        return []
    return sorted(
        p.name for p in root.iterdir()
        if p.is_dir() and ((p / "meta.json").exists()
                           or any(p.glob("meta_*.json"))))


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
    if not sdir.exists():
        return None
    resolved = _resolve_snapshot(sdir)
    if resolved is None:
        return None
    meta = resolved[2]
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
        self._delta_seq: Dict[str, int] = {}   # deltas written since base
        # serializes snapshot writes per store (an explicit sync() racing
        # the background loop must not interleave generation writes)
        self._save_locks: Dict[str, threading.Lock] = {}
        self._lock = threading.RLock()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    MAX_DELTAS = 64           # compaction: full snapshot after this many
    MAX_DELTA_FRACTION = 0.25  # delta only while touched <= 25% of rows

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

    # optional maintenance hook, run each tick before the sync (Database
    # wires staleness-driven cell refits here)
    maintenance_cb = None

    def _loop(self) -> None:
        while not self._stop.wait(self.sync_interval):
            if self.maintenance_cb is not None:
                try:
                    self.maintenance_cb()
                except Exception:  # pragma: no cover - keep the loop alive
                    pass
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
                # continue the existing delta chain where it left off
                sdir = _store_dir(self.root, name)
                self._delta_seq[name] = len(_delta_files(sdir))
            if isinstance(store, VectorStore):
                store._touched_reliable = True
        return store

    # -- syncing -----------------------------------------------------------

    def _sync_store(self, store) -> None:
        """Incremental when possible: a store with an anchored delta chain
        and a small touched set gets an O(delta) delta file; otherwise a
        full base snapshot (which also compacts the chain)."""
        name = store.name
        with self._lock:
            save_lock = self._save_locks.setdefault(name, threading.Lock())
        with save_lock:
            self._sync_store_locked(store)

    def _sync_store_locked(self, store) -> None:
        name = store.name
        # capture the version BEFORE the (possibly seconds-long) save: a
        # write landing during the save bumps store.version past this, so
        # sync_all re-syncs it next cycle instead of silently losing it —
        # recording store.version AFTER the save would mark unsaved state
        # as synced forever
        ver = store.version
        touched = len(getattr(store, "_touched_rows", ()))
        seq = self._delta_seq.get(name, 0)
        calib = getattr(store, "_calib", None)
        use_delta = (
            getattr(store, "_touched_reliable", False)
            and not getattr(store, "_contig", 0)
            and 0 < touched <= max(1, int(self.MAX_DELTA_FRACTION * max(store.count, 1)))
            and seq < self.MAX_DELTAS
            and isinstance(store, VectorStore)
            # deltas carry no calibration curves: a fresh (lazily
            # computed) curve forces one full base so it survives restart
            and not (calib is not None and calib.dirty)
        )
        if use_delta:
            save_delta(store, self.root, seq)
            with self._lock:
                self._delta_seq[name] = seq + 1
        else:
            save_store(store, self.root, compression=self.compression)
            with self._lock:
                self._delta_seq[name] = 0
        with self._lock:
            self._synced_version[name] = ver
        if store.version == ver:  # no write raced the save
            store.dirty = False

    def sync(self, name: str) -> bool:
        with self._lock:
            store = self._tracked.get(name)
        if store is None:
            return False
        self._sync_store(store)
        return True

    def sync_all(self) -> int:
        with self._lock:
            pending = [
                s for s in self._tracked.values()
                if s.version != self._synced_version.get(s.name, -1)
                or getattr(s, "_calib", None) is not None and s._calib.dirty
            ]
        n = 0
        for store in pending:
            self._sync_store(store)
            n += 1
        return n
