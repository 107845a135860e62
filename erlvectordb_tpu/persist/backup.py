"""Backups and portable JSON export/import.

Capability parity with the reference's backup layer (src/vector_backup.erl):
  * ``backup_store``  → one self-contained ``<store>_<name>_<ts>.backup``
    file (reference :41-85 writes a term_to_binary snapshot; ours is a zip of
    the array snapshot + a JSON manifest — portable and zero-copy restorable);
  * ``restore_store`` → creates a fresh store from the snapshot (reference
    :88-140 re-inserts vector-by-vector; we restore the arrays wholesale);
  * ``list_backups`` / ``delete_backup`` (reference :143-168);
  * ``export_store`` / ``import_store`` — human-readable JSON with the same
    shape the reference's jsx export produces (:170-242):
    ``{"store_name", "dimension", "vector_count", "vectors":
       [{"id", "vector", "metadata"}]}``.
"""

from __future__ import annotations

import io
import json
import os
import time
import zipfile
from pathlib import Path
from typing import List, Optional

import numpy as np

from erlvectordb_tpu.core.store import VectorStore

BACKUP_SUFFIX = ".backup"
# must cover every ndarray export_state can emit (int4r stores carry
# centroids) — a missed key stays in the JSON manifest and json.dumps
# raises; restore would also silently drop it
_ARRAY_KEYS = ("vectors", "norms", "valid", "scales", "centroids")


def backup_store(store: VectorStore, backup_name: str, backup_dir: str | os.PathLike) -> str:
    """Write a point-in-time backup file; returns its path."""
    bdir = Path(backup_dir)
    bdir.mkdir(parents=True, exist_ok=True)
    ts = int(time.time())
    fname = f"{store.name}_{backup_name}_{ts}{BACKUP_SUFFIX}"
    path = bdir / fname

    state = store.export_state()
    arrays = {k: state.pop(k) for k in _ARRAY_KEYS if k in state}
    manifest = dict(state)
    manifest["backup_name"] = backup_name
    manifest["timestamp"] = ts
    manifest["store_info"] = store.get_stats()

    npz_buf = io.BytesIO()
    np.savez_compressed(npz_buf, **arrays)

    tmp = path.with_suffix(".tmp")
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_STORED) as z:
        z.writestr("manifest.json", json.dumps(manifest))
        z.writestr("state.npz", npz_buf.getvalue())
    os.replace(tmp, path)
    return str(path)


def read_backup_manifest(path: str | os.PathLike) -> dict:
    with zipfile.ZipFile(path) as z:
        return json.loads(z.read("manifest.json"))


def restore_store(
    path: str | os.PathLike,
    new_name: Optional[str] = None,
    mesh=None,
):
    """Materialize a store from a backup file (optionally renamed).
    Sharded backups re-hydrate onto ``mesh`` (default: all devices)."""
    with zipfile.ZipFile(path) as z:
        state = json.loads(z.read("manifest.json"))
        with np.load(io.BytesIO(z.read("state.npz"))) as npz:
            for k in npz.files:
                state[k] = npz[k]
    state.pop("store_info", None)
    if new_name:
        state["name"] = new_name
    if state.get("sharded"):
        from erlvectordb_tpu.parallel.mesh import make_mesh
        from erlvectordb_tpu.parallel.sharded_store import ShardedVectorStore

        return ShardedVectorStore.from_state(state, mesh or make_mesh())
    return VectorStore.from_state(state)


def list_backups(backup_dir: str | os.PathLike) -> List[dict]:
    """Backup inventory with per-file header info (reference :143-160)."""
    bdir = Path(backup_dir)
    if not bdir.exists():
        return []
    out = []
    for p in sorted(bdir.glob(f"*{BACKUP_SUFFIX}")):
        try:
            m = read_backup_manifest(p)
            out.append(
                {
                    "file": p.name,
                    "path": str(p),
                    "store_name": m.get("name"),
                    "backup_name": m.get("backup_name"),
                    "timestamp": m.get("timestamp"),
                    "vector_count": len(m.get("id_to_row")
                                        or m.get("id_to_slot") or {})
                    + int(m.get("contig", 0)),
                    "size_bytes": p.stat().st_size,
                }
            )
        except (zipfile.BadZipFile, KeyError, json.JSONDecodeError):
            continue
    return out


def delete_backup(file_name: str, backup_dir: str | os.PathLike) -> bool:
    p = Path(backup_dir) / Path(file_name).name
    if p.exists() and p.suffix == BACKUP_SUFFIX:
        p.unlink()
        return True
    return False


# ---------------------------------------------------------------- JSON export


def export_store(store: VectorStore, path: str | os.PathLike) -> str:
    """Portable JSON export (reference export_store :170-205 shape)."""
    entries = [
        {"id": vid, "vector": [float(x) for x in vec], "metadata": meta}
        for vid, vec, meta in store.get_all_vectors()
    ]
    doc = {
        "store_name": store.name,
        "dimension": store.dim,
        "metric": store.metric,
        "vector_count": len(entries),
        "exported_at": time.time(),
        "vectors": entries,
    }
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_text(json.dumps(doc))
    os.replace(tmp, path)
    return str(path)


def import_store(
    path: str | os.PathLike,
    new_name: Optional[str] = None,
    dtype: str = "float32",
) -> VectorStore:
    """Create a store from a JSON export (reference import_store :207-242)."""
    doc = json.loads(Path(path).read_text())
    name = new_name or doc["store_name"]
    store = VectorStore(
        name,
        dim=doc.get("dimension"),
        metric=doc.get("metric", "cosine"),
        dtype=dtype,
    )
    vectors = doc.get("vectors", [])
    if vectors:
        ids = [e["id"] for e in vectors]
        mat = np.asarray([e["vector"] for e in vectors], dtype=np.float32)
        metas = [e.get("metadata", {}) for e in vectors]
        store.insert_batch(ids, mat, metas)
    return store
