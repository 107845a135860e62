"""Row-sharded vector store over a device mesh — exact distributed search.

What the reference cannot do: it only replicates whole stores across nodes
and never fans a query out (search is one local gen_server call,
src/erlvectordb.erl:88-92; replication src/cluster_manager.erl:148-171).
Here one store's rows are SHARDED across the mesh's ``data`` axis and every
query is answered exactly:

    shard_map:  per-device distance scan over its [cap, D] slice (MXU)
                -> local top-k                                     (on-chip)
                -> all_gather of (k dists, k global rows) over ICI  [S*k]
                -> replicated final top-k merge                     (tiny)

Queries are split across the ``replica`` axis (each replica group holds a
full copy of the rows), so replica count multiplies query throughput — the
productive version of the reference's availability replicas.

Device layout: ``vectors [S, cap, D]`` sharded ``P('data', None, None)`` —
shard s owns slice ``[s]``; a global row id is ``s * cap + local``.  Bulk
store migration (the reference's per-vector rpc loop,
src/cluster_manager.erl:370-380) is ``from_store``/``to_store`` — one
resharding device transfer.
"""

from __future__ import annotations

import functools
import threading
import math
import time
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from erlvectordb_tpu.core.search import (
    VALID_METRICS,
    int8_distances,
    pairwise_distances,
)
from erlvectordb_tpu.core.store import _next_pow2, _pack_results, _pad128
from erlvectordb_tpu.utils.hbm import prime_hbm
from erlvectordb_tpu.utils.locks import RWLock
from erlvectordb_tpu.parallel.mesh import DATA_AXIS, REPLICA_AXIS

MIN_SHARD_CAPACITY = 256

_INF = float("inf")  # python float: a module-level jnp array would initialize
# the XLA backend at import, breaking jax.distributed.initialize


def _bulk_cap(n: int, s_count: int) -> int:
    """Per-shard capacity for a bulk build: scan-tile-aligned (4096) instead
    of power-of-two above one tile — a 10M-row build allocates 10.002M rows,
    not 16.8M (power-of-two doubling would waste 40% of HBM at that scale).
    Growth after the build still doubles (``_grow_to``)."""
    from erlvectordb_tpu.ops.fused_topk import TILE_N

    per = -(-n // s_count)
    if per >= TILE_N:
        return -(-per // TILE_N) * TILE_N
    return max(_next_pow2(per), MIN_SHARD_CAPACITY)


# --------------------------------------------------------------------------
# Compiled programs, cached per (mesh, metric, k, dtype).  Shapes are handled
# by jit's own cache.
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _build_search(mesh: Mesh, metric: str, k: int, is_int8: bool,
                  fused_n_tiles: int = 0):
    """Compiled sharded search.  With ``fused_n_tiles > 0`` each device runs
    the fused Pallas scan kernel over its local shard (ops/fused_topk.py);
    otherwise the XLA distance path."""

    def local_scan(vecs, aux, nrm, vld, q):
        # block shapes: vecs [1, cap, D], aux/nrm/vld [1, cap], q [B_r, D]
        vecs, aux, nrm, vld = vecs[0], aux[0], nrm[0], vld[0]
        kk = min(k, vecs.shape[0])
        if fused_n_tiles > 0:
            from erlvectordb_tpu.ops.fused_topk import fused_topk

            neg_d, loc = fused_topk(
                vecs, aux if is_int8 else None, nrm, vld, q,
                metric=metric, k=kk, n_tiles=fused_n_tiles,
            )
            neg = -neg_d  # fused returns distances; merge works on -dist
        else:
            if is_int8:
                dists = int8_distances(vecs, aux, nrm, q, metric)
            else:
                dists = pairwise_distances(vecs, nrm, q, metric)
            dists = jnp.where(vld[None, :], dists, _INF)
            neg, loc = lax.top_k(-dists, kk)
        shard = lax.axis_index(DATA_AXIS)
        glob = loc + shard * vecs.shape[0]
        # Merge: gather the k candidates (not the N-length rows) over ICI.
        d_all = lax.all_gather(-neg, DATA_AXIS)  # [S, B_r, kk]
        g_all = lax.all_gather(glob, DATA_AXIS)
        s = d_all.shape[0]
        b = q.shape[0]
        d_flat = d_all.transpose(1, 0, 2).reshape(b, s * kk)
        g_flat = g_all.transpose(1, 0, 2).reshape(b, s * kk)
        kf = min(k, s * kk)
        neg2, sel = lax.top_k(-d_flat, kf)
        return -neg2, jnp.take_along_axis(g_flat, sel, axis=1)

    shd = jax.shard_map(
        local_scan,
        mesh=mesh,
        in_specs=(
            P(DATA_AXIS, None, None),
            P(DATA_AXIS, None),
            P(DATA_AXIS, None),
            P(DATA_AXIS, None),
            P(REPLICA_AXIS, None),
        ),
        out_specs=(P(REPLICA_AXIS, None), P(REPLICA_AXIS, None)),
        check_vma=False,
    )
    return jax.jit(shd)


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3),
                   static_argnames=("dt", "width"))
def _chunk_write(codes, scales, norms, valid, chunk, off, live, *, dt, width):
    """Quantize one [c, D] f32 chunk and write it into the flat sharded
    buffers at row ``off`` (in place — buffers are donated).  ``live`` masks
    trailing padding rows of a final partial chunk (traced, so one compiled
    program serves every chunk)."""
    c, d = chunk.shape
    if width != d:
        chunk = jnp.pad(chunk, ((0, 0), (0, width - d)))
    nn = jnp.sqrt(jnp.sum(chunk * chunk, axis=-1))
    if dt == "int8":
        absmax = jnp.max(jnp.abs(chunk), axis=-1)
        sc = jnp.where(absmax > 0, absmax / 127.0, 1.0)
        rows = jnp.clip(jnp.round(chunk / sc[:, None]), -127, 127).astype(jnp.int8)
    else:
        sc = jnp.ones((c,), jnp.float32)
        rows = chunk
    vld = jnp.arange(c) < live
    codes = lax.dynamic_update_slice(codes, rows, (off, 0))
    scales = lax.dynamic_update_slice(scales, sc, (off,))
    norms = lax.dynamic_update_slice(norms, jnp.where(vld, nn, 0.0), (off,))
    valid = lax.dynamic_update_slice(valid, vld, (off,))
    return codes, scales, norms, valid


@functools.lru_cache(maxsize=None)
def _build_insert(mesh: Mesh, is_int8: bool):
    if is_int8:
        def insert(codes, scales, norms, valid, shard_idx, local_idx, new_vecs):
            absmax = jnp.max(jnp.abs(new_vecs), axis=-1)
            scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
            q = jnp.clip(jnp.round(new_vecs / scale[:, None]), -127, 127).astype(jnp.int8)
            codes = codes.at[shard_idx, local_idx].set(q, mode="drop")
            scales = scales.at[shard_idx, local_idx].set(scale, mode="drop")
            nn = jnp.sqrt(jnp.sum(new_vecs * new_vecs, axis=-1))
            norms = norms.at[shard_idx, local_idx].set(nn, mode="drop")
            valid = valid.at[shard_idx, local_idx].set(True, mode="drop")
            return codes, scales, norms, valid

        return jax.jit(insert, donate_argnums=(0, 1, 2, 3))

    def insert(vectors, norms, valid, shard_idx, local_idx, new_vecs):
        vectors = vectors.at[shard_idx, local_idx].set(new_vecs, mode="drop")
        nn = jnp.sqrt(jnp.sum(new_vecs * new_vecs, axis=-1))
        norms = norms.at[shard_idx, local_idx].set(nn, mode="drop")
        valid = valid.at[shard_idx, local_idx].set(True, mode="drop")
        return vectors, norms, valid

    return jax.jit(insert, donate_argnums=(0, 1, 2))


@functools.lru_cache(maxsize=None)
def _build_delete(mesh: Mesh):
    def delete(valid, shard_idx, local_idx):
        return valid.at[shard_idx, local_idx].set(False, mode="drop")

    return jax.jit(delete, donate_argnums=(0,))


class ShardedVectorStore:
    """One store whose rows live sharded across a device mesh."""

    def __init__(
        self,
        name: str,
        mesh: Mesh,
        dim: Optional[int] = None,
        metric: str = "cosine",
        dtype: str = "float32",
    ):
        if metric not in VALID_METRICS:
            raise ValueError(f"metric must be one of {VALID_METRICS}")
        if dtype not in ("float32", "int8"):
            raise ValueError("dtype must be 'float32' or 'int8'")
        self.name = name
        self.mesh = mesh
        self.metric = metric
        self.dtype = dtype
        self._dim = dim
        self.n_shards = mesh.shape[DATA_AXIS]
        self.n_replicas = mesh.shape[REPLICA_AXIS]
        self._cap = 0  # per-shard capacity
        self._lock = RWLock()
        self._mat_lock = threading.Lock()  # guards _materialize

        self._vectors: Optional[jax.Array] = None  # [S, cap, D]
        self._scales: Optional[jax.Array] = None   # [S, cap] (int8 only)
        self._norms: Optional[jax.Array] = None    # [S, cap]
        self._valid: Optional[jax.Array] = None    # [S, cap]

        self._id_to_slot: Dict[str, Tuple[int, int]] = {}  # id -> (shard, local)
        self._slot_to_id: Dict[Tuple[int, int], str] = {}
        self._metadata: Dict[str, Any] = {}
        self._free: List[List[int]] = [[] for _ in range(self.n_shards)]
        self._next_local = [0] * self.n_shards
        self._rr = 0  # round-robin shard cursor

        # Bulk-build fast path (mirrors core VectorStore): rows [0, contig)
        # carry the implicit id str(i) at slot (i // cap, i % cap) — with
        # block partitioning the global row index equals i, so mapping is
        # identity.  The dicts above stay empty until the first targeted
        # mutation; at 10M rows they would cost GBs of host RAM.
        self._contig = 0
        # Columnar global-row -> id table for vectorized result mapping.
        self._ids_np: Optional[np.ndarray] = None
        self._ids_contig_filled = 0

        self.version = 0
        self.dirty = False
        self.created_at = time.time()

    # ------------------------------------------------------------ properties

    @property
    def dim(self) -> Optional[int]:
        return self._dim

    @property
    def count(self) -> int:
        return len(self._id_to_slot) + self._contig

    @property
    def capacity(self) -> int:
        return self._cap * self.n_shards

    def __len__(self) -> int:
        return self.count

    def __contains__(self, vid: str) -> bool:
        if self._contig:
            try:
                return 0 <= int(vid) < self._contig
            except (TypeError, ValueError):
                return False
        return vid in self._id_to_slot

    def _materialize(self) -> None:
        """Expand implicit contiguous ids into the slot dicts (one-time,
        before the first targeted mutation or dict-reading accessor).
        MUST run before any capacity grow: the implicit id<->row identity
        only holds at the build-time per-shard capacity.

        Callers may hold only the READ side of the RWLock (get /
        filter_mask / export paths run concurrently), so this is guarded
        by its own mutex with ``_contig`` cleared LAST: a concurrent
        reader either blocks here or sees complete tables, never the
        half-built state (same pattern as core VectorStore)."""
        if not self._contig:
            return
        with self._mat_lock:
            n, cap = self._contig, self._cap
            if not n:  # lost the race: another thread materialized
                return
            self._id_to_slot = {str(i): (i // cap, i % cap) for i in range(n)}
            self._slot_to_id = {v: k for k, v in self._id_to_slot.items()}
            self._fill_contig_ids(n)
            self._contig = 0  # publish: tables are complete

    def _fill_contig_ids(self, n: int) -> None:
        """Fill flat rows [0, n) of the columnar id table with implicit ids
        (flat row s*cap + l == original build row for block partitioning)."""
        if self._ids_np is not None and self._ids_contig_filled < n:
            flat = self._ids_np.reshape(-1)
            flat[self._ids_contig_filled:n] = np.arange(
                self._ids_contig_filled, n
            ).astype(str).astype(object)
            self._ids_contig_filled = n

    def _ids_view(self) -> Optional[np.ndarray]:
        if self._contig:
            self._fill_contig_ids(self._contig)
        return self._ids_np

    # --------------------------------------------------------------- device

    def _sharding(self, spec: P) -> NamedSharding:
        return NamedSharding(self.mesh, spec)

    def _ensure_allocated(self, dim: int) -> None:
        if self._dim is None:
            self._dim = dim
        if self._vectors is not None:
            return
        self._cap = MIN_SHARD_CAPACITY
        s, cap = self.n_shards, self._cap
        d = _pad128(self._dim)  # lane-padded like core stores
        row3 = self._sharding(P(DATA_AXIS, None, None))
        row2 = self._sharding(P(DATA_AXIS, None))
        vdtype = np.int8 if self.dtype == "int8" else np.float32
        self._vectors = jax.device_put(np.zeros((s, cap, d), vdtype), row3)
        if self.dtype == "int8":
            self._scales = jax.device_put(np.ones((s, cap), np.float32), row2)
        self._norms = jax.device_put(np.zeros((s, cap), np.float32), row2)
        self._valid = jax.device_put(np.zeros((s, cap), bool), row2)
        if self._ids_np is None:
            self._ids_np = np.full((s, cap), None, object)

    def _grow_to(self, per_shard: int) -> None:
        new_cap = max(_next_pow2(per_shard), MIN_SHARD_CAPACITY)
        if new_cap <= self._cap:
            return
        self._materialize()  # implicit-id identity breaks when cap changes
        pad = new_cap - self._cap
        cfg3 = ((0, 0), (0, pad), (0, 0))
        cfg2 = ((0, 0), (0, pad))
        row3 = self._sharding(P(DATA_AXIS, None, None))
        row2 = self._sharding(P(DATA_AXIS, None))
        self._vectors = jax.device_put(jnp.pad(self._vectors, cfg3), row3)
        if self._scales is not None:
            self._scales = jax.device_put(
                jnp.pad(self._scales, cfg2, constant_values=1.0), row2
            )
        self._norms = jax.device_put(jnp.pad(self._norms, cfg2), row2)
        self._valid = jax.device_put(jnp.pad(self._valid, cfg2), row2)
        if self._ids_np is not None:
            grown = np.full((self.n_shards, new_cap), None, object)
            grown[:, : self._cap] = self._ids_np
            self._ids_np = grown
        self._cap = new_cap

    def _alloc_slots(self, n: int) -> List[Tuple[int, int]]:
        """Round-robin allocation across shards for balance."""
        slots: List[Tuple[int, int]] = []
        pending = [0] * self.n_shards
        for _ in range(n):
            s = self._rr
            self._rr = (self._rr + 1) % self.n_shards
            if self._free[s]:
                slots.append((s, self._free[s].pop()))
            else:
                slots.append((s, self._next_local[s] + pending[s]))
                pending[s] += 1
        max_needed = max(
            (self._next_local[s] + pending[s] for s in range(self.n_shards)),
            default=0,
        )
        if max_needed > self._cap:
            self._grow_to(max_needed)
        for s in range(self.n_shards):
            self._next_local[s] += pending[s]
        return slots

    # --------------------------------------------------------------- insert

    def _validate_batch(self, vectors) -> np.ndarray:
        arr = np.asarray(vectors, dtype=np.float32)
        if arr.ndim == 1:
            arr = arr[None, :]
        if self._dim is not None and arr.shape[1] != self._dim:
            from erlvectordb_tpu.core.store import DimensionMismatch

            raise DimensionMismatch(
                f"store {self.name!r} has dimension {self._dim}, got {arr.shape[1]}"
            )
        if not np.all(np.isfinite(arr)):
            from erlvectordb_tpu.core.store import InvalidVector

            raise InvalidVector("vector elements must be finite numbers")
        return arr

    def insert(self, vector_id: str, vector, metadata: Optional[dict] = None) -> None:
        self.insert_batch([vector_id], [vector], [metadata or {}])

    def insert_batch(
        self,
        ids: Sequence[str],
        vectors,
        metadatas: Optional[Sequence[Optional[dict]]] = None,
    ) -> None:
        if len(ids) == 0:
            return
        arr = self._validate_batch(vectors)
        if arr.shape[0] != len(ids):
            raise ValueError("ids and vectors length mismatch")
        if metadatas is None:
            metadatas = [{}] * len(ids)
        if len(ids) > 1:
            # batch-internal duplicates collapse to the LAST occurrence
            # (last-write-wins) — same fix as core VectorStore: duplicate
            # new ids would otherwise each take a fresh slot, leaving a
            # permanent valid ghost only one of which delete can reach
            last = {str(v): i for i, v in enumerate(ids)}
            if len(last) != len(ids):
                keep = sorted(last.values())
                ids = [ids[i] for i in keep]
                arr = arr[keep]
                metadatas = [metadatas[i] for i in keep]
        with self._lock.write():
            self._materialize()
            self._ensure_allocated(arr.shape[1])
            n = len(ids)
            s_count = self.n_shards
            # Bulk fast path: fresh ids into an append-only store — compute
            # the round-robin slot assignment vectorized (the per-id loop is
            # the host bottleneck at 100k+ rows).
            fast = (
                n >= 1024
                and not self._id_to_slot
                and all(not f for f in self._free)
                and len(set(map(str, ids))) == n
            )
            if fast:
                pos = np.arange(n, dtype=np.int64)
                shard_idx = ((self._rr + pos) % s_count).astype(np.int32)
                base = np.asarray(self._next_local, np.int64)
                local_idx = (base[shard_idx] + pos // s_count).astype(np.int32)
                per_shard = np.bincount(shard_idx, minlength=s_count)
                new_next = base + per_shard
                if int(new_next.max()) > self._cap:
                    self._grow_to(int(new_next.max()))
                self._next_local = [int(x) for x in new_next]
                self._rr = int((self._rr + n) % s_count)
            else:
                shard_idx = np.empty(n, np.int32)
                local_idx = np.empty(n, np.int32)
                fresh = []
                for i, vid in enumerate(ids):
                    vid = str(vid)
                    slot = self._id_to_slot.get(vid)
                    if slot is not None:
                        shard_idx[i], local_idx[i] = slot
                    else:
                        fresh.append(i)
                for i, slot in zip(fresh, self._alloc_slots(len(fresh))):
                    shard_idx[i], local_idx[i] = slot
            bucket = _next_pow2(len(ids))
            pad = bucket - len(ids)
            width = _pad128(arr.shape[1])
            if pad or width != arr.shape[1]:
                shard_idx = np.concatenate([shard_idx, np.full(pad, self.n_shards, np.int32)])
                local_idx = np.concatenate([local_idx, np.zeros(pad, np.int32)])
                arr_d = np.zeros((bucket, width), np.float32)
                arr_d[: len(ids), : arr.shape[1]] = arr
            else:
                arr_d = arr
            fn = _build_insert(self.mesh, self.dtype == "int8")
            if self.dtype == "int8":
                (self._vectors, self._scales, self._norms, self._valid) = fn(
                    self._vectors, self._scales, self._norms, self._valid,
                    jnp.asarray(shard_idx), jnp.asarray(local_idx), jnp.asarray(arr_d),
                )
            else:
                (self._vectors, self._norms, self._valid) = fn(
                    self._vectors, self._norms, self._valid,
                    jnp.asarray(shard_idx), jnp.asarray(local_idx), jnp.asarray(arr_d),
                )
            if fast:
                sids = [str(v) for v in ids]
                slots = list(zip(shard_idx[:n].tolist(), local_idx[:n].tolist()))
                self._id_to_slot.update(zip(sids, slots))
                self._slot_to_id.update(zip(slots, sids))
                if any(m for m in metadatas):
                    self._metadata.update(
                        (v, m if m is not None else {})
                        for v, m in zip(sids, metadatas)
                    )
            else:
                sids = []
                for i, vid in enumerate(ids):
                    vid = str(vid)
                    sids.append(vid)
                    slot = (int(shard_idx[i]), int(local_idx[i]))
                    self._id_to_slot[vid] = slot
                    self._slot_to_id[slot] = vid
                    self._metadata[vid] = metadatas[i] if metadatas[i] is not None else {}
            flat = self._ids_np.reshape(-1)
            flat[
                shard_idx[:n].astype(np.int64) * self._cap + local_idx[:n]
            ] = sids
            self.version += 1
            self.dirty = True

    # --------------------------------------------------------------- delete

    def delete(self, vector_id: str) -> bool:
        with self._lock.write():
            self._materialize()
            slot = self._id_to_slot.pop(str(vector_id), None)
            if slot is None:
                return False
            self._slot_to_id.pop(slot, None)
            self._ids_np[slot[0], slot[1]] = None
            self._metadata.pop(str(vector_id), None)
            fn = _build_delete(self.mesh)
            self._valid = fn(
                self._valid,
                jnp.asarray([slot[0]], jnp.int32),
                jnp.asarray([slot[1]], jnp.int32),
            )
            self._free[slot[0]].append(slot[1])
            self.version += 1
            self.dirty = True
            return True

    # --------------------------------------------------------------- search

    def search(self, query, k: int = 10, metric: Optional[str] = None,
               where: Optional[dict] = None):
        return self.search_batch(
            np.asarray(query, np.float32)[None, :], k, metric, where
        )[0]

    def filter_mask(self, where: dict) -> np.ndarray:
        """[S, cap] slot mask for metadata equality predicates."""
        with self._lock.read():
            # allocate INSIDE the lock: a concurrent insert can grow _cap,
            # and slots recorded past a stale allocation would IndexError
            mask = np.zeros((self.n_shards, self._cap), bool)
            self._materialize()
            for vid, meta in self._metadata.items():
                if all(meta.get(kk) == vv for kk, vv in where.items()):
                    slot = self._id_to_slot.get(vid)
                    if slot is not None:
                        mask[slot[0], slot[1]] = True
        return mask

    def search_batch(self, queries, k: int = 10, metric: Optional[str] = None,
                     where: Optional[dict] = None):
        return self.search_batch_complete(
            self.search_batch_submit(queries, k, metric, where)
        )

    def search_batch_submit(self, queries, k: int = 10,
                            metric: Optional[str] = None,
                            where: Optional[dict] = None):
        """Async dispatch (see VectorStore.search_batch_submit)."""
        from erlvectordb_tpu.core.store import SearchTicket

        metric = metric or self.metric
        if metric not in VALID_METRICS:
            raise ValueError(f"metric must be one of {VALID_METRICS}")
        q = self._validate_batch(queries)
        nq = q.shape[0]
        if self._vectors is None or self.count == 0 or k <= 0:
            return SearchTicket(None, None, nq, k, 0)
        fmask = self.filter_mask(where) if where else None
        with self._lock.read():
            return self._dispatch_locked(q, nq, k, metric, fmask)

    def _readback(self, t):
        """One fused device->host readback per ticket when the packed
        array is present ([dists | row-hi | row-lo] f32, see
        core.store._pack_results); two otherwise."""
        if t.packed is not None:
            arr = np.asarray(t.packed)[: t.nq]
            kb = t.kb
            rows = (arr[:, kb:2 * kb].astype(np.int64) * 4096
                    + arr[:, 2 * kb:3 * kb].astype(np.int64))
            return arr[:, :kb], rows.astype(np.int32)
        return np.asarray(t.dists)[: t.nq], np.asarray(t.rows)[: t.nq]

    def search_batch_complete(self, t):
        if t.kb == 0 or t.dists is None:
            return [[] for _ in range(t.nq)]
        dists_np, rows_np = self._readback(t)
        with self._lock.read():
            rows_np = self._remap_ticket_rows(rows_np, t)
            return self._map_results(dists_np, rows_np, t.k)

    def search_batch_complete_raw(self, t):
        """Columnar completion (see VectorStore.search_batch_complete_raw)."""
        if t.kb == 0 or t.dists is None:
            return (np.zeros((t.nq, 0), np.float32),
                    np.zeros((t.nq, 0), np.int32), None)
        kk = min(t.k, np.shape(t.rows)[1])
        dists_np, rows_np = self._readback(t)
        dists_np = dists_np[:, :kk]
        rows_np = rows_np[:, :kk]
        with self._lock.read():
            rows_now = self._remap_ticket_rows(rows_np, t)
            ids = self._ids_view().reshape(-1)[rows_now]
        # Return the remapped rows: after a concurrent grow, rows_np decodes
        # wrongly against the current flat layout while ids came from rows_now.
        return dists_np, rows_now, ids

    def _remap_ticket_rows(self, rows_np, t):
        """Device rows encode shard*cap+local with the SUBMIT-TIME per-shard
        capacity; a concurrent insert may have grown _cap before this
        completion, which would silently remap results to wrong ids if
        decoded against the current flat layout."""
        cap_t = t.shard_cap or self._cap
        if cap_t == self._cap:
            return rows_np
        shard = rows_np // cap_t
        local = rows_np % cap_t
        return shard * self._cap + local

    def _map_results(self, dists_np, rows_np, k):
        kk = min(k, rows_np.shape[1])
        flat_ids = self._ids_view().reshape(-1)
        ids_l = flat_ids[rows_np[:, :kk]].tolist()
        d_l = dists_np[:, :kk].tolist()
        md = self._metadata
        isfinite = math.isfinite
        out = []
        for irow, drow in zip(ids_l, d_l):
            hits = []
            for vid, d in zip(irow, drow):
                if not isfinite(d):
                    break
                if vid is None:
                    continue
                hits.append((vid, md.get(vid, {}), d))
            out.append(hits)
        return out

    def _dispatch_locked(self, q, nq, k, metric, fmask=None):
        from erlvectordb_tpu.core.store import SearchTicket
        # Bucket the batch size to a power of two (every distinct shape is a
        # separate XLA compile) and pad so it splits evenly across replicas.
        r = self.n_replicas
        bq = _next_pow2(max(nq, 8))
        bq += (-bq) % r
        if bq != nq:
            q = np.concatenate([q, np.zeros((bq - nq, q.shape[1]), np.float32)])
        width = _pad128(q.shape[1])
        if width != q.shape[1]:
            qp = np.zeros((q.shape[0], width), np.float32)
            qp[:, : q.shape[1]] = q
            q = qp
        kb = _next_pow2(min(k, max(self.count, 1)))
        from erlvectordb_tpu.ops import fused_topk as ft

        fused_nt = 0
        if ft.fused_topk_available(
            self.count, self._cap, metric, jax.default_backend(), kb
        ):
            fused_nt = ft.n_tiles_for(max(self._next_local), self._cap)
        fn = _build_search(self.mesh, metric, kb, self.dtype == "int8", fused_nt)
        valid = self._valid
        if fmask is not None:
            # the mask was built outside this read lock; reconcile to the
            # current capacity (snapshot semantics, like core VectorStore)
            if fmask.shape[1] < valid.shape[1]:
                fmask = np.pad(
                    fmask, ((0, 0), (0, valid.shape[1] - fmask.shape[1])))
            elif fmask.shape[1] > valid.shape[1]:
                fmask = fmask[:, : valid.shape[1]]
            valid = jnp.logical_and(
                valid,
                jax.device_put(fmask, NamedSharding(self.mesh, P(DATA_AXIS, None))),
            )
        aux = self._scales if self.dtype == "int8" else self._norms  # dummy for f32
        q_dev = jax.device_put(q, self._sharding(P(REPLICA_AXIS, None)))
        dists, rows = fn(self._vectors, aux, self._norms, valid, q_dev)
        # fused single-readback pack (dists | row-hi | row-lo), same as
        # the local store: completion pays ONE link round-trip, not two
        return SearchTicket(dists, rows, nq, k, kb,
                            shard_cap=self._cap,
                            packed=_pack_results(dists, rows))

    # ------------------------------------------------------------ accessors

    def get(self, vector_id: str):
        with self._lock.read():
            self._materialize()
            slot = self._id_to_slot.get(str(vector_id))
            if slot is None:
                return None
            vec = np.asarray(self._vectors[slot[0], slot[1]])[: self._dim]
            if self.dtype == "int8":
                vec = vec.astype(np.float32) * float(self._scales[slot[0], slot[1]])
            return vec, self._metadata.get(str(vector_id), {})

    def get_stats(self) -> dict:
        with self._lock.read():  # _id_to_slot must not grow mid-iteration
            if self._contig:  # block partition: no dict walk needed
                per_shard = [
                    min(self._cap, max(0, self._contig - s * self._cap))
                    for s in range(self.n_shards)
                ]
            else:
                per_shard = [0] * self.n_shards
                for s, _ in self._id_to_slot.values():
                    per_shard[s] += 1
        return {
            "name": self.name,
            "count": self.count,
            "dimension": self._dim,
            "metric": self.metric,
            "dtype": self.dtype,
            "capacity": self.capacity,
            "shards": self.n_shards,
            "replicas": self.n_replicas,
            "per_shard_counts": per_shard,
            "version": self.version,
            "memory_bytes": self.device_memory_bytes(),
        }

    def device_memory_bytes(self) -> int:
        if self._vectors is None:
            return 0
        total = self._vectors.size * self._vectors.dtype.itemsize
        total += self._norms.size * 4 + self._valid.size
        if self._scales is not None:
            total += self._scales.size * 4
        return int(total)

    def get_all_vectors(self):
        with self._lock.read():
            self._materialize()
            if self.count == 0:
                return []
            mat = np.asarray(self._vectors)
            scales = np.asarray(self._scales) if self.dtype == "int8" else None
            out = []
            for vid, (s, l) in sorted(self._id_to_slot.items()):
                vec = mat[s, l][: self._dim]
                if scales is not None:
                    vec = vec.astype(np.float32) * scales[s, l]
                out.append((vid, vec, self._metadata.get(vid, {})))
            return out

    # ------------------------------------------------------ state export

    def export_state(self) -> dict:
        """Snapshot-compatible state (persist/snapshot.py handles it like a
        local store's; arrays land on host as [S, cap, ...])."""
        with self._lock.read():
            self._materialize()
            state = {
                "format": 1,
                "sharded": True,
                "name": self.name,
                "dim": self._dim,
                "metric": self.metric,
                "dtype": self.dtype,
                "created_at": self.created_at,
                "version": self.version,
                "n_shards": self.n_shards,
                "id_to_slot": {k: list(v) for k, v in self._id_to_slot.items()},
                "metadata": dict(self._metadata),
                "next_local": list(self._next_local),
                "free": [list(f) for f in self._free],
            }
            if self._vectors is not None:
                state["vectors"] = self._host_global(self._vectors)
                state["norms"] = self._host_global(self._norms)
                state["valid"] = self._host_global(self._valid)
                if self._scales is not None:
                    state["scales"] = self._host_global(self._scales)
            return state

    def _host_global(self, x) -> np.ndarray:
        """Bring a (possibly cross-process) sharded array fully to host.

        Single-process: a plain device_get.  Multi-process: shards owned by
        other hosts are not addressable, so np.asarray would fail — a jitted
        identity with fully-replicated out_sharding makes every host hold
        the whole array (one cross-host collective, the bulk analogue of the
        reference's per-vector rpc migration).  COOPERATIVE: every process
        in the group must call export_state together (each host's
        PersistenceManager does), like any other collective."""
        if jax.process_count() == 1:
            return np.asarray(x)
        rep = jax.jit(
            lambda a: a,
            out_shardings=NamedSharding(self.mesh, P()),
        )(x)
        return np.asarray(rep.addressable_data(0))

    @classmethod
    def from_state(cls, state: dict, mesh: Mesh) -> "ShardedVectorStore":
        """Re-hydrate onto a mesh.  If the mesh's data-axis size differs from
        the snapshot's shard count, the rows are re-sharded by rebuilding."""
        store = cls(
            state["name"], mesh,
            dim=state.get("dim"), metric=state.get("metric", "cosine"),
            dtype=state.get("dtype", "float32"),
        )
        store.created_at = state.get("created_at", time.time())
        store.version = state.get("version", 0)
        snap_shards = int(state.get("n_shards", 1))
        if snap_shards != store.n_shards and "vectors" in state:
            # topology changed since snapshot: bulk re-insert path
            vecs = np.asarray(state["vectors"])
            valid = np.asarray(state["valid"])
            scales = np.asarray(state.get("scales")) if "scales" in state else None
            ids, mats, metas = [], [], []
            meta_map = state.get("metadata", {})
            for vid, (s, l) in state.get("id_to_slot", {}).items():
                row = vecs[s, l]
                if scales is not None:
                    row = row.astype(np.float32) * scales[s, l]
                ids.append(vid)
                mats.append(row[: state.get("dim") or row.shape[0]])
                metas.append(meta_map.get(vid, {}))
            if ids:
                store.insert_batch(ids, np.stack(mats), metas)
            return store
        if "vectors" in state and state["vectors"] is not None:
            vecs = np.asarray(state["vectors"])
            store._cap = vecs.shape[1]
            row3 = store._sharding(P(DATA_AXIS, None, None))
            row2 = store._sharding(P(DATA_AXIS, None))
            store._vectors = jax.device_put(vecs, row3)
            store._norms = jax.device_put(np.asarray(state["norms"], np.float32), row2)
            store._valid = jax.device_put(np.asarray(state["valid"], bool), row2)
            if "scales" in state and state["scales"] is not None:
                store._scales = jax.device_put(
                    np.asarray(state["scales"], np.float32), row2)
        store._id_to_slot = {
            str(k): (int(v[0]), int(v[1]))
            for k, v in state.get("id_to_slot", {}).items()
        }
        store._slot_to_id = {v: k for k, v in store._id_to_slot.items()}
        if store._cap:
            store._ids_np = np.full((store.n_shards, store._cap), None, object)
            if store._id_to_slot:
                flat = store._ids_np.reshape(-1)
                pos = np.array(
                    [s * store._cap + l for s, l in store._id_to_slot.values()],
                    np.int64,
                )
                flat[pos] = list(store._id_to_slot.keys())
        store._metadata = dict(state.get("metadata", {}))
        store._next_local = [int(x) for x in state.get("next_local",
                                                       [0] * store.n_shards)]
        store._free = [[int(x) for x in f] for f in state.get("free",
                       [[] for _ in range(store.n_shards)])]
        return store

    # ----------------------------------------------------------- resharding

    def reshard_to(self, new_mesh: Mesh) -> None:
        """Move this store onto another mesh with the same data-axis size —
        one device-to-device resharding transfer.  This is the failover /
        elastic-recovery primitive: when a replica group dies, the cluster
        manager rebuilds a smaller mesh and reshards every store onto it
        (the reference only *logs* under-replication on nodedown,
        src/cluster_manager.erl:408-425 — it never re-copies data)."""
        if new_mesh.shape[DATA_AXIS] != self.n_shards:
            raise ValueError(
                f"data axis must stay {self.n_shards}, got {new_mesh.shape[DATA_AXIS]}"
            )
        with self._lock.write():
            self.mesh = new_mesh
            self.n_replicas = new_mesh.shape[REPLICA_AXIS]
            if self._vectors is None:
                return
            row3 = NamedSharding(new_mesh, P(DATA_AXIS, None, None))
            row2 = NamedSharding(new_mesh, P(DATA_AXIS, None))
            self._vectors = jax.device_put(self._vectors, row3)
            if self._scales is not None:
                self._scales = jax.device_put(self._scales, row2)
            self._norms = jax.device_put(self._norms, row2)
            self._valid = jax.device_put(self._valid, row2)

    # ----------------------------------------------------------- bulk build

    @classmethod
    def from_matrix(
        cls,
        name: str,
        mesh: Mesh,
        matrix,                      # [N, D] f32 (host or device array)
        ids: Optional[Sequence[str]] = None,
        metric: str = "cosine",
        dtype: str = "float32",
    ) -> "ShardedVectorStore":
        """Bulk sharded build: quantize/pad/shard in one device program
        (VectorStore.from_matrix's analogue).  Rows are block-partitioned:
        row i lives at (shard=i//cap, local=i%cap)."""
        from erlvectordb_tpu.core.store import _pad128

        store = cls(name, mesh, metric=metric, dtype=dtype)
        arr = matrix if isinstance(matrix, jax.Array) else np.ascontiguousarray(
            np.asarray(matrix, np.float32)
        )
        n, d = arr.shape
        store._dim = d
        s_count = store.n_shards
        store._cap = cap = _bulk_cap(n, s_count)
        width = _pad128(d)

        row3 = store._sharding(P(DATA_AXIS, None, None))
        row2 = store._sharding(P(DATA_AXIS, None))

        @functools.partial(
            jax.jit,
            static_argnames=("cap", "s_count", "width", "dt"),
            out_shardings=(row3, row2, row2, row2),
        )
        def build(arr, *, cap, s_count, width, dt):
            nn = arr.shape[0]
            norms = jnp.sqrt(jnp.sum(arr * arr, axis=-1))
            if dt == "int8":
                absmax = jnp.max(jnp.abs(arr), axis=-1)
                scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
                rows = jnp.clip(jnp.round(arr / scale[:, None]), -127, 127
                                ).astype(jnp.int8)
            else:
                scale = jnp.ones((nn,), jnp.float32)
                rows = arr
            pad_r = cap * s_count - nn
            pad_c = width - rows.shape[1]
            rows = jnp.pad(rows, ((0, pad_r), (0, pad_c)))
            scale = jnp.pad(scale, ((0, pad_r),), constant_values=1.0)
            norms = jnp.pad(norms, ((0, pad_r),))
            valid = jnp.pad(jnp.ones((nn,), bool), ((0, pad_r),))
            shape3 = (s_count, cap, width)
            return (rows.reshape(shape3), scale.reshape(s_count, cap),
                    norms.reshape(s_count, cap), valid.reshape(s_count, cap))

        if dtype == "int4":
            raise ValueError("sharded int4 bulk build not supported yet")
        vecs, scales, norms, valid = build(
            jnp.asarray(arr), cap=cap, s_count=s_count, width=width, dt=dtype
        )
        store._vectors = vecs
        store._norms = norms
        store._valid = valid
        if dtype == "int8":
            store._scales = scales
        store._ids_np = np.full((s_count, cap), None, object)
        if ids is None:
            # implicit contiguous ids: no dict materialization (at 10M rows
            # the dicts would cost GBs of host RAM and tens of seconds)
            store._contig = n
        else:
            if len(ids) != n:
                raise ValueError("ids and matrix length mismatch")
            slots = [(i // cap, i % cap) for i in range(n)]
            sids = [str(v) for v in ids]
            store._id_to_slot = dict(zip(sids, slots))
            store._slot_to_id = dict(zip(slots, sids))
            store._ids_np.reshape(-1)[:n] = sids
        store._next_local = [
            min(cap, max(0, n - s * cap)) for s in range(s_count)
        ]
        store.version = 1
        store.dirty = True
        return store

    # ------------------------------------------------------ streaming build

    @classmethod
    def from_chunks(
        cls,
        name: str,
        mesh: Mesh,
        chunks,                      # iterable of [c, D] f32 (host or device)
        n: int,
        dim: int,
        metric: str = "cosine",
        dtype: str = "int8",
    ) -> "ShardedVectorStore":
        """Streaming bulk build: quantize each chunk into preallocated
        sharded device buffers IN PLACE (donated dynamic_update_slice), so no
        [N, D] f32 temporary ever exists.  This is what makes the 10M x 768
        flagship-scale build fit v5e HBM: the int8 store is ~7.4 GB and the
        peak extra footprint is one f32 chunk (the all-at-once ``from_matrix``
        would need the 30 GB f32 corpus resident).

        Writes are dispatched asynchronously: generation/IO of chunk i+1
        overlaps the device write of chunk i.
        """
        if dtype not in ("float32", "int8"):
            raise ValueError("dtype must be 'float32' or 'int8'")
        store = cls(name, mesh, dim=dim, metric=metric, dtype=dtype)
        s_count = store.n_shards
        store._cap = cap = _bulk_cap(n, s_count)
        width = _pad128(dim)
        total = cap * s_count

        flat2 = NamedSharding(mesh, P(DATA_AXIS, None))
        flat1 = NamedSharding(mesh, P(DATA_AXIS))
        vdt = jnp.int8 if dtype == "int8" else jnp.float32

        # grow the device allocation pool before the first multi-GB buffer
        # (a cold pool rejects big single allocations — utils/hbm.py)
        prime_hbm(total * width * (1 if dtype == "int8" else 4)
                  // max(1, s_count))

        # allocate ON DEVICE (device_put of host zeros would ship GBs)
        codes = jax.jit(lambda: jnp.zeros((total, width), vdt),
                        out_shardings=flat2)()
        scales = jax.jit(lambda: jnp.ones((total,), jnp.float32),
                         out_shardings=flat1)()
        norms = jax.jit(lambda: jnp.zeros((total,), jnp.float32),
                        out_shardings=flat1)()
        valid = jax.jit(lambda: jnp.zeros((total,), bool),
                        out_shardings=flat1)()

        written = 0
        chunk = arr = None
        for chunk in chunks:
            c = int(chunk.shape[0])
            live = min(c, n - written)  # final chunk may be zero-padded
            if live <= 0:
                raise ValueError("chunks exceed declared n")
            arr = chunk if isinstance(chunk, jax.Array) else jnp.asarray(
                np.asarray(chunk, np.float32))
            room = total - written
            if c > room:  # padded final chunk overhanging the buffer: trim
                arr = arr[:room]  # (dynamic_update_slice would clamp+shift)
            codes, scales, norms, valid = _chunk_write(
                codes, scales, norms, valid, arr,
                jnp.int32(written), jnp.int32(live), dt=dtype, width=width,
            )
            written += live
        if written != n:
            raise ValueError(f"chunks covered {written} rows, declared {n}")
        # loop locals otherwise pin the LAST f32 chunk (+ its converted
        # copy) on device for the rest of the build — same class of leak
        # as cell_build's staging loop
        del chunk, arr
        jax.block_until_ready(valid)

        # donate: the reshape is layout-preserving for block partitioning, so
        # XLA aliases input->output — no second 7.7 GB copy at 10M x 768
        row3 = store._sharding(P(DATA_AXIS, None, None))
        row2 = store._sharding(P(DATA_AXIS, None))
        store._vectors = jax.jit(
            lambda a: a.reshape(s_count, cap, width), out_shardings=row3,
            donate_argnums=0)(codes)
        store._norms = jax.jit(
            lambda a: a.reshape(s_count, cap), out_shardings=row2,
            donate_argnums=0)(norms)
        store._valid = jax.jit(
            lambda a: a.reshape(s_count, cap), out_shardings=row2,
            donate_argnums=0)(valid)
        if dtype == "int8":
            store._scales = jax.jit(
                lambda a: a.reshape(s_count, cap), out_shardings=row2,
                donate_argnums=0)(scales)
        store._contig = n
        store._ids_np = np.full((s_count, cap), None, object)
        store._next_local = [
            min(cap, max(0, n - s * cap)) for s in range(s_count)
        ]
        store.version = 1
        store.dirty = True
        return store

    # ----------------------------------------------------------- migration

    @classmethod
    def from_store(cls, store, mesh: Mesh, name: Optional[str] = None) -> "ShardedVectorStore":
        """Distribute a single-device store across a mesh — bulk resharding,
        replacing the reference's per-vector rpc migration loop
        (src/cluster_manager.erl:370-380)."""
        out = cls(
            name or store.name,
            mesh,
            dim=store.dim,
            metric=store.metric,
            dtype=getattr(store, "dtype", "float32"),
        )
        allv = store.get_all_vectors()
        if allv:
            ids = [v[0] for v in allv]
            mat = np.stack([v[1] for v in allv])
            metas = [v[2] for v in allv]
            out.insert_batch(ids, mat, metas)
        return out

    def to_store(self, name: Optional[str] = None):
        """Collapse back to a single-device store (leave_cluster analogue)."""
        from erlvectordb_tpu.core.store import VectorStore

        out = VectorStore(
            name or self.name, dim=self._dim, metric=self.metric, dtype=self.dtype
        )
        allv = self.get_all_vectors()
        if allv:
            out.insert_batch(
                [v[0] for v in allv],
                np.stack([v[1] for v in allv]),
                [v[2] for v in allv],
            )
        return out
