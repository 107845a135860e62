"""Dimension-sharded search — the tensor-parallel axis of the design.

SURVEY §2.3's TPU-native mapping calls for two sharding axes over a store:
rows (the primary, parallel/sharded_store.py) and, when D is too large for
one chip's HBM, the FEATURE dimension: each device holds ``vectors[:, d0:d1]``
and computes partial dot products that a ``psum`` over the mesh combines —
exactly how tensor parallelism splits a matmul's contraction dimension.

Cosine / dot / euclidean all reduce to the dot ``q . x`` plus per-row norms
(replicated, they are O(N) not O(N·D)), so one psum per query batch gives
exact results.  Manhattan sums |q_d - x_d| over D, which is also a psum of
per-device partials.

This module provides the compiled kernel; it composes with row sharding by
using a mesh whose DATA axis splits rows and whose model axis splits D.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"

_INF = float("inf")  # python float: a module-level jnp array would initialize
# the XLA backend at import, breaking jax.distributed.initialize


def make_dim_mesh(n_model: int, devices=None) -> Mesh:
    """1-D mesh over the feature dimension."""
    import numpy as np

    devices = list(devices) if devices is not None else list(jax.devices())
    if n_model > len(devices):
        raise ValueError(f"need {n_model} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n_model]), (MODEL_AXIS,))


def shard_by_dim(mesh: Mesh, vectors: jax.Array) -> jax.Array:
    """Place [N, D] with D split across the model axis (D % n_model == 0)."""
    return jax.device_put(vectors, NamedSharding(mesh, P(None, MODEL_AXIS)))


@functools.lru_cache(maxsize=None)
def _build(mesh: Mesh, metric: str, k: int):
    def local(vecs, nrm, vld, q):
        # vecs [N, D_local], q [B, D_local]; nrm/vld replicated [N]
        pdots = jnp.dot(q, vecs.T, preferred_element_type=jnp.float32)
        if metric == "manhattan":
            # partial L1 over the local dims, then psum
            def per_query(qq):
                return jnp.sum(jnp.abs(vecs - qq[None, :]), axis=-1)

            partial = lax.map(per_query, q)
            dists = lax.psum(partial, MODEL_AXIS)
        else:
            dots = lax.psum(pdots, MODEL_AXIS)                      # [B, N]
            pq2 = jnp.sum(q * q, axis=-1)
            qsq = lax.psum(pq2, MODEL_AXIS)                         # [B]
            if metric == "dot":
                dists = -dots
            elif metric == "cosine":
                qn = jnp.sqrt(qsq)
                denom = qn[:, None] * nrm[None, :]
                sim = jnp.where(denom > 0, dots / jnp.where(denom > 0, denom, 1.0), 0.0)
                dists = 1.0 - sim
            elif metric == "euclidean":
                d2 = qsq[:, None] - 2.0 * dots + (nrm * nrm)[None, :]
                dists = jnp.sqrt(jnp.maximum(d2, 0.0))
            else:
                raise ValueError(metric)
        dists = jnp.where(vld[None, :], dists, _INF)
        neg, rows = lax.top_k(-dists, k)
        return -neg, rows

    shd = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, MODEL_AXIS), P(None), P(None), P(None, MODEL_AXIS)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    return jax.jit(shd)


def dim_sharded_topk(
    mesh: Mesh,
    vectors: jax.Array,  # [N, D] sharded P(None, 'model') (or host array)
    norms: jax.Array,    # [N] f32 (replicated)
    valid: jax.Array,    # [N] bool
    queries: jax.Array,  # [B, D]
    *,
    metric: str = "cosine",
    k: int = 10,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k with the feature dimension split across the mesh."""
    n_model = mesh.shape[MODEL_AXIS]
    if vectors.shape[1] % n_model:
        raise ValueError(
            f"D={vectors.shape[1]} not divisible by model axis {n_model}"
        )
    vecs = shard_by_dim(mesh, vectors)
    q = jax.device_put(queries, NamedSharding(mesh, P(None, MODEL_AXIS)))
    rep = NamedSharding(mesh, P(None))
    fn = _build(mesh, metric, min(k, vectors.shape[0]))
    return fn(vecs, jax.device_put(norms, rep), jax.device_put(valid, rep), q)


from erlvectordb_tpu.core.store import VectorStore as _VectorStore  # noqa: E402
from erlvectordb_tpu.core.store import SearchTicket as _SearchTicket  # noqa: E402


class DimShardedVectorStore(_VectorStore):
    """A store whose FEATURE dimension is split across a 'model' mesh axis —
    the tensor-parallel store for embeddings too wide for one chip's HBM
    (e.g. 32k-d embeddings at 100M rows).  The full VectorStore API applies
    (insert/overwrite/delete/search/stats/snapshots); every [N, D] buffer is
    placed P(None, 'model'), searches run one psum of partial dot products
    per batch (see module docstring), and host tables are inherited.

    float32 only: per-row quantization scales depend on the WHOLE row, which
    a D-sharded layout cannot compute locally without an extra collective —
    quantized stores belong on the row-sharded layout instead."""

    def __init__(self, name: str, mesh: Mesh, dim=None, metric: str = "cosine"):
        super().__init__(name, dim=dim, metric=metric, dtype="float32")
        self.mesh = mesh
        self.n_model = mesh.shape[MODEL_AXIS]
        if 128 % self.n_model:
            raise ValueError("model axis must divide the 128-lane pad width")

    # placement: 2D row×feature buffers split by feature, all else replicated
    def _put(self, x):
        arr = jnp.asarray(x)
        if arr.ndim == 2 and arr.shape[1] % self.n_model == 0 and arr.shape[1]:
            return jax.device_put(arr, NamedSharding(self.mesh, P(None, MODEL_AXIS)))
        return jax.device_put(
            arr, NamedSharding(self.mesh, P(*([None] * arr.ndim))))

    def _pad_capacity(self, new_cap: int) -> None:
        super()._pad_capacity(new_cap)
        # jnp.pad may have dropped the placement; re-pin
        self._vectors = self._put(self._vectors)
        self._norms = self._put(self._norms)
        self._valid = self._put(self._valid)

    def _dispatch_locked(self, q, k, metric, fmask=None,
                         nprobe=None) -> _SearchTicket:
        # nprobe is validated away in search_batch_submit (dim-sharded
        # stores are never int4r), so it is always None here
        from erlvectordb_tpu.core.search import k_bucket
        from erlvectordb_tpu.core.store import (_next_pow2, _pack_results,
                                                _pad128)

        nq = q.shape[0]
        if self._vectors is None or self.count == 0 or k <= 0:
            return _SearchTicket(None, None, nq, k, 0)
        kb = k_bucket(min(k, self.count), self._capacity)
        width = _pad128(q.shape[1])
        bq = _next_pow2(max(nq, 8))
        if width != q.shape[1] or bq != nq:
            import numpy as _np

            qp = _np.zeros((bq, width), _np.float32)
            qp[:nq, : q.shape[1]] = q
            q = qp
        valid = self._valid
        if fmask is not None:
            valid = jnp.logical_and(valid, self._put(fmask))
        fn = _build(self.mesh, metric, kb)
        dists, rows = fn(self._vectors, self._norms, valid, self._put(q))
        # fused single-readback pack, same as VectorStore (one link RTT)
        return _SearchTicket(dists, rows, nq, min(k, self.count), kb,
                             packed=_pack_results(dists, rows))

    def export_state(self) -> dict:
        state = super().export_state()
        state["dim_sharded"] = True
        state["n_model"] = self.n_model
        return state

    @classmethod
    def from_state(cls, state: dict, mesh: Optional[Mesh] = None,
                   device=None) -> "DimShardedVectorStore":
        mesh = mesh or make_dim_mesh(int(state.get("n_model", 1)))
        base = _VectorStore.from_state(state)
        store = cls(state["name"], mesh, dim=base.dim, metric=base.metric)
        for attr in ("_capacity", "_id_to_row", "_row_to_id", "_metadata",
                     "_free_rows", "_next_row", "_contig", "_ids_np",
                     "version", "created_at"):
            setattr(store, attr, getattr(base, attr))
        if base._vectors is not None:
            store._vectors = store._put(base._vectors)
            store._norms = store._put(base._norms)
            store._valid = store._put(base._valid)
        return store

    @classmethod
    def from_matrix(cls, name: str, matrix, mesh: Optional[Mesh] = None,
                    ids=None, metric: str = "cosine",
                    metadatas=None) -> "DimShardedVectorStore":
        """Bulk build placed DIRECTLY with the P(None, 'model') sharding.

        This class exists for matrices too wide for one chip — building a
        complete single-device store first (as an earlier version did)
        would OOM exactly those workloads and double peak memory for the
        rest.  Norms are computed on the sharded buffer (one psum), never
        on a single device."""
        import numpy as _np

        from erlvectordb_tpu.core.store import (
            MIN_CAPACITY,
            _next_pow2,
            _pad128,
        )

        mesh = mesh or make_dim_mesh(len(jax.devices()))
        arr = _np.ascontiguousarray(_np.asarray(matrix, _np.float32))
        n, d = arr.shape
        store = cls(name, mesh, dim=d, metric=metric)
        cap = max(_next_pow2(n), MIN_CAPACITY)
        width = _pad128(d)
        store._capacity = cap
        xp = _np.zeros((cap, width), _np.float32)
        xp[:n, :d] = arr
        store._vectors = store._put(xp)        # sharded placement, no detour
        store._norms = store._put(
            jnp.sqrt(jnp.sum(store._vectors * store._vectors, axis=-1)))
        vmask = _np.zeros((cap,), bool)
        vmask[:n] = True
        store._valid = store._put(vmask)
        store._next_row = n
        store._ids_np = _np.full((cap,), None, object)
        if metadatas is not None:
            if len(metadatas) != n:
                raise ValueError("metadatas and matrix length mismatch")
            eff = ids if ids is not None else range(n)
            store._metadata = {str(v): (m or {})
                               for v, m in zip(eff, metadatas)}
        if ids is None:
            store._contig = n
        else:
            if len(ids) != n:
                raise ValueError("ids and matrix length mismatch")
            store._id_to_row = {str(v): i for i, v in enumerate(ids)}
            store._row_to_id = {i: str(v) for i, v in enumerate(ids)}
            if len(store._id_to_row) != n:
                raise ValueError("duplicate ids in bulk build")
            store._ids_np[:n] = [str(v) for v in ids]
        store.version = 1
        store.dirty = True
        return store

    def get_stats(self) -> dict:
        stats = super().get_stats()
        stats["dim_sharded"] = True
        stats["model_shards"] = self.n_model
        return stats
