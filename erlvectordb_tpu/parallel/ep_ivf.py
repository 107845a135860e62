"""Expert-parallel IVF — cells sharded across the mesh's data axis.

The round-1 IVF (core/ivf.py) is the single-chip substrate: cells are
experts, queries route to their top-``nprobe`` cells.  Here the expert
axis goes PARALLEL: the [C, cap, D] cell blocks shard over the mesh's
``data`` axis (cells are the EP analogue of MoE experts), centroids and
queries replicate, and each device scores only the probed cells IT OWNS:

    shard_map:  route = top-nprobe over the replicated [B, C] centroid
                distances (identical on every device — no dispatch traffic)
                -> per probe slot: gather MY probed cell blocks, score
                -> local top-k over my (slot, row) candidates
                -> all_gather (k dists, k store-rows) over the data axis
                -> replicated global top-k merge

Only the k candidates per device cross the interconnect (the same
candidates-not-corpus merge as the sharded exact store); the routing
decision itself is compute-replicated, which beats shipping queries
around for small nprobe.  Unlike the single-chip sort-based dispatch,
the gather-based expert compute never drops (query, cell) pairs — there
is no q_cap — so recall is >= the single-chip IVF at equal nprobe.

This is the reference's missing scale-out story for its advertised (but
simulated) ivf index type (src/vector_index_manager.erl:25-31): cells that
cannot fit one chip spread across the mesh, and the query fan-out rides
ICI collectives instead of the reference's per-node rpc.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from erlvectordb_tpu.core.ivf import IVFIndex
from erlvectordb_tpu.parallel.mesh import DATA_AXIS

_NEG = -1e30


@functools.lru_cache(maxsize=None)
def _build_ep_search(mesh: Mesh, metric: str, k: int, nprobe: int,
                     c_local: int):
    """Compiled EP search over cells sharded P(data, None, None)."""

    def local_scan(cells, rows, norms, valid, centroids, q):
        # block views: cells [c_local, cap, D]; centroids [C, D] and
        # q [B, D] replicated
        b = q.shape[0]
        cap = cells.shape[1]
        shard = lax.axis_index(DATA_AXIS)
        base = shard * c_local

        # route: identical on every device (replicated inputs)
        cdots = jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)
        cn = jnp.sum(centroids * centroids, axis=-1)
        _, probe = lax.top_k(-(cn[None, :] - 2.0 * cdots), nprobe)  # [B, np]

        def one_slot(cell_ids):            # [B] global cell ids of this slot
            lidx = cell_ids - base
            mine = (lidx >= 0) & (lidx < c_local)
            li = jnp.clip(lidx, 0, c_local - 1)
            sub = cells[li]                # [B, cap, D] gather of MY cells
            dots = jnp.einsum("bcd,bd->bc", sub, q,
                              preferred_element_type=jnp.float32)
            if metric in ("euclidean", "l2"):
                qsq = jnp.sum(q * q, axis=-1, keepdims=True)
                sc = -(qsq - 2.0 * dots + norms[li] ** 2)
            elif metric == "dot":
                sc = dots
            elif metric == "cosine":
                qn = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
                denom = qn * norms[li]
                sc = jnp.where(denom > 0,
                               dots / jnp.where(denom > 0, denom, 1.0), 0.0)
            else:
                raise ValueError(metric)
            sc = jnp.where(valid[li] & mine[:, None], sc, _NEG)
            return sc, rows[li]

        scs, rws = lax.map(one_slot, probe.T)          # [np, B, cap]
        scs = scs.transpose(1, 0, 2).reshape(b, -1)    # [B, np*cap]
        rws = rws.transpose(1, 0, 2).reshape(b, -1)
        kk = min(k, scs.shape[1])
        top_sc, sel = lax.top_k(scs, kk)
        top_rows = jnp.take_along_axis(rws, sel, axis=1)

        # candidates-only merge over ICI
        sc_all = lax.all_gather(top_sc, DATA_AXIS)     # [S, B, kk]
        rw_all = lax.all_gather(top_rows, DATA_AXIS)
        s = sc_all.shape[0]
        sc_flat = sc_all.transpose(1, 0, 2).reshape(b, s * kk)
        rw_flat = rw_all.transpose(1, 0, 2).reshape(b, s * kk)
        kf = min(k, s * kk)
        best, sel2 = lax.top_k(sc_flat, kf)
        rows_out = jnp.take_along_axis(rw_flat, sel2, axis=1)
        rows_out = jnp.where(best > _NEG / 2, rows_out, -1)
        if metric in ("euclidean", "l2"):
            dist = jnp.sqrt(jnp.maximum(-best, 0.0))
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
            P(DATA_AXIS, None, None),   # cells
            P(DATA_AXIS, None),         # cell_rows
            P(DATA_AXIS, None),         # cell_norms
            P(DATA_AXIS, None),         # cell_valid
            P(None, None),              # centroids (replicated)
            P(None, None),              # queries (replicated)
        ),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    return jax.jit(shd)


class EPIVFIndex:
    """IVF cells as experts, sharded over a mesh's data axis."""

    def __init__(self, mesh: Mesh, centroids, cells, cell_rows, cell_norms,
                 cell_valid, row_map):
        self.mesh = mesh
        self.n_shards = mesh.shape[DATA_AXIS]
        if cells.shape[0] % self.n_shards:
            raise ValueError(
                f"{cells.shape[0]} cells not divisible by "
                f"{self.n_shards} shards")
        cell3 = NamedSharding(mesh, P(DATA_AXIS, None, None))
        cell2 = NamedSharding(mesh, P(DATA_AXIS, None))
        repl = NamedSharding(mesh, P(None, None))
        self.centroids = jax.device_put(
            np.asarray(centroids, np.float32), repl)
        self.cells = jax.device_put(np.asarray(cells, np.float32), cell3)
        self.cell_rows = jax.device_put(np.asarray(cell_rows, np.int32), cell2)
        self.cell_norms = jax.device_put(
            np.asarray(cell_norms, np.float32), cell2)
        self.cell_valid = jax.device_put(np.asarray(cell_valid, bool), cell2)
        self.row_map = row_map
        self.n_cells = self.cells.shape[0]
        self.cell_cap = self.cells.shape[1]

    @classmethod
    def build(cls, data, rows, norms, mesh: Mesh, n_cells: int = 64,
              **kw) -> "EPIVFIndex":
        """Build via the single-chip IVF builder (k-means + balanced
        assignment), cell count rounded to the shard count, then shard."""
        s = mesh.shape[DATA_AXIS]
        n_cells = max(s, -(-n_cells // s) * s)
        base = IVFIndex.build(np.asarray(data), np.asarray(rows),
                              np.asarray(norms), n_cells=n_cells, **kw)
        return cls.from_ivf(base, mesh)

    @classmethod
    def from_ivf(cls, ivf: IVFIndex, mesh: Mesh) -> "EPIVFIndex":
        """Distribute an existing single-chip IVF across the mesh (pads the
        cell count to a shard multiple with empty cells)."""
        s = mesh.shape[DATA_AXIS]
        c = ivf.n_cells
        c_pad = -(-c // s) * s - c
        cents = np.asarray(ivf.centroids)
        cells = np.asarray(ivf.cells)
        rows = np.asarray(ivf.cell_rows)
        nrms = np.asarray(ivf.cell_norms)
        vld = np.asarray(ivf.cell_valid)
        if c_pad:
            # padding centroids far away so routing never probes them
            cents = np.concatenate(
                [cents, np.full((c_pad, cents.shape[1]), 1e6, np.float32)])
            cells = np.concatenate(
                [cells, np.zeros((c_pad,) + cells.shape[1:], np.float32)])
            rows = np.concatenate(
                [rows, np.full((c_pad, rows.shape[1]), -1, np.int32)])
            nrms = np.concatenate(
                [nrms, np.zeros((c_pad, nrms.shape[1]), np.float32)])
            vld = np.concatenate(
                [vld, np.zeros((c_pad, vld.shape[1]), bool)])
        return cls(mesh, cents, cells, rows, nrms, vld, rows)

    def search(self, queries, k: int = 10, nprobe: int = 8,
               metric: str = "euclidean") -> Tuple[np.ndarray, np.ndarray]:
        """Returns (distances [B, k], store-rows [B, k]; -1 = no hit)."""
        q = np.asarray(queries, np.float32)
        if q.ndim == 1:
            q = q[None, :]
        nprobe = min(nprobe, self.n_cells)
        fn = _build_ep_search(self.mesh, metric,
                              min(k, self.cell_cap * nprobe), nprobe,
                              self.n_cells // self.n_shards)
        d, r = fn(self.cells, self.cell_rows, self.cell_norms,
                  self.cell_valid, self.centroids,
                  jax.device_put(q, NamedSharding(self.mesh, P(None, None))))
        return np.asarray(d)[:, :k], np.asarray(r)[:, :k]

    def to_arrays(self) -> dict:
        return {
            "centroids": np.asarray(self.centroids),
            "cells": np.asarray(self.cells),
            "cell_rows": np.asarray(self.cell_rows),
            "cell_norms": np.asarray(self.cell_norms),
        }

    @classmethod
    def from_arrays(cls, d: dict, mesh: Optional[Mesh] = None) -> "EPIVFIndex":
        from erlvectordb_tpu.parallel.mesh import make_mesh

        return cls.from_ivf(IVFIndex.from_arrays(d),
                            mesh or make_mesh(n_replica=1))

    def stats(self) -> dict:
        fill = (self.row_map >= 0).sum(axis=1)
        return {
            "kind": "ep_ivf",
            "shards": int(self.n_shards),
            "n_cells": int(self.n_cells),
            "cell_cap": int(self.cell_cap),
            "rows": int(fill.sum()),
            "cells_per_shard": int(self.n_cells // self.n_shards),
        }
