"""Expert-parallel IVF: cells sharded over the mesh's data axis
(VERDICT r1 item #6).  CI runs on the virtual 8-device CPU mesh; checks
recall parity with the single-chip IVF and that the merge is a real
cross-device collective."""

import jax
import numpy as np
import pytest

from erlvectordb_tpu.core.ivf import IVFIndex
from erlvectordb_tpu.parallel import make_mesh
from erlvectordb_tpu.parallel.ep_ivf import EPIVFIndex, _build_ep_search


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(3)
    centers = rng.standard_normal((64, 32)).astype(np.float32) * 2
    assign = rng.integers(0, 64, 20000)
    data = (centers[assign]
            + 0.4 * rng.standard_normal((20000, 32)).astype(np.float32))
    rows = np.arange(20000, dtype=np.int32)
    norms = np.linalg.norm(data, axis=1).astype(np.float32)
    ivf = IVFIndex.build(data, rows, norms, n_cells=64, iters=10)
    mesh = make_mesh(n_data=8, n_replica=1)
    ep = EPIVFIndex.from_ivf(ivf, mesh)
    queries = data[:64]
    return data, norms, ivf, ep, queries


class TestEPIVF:
    def test_recall_parity_with_single_chip(self, setup):
        data, norms, ivf, ep, queries = setup
        # exact ground truth
        d2 = ((queries[:, None, :] - data[None, :2000, :]) ** 2).sum(-1)
        for metric in ("euclidean", "cosine"):
            d_s, r_s = ivf.search(queries, k=10, nprobe=8, metric=metric)
            d_e, r_e = ep.search(queries, k=10, nprobe=8, metric=metric)
            # EP never drops (query, cell) pairs (no q_cap), so it must
            # cover at least the single-chip results
            overlap = np.mean([
                len(set(r_e[b]) & set(r_s[b][r_s[b] >= 0])) /
                max(1, (r_s[b] >= 0).sum())
                for b in range(queries.shape[0])
            ])
            assert overlap >= 0.95, (metric, overlap)

    def test_self_query_top1(self, setup):
        data, norms, ivf, ep, queries = setup
        d, r = ep.search(queries, k=1, nprobe=8, metric="euclidean")
        hit = np.mean(r[:, 0] == np.arange(queries.shape[0]))
        assert hit >= 0.95

    def test_routing_collective_in_jaxpr(self, setup):
        data, norms, ivf, ep, queries = setup
        fn = _build_ep_search(ep.mesh, "euclidean", 10, 8,
                              ep.n_cells // ep.n_shards)
        jaxpr = str(jax.make_jaxpr(fn)(
            ep.cells, ep.cell_rows, ep.cell_norms, ep.cell_valid,
            ep.centroids, np.zeros((8, data.shape[1]), np.float32)))
        assert "all_gather" in jaxpr  # the candidates-only ICI merge

    def test_stats_and_build_rounding(self, setup):
        data, norms, ivf, ep, queries = setup
        st = ep.stats()
        assert st["shards"] == 8
        assert st["n_cells"] % 8 == 0
        assert st["rows"] == 20000

    def test_build_direct(self, setup):
        data, norms, ivf, ep, queries = setup
        mesh = make_mesh(n_data=8, n_replica=1)
        ep2 = EPIVFIndex.build(data, np.arange(20000, dtype=np.int32),
                               norms, mesh, n_cells=60)  # rounds to 64
        assert ep2.n_cells % 8 == 0
        d, r = ep2.search(queries[:8], k=5, nprobe=6)
        assert (r >= 0).all()


class TestIndexManagerIntegration:
    def test_ep_ivf_through_index_manager(self, rng, tmp_path):
        from erlvectordb_tpu.core import StoreRegistry
        from erlvectordb_tpu.core.index_manager import IndexManager
        from erlvectordb_tpu.core.store import VectorStore

        reg = StoreRegistry()
        data = rng.standard_normal((4000, 16)).astype(np.float32)
        st = VectorStore.from_matrix("epstore", data,
                                     ids=[f"v{i}" for i in range(4000)],
                                     metric="euclidean")
        reg.adopt(st)
        im = IndexManager(reg)
        im.create_index("epi", "epstore", "ep_ivf",
                        {"n_cells": 32, "nprobe": 8})
        info = im.build_index("epi", wait=True)
        assert info["built"] and info["stats"]["kind"] == "ep_ivf"
        assert info["stats"]["shards"] == 8
        hits = im.search("epi", data[7], k=3)
        assert hits[0][0] == "v7"
        # persistence roundtrip
        im.save_index("epi", tmp_path)
        im2 = IndexManager(reg)
        assert im2.load_indexes(tmp_path) == ["epi"]
        hits2 = im2.search("epi", data[7], k=3)
        assert hits2[0][0] == "v7"
