"""IVF index tests: routing, recall-vs-nprobe, dispatch capacity, padding."""

import numpy as np
import pytest

from erlvectordb_tpu.core.ivf import IVFIndex


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(0)
    n, d, n_centers = 4000, 32, 40
    centers = rng.standard_normal((n_centers, d)).astype(np.float32) * 4
    assign = rng.integers(0, n_centers, n)
    data = (centers[assign]
            + 0.3 * rng.standard_normal((n, d)).astype(np.float32))
    rows = np.arange(n, dtype=np.int64)
    norms = np.linalg.norm(data, axis=1).astype(np.float32)
    idx = IVFIndex.build(data, rows, norms, n_cells=64, iters=12)
    queries = (centers[rng.integers(0, n_centers, 25)]
               + 0.3 * rng.standard_normal((25, d)).astype(np.float32))
    return data, idx, queries


def _exact(data, queries, k):
    out = []
    for q in queries:
        d = np.linalg.norm(data - q, axis=1)
        out.append(np.argsort(d)[:k])
    return np.asarray(out)


class TestBuild:
    def test_all_rows_placed(self, built):
        data, idx, _ = built
        st = idx.stats()
        assert st["rows"] == data.shape[0]
        assert st["n_cells"] == 64

    def test_shapes(self, built):
        _, idx, _ = built
        assert idx.cells.shape[0] == 64
        assert idx.cells.shape[1] % 8 == 0


class TestSearch:
    def test_recall_increases_with_nprobe(self, built):
        data, idx, queries = built
        k = 10
        gt = _exact(data, queries, k)

        def recall(nprobe):
            _, rows = idx.search(queries, k=k, nprobe=nprobe)
            return np.mean([
                len(set(gt[i]) & set(rows[i])) / k for i in range(len(queries))
            ])

        r2, r8, r32 = recall(2), recall(8), recall(32)
        assert r8 >= r2 - 0.05
        assert r32 >= r8 - 0.02
        assert r8 >= 0.7, (r2, r8, r32)
        assert r32 >= 0.9, (r2, r8, r32)

    def test_distances_sorted_and_valid(self, built):
        data, idx, queries = built
        dists, rows = idx.search(queries[:5], k=8, nprobe=8)
        for i in range(5):
            d = dists[i][np.isfinite(dists[i])]
            assert np.all(np.diff(d) >= -1e-4)
            valid_rows = rows[i][rows[i] >= 0]
            assert len(set(valid_rows.tolist())) == len(valid_rows)

    def test_single_query(self, built):
        data, idx, queries = built
        dists, rows = idx.search(data[77], k=1, nprobe=8)
        assert rows[0][0] == 77
        assert dists[0][0] == pytest.approx(0.0, abs=1e-2)

    def test_cosine_metric(self, built):
        data, idx, queries = built
        dists, rows = idx.search(data[5], k=1, nprobe=16, metric="cosine")
        assert rows[0][0] == 5
        assert dists[0][0] == pytest.approx(0.0, abs=1e-3)


class TestIndexManagerIntegration:
    def test_ivf_through_manager(self, rng):
        from erlvectordb_tpu.core import StoreRegistry
        from erlvectordb_tpu.core.index_manager import IndexManager

        registry = StoreRegistry()
        store = registry.create("s", metric="euclidean")
        centers = rng.standard_normal((16, 16)).astype(np.float32) * 4
        assign = rng.integers(0, 16, 800)
        data = centers[assign] + 0.2 * rng.standard_normal((800, 16)).astype(np.float32)
        store.insert_batch([f"v{i}" for i in range(800)], data)
        im = IndexManager(registry)
        im.create_index("ivf1", "s", "ivf", {"n_cells": 16, "nprobe": 8})
        info = im.build_index("ivf1")
        assert info["built"], info["error"]
        assert info["stats"]["kind"] == "ivf"
        hits = im.search("ivf1", data[42], k=3)
        assert hits[0][0] == "v42"
