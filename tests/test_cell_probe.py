"""Cell-probe (hnsw-slot) sub-linear index: op, index class, store nprobe
path, index-manager integration, persistence roundtrip."""

import numpy as np
import pytest

from erlvectordb_tpu.core.cell_probe import CellProbeIndex
from erlvectordb_tpu.core.store import VectorStore


def make_clustered(n, d, n_centers=32, noise=0.25, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_centers, d)).astype(np.float32)
    assign = rng.integers(0, n_centers, n)
    return (centers[assign]
            + noise * rng.standard_normal((n, d)).astype(np.float32))


class TestMultiprobeOp:
    @pytest.fixture(scope="class")
    def built(self):
        data = make_clustered(6000, 32)
        rows = np.arange(6000, dtype=np.int64)
        dp = np.pad(data, ((0, 0), (0, 96)))  # pad dims to 128
        idx = CellProbeIndex.build(dp, rows, cell_rows=48,
                                   cell_cap=64, iters=8)
        return idx, data

    @pytest.mark.parametrize("metric", ["cosine", "euclidean", "dot"])
    def test_recall_vs_exact(self, built, metric):
        idx, data = built
        rng = np.random.default_rng(1)
        queries = data[rng.integers(0, len(data), 24)]
        # exact ground truth on the raw f32 corpus
        if metric == "cosine":
            a = queries / np.linalg.norm(queries, axis=1, keepdims=True)
            b = data / np.linalg.norm(data, axis=1, keepdims=True)
            gt = np.argsort(-(a @ b.T), axis=1)[:, :10]
        elif metric == "dot":
            gt = np.argsort(-(queries @ data.T), axis=1)[:, :10]
        else:
            d2 = ((queries[:, None, :] - data[None, :, :]) ** 2).sum(-1)
            gt = np.argsort(d2, axis=1)[:, :10]
        _, rows = idx.search(queries, k=10, nprobe=16, metric=metric)
        rec = np.mean([len(set(gt[i]) & set(rows[i])) / 10
                       for i in range(len(queries))])
        # int8 residuals: recall limited by routing only; nprobe=16 of
        # ~125 cells must find nearly everything on clustered data
        assert rec >= 0.9, (metric, rec)

    def test_distances_are_exact_scale(self, built):
        idx, data = built
        q = data[5]
        dists, rows = idx.search(q, k=3, nprobe=16, metric="euclidean")
        assert rows[0][0] == 5
        # int8 residual reconstruction error only
        assert dists[0][0] < 0.05

    def test_low_nprobe_degrades_gracefully(self, built):
        idx, data = built
        q = data[7]
        dists, rows = idx.search(q, k=5, nprobe=1, metric="cosine")
        assert rows.shape == (1, 5)
        assert np.isfinite(dists[0][0])  # the probe found its own cell

    def test_persistence_roundtrip(self, built):
        idx, data = built
        arrays = idx.to_arrays()
        idx2 = CellProbeIndex.from_arrays(
            {k: np.asarray(v) for k, v in arrays.items()})
        q = data[11]
        d1, r1 = idx.search(q, k=5, nprobe=8, metric="cosine")
        d2, r2 = idx2.search(q, k=5, nprobe=8, metric="cosine")
        np.testing.assert_array_equal(r1, r2)
        np.testing.assert_allclose(d1, d2, rtol=1e-6)

    def test_stats(self, built):
        idx, _ = built
        s = idx.stats()
        assert s["kind"] == "cell_probe"
        assert s["rows"] == 6000
        assert s["max_cell"] <= s["cell_cap"]


class TestStoreNprobe:
    @pytest.fixture(scope="class")
    def store(self):
        data = make_clustered(4096, 24, seed=3)
        st = VectorStore.from_matrix("np4r", data, dtype="int4r")
        return st, data

    def test_nprobe_search_finds_self(self, store):
        st, data = store
        res = st.search(data[17], k=3, nprobe=8)
        assert res[0][0] == "17"

    def test_nprobe_batch(self, store):
        st, data = store
        out = st.search_batch(data[:6], k=4, nprobe=8)
        assert len(out) == 6
        assert [r[0][0] for r in out] == [str(i) for i in range(6)]

    def test_nprobe_recall_vs_exact_path(self, store):
        st, data = store
        rng = np.random.default_rng(2)
        qs = data[rng.integers(0, len(data), 16)]
        full = st.search_batch(qs, k=10)
        probed = st.search_batch(qs, k=10, nprobe=12)
        rec = np.mean([
            len({h[0] for h in probed[i]} & {h[0] for h in full[i]}) / 10
            for i in range(len(qs))])
        assert rec >= 0.85, rec

    def test_nprobe_rejects_non_int4r(self):
        st = VectorStore("plain_np")
        st.insert("a", np.ones(8, np.float32))
        with pytest.raises(ValueError, match="int4r"):
            st.search(np.ones(8, np.float32), k=1, nprobe=4)

    def test_nprobe_rejects_manhattan(self, store):
        st, data = store
        with pytest.raises(ValueError, match="manhattan"):
            st.search(data[0], k=1, metric="manhattan", nprobe=4)


class TestIndexManagerHnswSlot:
    @pytest.fixture()
    def managed(self, tmp_path):
        from erlvectordb_tpu.core.index_manager import IndexManager
        from erlvectordb_tpu.core.registry import StoreRegistry

        reg = StoreRegistry()
        st = reg.create("hs", metric="cosine")
        data = make_clustered(1500, 16, seed=5)
        st.insert_batch([f"v{i}" for i in range(len(data))], data)
        return IndexManager(reg), reg, data, tmp_path

    @pytest.mark.parametrize("itype", ["hnsw", "cellprobe"])
    def test_build_and_search(self, managed, itype):
        im, reg, data, _ = managed
        im.create_index(f"i_{itype}", "hs", itype,
                        {"cell_rows": 32, "cell_cap": 40, "nprobe": 8})
        info = im.build_index(f"i_{itype}")
        assert info["built"] and not info["error"], info
        assert info["stats"]["kind"] == "cell_probe"
        hits = im.search(f"i_{itype}", data[9], k=5)
        assert hits[0][0] == "v9"

    def test_save_load_roundtrip(self, managed):
        im, reg, data, tmp_path = managed
        im.create_index("ihp", "hs", "hnsw",
                        {"cell_rows": 32, "cell_cap": 40, "nprobe": 8})
        im.build_index("ihp")
        im.save_index("ihp", tmp_path)

        from erlvectordb_tpu.core.index_manager import IndexManager

        im2 = IndexManager(reg)
        loaded = im2.load_indexes(tmp_path)
        assert "ihp" in loaded
        hits = im2.search("ihp", data[3], k=3)
        assert hits[0][0] == "v3"


def test_nprobe_on_distributed_store_is_clean_error():
    """api.Database raises the domain error (not a TypeError) when nprobe
    targets a distributed store class that has no multiprobe support."""
    from erlvectordb_tpu.api import Database
    from erlvectordb_tpu.infra.config import load_config

    db = Database(load_config(overrides={"persistence_enabled": False},
                              env={}))
    db.create_distributed_store("dshard", dim=8)
    db.insert("dshard", "a", np.ones(8, np.float32))
    with pytest.raises(ValueError, match="distributed"):
        db.search("dshard", np.ones(8, np.float32), k=1, nprobe=4)


class TestHierarchicalRouting:
    @pytest.fixture(scope="class")
    def hier(self):
        data = make_clustered(6000, 32, seed=9)
        dp = np.pad(data, ((0, 0), (0, 96)))
        flat = CellProbeIndex.build(dp, np.arange(6000, dtype=np.int64),
                                    cell_rows=24, cell_cap=32, iters=6)
        assert flat.super_route is None  # under the threshold
        hier = flat._with_hierarchy(child_target=32)
        assert hier.super_route is not None and hier.child_cap >= 32
        return flat, hier, data

    @pytest.mark.parametrize("metric", ["cosine", "euclidean"])
    def test_recall_parity_with_flat_route(self, hier, metric):
        flat, h, data = hier
        rng = np.random.default_rng(4)
        qs = data[rng.integers(0, len(data), 24)]
        _d_f, r_f = flat.search(qs, k=10, nprobe=16, metric=metric)
        _d_h, r_h = h.search(qs, k=10, nprobe=16, metric=metric)
        overlap = np.mean([
            len(set(r_h[b][r_h[b] >= 0]) & set(r_f[b][r_f[b] >= 0])) /
            max(1, (r_f[b] >= 0).sum())
            for b in range(len(qs))])
        assert overlap >= 0.85, (metric, overlap)

    def test_self_row_top1(self, hier):
        _flat, h, data = hier
        _d, r = h.search(data[11], k=3, nprobe=8, metric="cosine")
        assert r[0][0] == 11

    def test_padding_cells_never_surface(self, hier):
        _flat, h, data = hier
        d, r = h.search(data[:8], k=10, nprobe=h.n_cells, metric="cosine")
        for b in range(8):
            got = r[b][np.isfinite(d[b])]
            assert (got >= 0).all()
            assert len(set(got.tolist())) == len(got)

    def test_persistence_roundtrip_with_hierarchy(self, hier):
        _flat, h, data = hier
        arrays = {k: np.asarray(v) for k, v in h.to_arrays().items()}
        assert "super_cents" in arrays
        h2 = CellProbeIndex.from_arrays(arrays)
        assert h2.super_route is not None
        d1, r1 = h.search(data[5], k=5, nprobe=8, metric="cosine")
        d2, r2 = h2.search(data[5], k=5, nprobe=8, metric="cosine")
        np.testing.assert_array_equal(r1, r2)

    def test_stats_reports_hierarchy(self, hier):
        _flat, h, _ = hier
        s = h.stats()
        assert s["hierarchical"] and s["supercells"] >= 2
        assert s["rows"] == 6000


class TestDmaGatherKernel:
    """Direct interpret-mode coverage of both Pallas gather+dot kernel
    bodies (multiprobe_topk gates the kernel to TPU, so CI's CPU runs
    exercise the XLA fallback — these hit the kernels themselves)."""

    def test_int8_kernel_matches_einsum(self):
        import jax.numpy as jnp

        from erlvectordb_tpu.ops.cell_probe import _dma_gather_dots

        rng = np.random.default_rng(0)
        K, cap, W, B, NP = 16, 16, 128, 8, 4
        codes3 = jnp.asarray(rng.integers(-127, 128, (K, cap, W),
                                          dtype=np.int8))
        probe = jnp.asarray(rng.integers(0, K, (B, NP), dtype=np.int32))
        q = jnp.asarray(rng.standard_normal((B, W)).astype(np.float32))
        got = np.asarray(_dma_gather_dots(codes3, probe, q, cell_cap=cap))
        ref = np.einsum("bpcw,bw->bpc",
                        np.asarray(codes3)[np.asarray(probe)]
                        .astype(np.float32), np.asarray(q))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-2)

    def test_packed_kernel_matches_unpacked(self):
        import jax.numpy as jnp

        from erlvectordb_tpu.ops.cell_probe import _dma_gather_dots

        rng = np.random.default_rng(1)
        K, cap, W, B, NP = 16, 16, 128, 8, 4
        vals = rng.integers(-7, 8, (K, cap, W)).astype(np.int8)
        nib = (vals & 0xF).astype(np.uint8)
        packed = jnp.asarray((nib[:, :, 0::2] << 4) | nib[:, :, 1::2])
        probe = jnp.asarray(rng.integers(0, K, (B, NP), dtype=np.int32))
        q = jnp.asarray(rng.standard_normal((B, W)).astype(np.float32))
        got = np.asarray(_dma_gather_dots(packed, probe, q, cell_cap=cap))
        ref = np.einsum("bpcw,bw->bpc",
                        vals[np.asarray(probe)].astype(np.float32),
                        np.asarray(q))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-2)


def test_cellprobe_recall_target_calibration():
    """CellProbeIndex.calibrate_nprobe: deep probe == 1.0, monotone-ish
    curve, and search(recall_target=) equals search(nprobe=chosen)."""
    rng = np.random.default_rng(9)
    n, d = 4000, 16
    centers = rng.standard_normal((30, d)).astype(np.float32)
    data = (centers[rng.integers(0, 30, n)]
            + 0.3 * rng.standard_normal((n, d)).astype(np.float32))
    dp = np.pad(data, ((0, 0), (0, 128 - d)))
    idx = CellProbeIndex.build(dp, np.arange(n, dtype=np.int64),
                               cell_rows=40)
    curve = idx.calibrate_nprobe(n_sample=48, k=5)
    deep = max(curve)
    assert curve[deep] == 1.0
    vals = [curve[p] for p in sorted(curve)]
    for a, b in zip(vals, vals[1:]):
        assert b >= a - 0.05, curve
    q = np.pad(data[:3], ((0, 0), (0, 128 - d)))
    want = idx.nprobe_for(0.9, k=5)
    _, r1 = idx.search(q, k=5, recall_target=0.9)
    _, r2 = idx.search(q, k=5, nprobe=want)
    np.testing.assert_array_equal(r1, r2)
