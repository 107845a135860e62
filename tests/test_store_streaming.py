"""VectorStore.from_chunks — streaming int4r build with device-resident
slot->row permutation (ids implicit, no O(N) host tables until the first
targeted mutation)."""

import numpy as np
import pytest

from erlvectordb_tpu.core.store import VectorStore


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(11)
    # iid gaussians: directions well separated (typical cross-row cosine
    # ~1/sqrt(d)), so int4 residual noise cannot outrank a self-match
    n, d = 600, 64
    data = rng.standard_normal((n, d)).astype(np.float32)

    def chunks():
        for i in range(0, n, 128):
            yield data[i:i + 128]

    store = VectorStore.from_chunks(
        "stream1", chunks(), n=n, dim=d, cell_rows=48, cell_cap=64,
        train_rows=512)
    return store, data


class TestStreamingBuild:
    def test_count_and_contains(self, built):
        store, data = built
        assert store.count == len(data)
        assert "0" in store and "599" in store
        assert "600" not in store and "007" not in store
        assert store.build_stats["vec_per_sec"] > 0

    def test_search_returns_original_ids(self, built):
        store, data = built
        hits = store.search(data[123], k=3)
        assert hits[0][0] == "123"
        assert all(isinstance(h[0], str) for h in hits)
        # distances ascending
        ds = [h[2] for h in hits]
        assert ds == sorted(ds)

    def test_search_batch_and_raw(self, built):
        store, data = built
        res = store.search_batch(data[:8], k=2)
        assert [r[0][0] for r in res] == [str(i) for i in range(8)]
        t = store.search_batch_submit(data[:4], k=2)
        dists, rows, ids = store.search_batch_complete_raw(t)
        assert ids.shape == (4, 2)
        assert [ids[i][0] for i in range(4)] == ["0", "1", "2", "3"]
        # raw rows are original row numbers (ids ARE the rows here)
        np.testing.assert_array_equal(rows[:, 0], np.arange(4))

    def test_nprobe_multiprobe_path(self, built):
        store, data = built
        hits = store.search(data[77], k=3, nprobe=8)
        assert hits[0][0] == "77"

    def test_get_materializes_and_roundtrips(self, built):
        store, data = built
        vec, md = store.get("321")
        assert md == {}
        # int4 residual reconstruction: direction preserved
        cos = float(vec @ data[321]) / (
            np.linalg.norm(vec) * np.linalg.norm(data[321]))
        assert cos > 0.98
        # materialization happened; searches still return the same ids
        assert store._perm_count == 0 and store._perm_dev is None
        hits = store.search(data[123], k=1)
        assert hits[0][0] == "123"

    def test_explicit_ids_unsupported(self):
        with pytest.raises(TypeError):
            VectorStore.from_chunks("x", iter([]), n=1, dim=4, ids=["a"])


class TestStreamingMutation:
    @pytest.fixture()
    def store(self):
        rng = np.random.default_rng(5)
        n, d = 300, 32
        data = rng.standard_normal((n, d)).astype(np.float32)

        def chunks():
            for i in range(0, n, 100):
                yield data[i:i + 100]

        s = VectorStore.from_chunks("mut1", chunks(), n=n, dim=d,
                                    cell_rows=32, cell_cap=64,
                                    train_rows=256)
        return s, data

    def test_delete_then_search(self, store):
        s, data = store
        assert s.delete("42")
        assert s.count == 299
        hits = s.search(data[42], k=1)
        assert hits[0][0] != "42"
        assert not s.delete("42")

    def test_insert_after_streaming_build(self, store):
        s, data = store
        v = np.random.default_rng(99).standard_normal(
            data.shape[1]).astype(np.float32)
        s.insert("new-row", v, {"tag": "fresh"})
        assert s.count == 301
        hits = s.search(v, k=1)
        assert hits[0][0] == "new-row"
        assert hits[0][1] == {"tag": "fresh"}

    def test_persistence_roundtrip(self, store):
        s, data = store
        state = s.export_state()
        s2 = VectorStore.from_state(state)
        assert s2.count == 300
        hits = s2.search(data[10], k=1)
        assert hits[0][0] == "10"
