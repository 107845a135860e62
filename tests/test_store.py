"""Store engine tests — transliteration of the reference's vector_store_SUITE
(test/vector_store_SUITE.erl: create/insert/search/delete/dimension-validation)
plus TPU-specific coverage: batching, capacity growth, int8 stores, metrics.
"""

import numpy as np
import pytest

from erlvectordb_tpu.core import (
    DimensionMismatch,
    InvalidVector,
    StoreExists,
    StoreNotFound,
    VectorStore,
)


class TestBasicCrud:
    def test_create_and_stats(self, registry):
        registry.create("s1", dim=4)
        stats = registry.get("s1").get_stats()
        assert stats["name"] == "s1"
        assert stats["count"] == 0
        assert stats["dimension"] == 4

    def test_duplicate_create_rejected(self, registry):
        registry.create("s1")
        with pytest.raises(StoreExists):
            registry.create("s1")

    def test_missing_store(self, registry):
        with pytest.raises(StoreNotFound):
            registry.get("nope")

    def test_insert_and_search_top1_identity(self):
        # Parity with vector_store_SUITE: the queried vector ranks first.
        store = VectorStore("t")
        store.insert("a", [1.0, 0.0, 0.0], {"tag": "a"})
        store.insert("b", [0.0, 1.0, 0.0], {"tag": "b"})
        store.insert("c", [0.7, 0.7, 0.0], {"tag": "c"})
        res = store.search([1.0, 0.0, 0.0], k=2)
        assert len(res) == 2
        vid, meta, dist = res[0]
        assert vid == "a"
        assert meta == {"tag": "a"}
        assert dist == pytest.approx(0.0, abs=1e-5)
        assert res[0][2] <= res[1][2]

    def test_insert_overwrites_same_id(self):
        store = VectorStore("t")
        store.insert("x", [1.0, 0.0], {"v": 1})
        store.insert("x", [0.0, 1.0], {"v": 2})
        assert store.count == 1
        vec, meta = store.get("x")
        assert meta == {"v": 2}
        np.testing.assert_allclose(vec, [0.0, 1.0])

    def test_delete(self):
        store = VectorStore("t")
        store.insert("a", [1.0, 0.0])
        store.insert("b", [0.0, 1.0])
        assert store.delete("a")
        assert not store.delete("a")
        assert store.count == 1
        res = store.search([1.0, 0.0], k=5)
        assert [r[0] for r in res] == ["b"]

    def test_deleted_row_reused(self):
        store = VectorStore("t")
        store.insert("a", [1.0, 0.0])
        store.delete("a")
        store.insert("b", [0.5, 0.5])
        assert store.count == 1
        assert store.search([0.5, 0.5], k=1)[0][0] == "b"


class TestValidation:
    def test_dimension_mismatch(self):
        store = VectorStore("t", dim=3)
        with pytest.raises(DimensionMismatch):
            store.insert("a", [1.0, 2.0])

    def test_dimension_fixed_by_first_insert(self):
        store = VectorStore("t")
        store.insert("a", [1.0, 2.0])
        with pytest.raises(DimensionMismatch):
            store.insert("b", [1.0, 2.0, 3.0])

    def test_non_finite_rejected(self):
        store = VectorStore("t")
        with pytest.raises(InvalidVector):
            store.insert("a", [1.0, float("nan")])
        with pytest.raises(InvalidVector):
            store.insert("a", [1.0, float("inf")])

    def test_non_numeric_rejected(self):
        store = VectorStore("t")
        with pytest.raises((InvalidVector, ValueError)):
            store.insert("a", [1.0, "zap"])

    def test_search_dimension_mismatch(self):
        store = VectorStore("t", dim=3)
        store.insert("a", [1.0, 0.0, 0.0])
        with pytest.raises(DimensionMismatch):
            store.search([1.0, 0.0], k=1)


class TestSearchSemantics:
    def test_k_larger_than_count(self):
        store = VectorStore("t")
        store.insert("a", [1.0, 0.0])
        res = store.search([1.0, 0.0], k=100)
        assert len(res) == 1

    def test_empty_store_search(self):
        store = VectorStore("t", dim=2)
        assert store.search([1.0, 0.0], k=3) == []

    def test_zero_norm_cosine_distance_is_one(self):
        # Reference semantics: zero-norm -> distance 1.0
        # (src/vector_store.erl:238-246).
        store = VectorStore("t")
        store.insert("zero", [0.0, 0.0])
        res = store.search([1.0, 0.0], k=1)
        assert res[0][2] == pytest.approx(1.0, abs=1e-6)

    def test_matches_numpy_exact(self, rng):
        n, d, k = 500, 32, 10
        data = rng.standard_normal((n, d)).astype(np.float32)
        q = rng.standard_normal(d).astype(np.float32)
        store = VectorStore("t")
        store.insert_batch([f"v{i}" for i in range(n)], data)
        res = store.search(q, k=k)
        # numpy ground truth (cosine distance)
        sims = data @ q / (np.linalg.norm(data, axis=1) * np.linalg.norm(q))
        order = np.argsort(1.0 - sims, kind="stable")[:k]
        expected = {f"v{i}" for i in order}
        got = {r[0] for r in res}
        # Allow ties at the boundary: compare distances instead of exact sets.
        exp_d = np.sort(1.0 - sims)[:k]
        got_d = np.array([r[2] for r in res])
        np.testing.assert_allclose(got_d, exp_d, atol=1e-4)
        assert len(got & expected) >= k - 1

    @pytest.mark.parametrize("metric", ["euclidean", "manhattan", "dot"])
    def test_other_metrics_match_numpy(self, rng, metric):
        n, d, k = 300, 16, 5
        data = rng.standard_normal((n, d)).astype(np.float32)
        q = rng.standard_normal(d).astype(np.float32)
        store = VectorStore("t", metric=metric)
        store.insert_batch([f"v{i}" for i in range(n)], data)
        res = store.search(q, k=k)
        if metric == "euclidean":
            ref = np.linalg.norm(data - q, axis=1)
        elif metric == "manhattan":
            ref = np.abs(data - q).sum(axis=1)
        else:
            ref = -(data @ q)
        exp = np.sort(ref)[:k]
        got = np.array([r[2] for r in res])
        np.testing.assert_allclose(got, exp, atol=1e-3)

    def test_batched_search(self, rng):
        n, d = 200, 8
        data = rng.standard_normal((n, d)).astype(np.float32)
        store = VectorStore("t", metric="euclidean")
        store.insert_batch([f"v{i}" for i in range(n)], data)
        qs = data[:7]  # the vectors themselves
        results = store.search_batch(qs, k=1)
        assert [r[0][0] for r in results] == [f"v{i}" for i in range(7)]


class TestCapacityGrowth:
    def test_grow_past_initial_capacity(self, rng):
        store = VectorStore("t")
        n = 2500  # > MIN_CAPACITY=1024, forces two growths
        data = rng.standard_normal((n, 4)).astype(np.float32)
        store.insert_batch([f"v{i}" for i in range(n)], data)
        assert store.count == n
        assert store.capacity >= n
        res = store.search(data[1234], k=1)
        assert res[0][0] == "v1234"


class TestInt8Store:
    def test_int8_roundtrip_and_search(self, rng):
        n, d = 400, 64
        data = rng.standard_normal((n, d)).astype(np.float32)
        store = VectorStore("t", dtype="int8")
        store.insert_batch([f"v{i}" for i in range(n)], data)
        vec, _ = store.get("v7")
        # int8 symmetric quantization error bound: absmax/127 per element
        assert np.max(np.abs(vec - data[7])) <= np.abs(data[7]).max() / 127 + 1e-6
        res = store.search(data[42], k=1)
        assert res[0][0] == "v42"

    def test_int8_recall_vs_exact(self, rng):
        n, d, k, nq = 1000, 32, 10, 20
        data = rng.standard_normal((n, d)).astype(np.float32)
        ids = [f"v{i}" for i in range(n)]
        exact = VectorStore("f32")
        exact.insert_batch(ids, data)
        quant = VectorStore("q", dtype="int8")
        quant.insert_batch(ids, data)
        qs = rng.standard_normal((nq, d)).astype(np.float32)
        r_exact = exact.search_batch(qs, k=k)
        r_quant = quant.search_batch(qs, k=k)
        recalls = []
        for a, b in zip(r_exact, r_quant):
            sa = {x[0] for x in a}
            sb = {x[0] for x in b}
            recalls.append(len(sa & sb) / k)
        assert np.mean(recalls) >= 0.9


class TestAccessors:
    def test_get_all_vectors(self, rng):
        store = VectorStore("t")
        data = rng.standard_normal((10, 4)).astype(np.float32)
        store.insert_batch([f"v{i}" for i in range(10)], data, [{"i": i} for i in range(10)])
        allv = store.get_all_vectors()
        assert len(allv) == 10
        by_id = {vid: (vec, meta) for vid, vec, meta in allv}
        np.testing.assert_allclose(by_id["v3"][0], data[3], atol=1e-6)
        assert by_id["v3"][1] == {"i": 3}

    def test_export_import_state(self, rng):
        store = VectorStore("t", metric="euclidean")
        data = rng.standard_normal((50, 8)).astype(np.float32)
        store.insert_batch([f"v{i}" for i in range(50)], data)
        store.delete("v10")
        state = store.export_state()
        clone = VectorStore.from_state(state)
        assert clone.count == 49
        assert clone.metric == "euclidean"
        assert clone.search(data[20], k=1)[0][0] == "v20"
        # deleted id stays deleted
        assert clone.get("v10") is None


class TestBulkBuild:
    def test_from_matrix_implicit_ids(self, rng):
        from erlvectordb_tpu.core.store import VectorStore

        data = rng.standard_normal((2000, 16)).astype(np.float32)
        store = VectorStore.from_matrix("bulk", data)
        assert store.count == 2000
        res = store.search(data[123], k=1)
        assert res[0][0] == "123"
        assert "1999" in store and "2000" not in store
        # first mutation materializes the id tables
        store.delete("7")
        assert store.count == 1999
        assert store.search(data[7], k=1)[0][0] != "7"

    def test_from_matrix_explicit_ids(self, rng):
        from erlvectordb_tpu.core.store import VectorStore

        data = rng.standard_normal((100, 8)).astype(np.float32)
        store = VectorStore.from_matrix("bulk", data, ids=[f"x{i}" for i in range(100)])
        assert store.search(data[5], k=1)[0][0] == "x5"

    def test_from_matrix_int8(self, rng):
        from erlvectordb_tpu.core.store import VectorStore

        data = rng.standard_normal((500, 32)).astype(np.float32)
        store = VectorStore.from_matrix("bulk", data, dtype="int8")
        assert store.search(data[42], k=1)[0][0] == "42"

    def test_from_matrix_export_roundtrip(self, rng):
        from erlvectordb_tpu.core.store import VectorStore

        data = rng.standard_normal((50, 8)).astype(np.float32)
        store = VectorStore.from_matrix("bulk", data)
        clone = VectorStore.from_state(store.export_state())
        assert clone.count == 50
        assert clone.search(data[9], k=1)[0][0] == "9"


class TestInt4Store:
    def test_int4_roundtrip_and_search(self, rng):
        n, d = 400, 64
        data = rng.standard_normal((n, d)).astype(np.float32)
        store = VectorStore("t4", dtype="int4")
        store.insert_batch([f"v{i}" for i in range(n)], data)
        vec, _ = store.get("v7")
        # int4 symmetric bound: absmax/7 per element
        assert np.max(np.abs(vec - data[7])) <= np.abs(data[7]).max() / 7 + 1e-6
        assert store.search(data[42], k=1)[0][0] == "v42"

    def test_int4_from_matrix(self, rng):
        data = rng.standard_normal((600, 32)).astype(np.float32)
        store = VectorStore.from_matrix("b4", data, dtype="int4")
        assert store.search(data[123], k=1)[0][0] == "123"
        # packed storage is half-width
        assert store._vectors.shape[1] == 64  # 32 -> pad 128 -> packed 64
        allv = store.get_all_vectors()
        assert len(allv) == 600

    def test_int4_recall_vs_exact(self, rng):
        n, d, k, nq = 800, 32, 10, 15
        data = rng.standard_normal((n, d)).astype(np.float32)
        ids = [f"v{i}" for i in range(n)]
        exact = VectorStore("f32x")
        exact.insert_batch(ids, data)
        quant = VectorStore("q4", dtype="int4")
        quant.insert_batch(ids, data)
        qs = rng.standard_normal((nq, d)).astype(np.float32)
        r_exact = exact.search_batch(qs, k=k)
        r_quant = quant.search_batch(qs, k=k)
        recalls = [
            len({x[0] for x in a} & {x[0] for x in b}) / k
            for a, b in zip(r_exact, r_quant)
        ]
        assert np.mean(recalls) >= 0.6  # 4-bit is coarse; sanity bound

    def test_int4_export_roundtrip(self, rng):
        data = rng.standard_normal((50, 16)).astype(np.float32)
        store = VectorStore.from_matrix("e4", data, dtype="int4")
        clone = VectorStore.from_state(store.export_state())
        assert clone.dtype == "int4"
        assert clone.search(data[9], k=1)[0][0] == "9"


class TestFilteredSearch:
    def test_where_equality(self, rng):
        store = VectorStore("f1", metric="euclidean")
        data = rng.standard_normal((100, 8)).astype(np.float32)
        metas = [{"cat": "a" if i % 2 == 0 else "b", "n": i % 3}
                 for i in range(100)]
        store.insert_batch([f"v{i}" for i in range(100)], data, metas)
        res = store.search(data[3], k=5, where={"cat": "b"})
        assert all(int(r[0][1:]) % 2 == 1 for r in res)
        res = store.search(data[3], k=50, where={"cat": "a", "n": 0})
        assert all(r[1] == {"cat": "a", "n": 0} for r in res)

    def test_where_no_match(self, rng):
        store = VectorStore("f2")
        store.insert("a", [1.0, 0.0], {"x": 1})
        assert store.search([1.0, 0.0], k=3, where={"x": 2}) == []

    def test_where_self_match(self, rng):
        store = VectorStore("f3", metric="euclidean")
        data = rng.standard_normal((50, 4)).astype(np.float32)
        store.insert_batch([f"v{i}" for i in range(50)], data,
                           [{"g": i // 10} for i in range(50)])
        res = store.search(data[25], k=1, where={"g": 2})
        assert res[0][0] == "v25"


class TestWarmup:
    def test_warmup_counts_programs(self, rng):
        store = VectorStore("w1")
        store.insert_batch([f"v{i}" for i in range(20)],
                           rng.standard_normal((20, 8)).astype(np.float32))
        assert store.warmup(batch_sizes=(1, 4), ks=(1, 5)) == 4
        # empty store: nothing to warm
        empty = VectorStore("w2", dim=4)
        assert empty.warmup() == 0


class TestColumnarFiltering:
    """Round-2 device-side metadata filtering: columnar tag tables replace
    the per-row metadata walk (VERDICT #5)."""

    def _mk(self, rng, n=512, d=16):
        from erlvectordb_tpu.core.store import VectorStore

        data = rng.standard_normal((n, d)).astype(np.float32)
        ids = [f"v{i}" for i in range(n)]
        metas = [{"cat": i % 4, "hot": i % 100 == 0} for i in range(n)]
        store = VectorStore.from_matrix("filt", data, ids=ids, metadatas=metas)
        return store, data

    def test_columnar_matches_slow_path(self, rng):
        store, data = self._mk(rng)
        where = {"cat": 2}
        fast = store.filter_mask(where)
        # force the slow path by making one value unhashable-adjacent: the
        # slow path is exercised with an unhashable predicate value type
        slow = np.zeros(store.capacity, bool)
        for vid, meta in store._metadata.items():
            if all(meta.get(k) == v for k, v in where.items()):
                slow[store._id_to_row[vid]] = True
        np.testing.assert_array_equal(fast, slow)

    def test_filtered_search_results(self, rng):
        store, data = self._mk(rng)
        hits = store.search_batch(data[:8], k=4, where={"cat": 1})
        for row in hits:
            assert row, "selective filter should still return hits"
            for vid, meta, _ in row:
                assert meta["cat"] == 1

    def test_overwrite_updates_tags(self, rng):
        store, data = self._mk(rng)
        store.filter_mask({"cat": 3})  # build the column
        store.insert("v7", data[7], {"cat": 999})  # overwrite: cat 3 -> 999
        m999 = store.filter_mask({"cat": 999})
        m3 = store.filter_mask({"cat": 3})
        row7 = store._id_to_row["v7"]
        assert m999[row7] and not m3[row7]
        # overwrite that REMOVES the key clears the tag
        store.insert("v7", data[7], {"other": 1})
        assert not store.filter_mask({"cat": 999})[row7]

    def test_delete_clears_tags(self, rng):
        store, data = self._mk(rng)
        store.filter_mask({"cat": 0})
        row = store._id_to_row["v4"]
        store.delete("v4")
        assert not store.filter_mask({"cat": 0})[row]

    def test_growth_preserves_tags(self, rng):
        store, data = self._mk(rng, n=100)
        store.filter_mask({"cat": 1})
        more = rng.standard_normal((2000, 16)).astype(np.float32)
        store.insert_batch([f"n{i}" for i in range(2000)], more,
                           [{"cat": 1}] * 2000)
        m = store.filter_mask({"cat": 1})
        assert m.sum() == 25 + 2000  # 100/4 original + 2000 new

    def test_unhashable_value_falls_back(self, rng):
        store, data = self._mk(rng)
        store.insert("weird", data[0], {"cat": [1, 2]})
        # unhashable predicate -> slow path, still correct
        m = store.filter_mask({"cat": [1, 2]})
        assert m[store._id_to_row["weird"]]
        assert m.sum() == 1

    def test_device_mask_cache_invalidation(self, rng):
        store, data = self._mk(rng)
        hits1 = store.search(data[8], k=1, where={"cat": 0})
        assert hits1[0][0] == "v8"
        store.delete("v8")
        hits2 = store.search(data[8], k=1, where={"cat": 0})
        assert hits2[0][0] != "v8"  # version bump invalidated the mask

    def test_value_never_seen(self, rng):
        store, data = self._mk(rng)
        assert store.filter_mask({"cat": 12345}).sum() == 0
        assert store.search(data[0], k=3, where={"cat": 12345}) == []


class TestDuplicateBatchIds:
    """Regression: duplicate NEW ids in one insert_batch must collapse to
    the last occurrence — not allocate a ghost row per occurrence that
    search returns forever and delete cannot reach."""

    def test_duplicate_new_ids_last_write_wins(self):
        st = VectorStore("dupb")
        v1 = np.array([1.0, 0.0, 0.0, 0.0], np.float32)
        v2 = np.array([0.0, 1.0, 0.0, 0.0], np.float32)
        st.insert_batch(["a", "a"], np.stack([v1, v2]))
        assert st.count == 1
        got = st.get("a")
        np.testing.assert_allclose(got[0][:4], v2, atol=1e-6)
        # no ghost: top-2 search returns ONE hit for 'a'
        hits = st.search(v1, k=2)
        assert [h[0] for h in hits] == ["a"]
        assert st.delete("a")
        assert st.count == 0
        assert st.search(v1, k=1) == []

    def test_duplicate_existing_id_deterministic(self):
        st = VectorStore("dupb2")
        st.insert("x", [1.0, 0.0])
        st.insert_batch(["x", "x"],
                        np.array([[0.0, 1.0], [0.0, -1.0]], np.float32))
        got = st.get("x")
        np.testing.assert_allclose(got[0][:2], [0.0, -1.0], atol=1e-6)
        assert st.count == 1

    def test_duplicate_metadata_follows_last(self):
        st = VectorStore("dupb3")
        st.insert_batch(["m", "m"],
                        np.array([[1.0, 0.0], [0.0, 1.0]], np.float32),
                        [{"v": 1}, {"v": 2}])
        assert st.get("m")[1] == {"v": 2}


class TestStoreHardening:
    def test_delete_batch_duplicate_ids(self):
        st = VectorStore("ddup")
        st.insert("a", [1.0, 0.0])
        st.insert("b", [0.0, 1.0])
        assert st.delete_batch(["a", "a", "b"]) == 2
        assert st.count == 0 and st.version > 1

    def test_contains_rejects_noncanonical_contig_ids(self):
        data = np.random.default_rng(0).standard_normal((16, 4)).astype(np.float32)
        st = VectorStore.from_matrix("cfm", data)
        assert "7" in st
        assert "007" not in st
        assert "+7" not in st
        assert " 7" not in st
        assert "16" not in st

    def test_normalize_batched(self):
        from erlvectordb_tpu.utils.vector_math import normalize

        a = np.array([[3.0, 4.0, 0.0], [0.0, 0.0, 0.0]], np.float32)
        out = np.asarray(normalize(a))
        np.testing.assert_allclose(out[0], [0.6, 0.8, 0.0], atol=1e-6)
        np.testing.assert_allclose(out[1], 0.0)
        # square input must normalize ROWS (the old broadcast divided columns)
        sq = np.array([[2.0, 0.0], [0.0, 8.0]], np.float32)
        np.testing.assert_allclose(
            np.asarray(normalize(sq)), [[1.0, 0.0], [0.0, 1.0]], atol=1e-6)


class TestIntkeyStore:
    """int8 + intkey=True: the unit-code plane drives cosine selection
    (raw int32 dots); rescore stays on the absmax plane.  Gated like the
    pos path — tests lower the gate and use >= TILE_N capacity."""

    @pytest.fixture(autouse=True)
    def _gate(self, monkeypatch):
        import erlvectordb_tpu.ops.fused_topk as ft

        monkeypatch.setattr(ft, "POS_MIN_TILES", 1)
        # run the store's fused dispatch (interpret mode) on CPU so the
        # intkey wiring — plane derivation included — actually executes
        real = ft.fused_topk_available
        monkeypatch.setattr(
            ft, "fused_topk_available",
            lambda count, cap, metric, backend, k=10: real(
                count, cap, metric, "tpu", k))

    def _mk(self, rng, n=5000, d=64):
        data = rng.standard_normal((n, d)).astype(np.float32)
        store = VectorStore("ik", dtype="int8", intkey=True)
        store.insert_batch([f"v{i}" for i in range(n)], data)
        return store, data

    def test_requires_int8(self):
        with pytest.raises(ValueError):
            VectorStore("bad", dtype="float32", intkey=True)

    def test_search_uses_plane_and_matches_exact(self, rng):
        # >= kb key slices needed at k=10 (kb 16): 20000 rows -> cap 32768
        # -> 32 slices (production's POS_MIN_TILES gate guarantees >= 576)
        store, data = self._mk(rng, n=20000)
        assert store._codes_unit is not None
        res = store.search(data[42], k=1)
        assert res[0][0] == "v42"
        # recall parity with a plain int8 store on the same data
        plain = VectorStore("pl", dtype="int8")
        plain.insert_batch([f"v{i}" for i in range(len(data))], data)
        qs = rng.standard_normal((16, data.shape[1])).astype(np.float32)
        hits = 0
        for a, b in zip(store.search_batch(qs, k=10),
                        plain.search_batch(qs, k=10)):
            hits += len({x[0] for x in a} & {x[0] for x in b})
        assert hits / 160 >= 0.9

    def test_delete_zeroes_plane_and_excludes(self, rng):
        store, data = self._mk(rng)
        assert store.delete("v42")
        assert np.all(np.asarray(store._codes_unit[42]) == 0)
        res = store.search(data[42], k=3)
        assert "v42" not in [r[0] for r in res]

    def test_overwrite_updates_plane(self, rng):
        store, data = self._mk(rng)
        newv = rng.standard_normal(data.shape[1]).astype(np.float32)
        store.insert("v7", newv)
        res = store.search(newv, k=1)
        assert res[0][0] == "v7"

    def test_snapshot_restore_rederives_plane(self, rng, tmp_path):
        from erlvectordb_tpu.persist.snapshot import load_store, save_store

        store, data = self._mk(rng)
        save_store(store, tmp_path)
        back = load_store("ik", tmp_path)
        assert back.intkey and back._codes_unit is None  # lazy
        res = back.search(data[42], k=1)
        assert res[0][0] == "v42"
        assert back._codes_unit is not None  # derived on first search
        # maintained by subsequent mutations
        back.delete("v42")
        assert np.all(np.asarray(back._codes_unit[42]) == 0)

    def test_memory_reports_plane(self, rng):
        store, _ = self._mk(rng, n=100)
        plain = VectorStore("pl2", dtype="int8")
        plain.insert_batch(["a"], np.ones((1, 64), np.float32))
        assert store.device_memory_bytes() > plain.device_memory_bytes()


class TestIntkeyMagPlane:
    """Round 5: intkey euclidean/dot stores select on the MAGNITUDE plane
    (127*x/S global scale; euclidean folds the -|x|^2/2 row bias into the
    key domain per batch — exp_intkey_l2 measured 1.41x/1.58x over the pos
    path at 1.2M x 128).  Same gate-lowering harness as TestIntkeyStore."""

    @pytest.fixture(autouse=True)
    def _gate(self, monkeypatch):
        import erlvectordb_tpu.ops.fused_topk as ft

        monkeypatch.setattr(ft, "POS_MIN_TILES", 1)
        real = ft.fused_topk_available
        monkeypatch.setattr(
            ft, "fused_topk_available",
            lambda count, cap, metric, backend, k=10: real(
                count, cap, metric, "tpu", k))

    def _mk(self, rng, metric, n=20000, d=64):
        # heterogeneous row magnitudes so euclid/dot genuinely differ
        data = (rng.standard_normal((n, d))
                * (1.0 + 2.0 * rng.random((n, 1)))).astype(np.float32)
        store = VectorStore("ikm", dtype="int8", intkey=True, metric=metric)
        store.insert_batch([f"v{i}" for i in range(n)], data)
        return store, data

    @pytest.mark.parametrize("metric", ["euclidean", "dot"])
    def test_search_matches_plain_int8(self, rng, metric):
        store, data = self._mk(rng, metric)
        assert store._codes_unit is None  # mag plane is lazy (S from data)
        res = store.search(data[42], k=1)
        assert res[0][0] == "v42"
        assert store._codes_unit is not None  # derived on first search
        assert store._plane_scale and store._plane_scale > 0
        plain = VectorStore("plm", dtype="int8", metric=metric)
        plain.insert_batch([f"v{i}" for i in range(len(data))], data)
        qs = rng.standard_normal((16, data.shape[1])).astype(np.float32)
        hits = 0
        for a, b in zip(store.search_batch(qs, k=10),
                        plain.search_batch(qs, k=10)):
            hits += len({x[0] for x in a} & {x[0] for x in b})
        assert hits / 160 >= 0.9

    def test_outgrown_scale_invalidates_then_rebuilds(self, rng):
        store, data = self._mk(rng, "euclidean", n=5000)
        store.search(data[0], k=1)  # materialize the lazy plane
        assert store._codes_unit is not None
        big = (data[7] * 100.0).astype(np.float32)
        store.insert("vbig", big)
        # host-side norm check dropped the stale plane
        assert store._codes_unit is None and store._plane_scale is None
        res = store.search(big, k=1)  # lazy rebuild with a fresh S
        assert res[0][0] == "vbig"
        assert store._codes_unit is not None
        assert store._plane_scale > np.linalg.norm(big)

    def test_delete_zeroes_plane_and_excludes(self, rng):
        store, data = self._mk(rng, "euclidean", n=5000)
        store.search(data[0], k=1)  # materialize the lazy plane
        assert store.delete("v42")
        assert np.all(np.asarray(store._codes_unit[42]) == 0)
        res = store.search(data[42], k=3)
        assert "v42" not in [r[0] for r in res]

    def test_metric_override_outside_plane_kind_still_correct(self, rng):
        # a mag-plane store asked for cosine rides the pos path (the plane
        # only ranks its own kind) — results must still be correct
        store, data = self._mk(rng, "euclidean", n=5000)
        res = store.search(data[42], k=1, metric="cosine")
        assert res[0][0] == "v42"

    def test_snapshot_restore_rederives_mag_plane(self, rng, tmp_path):
        from erlvectordb_tpu.persist.snapshot import load_store, save_store

        store, data = self._mk(rng, "dot", n=5000)
        save_store(store, tmp_path)
        back = load_store("ikm", tmp_path)
        assert back.intkey and back._codes_unit is None  # lazy
        res = back.search(data[42], k=1)
        assert res[0][0] == "v42"
        assert back._codes_unit is not None and back._plane_scale > 0


class TestRQStore:
    """Second-stage residual quantization (``rq_m`` on from_matrix):
    OPQ error codes over the int4 reconstruction error, rescored in
    multiprobe searches.  Round-4 sweeps (experiments/exp_rq*.py)
    measured the recall lift this buys at flagship scale; these tests
    pin the mechanics (recall no worse, insert encodes, snapshot
    round-trip, memory accounting)."""

    def _corpus(self, rng, n=6000, d=20, centers=64, noise=0.3):
        c = rng.standard_normal((centers, d)).astype(np.float32)
        a = rng.integers(0, centers, n)
        return (c[a] + noise * rng.standard_normal((n, d))).astype(np.float32)

    def _recall(self, store, q, gt, k=10, nprobe=32):
        t = store.search_batch_submit(q, k=k, nprobe=nprobe)
        _d, _r, ids = store.search_batch_complete_raw(t)
        got = [[int(v) if v is not None else -1 for v in row]
               for row in ids.tolist()]
        return np.mean([len(set(gt[i]) & set(got[i])) / k
                        for i in range(len(q))])

    def test_rq_recall_not_worse_and_memory(self, rng):
        x = self._corpus(rng)
        plain = VectorStore.from_matrix("rqp", x, dtype="int4r")
        rq = VectorStore.from_matrix("rqr", x, dtype="int4r", rq_m=5)
        q = x[:64]
        xn = np.linalg.norm(x, axis=1)
        sims = (q @ x.T) / (np.linalg.norm(q, axis=1)[:, None] * xn[None, :])
        gt = np.argsort(-sims, axis=1)[:, :10]
        rp = self._recall(plain, q, gt)
        rr = self._recall(rq, q, gt)
        assert rr >= rp - 0.01, (rp, rr)
        # +rq_m bytes/row (plus small codebook/rotation overheads)
        extra = rq.device_memory_bytes() - plain.device_memory_bytes()
        assert extra >= rq._capacity * 5
        assert extra <= rq._capacity * 5 + 4 * (5 * 256 * 4 + 20 * 20) + 4096

    def test_rq_insert_encodes_second_stage(self, rng):
        x = self._corpus(rng, n=4000)
        rq = VectorStore.from_matrix("rqi", x, dtype="int4r", rq_m=5)
        v = x[0] + 0.01
        rq.insert("fresh", v)
        row = rq._id_to_row["fresh"]
        codes2 = np.asarray(rq._rq_codes[row])
        assert codes2.any()  # the error stage actually wrote codes
        res = rq.search(v, k=2, nprobe=32)
        assert "fresh" in [r[0] for r in res]

    def test_rq_snapshot_roundtrip(self, rng):
        x = self._corpus(rng, n=3000)
        rq = VectorStore.from_matrix("rqs", x, dtype="int4r", rq_m=5)
        back = VectorStore.from_state(rq.export_state())
        assert back._rq_m == 5 and back._rq_codes is not None
        q = x[:16]
        t1 = rq.search_batch_submit(q, k=10, nprobe=32)
        t2 = back.search_batch_submit(q, k=10, nprobe=32)
        _d1, _r1, i1 = rq.search_batch_complete_raw(t1)
        _d2, _r2, i2 = back.search_batch_complete_raw(t2)
        assert (i1 == i2).all()

    def test_rq_norms_are_full_reconstruction(self, rng):
        # stored norms must describe centroid + stage1 + stage2, not stage1
        x = self._corpus(rng, n=3000)
        plain = VectorStore.from_matrix("rqn1", x, dtype="int4r")
        rq = VectorStore.from_matrix("rqn2", x, dtype="int4r", rq_m=5)
        # full-recon norms track the true norms at least as well on average
        def err(st):
            perm_rows = [st._id_to_row[str(i)] for i in range(200)]
            nrm = np.asarray(st._norms)[perm_rows]
            true = np.linalg.norm(x[:200], axis=1)
            return np.mean(np.abs(nrm - true))
        assert err(rq) <= err(plain) + 1e-6
