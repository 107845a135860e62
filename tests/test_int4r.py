"""Cell-residual int4 stores (dtype="int4r"): 4-bit codes quantize only the
row's residual against its cell centroid, rescuing int4 recall (round-1
whole-vector int4 measured 0.59 recall@10; residual coding reaches ~0.9 at
the same 0.5 byte/dim code footprint).  VERDICT r1 item #8."""

import numpy as np
import pytest

from erlvectordb_tpu.core.store import VectorStore


@pytest.fixture
def corpus(rng):
    # clustered corpus: residuals ~3x smaller than vectors (center norm ~5,
    # noise norm ~1.5) — GloVe-like separation, not degenerate near-ties
    centers = rng.standard_normal((32, 24)).astype(np.float32)
    assign = rng.integers(0, 32, 3000)
    return (centers[assign]
            + 0.3 * rng.standard_normal((3000, 24)).astype(np.float32))


class TestBulkBuild:
    def test_build_and_search(self, corpus):
        st = VectorStore.from_matrix("r4", corpus, dtype="int4r")
        assert st.count == 3000
        assert st.dtype == "int4r"
        hits = st.search_batch(corpus[:16], k=1)
        top1 = [h[0][0] for h in hits]
        assert sum(top1[i] == str(i) for i in range(16)) >= 12

    def test_recall_beats_plain_int4(self, corpus, rng):
        """Relative gates on a deliberately hard fixture (int8 itself only
        reaches ~0.93 here): int4r must crush plain int4 and recover most of
        the int8 ceiling.  The absolute >=0.90 gate runs on the config-3
        corpus in bench.py --config 8 (d=100, realistic separations)."""
        q = corpus[:64]
        exact = VectorStore.from_matrix("ex", corpus)
        gt = [[h[0] for h in row] for row in exact.search_batch(q, k=5)]
        plain = VectorStore.from_matrix("p4", corpus, dtype="int4")
        resid = VectorStore.from_matrix("r4b", corpus, dtype="int4r")
        i8 = VectorStore.from_matrix("i8b", corpus, dtype="int8")
        def recall(st):
            got = [[h[0] for h in row] for row in st.search_batch(q, k=5)]
            return np.mean([len(set(g) & set(w)) / 5 for g, w in zip(got, gt)])
        r_plain, r_resid, r_i8 = recall(plain), recall(resid), recall(i8)
        assert r_resid >= r_plain + 0.2   # int4: ~0.43, int4r: ~0.74 here
        assert r_resid >= 0.75 * r_i8     # recovers most of the 8-bit ceiling

    def test_all_metrics(self, corpus):
        st = VectorStore.from_matrix("rm", corpus, dtype="int4r")
        for metric in ("cosine", "euclidean", "dot", "manhattan"):
            hits = st.search(corpus[7], k=3, metric=metric)
            assert len(hits) == 3
            assert hits[0][0] == "7"

    def test_get_dequantizes(self, corpus):
        st = VectorStore.from_matrix("rg", corpus, dtype="int4r")
        vec, meta = st.get("42")
        # residual coding: reconstruction error bounded by residual scale
        rel = np.linalg.norm(vec - corpus[42]) / np.linalg.norm(corpus[42])
        assert rel < 0.08

    def test_memory_at_int4_footprint(self, rng):
        # at 3k rows CELL_BLOCK padding dominates; measure at a size where
        # the layout amortizes (config-8 on TPU measures 0.70x of int8 @ 120k)
        big = rng.standard_normal((30_000, 16)).astype(np.float32)
        r4 = VectorStore.from_matrix("rmem", big, dtype="int4r")
        i8 = VectorStore.from_matrix("imem", big, dtype="int8")
        # codes are half of int8's; centroids+padding overhead stays small
        assert r4.device_memory_bytes() < i8.device_memory_bytes()


class TestMutation:
    def test_insert_into_empty(self, corpus):
        st = VectorStore("mut", dim=24, dtype="int4r")
        st.insert_batch([f"v{i}" for i in range(200)], corpus[:200])
        assert st.count == 200
        assert st.search(corpus[5], k=1)[0][0] == "v5"
        st.insert("late", corpus[500], {"tag": "x"})
        hit = st.search(corpus[500], k=1)
        assert hit[0][0] == "late"
        assert hit[0][1] == {"tag": "x"}

    def test_insert_after_bulk_build(self, corpus):
        st = VectorStore.from_matrix("mut2", corpus[:1000], dtype="int4r")
        st.insert("new", corpus[2000])
        assert st.search(corpus[2000], k=1)[0][0] == "new"
        assert st.count == 1001

    def test_delete_and_slot_reuse(self, corpus):
        st = VectorStore.from_matrix("mut3", corpus[:500], dtype="int4r")
        cap_before = st.capacity
        row = st._id_to_row["17"]
        assert st.delete("17")
        assert st.search(corpus[17], k=1)[0][0] != "17"
        st.insert("again", corpus[17])
        assert st.search(corpus[17], k=1)[0][0] == "again"
        assert st._id_to_row["again"] == row  # freed slot reused
        assert st.capacity == cap_before

    def test_overwrite(self, corpus):
        st = VectorStore.from_matrix("mut4", corpus[:300], dtype="int4r")
        st.insert("9", corpus[2500])  # overwrite id 9 with a new vector
        assert st.count == 300
        assert st.search(corpus[2500], k=1)[0][0] == "9"

    def test_growth_appends_cells(self, corpus):
        st = VectorStore("grow", dim=24, dtype="int4r")
        st.insert_batch([f"a{i}" for i in range(100)], corpus[:100])
        k1 = len(st._cell_next)
        st.insert_batch([f"b{i}" for i in range(2000)], corpus[100:2100])
        assert len(st._cell_next) > k1
        assert st.capacity % 4096 == 0  # stays scan-tile-aligned
        assert st.search(corpus[150], k=1)[0][0] == "b50"


class TestPersistence:
    def test_snapshot_roundtrip(self, corpus, tmp_path):
        from erlvectordb_tpu.persist.snapshot import load_store, save_store

        st = VectorStore.from_matrix("snap", corpus[:800], dtype="int4r")
        st.insert("extra", corpus[900], {"m": 1})
        save_store(st, tmp_path)
        ld = load_store("snap", tmp_path)
        assert ld.dtype == "int4r"
        assert ld.count == st.count
        assert ld.search(corpus[3], k=1)[0][0] == "3"
        assert ld.search(corpus[900], k=1)[0][0] == "extra"
        # mutation after reload keeps working (cell state restored)
        ld.insert("post", corpus[901])
        assert ld.search(corpus[901], k=1)[0][0] == "post"

    def test_backup_restore_path(self, corpus, tmp_path):
        from erlvectordb_tpu.persist import backup as bk

        st = VectorStore.from_matrix("bkr", corpus[:400], dtype="int4r")
        # get_all_vectors dequantizes (used by export/migration)
        allv = st.get_all_vectors()
        assert len(allv) == 400
        vid, vec, _ = allv[0]
        rel = np.linalg.norm(vec - corpus[int(vid)]) / np.linalg.norm(corpus[int(vid)])
        assert rel < 0.08


class TestFusedResidualKernel:
    """Interpret-mode coverage of BOTH fused residual scan paths (the
    masked-extraction kernel and the positive-packed pos path) against the
    XLA exact_topk_int4r reference."""

    @pytest.fixture(scope="class")
    def big_store(self):
        import erlvectordb_tpu.ops.fused_topk as ft

        rng = np.random.default_rng(5)
        n, d = 2 * ft.TILE_N, 32
        centers = rng.standard_normal((64, d)).astype(np.float32)
        assign = rng.integers(0, 64, n)
        data = (centers[assign]
                + 0.3 * rng.standard_normal((n, d)).astype(np.float32))
        queries = data[rng.integers(0, n, 16)].copy()
        store = VectorStore.from_matrix("i4rk", data, dtype="int4r")
        return store, queries

    def _run(self, store, queries, metric, k=8):
        import jax.numpy as jnp

        import erlvectordb_tpu.ops.fused_topk as ft

        nt = ft.n_tiles_for(store._capacity, store._capacity)
        width = store._centroids.shape[1]
        qp = np.zeros((queries.shape[0], width), np.float32)
        qp[:, : queries.shape[1]] = queries
        return ft.fused_topk_residual(
            store._vectors, store._scales, store._norms, store._valid,
            store._centroids, jnp.asarray(qp), metric=metric, k=k,
            n_tiles=nt, cell_cap=store._cell_cap,
        )

    def _exact(self, store, queries, metric, k=8):
        import jax.numpy as jnp

        from erlvectordb_tpu.core.search import exact_topk_int4r

        width = store._centroids.shape[1]
        qp = np.zeros((queries.shape[0], width), np.float32)
        qp[:, : queries.shape[1]] = queries
        return exact_topk_int4r(
            store._vectors, store._scales, store._norms, store._valid,
            store._centroids, jnp.asarray(qp), metric=metric, k=k,
            cell_cap=store._cell_cap,
        )

    @pytest.mark.parametrize("metric", ["cosine", "euclidean", "dot"])
    def test_masked_path_matches_exact(self, big_store, metric):
        store, queries = big_store
        d_f, r_f = self._run(store, queries, metric)
        d_x, r_x = self._exact(store, queries, metric)
        d_f, r_f, d_x, r_x = map(np.asarray, (d_f, r_f, d_x, r_x))
        for b in range(queries.shape[0]):
            assert len(set(r_f[b]) & set(r_x[b])) >= 7, (metric, b)
        # distances differ by query-quantization noise: the fused rescore
        # uses the RAW f32 query while the XLA reference scores with the
        # quantized one — rows matching is the strong check.  Euclidean
        # with self-member queries is ill-conditioned for allclose (the
        # reference's self-distance is exactly 0 while the fused path sees
        # the int4 reconstruction error), so bound both by quantization
        # noise instead of comparing them to each other.
        if metric == "euclidean":
            assert float(np.max(d_f[:, 0])) < 0.35
            assert float(np.max(d_x[:, 0])) < 0.35
        else:
            np.testing.assert_allclose(
                d_f[:, 0], d_x[:, 0], rtol=0.05, atol=0.08)

    @pytest.mark.parametrize("metric", ["cosine", "euclidean", "dot"])
    def test_pos_path_quality(self, big_store, metric, monkeypatch):
        """The pos path is gated at POS_MIN_TILES=144 in production; at 2
        tiles there are only 16 candidate keys for the whole store, so
        global recall is out of its design envelope (the scale behavior is
        the simulation documented at _make_pos_residual_kernel).  What the
        design DOES guarantee at any scale: the global best survives
        (it is the top-1 of its slice), distances are exact rescores, and
        top-2-per-slice keeps both of the home cell's best rows."""
        import erlvectordb_tpu.ops.fused_topk as ft

        monkeypatch.setattr(ft, "POS_MIN_TILES", 1)
        store, queries = big_store
        d_f, r_f = self._run(store, queries, metric, k=5)
        d_x, r_x = self._exact(store, queries, metric, k=5)
        _, r_wide = self._exact(store, queries, metric, k=24)
        d_f, r_f, d_x, r_x, r_wide = map(
            np.asarray, (d_f, r_f, d_x, r_x, r_wide))
        for b in range(queries.shape[0]):
            # self-row: queries are (near-)members, so exact top-1 must be
            # found; rescore uses the raw query so its rank-1 is robust
            assert r_f[b][0] == r_x[b][0], (metric, b)
            # top-2/slice keeps the home cell's two best rows: at least 2
            # of the returned 5 are genuine top-24 neighbors
            assert len(set(r_f[b]) & set(r_wide[b])) >= 2, (metric, b)
            # no duplicate rows in the result
            assert len(set(r_f[b].tolist())) == len(r_f[b]), (metric, b)
        if metric == "euclidean":
            assert float(np.max(d_f[:, 0])) < 0.35
            assert float(np.max(d_x[:, 0])) < 0.35
        else:
            np.testing.assert_allclose(
                d_f[:, 0], d_x[:, 0], rtol=0.05, atol=0.08)


class TestDeepSliceExtraction:
    """slice_w / t_top extraction structure (VERDICT r3 #3): cell-major
    layout concentrates a query's true top-k into ~2-4 cells (measured
    8M x 768 manifold: mean 3.5 cells hold the top-10), so per-slice
    extraction capacity — not key precision — bounds the packed scan's
    candidate recall.  Plant the top-k inside ONE cell and assert
    top-8/slice recovers what top-2/slice structurally cannot."""

    @pytest.fixture(scope="class")
    def one_cell_corpus(self):
        import jax.numpy as jnp

        import erlvectordb_tpu.ops.fused_topk as ft

        rng = np.random.default_rng(7)
        n, w, cc = 2 * ft.TILE_N, 32, 512
        k_cells = n // cc
        cents = rng.standard_normal((k_cells, w)).astype(np.float32)
        resid = 0.05 * rng.standard_normal((n, w)).astype(np.float32)
        # query IS a centroid: its true top-k are that cell's rows
        # (residuals are tiny), i.e. all inside one 512-row cell
        q = cents[3:4] + 0.01 * rng.standard_normal((1, w)).astype(
            np.float32)
        rows = cents.repeat(cc, axis=0) + resid
        norms = np.linalg.norm(rows, axis=1).astype(np.float32)
        scale = (np.abs(resid).max(axis=1) / 7.0).astype(np.float32)
        codes = np.clip(np.round(resid / scale[:, None]), -7, 7)
        u = codes.astype(np.int8).astype(np.uint8)
        packed = ((u[:, 0::2] & 0xF) << 4) | (u[:, 1::2] & 0xF)
        return (jnp.asarray(packed), jnp.asarray(scale),
                jnp.asarray(norms), jnp.ones(n, bool), jnp.asarray(cents),
                jnp.asarray(q), cc)

    def _pos(self, c, slice_w, t_top, monkeypatch, k=8):
        import erlvectordb_tpu.ops.fused_topk as ft

        packed, scale, norms, valid, cents, q, cc = c
        monkeypatch.setattr(ft, "POS_MIN_TILES", 1)
        _, r = ft.fused_topk_residual(
            packed, scale, norms, valid, cents, q, metric="cosine", k=k,
            n_tiles=2, cell_cap=cc, slice_w=slice_w, t_top=t_top)
        return set(np.asarray(r)[0].tolist())

    def test_top8_recovers_one_cell_topk(self, one_cell_corpus, monkeypatch):
        from erlvectordb_tpu.core.search import exact_topk_int4r

        packed, scale, norms, valid, cents, q, cc = one_cell_corpus
        _, r_x = exact_topk_int4r(
            packed, scale, norms, valid, cents, q, metric="cosine", k=8,
            cell_cap=cc)
        truth = set(np.asarray(r_x)[0].tolist())
        # all true top-8 in one cell -> inside one 1024-slice
        assert len({t // 1024 for t in truth}) == 1
        got8 = self._pos(one_cell_corpus, 1024, 8, monkeypatch)
        assert len(got8 & truth) == 8
        # top-2/1024 can keep at most 2 of them (capacity bound)
        got2 = self._pos(one_cell_corpus, 1024, 2, monkeypatch)
        assert len(got2 & truth) <= 2
        # cell-aligned 512-slices at t_top=8 also recover everything
        got512 = self._pos(one_cell_corpus, 512, 8, monkeypatch)
        assert len(got512 & truth) == 8


class TestNprobeCalibration:
    """recall_target -> nprobe auto-tuning (calibrate_nprobe): the curve
    is ceiling-relative (deep probe == 1.0), monotone non-decreasing,
    persists through state export/import, and recall_target searches
    match the curve's chosen nprobe exactly."""

    @pytest.fixture(scope="class")
    def cal_store(self):
        rng = np.random.default_rng(11)
        n, d = 6000, 24
        centers = rng.standard_normal((40, d)).astype(np.float32)
        data = (centers[rng.integers(0, 40, n)]
                + 0.25 * rng.standard_normal((n, d)).astype(np.float32))
        return VectorStore.from_matrix("cal", data, dtype="int4r")

    def test_curve_shape_and_persistence(self, cal_store):
        curve = cal_store.calibrate_nprobe(n_sample=64, k=5)
        deep = max(curve)
        assert curve[deep] == 1.0
        probes = sorted(curve)
        vals = [curve[p] for p in probes]
        # monotone within sampling noise
        for a, b in zip(vals, vals[1:]):
            assert b >= a - 0.05, curve
        state = cal_store.export_state()
        assert state["calibrations"]
        st2 = VectorStore.from_state(state)
        cal2 = st2._calib.get(5, "cosine")
        assert cal2 is not None and cal2.curve == curve
        assert cal2.mode == "ceiling" and cal2.ceiling == 1.0

    def test_recall_target_search(self, cal_store):
        if cal_store._calib.get(5, "cosine") is None:
            cal_store.calibrate_nprobe(n_sample=64, k=5)
        q = np.asarray(cal_store.get("7")[0], np.float32)
        want = cal_store._nprobe_for_target(0.9, k=5)
        r_target = cal_store.search(q, k=5, recall_target=0.9)
        r_nprobe = cal_store.search(q, k=5, nprobe=want)
        assert [h[0] for h in r_target] == [h[0] for h in r_nprobe]
        with pytest.raises(ValueError):
            cal_store.search(q, k=5, nprobe=4, recall_target=0.9)
        with pytest.raises(ValueError):
            cal_store.search(q, k=5, recall_target=1.5)

    def test_recall_target_rejected_on_non_cell_store(self):
        rng = np.random.default_rng(3)
        st = VectorStore.from_matrix(
            "cal8", rng.standard_normal((64, 8)).astype(np.float32),
            dtype="int8")
        with pytest.raises(ValueError):
            st.search(np.zeros(8, np.float32), k=2, recall_target=0.9)
