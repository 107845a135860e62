"""Calibration semantics for the recall_target SLA knob (VERDICT r4 #1).

The round-4 curve was ceiling-relative only: recall measured against the
layout's own deep probe, whose recall is 1.0 by construction — so a
recall_target could silently under-deliver by the quantization ceiling.
These tests pin the round-5 semantics (core/calibration.py):

  * EXACT mode: curve values are absolute recall@k vs exact f32 ground
    truth; the deep probe's value is the ceiling; targets above it raise
    RecallUnachievable; measured held-out absolute recall meets the
    target.
  * curves are keyed by (k, metric) — no stale cross-(k,metric) reuse
    (ADVICE r4 #1);
  * lazy first-use calibration runs once under concurrency (ADVICE r4
    #4) and persists;
  * empty index/queries raise domain errors (ADVICE r4 #3);
  * serving surfaces reject nprobe < 1 / recall_target outside (0, 1]
    (ADVICE r4 #2).
"""

import json
import threading

import numpy as np
import pytest

from erlvectordb_tpu.core.calibration import (
    CalibrationCurve,
    CalibrationSet,
    RecallUnachievable,
    exact_ground_truth,
    measure_curve,
    recall_vs,
)
from erlvectordb_tpu.core.cell_probe import CellProbeIndex
from erlvectordb_tpu.core.store import VectorStore


def _clustered(n, d, n_centers=40, noise=0.25, seed=11):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_centers, d)).astype(np.float32)
    data = (centers[rng.integers(0, n_centers, n)]
            + noise * rng.standard_normal((n, d)).astype(np.float32))
    held = (centers[rng.integers(0, n_centers, 64)]
            + noise * rng.standard_normal((64, d)).astype(np.float32))
    return data, held


# ------------------------------------------------------------- unit pieces


class TestCurve:
    def _curve(self, mode="exact", ceiling=0.9):
        return CalibrationCurve(
            curve={4: 0.5, 16: 0.8, 64: ceiling},
            mode=mode, ceiling=ceiling, k=10, metric="cosine", n_queries=64)

    def test_nprobe_for_picks_smallest(self):
        c = self._curve()
        assert c.nprobe_for(0.5) == 4
        assert c.nprobe_for(0.6) == 16
        assert c.nprobe_for(0.85) == 64

    def test_exact_mode_rejects_above_ceiling(self):
        c = self._curve()
        with pytest.raises(RecallUnachievable) as ei:
            c.nprobe_for(0.95)
        assert "0.9" in str(ei.value)  # names the ceiling
        assert c.nprobe_for(0.95, clamp=True) == 64

    def test_ceiling_mode_never_rejects_in_range(self):
        c = CalibrationCurve(curve={4: 0.5, 64: 1.0}, mode="ceiling",
                             ceiling=1.0, k=10, metric="cosine")
        assert c.nprobe_for(1.0) == 64
        with pytest.raises(ValueError):
            c.nprobe_for(1.5)
        with pytest.raises(ValueError):
            c.nprobe_for(0.0)

    def test_json_roundtrip(self):
        c = self._curve()
        c2 = CalibrationCurve.from_dict(json.loads(json.dumps(c.to_dict())))
        assert c2.curve == c.curve and c2.mode == c.mode
        assert c2.ceiling == c.ceiling and (c2.k, c2.metric) == (10, "cosine")


class TestSet:
    def test_keyed_by_k_and_metric(self):
        s = CalibrationSet()
        s.put(CalibrationCurve({4: 1.0}, "ceiling", 1.0, 10, "cosine"))
        assert s.get(10, "cosine") is not None
        assert s.get(5, "cosine") is None
        assert s.get(10, "euclidean") is None

    def test_get_or_compute_once_under_concurrency(self):
        s = CalibrationSet()
        calls = []

        def compute():
            calls.append(1)
            return CalibrationCurve({4: 1.0}, "ceiling", 1.0, 10, "cosine")

        threads = [threading.Thread(
            target=lambda: s.get_or_compute(10, "cosine", compute))
            for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(calls) == 1
        assert s.dirty

    def test_json_roundtrip_and_legacy(self):
        s = CalibrationSet()
        s.put(CalibrationCurve({4: 0.5, 64: 0.9}, "exact", 0.9, 10, "dot"))
        s2 = CalibrationSet.from_json(s.to_json())
        assert s2.get(10, "dot").ceiling == 0.9
        leg = CalibrationSet.from_legacy({4: 0.7, 512: 1.0})
        assert leg.get(10, "cosine").mode == "ceiling"


class TestMeasure:
    def test_exact_vs_ceiling_modes(self):
        # fake layout: nprobe p returns the first ~p/64 of truth; truth
        # itself is offset so even deep misses 20% (the "ceiling")
        truth = np.arange(10)[None, :].repeat(4, axis=0)

        def search_rows(qs, k, nprobe):
            frac = min(1.0, nprobe / 64.0)
            got = np.full((len(qs), k), -1, np.int64)
            keep = max(1, int(k * frac))
            got[:, :keep] = truth[:, :keep]
            if nprobe >= 512:  # deep probe: 8/10 of truth
                got[:, :k] = truth[:, :k]
                got[:, 8:] = 1000 + np.arange(k - 8)
            return got

        q = np.zeros((4, 8), np.float32)
        ceil_curve = measure_curve(search_rows, q, k=10, metric="cosine",
                                   deep=512)
        assert ceil_curve.mode == "ceiling" and ceil_curve.ceiling == 1.0
        ex = measure_curve(search_rows, q, k=10, metric="cosine", deep=512,
                           ground_truth=truth)
        assert ex.mode == "exact"
        assert ex.ceiling == pytest.approx(0.8)
        assert ex.curve[512] == pytest.approx(0.8)

    def test_empty_queries_raise(self):
        with pytest.raises(ValueError):
            measure_curve(lambda q, k, p: q, np.zeros((0, 4), np.float32),
                          k=5, metric="cosine", deep=512)

    def test_recall_vs_ignores_missing(self):
        ref = np.asarray([[1, 2, -1]])
        got = np.asarray([[2, 9, 1]])
        assert recall_vs(ref, got, 3) == 1.0


# --------------------------------------------------------- index-level exact


class TestCellProbeExact:
    @pytest.fixture(scope="class")
    def built(self):
        data, held = _clustered(20_000, 32)
        rows = np.arange(len(data), dtype=np.int64)
        idx = CellProbeIndex.build(data, rows, cell_rows=64, cell_cap=96,
                                   iters=8)
        return data, held, idx

    def test_absolute_recall_meets_target(self, built):
        data, held, idx = built
        gt = exact_ground_truth(data, held, k=10, metric="cosine")
        idx.calibrate_nprobe(queries=held, k=10, metric="cosine",
                             ground_truth=gt)
        cal = idx._calib.get(10, "cosine")
        assert cal.mode == "exact"
        assert 0.5 < cal.ceiling <= 1.0
        # pick an achievable target and verify it on held-out EVAL queries
        target = min(0.9, cal.ceiling - 0.02)
        _, eval_held = _clustered(1, 32, seed=77)
        gt_eval = exact_ground_truth(data, eval_held, k=10, metric="cosine")
        _, got = idx.search(eval_held, k=10, recall_target=target,
                            metric="cosine")
        measured = recall_vs(gt_eval, got, 10)
        assert measured >= target - 0.05, (measured, target)

    def test_above_ceiling_rejected(self, built):
        data, held, idx = built
        cal = idx._calib.get(10, "cosine")
        if cal is None or cal.mode != "exact":
            gt = exact_ground_truth(data, held, k=10, metric="cosine")
            idx.calibrate_nprobe(queries=held, k=10, metric="cosine",
                                 ground_truth=gt)
            cal = idx._calib.get(10, "cosine")
        if cal.ceiling >= 1.0 - 1e-9:
            pytest.skip("layout is lossless on this corpus")
        with pytest.raises(RecallUnachievable):
            idx.search(held[:2], k=10, metric="cosine",
                       recall_target=min(1.0, cal.ceiling + 0.01))

    def test_keyed_lazy_calibration(self, built):
        data, held, idx = built
        if idx._calib.get(10, "cosine") is None:  # self-sufficient ordering
            gt = exact_ground_truth(data, held, k=10, metric="cosine")
            idx.calibrate_nprobe(queries=held, k=10, metric="cosine",
                                 ground_truth=gt)
        # a k=5 search must NOT reuse the k=10 curve: it lazily builds its
        # own (ceiling-mode) entry under the (5, cosine) key
        assert idx._calib.get(5, "cosine") is None
        idx.search(held[:2], k=5, recall_target=0.8, metric="cosine")
        lazy = idx._calib.get(5, "cosine")
        assert lazy is not None and lazy.mode == "ceiling" and lazy.k == 5
        # and an exact k=10 curve still lives alongside it
        assert idx._calib.get(10, "cosine").mode == "exact"

    def test_persistence_roundtrip_keeps_mode(self, built):
        data, held, idx = built
        if idx._calib.get(10, "cosine") is None:  # self-sufficient ordering
            gt = exact_ground_truth(data, held, k=10, metric="cosine")
            idx.calibrate_nprobe(queries=held, k=10, metric="cosine",
                                 ground_truth=gt)
        arrays = {k: np.asarray(v) for k, v in idx.to_arrays().items()}
        assert "calibrations" in arrays
        idx2 = CellProbeIndex.from_arrays(arrays)
        cal2 = idx2._calib.get(10, "cosine")
        assert cal2.mode == "exact"
        assert cal2.ceiling == idx._calib.get(10, "cosine").ceiling
        assert not idx2._calib.dirty  # restored curves are not re-written

    def test_empty_index_calibration_raises(self):
        idx = CellProbeIndex(
            np.zeros((2, 8), np.float32), np.zeros((8, 8), np.int8),
            np.ones(8, np.float32), np.zeros(8, np.float32),
            np.zeros(8, bool), np.full(8, -1, np.int64), 4)
        with pytest.raises(ValueError):
            idx.calibrate_nprobe(k=5)

    def test_ground_truth_requires_queries(self, built):
        data, held, idx = built
        with pytest.raises(ValueError):
            idx.calibrate_nprobe(ground_truth=np.zeros((4, 10), np.int64))


class TestEPCellProbeExact:
    def test_empty_index_raises(self):
        import jax

        from erlvectordb_tpu.parallel.ep_cell_probe import EPCellProbeIndex
        from erlvectordb_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=len(jax.devices()), n_replica=1)
        n_cells = 8 * len(jax.devices())
        idx = EPCellProbeIndex(
            mesh, np.full((n_cells, 8), 1e6, np.float32),
            np.zeros((n_cells * 4, 8), np.int8),
            np.ones(n_cells * 4, np.float32),
            np.zeros(n_cells * 4, np.float32),
            np.zeros(n_cells * 4, bool),
            np.full(n_cells * 4, -1, np.int64), 4)
        with pytest.raises(ValueError):
            idx.calibrate_nprobe(k=5)


# --------------------------------------------------------- store-level exact


class TestStoreExact:
    @pytest.fixture(scope="class")
    def store(self):
        data, held = _clustered(8_000, 24)
        st = VectorStore.from_matrix("calx", data, dtype="int4r")
        return data, held, st

    def test_exact_mode_curve_and_guarantee(self, store):
        data, held, st = store
        gt = exact_ground_truth(data, held, k=10, metric="cosine")
        st.calibrate_nprobe(queries=held, k=10, metric="cosine",
                            ground_truth=gt)
        cal = st._calib.get(10, "cosine")
        assert cal.mode == "exact" and cal.ceiling <= 1.0
        target = max(0.5, cal.ceiling - 0.05)
        _, eval_held = _clustered(1, 24, seed=99)
        gt_eval = exact_ground_truth(data, eval_held, k=10, metric="cosine")
        results = st.search_batch(eval_held, k=10, recall_target=target)
        got = np.full((len(eval_held), 10), -1, np.int64)
        for i, hits in enumerate(results):
            for j, (vid, _m, _d) in enumerate(hits):
                got[i, j] = int(vid)  # implicit ids == original positions
        assert recall_vs(gt_eval, got, 10) >= target - 0.05

    def test_above_ceiling_rejected_through_search(self, store):
        data, held, st = store
        cal = st._calib.get(10, "cosine")
        if cal.ceiling >= 1.0 - 1e-9:
            pytest.skip("lossless on this corpus")
        with pytest.raises(RecallUnachievable):
            st.search(held[0], k=10,
                      recall_target=min(1.0, cal.ceiling + 0.01))

    def test_exact_mode_survives_snapshot(self, store, tmp_path):
        from erlvectordb_tpu.persist.snapshot import load_store, save_store

        data, held, st = store
        save_store(st, tmp_path)
        st2 = load_store("calx", tmp_path)
        cal = st2._calib.get(10, "cosine")
        assert cal is not None and cal.mode == "exact"
        assert cal.ceiling == st._calib.get(10, "cosine").ceiling

    def test_stats_surface_calibration(self, store):
        data, held, st = store
        stats = st.get_stats()
        assert any(c["mode"] == "exact" for c in stats["calibration"])


# --------------------------------------------------- index-manager + facade


class TestIndexManagerCalibrate:
    @pytest.fixture()
    def mgr(self):
        from erlvectordb_tpu.core.index_manager import IndexManager
        from erlvectordb_tpu.core.registry import StoreRegistry

        reg = StoreRegistry()
        st = reg.create("imx", metric="cosine")
        data, held = _clustered(6_000, 16, seed=5)
        st.insert_batch([str(i) for i in range(len(data))], data)
        mgr = IndexManager(reg)
        mgr.create_index("cp", "imx", "cellprobe", {"cell_rows": 48})
        mgr.build_index("cp", wait=True)
        return mgr, held

    def test_exact_calibration_from_store_rows(self, mgr):
        m, held = mgr
        out = m.calibrate_index("cp", queries=held, k=10, mode="exact")
        assert out["mode"] == "exact" and 0 < out["ceiling"] <= 1.0
        assert out["curve"]
        info = m.get_index_info("cp")
        assert info["calibration"][0]["mode"] == "exact"
        assert "cp" in m.dirty_calibrations()

    def test_ceiling_mode_and_bad_modes(self, mgr):
        m, held = mgr
        out = m.calibrate_index("cp", k=5, mode="ceiling")
        assert out["mode"] == "ceiling" and out["ceiling"] == 1.0
        with pytest.raises(ValueError):
            m.calibrate_index("cp", mode="bogus")

    def test_non_cellprobe_rejected(self, mgr):
        m, held = mgr
        m.create_index("fl", "imx", "flat")
        with pytest.raises(ValueError):
            m.calibrate_index("fl")

    def test_search_rejects_nprobe_zero(self, mgr):
        m, held = mgr
        with pytest.raises(ValueError):
            m.search("cp", held[0], k=5, nprobe=0)


class TestServingValidation:
    def test_probe_kwargs_rejects_degenerate(self):
        from erlvectordb_tpu.serve.tools import ToolError, probe_kwargs

        assert probe_kwargs({}) == {}
        assert probe_kwargs({"nprobe": 8}) == {"nprobe": 8}
        assert probe_kwargs({"recall_target": 0.9}) == {"recall_target": 0.9}
        for bad in ({"nprobe": 0}, {"nprobe": -3}, {"recall_target": 0.0},
                    {"recall_target": 1.5},
                    {"nprobe": 4, "recall_target": 0.9}):
            with pytest.raises(ToolError):
                probe_kwargs(bad)

    def test_tool_error_is_value_error(self):
        from erlvectordb_tpu.serve.tools import ToolError

        assert issubclass(ToolError, ValueError)
