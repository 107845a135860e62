"""Recall-under-churn for int4r cell stores (VERDICT r2 weak #9).

Builds a cell store, churns it (+20% inserts, -10% deletes), and asserts
multiprobe recall stays within a small margin of a FRESH rebuild of the
final corpus — cell drift is how partition indexes rot.  Also covers the
drift counters, the is_stale trigger, rebuild_cells, and the Database
maintenance wiring.  Scaled down for CI; the measured large-scale churn
datapoint lives in BENCH_NOTES.md.
"""

import numpy as np
import pytest

from erlvectordb_tpu.core.store import VectorStore


def _recall(store, queries, truth, k=10, nprobe=8):
    got = store.search_batch(queries, k=k, nprobe=nprobe)
    tot = 0.0
    for i, hits in enumerate(got):
        ids = {h[0] for h in hits}
        tot += len(ids & set(truth[i])) / k
    return tot / len(got)


def _truth(corpus_ids, corpus, queries, k=10):
    sims = (queries @ corpus.T) / (
        np.linalg.norm(queries, axis=1)[:, None]
        * np.maximum(np.linalg.norm(corpus, axis=1)[None, :], 1e-9))
    top = np.argsort(-sims, axis=1)[:, :k]
    return [[corpus_ids[j] for j in row] for row in top]


@pytest.fixture(scope="module")
def churned():
    rng = np.random.default_rng(31)
    n, d = 6000, 48
    centers = rng.standard_normal((40, d)).astype(np.float32) * 2
    base = (centers[rng.integers(0, 40, n)]
            + 0.6 * rng.standard_normal((n, d))).astype(np.float32)
    extra = (centers[rng.integers(0, 40, n // 5)]
             + 0.6 * rng.standard_normal((n // 5, d))).astype(np.float32)

    store = VectorStore.from_matrix("churn1", base, dtype="int4r")
    # +20% inserts
    store.insert_batch([f"x{i}" for i in range(len(extra))], extra)
    # -10% deletes (of the original rows)
    dead = rng.choice(n, n // 10, replace=False)
    store.delete_batch([str(i) for i in dead])

    live_ids = [str(i) for i in range(n) if i not in set(dead.tolist())]
    live_ids += [f"x{i}" for i in range(len(extra))]
    final = np.concatenate(
        [base[np.setdiff1d(np.arange(n), dead)], extra])
    queries = (centers[rng.integers(0, 40, 200)]
               + 0.6 * rng.standard_normal((200, d))).astype(np.float32)
    return store, final, live_ids, queries


class TestChurnRecall:
    def test_recall_within_margin_of_fresh_rebuild(self, churned):
        store, final, live_ids, queries = churned
        truth = _truth(live_ids, final, queries)
        r_churned = _recall(store, queries, truth)

        fresh = VectorStore.from_matrix("churn-fresh", final, ids=live_ids,
                                        dtype="int4r")
        r_fresh = _recall(fresh, queries, truth)
        assert r_churned >= r_fresh - 0.03, (r_churned, r_fresh)

    def test_drift_counters_and_staleness(self, churned):
        store, final, _, _ = churned
        d = store.drift()
        assert d["inserts_since_build"] == 1200
        assert d["deletes_since_build"] == 600
        assert abs(d["fraction"] - 1800 / 6000) < 1e-9
        assert store.is_stale(threshold=0.25)
        assert not store.is_stale(threshold=0.5)

    def test_rebuild_cells_restores_freshness(self, churned):
        store, final, live_ids, queries = churned
        truth = _truth(live_ids, final, queries)
        r_churned = _recall(store, queries, truth)
        drift = store.rebuild_cells()
        assert drift["fraction"] == 0.0
        assert not store.is_stale(0.01)
        assert store.count == len(live_ids)
        r_rebuilt = _recall(store, queries, truth)
        # the honest baseline: a fresh build of what the refit can SEE —
        # the dequantized corpus (int4r keeps no f32 originals, so one
        # re-quantization generation is inherent; see rebuild_cells doc)
        dequant = np.stack([store.get(i)[0] for i in live_ids])
        fresh_q = VectorStore.from_matrix("churn-fresh2", dequant,
                                          ids=live_ids, dtype="int4r")
        r_fresh_q = _recall(fresh_q, queries, truth)
        assert r_rebuilt >= r_fresh_q - 0.02
        # vs the churned layout: the refit trades one re-quantization
        # generation (~2-3 pts here) for a clean layout; at THIS mild churn
        # level that's roughly a wash — the default refit_threshold (0.5)
        # is set where layout rot clearly exceeds the generation cost
        assert r_rebuilt >= r_churned - 0.04


class TestMaintenanceWiring:
    def test_database_refits_stale_store(self, tmp_path):
        from erlvectordb_tpu.api import Database
        from erlvectordb_tpu.infra.config import load_config

        cfg = load_config(overrides={
            "persistence_enabled": False, "refit_threshold": 0.3,
            "oauth_enabled": False})
        db = Database(cfg)
        rng = np.random.default_rng(5)
        base = rng.standard_normal((400, 16)).astype(np.float32)
        store = VectorStore.from_matrix("m1", base, dtype="int4r")
        db.registry.adopt(store)
        store.insert_batch([f"x{i}" for i in range(200)],
                           rng.standard_normal((200, 16)).astype(np.float32))
        assert store.is_stale(0.3)
        assert db._refit_stale_stores() == 1
        assert not store.is_stale(0.3)
        assert db._refit_stale_stores() == 0  # nothing left to refit

    def test_threshold_zero_disables(self):
        from erlvectordb_tpu.api import Database
        from erlvectordb_tpu.infra.config import load_config

        db = Database(load_config(overrides={
            "persistence_enabled": False, "refit_threshold": 0.0,
            "oauth_enabled": False}))
        assert db._refit_stale_stores() == 0
