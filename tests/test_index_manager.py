"""Index manager tests — the reference's index_manager is simulated
(sleep + fake stats, src/vector_index_manager.erl:58-66); these verify OURS
actually builds and that search consults the built artifact."""

import numpy as np
import pytest

from erlvectordb_tpu.core import StoreRegistry
from erlvectordb_tpu.core.index_manager import IndexError_, IndexManager
from erlvectordb_tpu.core.store import VectorStore


@pytest.fixture
def setup(rng):
    registry = StoreRegistry()
    store = registry.create("s", metric="euclidean")
    data = rng.standard_normal((600, 32)).astype(np.float32)
    store.insert_batch([f"v{i}" for i in range(600)], data)
    return registry, IndexManager(registry), data


class TestRegistry:
    def test_create_and_list(self, setup):
        _, im, _ = setup
        info = im.create_index("i1", "s", "flat")
        assert info["built"]  # flat needs no build
        assert [i["name"] for i in im.list_indexes()] == ["i1"]

    def test_duplicate_rejected(self, setup):
        _, im, _ = setup
        im.create_index("i1", "s", "flat")
        with pytest.raises(IndexError_):
            im.create_index("i1", "s", "flat")

    def test_unknown_type(self, setup):
        _, im, _ = setup
        with pytest.raises(IndexError_):
            im.create_index("i1", "s", "btree")

    def test_unknown_store(self, setup):
        _, im, _ = setup
        with pytest.raises(Exception):
            im.create_index("i1", "ghost", "flat")

    def test_drop(self, setup):
        _, im, _ = setup
        im.create_index("i1", "s", "flat")
        assert im.drop_index("i1")
        assert not im.drop_index("i1")


class TestBuilds:
    def test_int8_build_and_search(self, setup):
        _, im, data = setup
        im.create_index("q8", "s", "int8")
        info = im.build_index("q8")
        assert info["built"] and not info["error"]
        assert info["build_seconds"] is not None
        assert info["stats"]["kind"] == "int8"
        hits = im.search("q8", data[42], k=1)
        assert hits[0][0] == "v42"

    def test_pq_build_and_search(self, setup):
        _, im, data = setup
        im.create_index("pq1", "s", "pq", {"m": 8, "iters": 8})
        info = im.build_index("pq1")
        assert info["built"], info["error"]
        assert info["stats"]["code_bytes_per_vector"] == 8
        hits = im.search("pq1", data[7], k=10)
        assert "v7" in [h[0] for h in hits[:3]]  # PQ is approximate

    def test_pq_recall(self, setup):
        registry, im, data = setup
        im.create_index("pq1", "s", "pq", {"m": 8, "iters": 10})
        im.build_index("pq1")
        store = registry.get("s")
        recalls = []
        for i in range(10):
            exact = {h[0] for h in store.search(data[i], k=10)}
            approx = {h[0] for h in im.search("pq1", data[i], k=10)}
            recalls.append(len(exact & approx) / 10)
        assert np.mean(recalls) >= 0.5  # small random corpus, modest bar

    def test_async_build(self, setup):
        import time

        _, im, data = setup
        im.create_index("q8", "s", "int8")
        info = im.build_index("q8", wait=False)
        deadline = time.time() + 30
        while time.time() < deadline:
            info = im.get_index_info("q8")
            if info["built"] or info["error"]:
                break
            time.sleep(0.02)
        assert info["built"]

    def test_staleness(self, setup):
        registry, im, data = setup
        im.create_index("q8", "s", "int8")
        im.build_index("q8")
        assert not im.is_stale("q8")
        registry.get("s").insert("new", np.ones(32, np.float32))
        assert im.is_stale("q8")
        im.build_index("q8")  # rebuild clears staleness
        assert not im.is_stale("q8")

    def test_probe_knob_overrides(self, setup):
        """Per-request nprobe / recall_target override the build-time probe
        width on probed index families; non-probed types reject them."""
        _, im, data = setup
        im.create_index("cp1", "s", "cellprobe", {"nprobe": 2})
        info = im.build_index("cp1")
        assert info["built"], info["error"]
        hits = im.search("cp1", data[11], k=3, nprobe=8)
        assert hits[0][0] == "v11"
        # recall_target lazily calibrates, then answers correctly
        hits = im.search("cp1", data[23], k=3, recall_target=0.9)
        assert hits[0][0] == "v23"
        with pytest.raises(ValueError, match="not both"):
            im.search("cp1", data[0], k=1, nprobe=4, recall_target=0.9)
        # ivf takes nprobe but not recall_target
        im.create_index("iv1", "s", "ivf", {"nprobe": 2})
        assert im.build_index("iv1")["built"]
        assert im.search("iv1", data[5], k=3, nprobe=8)[0][0] == "v5"
        with pytest.raises(ValueError, match="cellprobe-family"):
            im.search("iv1", data[0], k=1, recall_target=0.9)
        # non-probed types reject both knobs
        im.create_index("q8k", "s", "int8")
        im.build_index("q8k")
        with pytest.raises(ValueError, match="no probe knob"):
            im.search("q8k", data[0], k=1, nprobe=4)

    def test_build_empty_store_fails(self, setup):
        registry, im, _ = setup
        registry.create("empty", dim=4)
        im.create_index("e1", "empty", "int8")
        info = im.build_index("e1")
        assert not info["built"]
        assert "empty" in info["error"]

    def test_search_unbuilt_fails(self, setup):
        _, im, data = setup
        im.create_index("q8", "s", "int8")
        with pytest.raises(IndexError_):
            im.search("q8", data[0], k=1)


class TestDatabaseIntegration:
    def test_facade_verbs(self, rng, tmp_path):
        from erlvectordb_tpu.api import Database
        from erlvectordb_tpu.infra.config import load_config

        db = Database(load_config(overrides={
            "persistence_enabled": False}, env={}))
        db.create_store("s1")
        data = rng.standard_normal((300, 16)).astype(np.float32)
        db.insert_batch("s1", [f"v{i}" for i in range(300)], data)
        db.create_index("idx", "s1", "int8")
        db.build_index("idx")
        hits = db.search_index("idx", data[5], k=1)
        assert hits[0][0] == "v5"
        assert db.get_index_info("idx")["built"]
        assert db.drop_index("idx")


class TestOPQIndex:
    def test_opq_build_and_search(self, setup):
        _, im, data = setup
        im.create_index("opq1", "s", "opq", {"m": 8, "iters": 8, "opq_iters": 2})
        info = im.build_index("opq1")
        assert info["built"], info["error"]
        assert info["stats"]["kind"] == "opq"
        hits = im.search("opq1", data[7], k=10)
        assert "v7" in [h[0] for h in hits[:3]]


class TestIndexPersistence:
    def test_save_load_roundtrip(self, setup, tmp_path):
        registry, im, data = setup
        im.create_index("p8", "s", "int8")
        im.build_index("p8")
        im.create_index("ppq", "s", "pq", {"m": 8, "iters": 6})
        im.build_index("ppq")
        im.save_all(tmp_path)
        im2 = IndexManager(registry)
        loaded = im2.load_indexes(tmp_path)
        assert set(loaded) == {"p8", "ppq"}
        assert im2.search("p8", data[42], k=1)[0][0] == "v42"
        hits = im2.search("ppq", data[7], k=5)
        assert "v7" in [h[0] for h in hits]

    def test_load_skips_missing_store(self, setup, tmp_path):
        registry, im, _ = setup
        im.create_index("p8", "s", "int8")
        im.build_index("p8")
        im.save_all(tmp_path)
        from erlvectordb_tpu.core import StoreRegistry

        im2 = IndexManager(StoreRegistry())  # store 's' absent
        assert im2.load_indexes(tmp_path) == []

    def test_load_pre_norms_artifact(self, setup, tmp_path):
        """Regression (ADVICE r2): int8 artifacts saved before norms/valid
        were persisted must re-hydrate from the live store instead of
        raising KeyError and aborting Database.start()."""
        registry, im, data = setup
        im.create_index("old8", "s", "int8")
        im.build_index("old8")
        im.save_all(tmp_path)
        idir = tmp_path / "idx_old8"
        with np.load(idir / "arrays.npz") as z:
            arrays = {k: z[k] for k in z.files}
        arrays.pop("norms")
        arrays.pop("valid")
        np.savez(idir / "arrays.npz", **arrays)
        im2 = IndexManager(registry)
        assert im2.load_indexes(tmp_path) == ["old8"]
        assert im2.search("old8", data[42], k=1)[0][0] == "v42"

    def test_load_skips_corrupt_artifact(self, setup, tmp_path):
        """One unreadable artifact must not abort loading the others."""
        registry, im, data = setup
        im.create_index("good8", "s", "int8")
        im.build_index("good8")
        im.save_all(tmp_path)
        bad = tmp_path / "idx_bad"
        bad.mkdir()
        (bad / "meta.json").write_text('{"name": "bad", "store": "s", ')
        im2 = IndexManager(registry)
        assert im2.load_indexes(tmp_path) == ["good8"]

    def test_database_persists_indexes(self, rng, tmp_path):
        from erlvectordb_tpu.api import Database
        from erlvectordb_tpu.infra.config import load_config

        cfg = load_config(overrides={
            "persistence_dir": str(tmp_path / "data"),
            "backup_dir": str(tmp_path / "backups"),
            "sync_interval": 9999,
        }, env={})
        db = Database(cfg).start()
        db.create_store("ps")
        data = rng.standard_normal((200, 16)).astype(np.float32)
        db.insert_batch("ps", [f"v{i}" for i in range(200)], data)
        db.sync("ps")
        db.create_index("pidx", "ps", "int8")
        db.build_index("pidx")  # saved automatically
        db.stop()
        db2 = Database(cfg).start()
        try:
            assert db2.get_index_info("pidx")["built"]
            assert db2.search_index("pidx", data[3], k=1)[0][0] == "v3"
        finally:
            db2.stop()


class TestIndexHardening:
    def test_int8_index_survives_store_growth(self, tmp_path):
        """Regression: the int8 index scored build-time codes against the
        LIVE store's norms/valid — a capacity grow after build crashed with
        a broadcast shape mismatch."""
        reg = StoreRegistry()
        st = reg.create("g8", metric="cosine")
        rng = np.random.default_rng(0)
        data = rng.standard_normal((900, 8)).astype(np.float32)
        st.insert_batch([f"v{i}" for i in range(900)], data)
        im = IndexManager(reg)
        im.create_index("gi", "g8", "int8")
        info = im.build_index("gi")
        assert info["built"], info
        # same-capacity insert FIRST: a no-copy artifact alias would be
        # deleted by this scatter's buffer donation (RuntimeError)
        st.insert("x0", rng.standard_normal(8).astype(np.float32))
        hits = im.search("gi", data[5], k=1)
        assert hits[0][0] == "v5"
        # then grow capacity past the build-time 1024
        more = rng.standard_normal((2000, 8)).astype(np.float32)
        st.insert_batch([f"w{i}" for i in range(2000)], more)
        hits = im.search("gi", data[5], k=1)
        assert hits[0][0] == "v5"
        # and the snapshot persists/reloads
        im.save_index("gi", tmp_path)
        im2 = IndexManager(reg)
        assert "gi" in im2.load_indexes(tmp_path)
        assert im2.search("gi", data[7], k=1)[0][0] == "v7"

    def test_int8_index_rejects_packed_stores(self):
        """Regression: building an int8 index over an int4 store quantized
        the packed nibble bytes as float rows — a silently garbage index."""
        reg = StoreRegistry()
        st = reg.create("p4", dtype="int4")
        rng = np.random.default_rng(1)
        st.insert_batch([f"v{i}" for i in range(100)],
                        rng.standard_normal((100, 8)).astype(np.float32))
        im = IndexManager(reg)
        im.create_index("bad8", "p4", "int8")
        info = im.build_index("bad8")
        assert not info["built"]
        assert "float32" in (info["error"] or "")

    def test_delete_store_drops_dependent_indexes(self):
        from erlvectordb_tpu.api import Database
        from erlvectordb_tpu.infra.config import load_config

        db = Database(load_config(overrides={"persistence_enabled": False},
                                  env={}))
        db.create_store("ds")
        rng = np.random.default_rng(2)
        db.insert_batch("ds", [f"v{i}" for i in range(64)],
                        rng.standard_normal((64, 8)).astype(np.float32))
        db.create_index("dsi", "ds", "flat")
        assert db.delete_store("ds")
        assert db.indexes.get_index_info("dsi") is None
