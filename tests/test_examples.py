"""Demo-client tests (the gemini_mcp_client.py analogue): smart insert /
smart search against a live server with the local hashing embedder."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from erlvectordb_tpu.app import Application
from erlvectordb_tpu.infra.config import load_config
from erlvectordb_tpu.serve.client import VectorDBClient
from examples.ai_demo_client import DEMO_DOCS, HashingEmbedder, SmartClient

BASE = 24500


@pytest.fixture(scope="module")
def app(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("examples")
    cfg = load_config(overrides={
        "services": {
            "mcp_server": {"preferred_port": BASE, "range": (BASE, BASE + 9)},
            "oauth_server": {"preferred_port": BASE + 10, "range": (BASE + 10, BASE + 19)},
            "rest_api": {"preferred_port": BASE + 20, "range": (BASE + 20, BASE + 29)},
            "health_check": {"preferred_port": BASE + 30, "range": (BASE + 30, BASE + 39)},
        },
        "persistence_dir": str(tmp / "data"),
        "backup_dir": str(tmp / "backups"),
        "sync_interval": 9999,
        "rest_api_enabled": False,
    }, env={})
    application = Application(cfg).start()
    yield application
    application.stop()


def test_hashing_embedder_properties():
    e = HashingEmbedder(dim=64)
    v1 = e.embed("tensor processing units multiply matrices")
    v2 = e.embed("tensor processing units multiply matrices")
    assert v1 == v2  # deterministic
    assert len(v1) == 64
    assert abs(sum(x * x for x in v1) - 1.0) < 1e-6  # unit norm
    # related text is closer than unrelated text
    sim_related = sum(a * b for a, b in zip(
        v1, e.embed("units that multiply matrices: tensor processors")))
    sim_unrelated = sum(a * b for a, b in zip(
        v1, e.embed("baking sourdough requires patient fermentation")))
    assert sim_related > sim_unrelated


def test_mcp_client_example_end_to_end(app, monkeypatch, capsys):
    """The standalone example script (examples/mcp_client.py, the analogue
    of the reference's runnable mcp_client.py) passes every step against a
    live server and exits 0."""
    from examples import mcp_client as example

    monkeypatch.setattr(sys, "argv", [
        "mcp_client.py",
        "--port", str(app.service_port("mcp_server")),
        "--oauth-url",
        f"http://127.0.0.1:{app.service_port('oauth_server')}/oauth/token",
        "--count", "40", "--searches", "3", "--dim", "16",
    ])
    assert example.main() == 0
    out = capsys.readouterr().out
    assert "all steps passed." in out
    assert "self-hit check: 3/3" in out


def test_smart_insert_and_search(app):
    client = VectorDBClient(
        mcp_port=app.service_port("mcp_server"),
        oauth_url=f"http://127.0.0.1:{app.service_port('oauth_server')}/oauth/token",
    )
    smart = SmartClient(client, store="demo_docs")
    try:
        smart.ensure_store()
        for doc_id, text in DEMO_DOCS.items():
            smart.smart_insert(doc_id, text)
        hits = smart.smart_search("how do TPUs multiply matrices fast?", k=2)
        assert hits[0]["id"] == "doc_tpu"
        assert "explanation" in hits[0]
        hits = smart.smart_search("compressing embeddings into codes", k=2)
        assert hits[0]["id"] == "doc_pq"
    finally:
        client.close()
