#!/usr/bin/env python
"""AI-embedding demo client — smart insert / smart search with an LLM-backed
(or local) embedder.

Capability parity with the reference's Gemini demo client
(examples/gemini_mcp_client.py: Gemini-generated embeddings :146-179,
smart_insert/smart_search with AI explanation :277-334, run demo :342).
The embedder is pluggable:

  * ``HashingEmbedder``  — dependency-free deterministic feature-hashing
    embedder (tf-style token hashing + l2 norm), works offline;
  * ``CallableEmbedder`` — wrap any function (e.g. a Gemini / OpenAI /
    sentence-transformers call) returning a vector.

Usage:
    python examples/ai_demo_client.py           # run the demo
    (expects a server: python -m erlvectordb_tpu.cli serve)
"""

from __future__ import annotations

import hashlib
import math
import re
import sys
from typing import Callable, List, Optional, Sequence

sys.path.insert(0, ".")  # repo-root execution

from erlvectordb_tpu.serve.client import VectorDBClient  # noqa: E402


class HashingEmbedder:
    """Deterministic local text embedder: hashed bag-of-words + bigrams."""

    def __init__(self, dim: int = 256):
        self.dim = dim

    def _tokens(self, text: str) -> List[str]:
        words = re.findall(r"[a-z0-9]+", text.lower())
        return words + [f"{a}_{b}" for a, b in zip(words, words[1:])]

    def embed(self, text: str) -> List[float]:
        vec = [0.0] * self.dim
        for tok in self._tokens(text):
            h = int.from_bytes(hashlib.sha1(tok.encode()).digest()[:8], "big")
            idx = h % self.dim
            sign = 1.0 if (h >> 63) & 1 else -1.0
            vec[idx] += sign
        norm = math.sqrt(sum(x * x for x in vec)) or 1.0
        return [x / norm for x in vec]


class CallableEmbedder:
    def __init__(self, fn: Callable[[str], Sequence[float]]):
        self.fn = fn

    def embed(self, text: str) -> List[float]:
        return list(map(float, self.fn(text)))


class SmartClient:
    """smart_insert / smart_search: text in, similarity out."""

    def __init__(self, client: VectorDBClient, embedder=None,
                 store: str = "documents"):
        self.client = client
        self.embedder = embedder or HashingEmbedder()
        self.store = store

    def ensure_store(self) -> None:
        stats = self.client.tool("list_stores")
        if self.store not in stats["stores"]:
            self.client.create_store(self.store, metric="cosine")

    def smart_insert(self, doc_id: str, text: str,
                     metadata: Optional[dict] = None) -> dict:
        vec = self.embedder.embed(text)
        meta = {"text": text[:500], **(metadata or {})}
        return self.client.insert_vector(self.store, doc_id, vec, meta)

    def smart_search(self, query: str, k: int = 3) -> List[dict]:
        vec = self.embedder.embed(query)
        results = self.client.search_vectors(self.store, vec, k=k)
        for r in results:
            r["explanation"] = (
                f"matched with cosine distance {r['distance']:.3f} "
                f"(smaller is closer)"
            )
        return results


DEMO_DOCS = {
    "doc_tpu": "TPUs accelerate matrix multiplication with a systolic array "
               "called the MXU, fed from high bandwidth memory.",
    "doc_vectors": "A vector database stores embeddings and answers nearest "
                   "neighbor queries using cosine or euclidean distance.",
    "doc_erlang": "Erlang uses lightweight processes and supervisors to build "
                  "fault tolerant distributed systems on the BEAM.",
    "doc_pq": "Product quantization compresses vectors into small codes and "
              "searches them with asymmetric distance computation.",
}


def run_demo() -> int:
    import os

    # honor the bridge env-var matrix (docs/BRIDGE_SETUP.md) so the demo
    # follows fallback ports picked by the server's port manager
    mcp_port = int(os.environ.get("EVDB_MCP_PORT", "8080"))
    oauth_url = os.environ.get(
        "EVDB_OAUTH_URL", "http://127.0.0.1:8081/oauth/token")
    client = VectorDBClient(
        host=os.environ.get("EVDB_HOST", "127.0.0.1"),
        mcp_port=mcp_port, oauth_url=oauth_url,
    )
    smart = SmartClient(client)
    try:
        smart.ensure_store()
        for doc_id, text in DEMO_DOCS.items():
            smart.smart_insert(doc_id, text)
            print(f"inserted {doc_id}")
        for query in ("how do TPUs multiply matrices fast?",
                      "compressing embeddings for search"):
            print(f"\nquery: {query}")
            for hit in smart.smart_search(query, k=2):
                print(f"  {hit['id']}: {hit['explanation']}")
                print(f"    {hit['metadata'].get('text', '')[:80]}...")
        return 0
    finally:
        client.close()


if __name__ == "__main__":
    raise SystemExit(run_demo())
