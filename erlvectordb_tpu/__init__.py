"""erlvectordb_tpu — a TPU-native vector database framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of ErlVectorDB
(an Erlang/OTP MCP-fronted vector store): multi-tenant stores as HBM-resident
arrays with batched matmul distance scans and fused top-k, real quantization
(int8/int4/PQ) searched in the compressed domain, mesh-sharded multi-chip
search with all_gather merge, snapshot persistence, and MCP/REST/OAuth
serving frontends.
"""

__version__ = "0.1.0"

from erlvectordb_tpu.core import (  # noqa: F401
    VectorStore,
    StoreRegistry,
    DimensionMismatch,
    InvalidVector,
    StoreExists,
    StoreNotFound,
)


def __getattr__(name):
    # lazy: Database/Application pull in serving deps; keep bare imports light
    if name == "Database":
        from erlvectordb_tpu.api import Database

        return Database
    if name == "Application":
        from erlvectordb_tpu.app import Application

        return Application
    raise AttributeError(name)
