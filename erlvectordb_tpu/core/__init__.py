from erlvectordb_tpu.core.store import (  # noqa: F401
    VectorStore,
    DimensionMismatch,
    InvalidVector,
)
from erlvectordb_tpu.core.registry import (  # noqa: F401
    StoreRegistry,
    StoreExists,
    StoreNotFound,
)
from erlvectordb_tpu.core import search  # noqa: F401
