from erlvectordb_tpu.utils import vector_math  # noqa: F401
