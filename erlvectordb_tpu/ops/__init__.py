from erlvectordb_tpu.ops.kmeans import kmeans_fit, kmeans_fit_subspaces  # noqa: F401
