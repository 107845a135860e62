from erlvectordb_tpu.quant.compression import (  # noqa: F401
    CompressedVector,
    SUPPORTED_ALGORITHMS,
    benchmark_compression,
    compress_batch,
    compress_vector,
    decompress_batch,
    decompress_vector,
    get_compression_ratio,
    get_supported_algorithms,
)
from erlvectordb_tpu.quant.pca import PCAModel  # noqa: F401
from erlvectordb_tpu.quant.pq import PQCodebook  # noqa: F401
from erlvectordb_tpu.quant.opq import OPQCodebook  # noqa: F401
from erlvectordb_tpu.quant import affine, codecs  # noqa: F401
