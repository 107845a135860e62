from erlvectordb_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    REPLICA_AXIS,
    init_distributed,
    make_mesh,
    mesh_shape,
    single_device_mesh,
)
from erlvectordb_tpu.parallel.sharded_store import ShardedVectorStore  # noqa: F401
from erlvectordb_tpu.parallel.cluster import ClusterError, ClusterManager  # noqa: F401
