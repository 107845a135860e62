"""Device mesh construction — the "cluster" of the TPU-native design.

The reference scales by whole-store replication across distributed-Erlang
nodes with rpc data transfer (src/cluster_manager.erl:148-171, :370-380).
Here the cluster is a ``jax.sharding.Mesh`` with two axes:

  * ``data``    — the rows of every store are sharded across this axis;
                  per-shard local top-k + all_gather merge gives exact
                  global results (the DB analogue of data/sequence
                  parallelism over the corpus);
  * ``replica`` — full copies for availability and query throughput; the
                  query batch is split across replicas.

Multi-host pods: call :func:`init_distributed` first (wraps
``jax.distributed.initialize``) and build the mesh from ``jax.devices()`` —
collectives then ride ICI within a slice and DCN across slices.  CI uses 8
virtual CPU devices (tests/conftest.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
REPLICA_AXIS = "replica"


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join a multi-host process group (the ``join_cluster`` analogue —
    reference src/cluster_manager.erl:100-125 pings a seed node; here the
    JAX runtime handles membership and failure detection)."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    n_data: Optional[int] = None,
    n_replica: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (replica, data) mesh.

    Defaults: all visible devices, one replica group.  ``n_replica`` is the
    ``replication_factor`` analogue (reference config replication_factor).
    """
    devices = list(devices) if devices is not None else list(jax.devices())
    if n_data is None:
        if len(devices) % n_replica:
            raise ValueError(
                f"{len(devices)} devices not divisible by n_replica={n_replica}"
            )
        n_data = len(devices) // n_replica
    need = n_data * n_replica
    if need > len(devices):
        raise ValueError(f"need {need} devices, have {len(devices)}")
    grid = np.array(devices[:need]).reshape(n_replica, n_data)
    return Mesh(grid, (REPLICA_AXIS, DATA_AXIS))


def single_device_mesh(device: Optional[jax.Device] = None) -> Mesh:
    device = device or jax.devices()[0]
    return Mesh(np.array([[device]]), (REPLICA_AXIS, DATA_AXIS))


def mesh_shape(mesh: Mesh) -> dict:
    return {
        "replica": mesh.shape[REPLICA_AXIS],
        "data": mesh.shape[DATA_AXIS],
        "devices": int(np.prod(list(mesh.shape.values()))),
    }
