"""Cluster manager — placement, health, and replica failover on a device mesh.

Capability parity with the reference's cluster layer
(src/cluster_manager.erl:19-29 exports): join/leave, node listing and status,
store distribution and location, cluster state sync, cluster stats.  The
mapping:

  reference                         TPU-native
  ---------                         ----------
  distributed-Erlang node           a device (single-host) / process (pod)
  replication_factor node copies    the mesh's replica axis
  distribute_store (rpc start)      ShardedVectorStore on the mesh
  per-vector rpc migration          bulk resharding transfer
  nodedown -> log + prune           fail_device -> rebuild mesh WITHOUT the
                                    dead replica group and reshard every
                                    store onto it (actual re-protection,
                                    which the reference never does —
                                    src/cluster_manager.erl:408-425)
  heartbeats (5 s casts)            on-demand per-device liveness probe
                                    (a tiny computation on each device)

Multi-host: ``join_cluster`` wraps ``jax.distributed.initialize`` — the JAX
runtime then owns membership; everything else here works unchanged on the
bigger device set.
"""

from __future__ import annotations

import threading
import time
from typing import Dict, List, Optional

import jax
import numpy as np
from jax.sharding import Mesh

from erlvectordb_tpu.parallel.mesh import DATA_AXIS, REPLICA_AXIS
from erlvectordb_tpu.parallel.sharded_store import ShardedVectorStore


class ClusterError(RuntimeError):
    pass


class ClusterManager:
    """Single-controller cluster state: mesh + placements + health."""

    def __init__(
        self,
        devices: Optional[List[jax.Device]] = None,
        replication_factor: int = 1,
        n_data: Optional[int] = None,
    ):
        self._all_devices = list(devices) if devices is not None else list(jax.devices())
        self.replication_factor = replication_factor
        if n_data is None:
            n_data = len(self._all_devices) // replication_factor
        if n_data < 1:
            raise ClusterError(
                f"replication_factor {replication_factor} exceeds the "
                f"{len(self._all_devices)} available device(s): no complete "
                "replica group can form")
        self.n_data = n_data
        self._failed: set = set()  # device ids marked dead
        self._stores: Dict[str, ShardedVectorStore] = {}
        self._lock = threading.RLock()
        self._state_version = 0
        self._mesh = self._build_mesh()

    # ------------------------------------------------------------- topology

    def _healthy_devices(self) -> List[jax.Device]:
        return [d for d in self._all_devices if d.id not in self._failed]

    def _build_mesh(self) -> Mesh:
        """Mesh of (healthy replica groups) x n_data.

        A replica group is a contiguous row of ``n_data`` devices; any
        failed member poisons its whole group (its shards are incomplete).
        """
        groups: List[List[jax.Device]] = []
        for i in range(0, len(self._all_devices) - self.n_data + 1, self.n_data):
            row = self._all_devices[i : i + self.n_data]
            if all(d.id not in self._failed for d in row):
                groups.append(row)
        if not groups:
            raise ClusterError("no complete replica group of healthy devices remains")
        grid = np.array(groups)
        return Mesh(grid, (REPLICA_AXIS, DATA_AXIS))

    @property
    def mesh(self) -> Mesh:
        return self._mesh

    # --------------------------------------------------- membership analogue

    def join_cluster(
        self,
        coordinator_address: Optional[str] = None,
        num_processes: Optional[int] = None,
        process_id: Optional[int] = None,
    ) -> dict:
        """Join a multi-host process group, then rebuild from the enlarged
        device set (reference join_cluster, src/cluster_manager.erl:100-125)."""
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        self._all_devices = list(jax.devices())
        self.n_data = max(
            1, len(self._all_devices) // max(self.replication_factor, 1))
        self._mesh = self._build_mesh()
        self._resync_stores()
        return self.get_cluster_stats()

    def leave_cluster(self) -> dict:
        """Collapse every store to this process's local devices before
        leaving (the reference migrates sole-copy stores before leaving,
        src/cluster_manager.erl:334-380 — ours is one resharding transfer)."""
        local = [d for d in jax.local_devices()]
        with self._lock:
            self._all_devices = local
            self.n_data = max(1, len(local) // max(self.replication_factor, 1))
            self._failed.clear()
            old_stores = dict(self._stores)
            self._mesh = self._build_mesh()
            for name, sh in old_stores.items():
                # data-axis size may change on leave: rebuild via bulk copy
                self._stores[name] = ShardedVectorStore.from_store(sh, self._mesh, name)
            self._state_version += 1
        return self.get_cluster_stats()

    # ------------------------------------------------------------- placement

    def distribute_store(self, store, name: Optional[str] = None) -> ShardedVectorStore:
        """Place a store onto the mesh (reference distribute_store :148-171).
        Accepts a VectorStore (migrates its data) or creates empty from spec."""
        with self._lock:
            if isinstance(store, ShardedVectorStore):
                sharded = store
                if sharded.mesh is not self._mesh:
                    sharded = ShardedVectorStore.from_store(store, self._mesh, name)
            elif isinstance(store, str):
                sharded = ShardedVectorStore(store, self._mesh)
            else:
                sharded = ShardedVectorStore.from_store(store, self._mesh, name)
            self._stores[sharded.name] = sharded
            self._state_version += 1
            return sharded

    def undistribute_store(self, name: str) -> bool:
        with self._lock:
            hit = self._stores.pop(name, None) is not None
            if hit:
                self._state_version += 1
            return hit

    def get_store(self, name: str) -> Optional[ShardedVectorStore]:
        return self._stores.get(name)

    def get_store_location(self, name: str) -> Optional[dict]:
        """Which devices hold each shard (reference get_store_location)."""
        sh = self._stores.get(name)
        if sh is None:
            return None
        mesh_devs = np.asarray(self._mesh.devices)
        return {
            "store": name,
            "shards": sh.n_shards,
            "replicas": sh.n_replicas,
            "placement": {
                f"shard_{s}": [str(mesh_devs[r, s]) for r in range(sh.n_replicas)]
                for s in range(sh.n_shards)
            },
        }

    def get_store_distribution(self) -> Dict[str, dict]:
        return {name: self.get_store_location(name) for name in self._stores}

    # ---------------------------------------------------------------- health

    def get_cluster_nodes(self) -> List[str]:
        return [str(d) for d in self._healthy_devices()]

    def get_node_status(self) -> List[dict]:
        out = []
        for d in self._all_devices:
            out.append(
                {
                    "device": str(d),
                    "id": d.id,
                    "platform": d.platform,
                    "process_index": d.process_index,
                    "healthy": d.id not in self._failed,
                }
            )
        return out

    def probe_devices(self) -> Dict[int, bool]:
        """Liveness probe: run a tiny computation on every device
        (the heartbeat analogue, reference :238-244)."""
        results: Dict[int, bool] = {}
        for d in self._all_devices:
            try:
                x = jax.device_put(np.ones((8,), np.float32), d)
                results[d.id] = bool(abs(float(x.sum()) - 8.0) < 1e-6)
            except Exception:
                results[d.id] = False
        return results

    # ---------------------------------------------------------- failover

    def fail_device(self, device_id: int) -> dict:
        """Mark a device dead and re-protect: rebuild the mesh without its
        replica group and reshard every store onto the survivors."""
        with self._lock:
            if device_id not in {d.id for d in self._all_devices}:
                raise ClusterError(f"unknown device id {device_id}")
            self._failed.add(device_id)
            self._mesh = self._build_mesh()
            self._resync_stores()
            self._state_version += 1
            return self.get_cluster_stats()

    def recover_device(self, device_id: int) -> dict:
        with self._lock:
            self._failed.discard(device_id)
            self._mesh = self._build_mesh()
            self._resync_stores()
            self._state_version += 1
            return self.get_cluster_stats()

    def _resync_stores(self) -> None:
        for sh in self._stores.values():
            if sh.n_shards == self._mesh.shape[DATA_AXIS]:
                sh.reshard_to(self._mesh)
            else:  # topology changed shape: bulk re-distribute
                rebuilt = ShardedVectorStore.from_store(sh, self._mesh, sh.name)
                self._stores[sh.name] = rebuilt

    # ------------------------------------------------------------------ sync

    def sync_cluster_state(self) -> dict:
        """Single-controller state is consistent by construction; returns the
        current version (reference maps:merge sync, :190-195)."""
        return {"state_version": self._state_version, "stores": sorted(self._stores)}

    def get_cluster_stats(self) -> dict:
        healthy = self._healthy_devices()
        return {
            "total_devices": len(self._all_devices),
            "healthy_devices": len(healthy),
            "failed_devices": sorted(self._failed),
            "replica_groups": self._mesh.shape[REPLICA_AXIS],
            "data_shards": self._mesh.shape[DATA_AXIS],
            "replication_factor": self.replication_factor,
            "stores": {n: s.count for n, s in self._stores.items()},
            "state_version": self._state_version,
            "timestamp": time.time(),
        }
