"""Worker for the 2-process jax.distributed test (run by test_multihost.py).

Each OS process owns 4 virtual CPU devices; together they form one 8-device
global mesh.  This is the DCN/multi-host path the reference exercises with
distributed Erlang (reference src/cluster_manager.erl:100-125 ping/join,
:272-289 net_kernel) — here the JAX distributed runtime forms the group and
the sharded-search collectives cross the process boundary.

Usage: python multihost_worker.py <process_id> <coordinator_addr>
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

import numpy as np  # noqa: E402


def main() -> int:
    pid = int(sys.argv[1])
    coord = sys.argv[2]

    from erlvectordb_tpu.parallel.mesh import init_distributed, make_mesh

    init_distributed(coordinator_address=coord, num_processes=2,
                     process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4, jax.local_device_count()

    from erlvectordb_tpu.parallel.sharded_store import ShardedVectorStore

    mesh = make_mesh(n_data=8, n_replica=1)
    # both processes generate identical data (uncommitted inputs replicate)
    rng = np.random.default_rng(42)
    data = rng.standard_normal((2048, 32)).astype(np.float32)

    store = ShardedVectorStore.from_matrix("mh", mesh, data, dtype="float32")
    assert store.count == 2048

    # sharded search across BOTH processes; verify against host numpy
    q = data[123:127]
    got = store.search_batch(q, k=3)
    sims = (q / np.linalg.norm(q, axis=1, keepdims=True)) @ (
        data / np.linalg.norm(data, axis=1, keepdims=True)).T
    want = np.argsort(1.0 - sims, axis=1)[:, :3]
    for b in range(4):
        got_ids = [int(h[0]) for h in got[b]]
        assert got_ids == want[b].tolist(), (b, got_ids, want[b])

    # targeted mutation after the bulk build, then search sees it
    store.insert("fresh", data[123], {"src": "proc"})
    hit = store.search(data[123], k=1)
    assert hit[0][0] in ("123", "fresh"), hit[:1]

    # failover drill: reshard onto a permuted mesh — shard 0 moves to the
    # other process (a cross-host device-to-device transfer, the bulk
    # migration the reference does one rpc per vector)
    before = store.search_batch(q, k=3)
    devs = list(jax.devices())
    permuted = devs[4:] + devs[:4]
    new_mesh = make_mesh(n_data=8, n_replica=1, devices=permuted)
    store.reshard_to(new_mesh)
    got2 = store.search_batch(q, k=3)
    for b in range(4):
        assert [h[0] for h in got2[b]] == [h[0] for h in before[b]], b

    print(f"MULTIHOST_OK pid={pid}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
