"""Where do config 5's ~28 ms/batch of completion host work go?

Rebuilds the config-5 store (10M x 768 int8, 1-device mesh, ~4 s warm)
and decomposes one completion: raw device_get of the packed ticket,
numpy row decode, id gather, and the per-hit mapping loop — each timed
separately, plus the raw-readback floor for the same payload size.
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import log
from erlvectordb_tpu.parallel import ShardedVectorStore, make_mesh

mesh = make_mesh(n_data=len(jax.devices()), n_replica=1)
n, d, k, batch = 10_000_000, 768, 10, 1024
chunk_rows = 262_144
key = jax.random.PRNGKey(0)
kc, kq = jax.random.split(key)
centers = jax.random.normal(kc, (1024, d), jnp.float32)


@functools.partial(jax.jit, static_argnames=("c",))
def gen_chunk(k2, centers, c):
    ka, kn = jax.random.split(k2)
    assign = jax.random.randint(ka, (c,), 0, 1024)
    return centers[assign] + 0.35 * jax.random.normal(kn, (c, d),
                                                      jnp.float32)


def chunks():
    for i in range(-(-n // chunk_rows)):
        yield gen_chunk(jax.random.fold_in(kq, i), centers, chunk_rows)


log("[c5c] building 10M x 768 int8 sharded store...")
t0 = time.perf_counter()
store = ShardedVectorStore.from_chunks("c5c", mesh, chunks(), n=n, dim=d,
                                       dtype="int8")
jax.block_until_ready(store._valid)
log(f"[c5c] built in {time.perf_counter()-t0:.1f}s")

rngq = np.random.default_rng(7)
qs = (np.asarray(centers[:batch]) +
      0.35 * rngq.standard_normal((batch, d)).astype(np.float32))

# warm the search program + completion path
t = store.search_batch_submit(qs, k=k)
store.search_batch_complete(t)

for trial in range(3):
    t = store.search_batch_submit(qs, k=k)
    jax.block_until_ready(t.packed)
    t0 = time.perf_counter()
    arr = np.asarray(t.packed)[: t.nq]
    t1 = time.perf_counter()
    kb = t.kb
    rows = (arr[:, kb:2 * kb].astype(np.int64) * 4096
            + arr[:, 2 * kb:3 * kb].astype(np.int64)).astype(np.int32)
    dists_np = arr[:, :kb]
    t2 = time.perf_counter()
    with store._lock.read():
        rows_now = store._remap_ticket_rows(rows, t)
        t3 = time.perf_counter()
        flat_ids = store._ids_view().reshape(-1)
        t4 = time.perf_counter()
        out = store._map_results(dists_np, rows_now, t.k)
    t5 = time.perf_counter()
    log(f"[c5c] trial {trial}: device_get {1e3*(t1-t0):.2f} ms | "
        f"decode {1e3*(t2-t1):.2f} | remap {1e3*(t3-t2):.2f} | "
        f"ids_view {1e3*(t4-t3):.2f} | map {1e3*(t5-t4):.2f} | "
        f"TOTAL {1e3*(t5-t0):.2f} ms ({len(out)} result rows)")

# raw floor for the same payload
mk = jax.jit(lambda s: jnp.full((batch, 3 * 16), 1.0, jnp.float32) * s)
rtts = []
for i in range(5):
    a = mk(jnp.float32(i + 1))
    jax.block_until_ready(a)
    t0 = time.perf_counter()
    np.asarray(a)
    rtts.append(time.perf_counter() - t0)
log(f"[c5c] raw same-size readback floor: "
    f"{1e3*float(np.median(rtts)):.2f} ms")
