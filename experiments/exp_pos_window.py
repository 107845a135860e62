"""Plain pos path (int8, non-cell) on a near-tie manifold corpus.

The int4r packed scan collapsed to 0.59 recall on this geometry before
the scaled-int window keys; the plain int8 pos path shares the bitcast
key mechanism but was never measured on near-ties (config 3's corpus is
GloVe-class).  Builds a 2M x 768 manifold int8 store, measures pos-path
recall@10 vs exact f32 GT, and the masked-extraction path (EVDB exact
scan) as the ceiling.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

from bench import _manifold_gen, log
from erlvectordb_tpu.core.store import VectorStore
from erlvectordb_tpu.ops import fused_topk as ft

n, d, k, nq = 2_097_152, 768, 10, 512
ch = 262_144
key = jax.random.PRNGKey(0)
gen_chunk, centers = _manifold_gen(key, d)
queries = np.asarray(gen_chunk(jax.random.fold_in(key, 10**6), centers,
                               nq))
q_dev = jnp.asarray(queries)
qn = q_dev / jnp.linalg.norm(q_dev, axis=1, keepdims=True)


@jax.jit
def gt_update(best_d, best_i, chunk, base):
    cn = jnp.linalg.norm(chunk, axis=1)
    sims = jnp.dot(qn, chunk.T, preferred_element_type=jnp.float32)
    sims = sims / jnp.maximum(cn[None, :], 1e-9)
    dd, ii = lax.top_k(sims, k)
    cd = jnp.concatenate([best_d, dd], axis=1)
    ci = jnp.concatenate([best_i, ii + base], axis=1)
    nd, sel = lax.top_k(cd, k)
    return nd, jnp.take_along_axis(ci, sel, axis=1)


bd = jnp.full((nq, k), -2.0, jnp.float32)
bi = jnp.full((nq, k), -1, jnp.int32)
log(f"[posw] building int8 store {n} x {d} (manifold, device)...")
t0 = time.perf_counter()
parts = []
for i in range(n // ch):
    c = gen_chunk(jax.random.fold_in(key, i), centers, ch)
    bd, bi = gt_update(bd, bi, c, i * ch)
    parts.append(c)
data = jnp.concatenate(parts, axis=0)
del parts
store = VectorStore.from_matrix("posw", data, dtype="int8")
del data
gt_rows = np.asarray(bi)
log(f"[posw] built ({time.perf_counter()-t0:.1f}s); n_tiles "
    f"{ft.n_tiles_for(store.count, store._capacity)} "
    f"(pos gate {ft.POS_MIN_TILES})")


def recall_rows(rows):
    hit = 0
    for i in range(nq):
        hit += len(set(rows[i].tolist()) & set(gt_rows[i].tolist()))
    return hit / (nq * k)


# pos path (the default at this size; intkey OFF for this store)
assert not store.intkey
t = store.search_batch_submit(queries, k=k)
_, rows, _ = store.search_batch_complete_raw(t)
log(f"[posw] pos-path recall@10 = {recall_rows(rows):.4f} "
    f"(int4r analogue collapsed to 0.83 at 393k / 0.59 at 8M pre-fix)")

# masked-extraction ceiling.  k=11 forces a fresh trace: jit caches key
# on (shapes, statics) and flipping POS_PATH_ENABLED alone would alias
# the already-compiled pos executable (see tests/test_fused_topk.py note)
ft.POS_PATH_ENABLED = False
t = store.search_batch_submit(queries, k=k + 1)
_, rows, _ = store.search_batch_complete_raw(t)
log(f"[posw] masked-path (exact-extraction) recall@10 = "
    f"{recall_rows(rows[:, :k]):.4f} (int8 quantization ceiling)")
ft.POS_PATH_ENABLED = True
