"""Targeted 8M x 768 packed-scan window-offset A/B (VERDICT r3 #3).

Builds ONLY config 10's phase A (int4r store + ground truth), then
measures the packed full-scan recall with the per-query window offset
(the WIP in ops/fused_topk.py) plus its per-dispatch cost, against the
recorded pre-fix baseline (0.5947 recall, BENCH_ALL config 10).
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

from bench import _manifold_gen, log
from erlvectordb_tpu.core.store import VectorStore

n = 8_388_608
d, k, nq = 768, 10, 1024
ch = 262_144
n_chunks = -(-n // ch)

key = jax.random.PRNGKey(0)
kq = key
gen_chunk, centers = _manifold_gen(key, d)

queries = np.asarray(gen_chunk(jax.random.fold_in(kq, 10**6), centers, nq))
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


gt_box = [jnp.full((nq, k), -2.0, jnp.float32),
          jnp.full((nq, k), -1, jnp.int32)]


def chunks():
    for i in range(n_chunks):
        c = gen_chunk(jax.random.fold_in(kq, i), centers, ch)
        gt_box[0], gt_box[1] = gt_update(gt_box[0], gt_box[1], c, i * ch)
        yield c


log(f"[window] building int4r store {n} x {d} (streaming, real)...")
t0 = time.perf_counter()
store = VectorStore.from_chunks(
    "flagw", chunks(), cell_rows=448, cell_cap=512, aniso_eta=4.0,
    n=n, dim=d, train_rows=262_144, kmeans_iters=6,
    kmeans_init="random", refits=1, j=16)
gt_rows = np.asarray(gt_box[1])
log(f"[window] build: {store.build_stats} ({time.perf_counter()-t0:.1f}s)")


def recall_rows(rows):
    hit = 0
    for i in range(nq):
        hit += len(set(rows[i].tolist()) & set(gt_rows[i].tolist()))
    return hit / (nq * k)


# packed full scan (no nprobe): the path under test.  A/B the extraction
# structure (slice width w, keys-per-slice t): scaled-int keys are
# lossless (exp_slice_diag), so candidate recall is purely per-slice
# capacity vs the corpus's cell concentration (mean 3.5 cells hold the
# true top-10 here).
def per_dispatch(m):
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [store.search_batch_submit(queries[:8], k=k)
                for _ in range(m)]
        for o in outs:
            store.search_batch_complete_raw(o)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


for wt in ((1024, 8), (512, 8)):
    store._scan_wt = wt
    t0 = time.perf_counter()
    t = store.search_batch_submit(queries, k=k)
    _, rows, _ = store.search_batch_complete_raw(t)
    rec = recall_rows(rows)
    per_dispatch(2)
    t4, t32 = per_dispatch(4), per_dispatch(32)
    log(f"[window] w={wt[0]} t={wt[1]}: packed-scan recall@10 {rec:.4f} "
        f"per-dispatch {1e3*(t32-t4)/28.0:.3f} ms "
        f"(pre-fix baseline 0.5947 @ 1.763 ms)")

# multiprobe sanity (should be unchanged ~0.94 at nprobe=16)
t = store.search_batch_submit(queries, k=k, nprobe=16)
_, rows, _ = store.search_batch_complete_raw(t)
log(f"[window] multiprobe nprobe=16 recall@10 = {recall_rows(rows):.4f}")
