"""Round-4: does a quarter-sample pre-refit round hold recall?  The
half-sample route+assign is ~2.0s of the 9.3s warm cellprobe build; a
25% sample (~104 rows/cell at 8M/20k cells) would save ~1.0s toward the
>= 1.0M vec/s bar — IF recall@8 stays at the half-sample level (0.98).

Builds the bench config-10 cellprobe (8M x 768 manifold, gt accumulated
during generation) at refit_sample in {0.5, 0.25}, twice each (second =
warm rate), printing recall@{8,16} and build stats.
"""

import sys
import time

import jax

jax.devices()
sys.path.insert(0, "/root/repo")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

from bench import _manifold_gen  # noqa: E402

N = 8_388_608
D = 768
CH = 262_144
K = 10
NQ = 1024


def main():
    from erlvectordb_tpu.core.cell_probe import CellProbeIndex

    key = jax.random.PRNGKey(0)
    gen_chunk, centers = _manifold_gen(key, D)
    queries = np.asarray(gen_chunk(jax.random.fold_in(key, 10**6),
                                   centers, NQ))
    q_dev = jnp.asarray(queries)
    qn = q_dev / jnp.linalg.norm(q_dev, axis=1, keepdims=True)

    @jax.jit
    def gt_update(best_d, best_i, chunk, base):
        cn = jnp.linalg.norm(chunk, axis=1)
        sims = jnp.dot(qn, chunk.T, preferred_element_type=jnp.float32)
        sims = sims / jnp.maximum(cn[None, :], 1e-9)
        dd, ii = lax.top_k(sims, K)
        cd = jnp.concatenate([best_d, dd], axis=1)
        ci = jnp.concatenate([best_i, ii + base], axis=1)
        nd, sel = lax.top_k(cd, K)
        return nd, jnp.take_along_axis(ci, sel, axis=1)

    gt_box = [jnp.full((NQ, K), -jnp.inf), jnp.zeros((NQ, K), jnp.int32)]

    def chunks(with_gt=False):
        for i in range(N // CH):
            c = gen_chunk(jax.random.fold_in(key, i), centers, CH)
            if with_gt:
                gt_box[0], gt_box[1] = gt_update(gt_box[0], gt_box[1], c,
                                                 i * CH)
            yield c

    gt_rows = None
    for rs in (0.5, 0.25):
        for run in ("a", "warm"):
            t0 = time.time()
            idx = CellProbeIndex.build_streaming(
                chunks(with_gt=gt_rows is None), n=N, dim=D, cell_rows=416,
                cell_cap=512, spill_mult=1.3, train_rows=262_144,
                kmeans_iters=6, kmeans_init="random", refits=1, j=16,
                refit_sample=rs)
            if gt_rows is None:
                gt_rows = np.asarray(gt_box[1])
            st = idx.build_stats
            recs = {}
            for nprobe in (8, 16):
                _, rows = idx.search(q_dev, k=K, nprobe=nprobe)
                rows = np.asarray(rows)
                hit = sum(len(set(rows[b].tolist())
                              & set(gt_rows[b].tolist()))
                          for b in range(NQ))
                recs[nprobe] = round(hit / (NQ * K), 4)
            print(f"[rs={rs} {run}] total={time.time() - t0:.1f}s "
                  f"recall@8={recs[8]} @16={recs[16]} "
                  f"vec/s={st['vec_per_sec']} assign={st['assign_s']} "
                  f"dumped={st['dumped_rows']}", flush=True)
            del idx
            import gc
            gc.collect()


if __name__ == "__main__":
    main()
