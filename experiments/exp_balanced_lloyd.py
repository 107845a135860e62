"""Round-5 (VERDICT r4 #5, ROADMAP #9): capacity-constrained Lloyd DURING
training vs the shipped greedy-only pipeline.

Today the seed k-means is plain Lloyd; balance is enforced afterwards by
the capacity-bounded greedy assignment (+ post-hoc refit rounds).  On
contended geometries that costs dumped/early-stopped rows and the
round-4 early-abandon fix traded placement quality for assign time.
The principled alternative: shape the CENTROIDS under a per-cluster
price controller during training (ops/kmeans._lloyd ``balance``), so the
greedy sees geometry that already respects its caps.

A/B at flagship scale (default 8M x 768, cell_rows=416/cap=512 — the
config-10 shape) on the two geometries that bracket the problem:
clustered (routing-limited) and iid gaussian (the assign worst case,
round-4's 15-21 s cliff).  Measured per variant: build phase seconds
(stage/seed/route/assign/encode), dumped + earlystop rows, cell fill
skew, and recall@nprobe{4,8} against EXACT f32 ground truth on held-out
queries (absolute, not ceiling-relative — core/calibration.py).

Ship bar: recall up at equal build time, or assign time down at equal
recall; otherwise record the negative and keep balance=0 default.
"""

import sys
import time

import jax

jax.devices()
sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from erlvectordb_tpu.core.calibration import exact_ground_truth  # noqa: E402
from erlvectordb_tpu.core.store import VectorStore  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8 * 1024 * 1024
W = 768
CH = 1 << 17
NQ = 256
K = 10
BALANCES = (0.0, 0.15, 0.3)  # > ~0.3 destabilizes iid (kmeans._lloyd)
CELL_ROWS, CELL_CAP = 416, 512


def gen_chunks(geom: str, n: int, centers):
    """Deterministic replayable chunk stream (host f32)."""
    for i in range(0, n, CH):
        m = min(CH, n - i)
        rng = np.random.default_rng(1000 + i)
        if geom == "iid":
            yield rng.standard_normal((m, W)).astype(np.float32)
        else:
            own = rng.integers(0, len(centers), m)
            yield (centers[own]
                   + 0.35 * rng.standard_normal((m, W))).astype(np.float32)


def queries_for(geom, centers):
    rng = np.random.default_rng(77)
    if geom == "iid":
        return rng.standard_normal((NQ, W)).astype(np.float32)
    own = rng.integers(0, len(centers), NQ)
    return (centers[own]
            + 0.35 * rng.standard_normal((NQ, W))).astype(np.float32)


def recall_vs(ref, got, k):
    hit = sum(len(set(ref[i][:k].tolist()) & set(got[i][:k].tolist()))
              for i in range(len(ref)))
    return hit / (len(ref) * k)


def main():
    for geom in ("clustered", "iid"):
        rng = np.random.default_rng(0)
        centers = rng.standard_normal((4096, W)).astype(np.float32)
        qs = queries_for(geom, centers)
        t0 = time.perf_counter()
        gt = exact_ground_truth(gen_chunks(geom, N, centers), qs, k=K,
                                metric="cosine")
        print(f"[{geom}] exact GT in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)

        for bal in BALANCES:
            name = f"bl_{geom}_{bal}"
            t0 = time.perf_counter()
            st = VectorStore.from_chunks(
                name, gen_chunks(geom, N, centers), n=N, dim=W,
                metric="cosine", cell_rows=CELL_ROWS, cell_cap=CELL_CAP,
                kmeans_balance=bal)
            wall = time.perf_counter() - t0
            bs = dict(getattr(st, "build_stats", {}) or {})
            recs = {}
            for nprobe in (4, 8):
                t = st.search_batch_submit(qs, k=K, nprobe=nprobe)
                _d, rows, _i = st.search_batch_complete_raw(t)
                recs[nprobe] = round(recall_vs(np.asarray(gt), rows, K), 4)
            fill = bs.get("fill_min"), bs.get("fill_max")
            print(f"[{geom}] balance={bal}: wall={wall:.1f}s "
                  f"phases={ {k: round(v, 2) for k, v in bs.items() if k.endswith('_s')} } "
                  f"dumped={bs.get('dumped_rows')} "
                  f"early={bs.get('earlystop_rows')} fill={fill} "
                  f"recall@4={recs[4]} recall@8={recs[8]}", flush=True)
            del st


if __name__ == "__main__":
    main()
