"""Round-4 VERDICT #4: the untried lever on the int4r 100-d recall miss —
a residual second stage at (or under) the int4 bit budget.

Measures QUANTIZATION CEILINGS (rank by decoded reconstruction, f32
scoring, vs f32 exact ground truth) on the config-3 corpus at 1.2M x 100:

  int4r          cells + per-row clip-swept int4 residual (reference: the
                 recorded 0.859 deep-probe ceiling)
  opq-m{10,20,25,50}   flat OPQ: rotation + m subvectors x 8 bits
                 (m=50 == int4's bit rate, vector-quantized pairs)
  cell+opq-m25   cell centroid (stage 1) + OPQ over the residual (stage 2)

Memory ratio vs the int8 store (128B padded codes + 8B) is printed per
variant.  A ceiling >= 0.92 justifies wiring a store path; < 0.90 means
the bar is exhausted WITH the RQ sweep recorded (VERDICT #4's alternative
done-condition).
"""

import sys
import time

import jax

jax.devices()
sys.path.insert(0, "/root/repo")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench import make_corpus  # noqa: E402

N = 1_200_000
D = 100
NQ = 256
K = 10
INT8_BYTES = 128 + 8          # padded int8 codes + scale + norm


def recall_of_recon(data, xn, recon_fn, gt, tag, row_bytes):
    """recall@10 when ranking by cosine against recon_fn(chunk) rows."""
    hits = 0
    q = data[:NQ]
    qn = xn[:NQ]
    ch = 150_000
    scores = []
    for i in range(0, N, ch):
        rec = recon_fn(i, min(ch, N - i))                  # [ch, D] f32
        rn = jnp.sqrt(jnp.sum(rec * rec, axis=-1))
        s = (q @ rec.T) / (qn[:, None] * jnp.maximum(rn[None, :], 1e-9))
        scores.append(np.asarray(s, np.float16))
    s_all = np.concatenate(scores, axis=1)
    top = np.argsort(-s_all.astype(np.float32), axis=1)[:, :K]
    for b in range(NQ):
        hits += len(set(top[b].tolist()) & set(gt[b].tolist()))
    r = hits / (NQ * K)
    print(f"{tag:16s} ceiling recall@10 = {r:.4f}   "
          f"mem = {row_bytes}B/row = {row_bytes / INT8_BYTES:.2f}x int8",
          flush=True)
    return r


def main():
    t0 = time.time()
    key = jax.random.PRNGKey(3)
    data = make_corpus(key, N, D)
    xn = jnp.sqrt(jnp.sum(data * data, axis=-1))
    q = data[:NQ]

    # exact ground truth
    gt = []
    for i in range(0, NQ, 64):
        s = (q[i:i + 64] @ data.T) / (xn[i:i + 64, None]
                                      * jnp.maximum(xn[None, :], 1e-9))
        gt.append(np.asarray(jax.lax.top_k(s, K)[1]))
    gt = np.concatenate(gt)
    print(f"gt done ({time.time() - t0:.0f}s)", flush=True)

    from erlvectordb_tpu.quant.opq import OPQCodebook

    sample = np.asarray(data[:: N // 131072][:131072])

    # ---- flat OPQ sweep --------------------------------------------------
    for m in (10, 20, 25, 50):
        cb = OPQCodebook.fit(sample, m=m, k=256, iters=8, opq_iters=3,
                             seed=0)
        codes = []
        for i in range(0, N, 300_000):
            codes.append(np.asarray(cb.encode(data[i:i + 300_000])))
        codes = np.concatenate(codes)

        def rec(i, ln, cb=cb, codes=codes):
            return cb.decode(jnp.asarray(codes[i:i + ln]))

        recall_of_recon(data, xn, rec, gt, f"opq-m{m}", m + 4)

    # ---- cell + OPQ residual (two-stage RQ) ------------------------------
    from erlvectordb_tpu.ops.kmeans import kmeans_fit
    kcells = 4096
    cents, _ = kmeans_fit(data[:: N // 262144][:262144],
                          jnp.uint32(0), k=kcells, iters=8, init="kpp")
    # nearest cell per row (chunked)
    owner = []
    cn2 = jnp.sum(cents * cents, axis=-1)
    for i in range(0, N, 300_000):
        dots = data[i:i + 300_000] @ cents.T
        owner.append(np.asarray(jnp.argmin(cn2[None, :] - 2 * dots,
                                           axis=1), np.int32))
    owner = np.concatenate(owner)
    owner_j = jnp.asarray(owner)

    res_sample = np.asarray(sample) - np.asarray(cents)[owner[:: N // 131072][:131072]]
    for m in (25, 50):
        cb2 = OPQCodebook.fit(res_sample, m=m, k=256, iters=8, opq_iters=3,
                              seed=0)
        codes2 = []
        for i in range(0, N, 300_000):
            r = data[i:i + 300_000] - cents[owner_j[i:i + 300_000]]
            codes2.append(np.asarray(cb2.encode(r)))
        codes2 = np.concatenate(codes2)

        def rec2(i, ln, cb2=cb2, codes2=codes2):
            return (cents[owner_j[i:i + ln]]
                    + cb2.decode(jnp.asarray(codes2[i:i + ln])))

        recall_of_recon(data, xn, rec2, gt, f"cell+opq-m{m}", m + 4)

    print(f"total {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
