"""Round-4 VERDICT #4, sweep 2: second residual stage INSIDE the 0.5x budget.

exp_rq.py measured the 4-bit-rate encoders (ceilings: int4r-affine 0.859
recorded, cell+opq-m50 0.8695, flat opq-m50 0.6715).  The 0.90 bar allows
<= 0.5x int8 = 68 B/row (int8 row = 128 B padded codes + scale + norm);
int4r uses 58 B — 10 B of unspent budget.  This sweep measures whether a
SECOND residual stage over the first stage's error spends those bytes
into the missing 0.04 recall, and whether a bigger coarse codebook
(free: the cell id is implicit in the slot layout) moves the ceiling.

  cell+i4            cells + per-row clip-swept aniso int4 (harness
                     reproduction of the production encoder, 58 B)
  cell+i4+e-m10      + OPQ m=10 over the int4 error        (68 B, 0.500x)
  cell+opq50+e-m10   cells + OPQ m=50 + OPQ m=10 error     (64 B, 0.47x)
  cell16k+i4[+e]     4x coarse codebook (16384 cells) variants
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
INT8_BYTES = 128 + 8


def recall_of_recon(data, xn, recon_fn, gt, tag, row_bytes):
    hits = 0
    q = data[:NQ]
    qn = xn[:NQ]
    ch = 150_000
    scores = []
    for i in range(0, N, ch):
        rec = recon_fn(i, min(ch, N - i))
        rn = jnp.sqrt(jnp.sum(rec * rec, axis=-1))
        s = (q @ rec.T) / (qn[:, None] * jnp.maximum(rn[None, :], 1e-9))
        scores.append(np.asarray(s, np.float16))
    s_all = np.concatenate(scores, axis=1)
    top = np.argsort(-s_all.astype(np.float32), axis=1)[:, :K]
    for b in range(NQ):
        hits += len(set(top[b].tolist()) & set(gt[b].tolist()))
    r = hits / (NQ * K)
    print(f"{tag:20s} ceiling recall@10 = {r:.4f}   "
          f"mem = {row_bytes}B/row = {row_bytes / INT8_BYTES:.3f}x int8",
          flush=True)
    return r


def owners_for(data, cents):
    cn2 = jnp.sum(cents * cents, axis=-1)
    owner = []
    for i in range(0, N, 300_000):
        dots = data[i:i + 300_000] @ cents.T
        owner.append(np.asarray(jnp.argmin(cn2[None, :] - 2 * dots, axis=1),
                                np.int32))
    return jnp.asarray(np.concatenate(owner))


def int4_encode_all(data, cents, owner_j):
    """Production-equivalent per-row clip-swept aniso int4 of cell residuals.
    Returns (q int8 [N, D], s f32 [N]) on host."""
    from erlvectordb_tpu.ops.cell_build import _quantize_residual_int4
    qs, ss = [], []
    f = jax.jit(lambda r, x: _quantize_residual_int4(r, x, aniso_eta=4.0))
    for i in range(0, N, 300_000):
        x = data[i:i + 300_000]
        r = x - cents[owner_j[i:i + 300_000]]
        q, s = f(r, x)
        qs.append(np.asarray(q))
        ss.append(np.asarray(s))
    return np.concatenate(qs), np.concatenate(ss)


def main():
    t0 = time.time()
    key = jax.random.PRNGKey(3)
    data = make_corpus(key, N, D)
    xn = jnp.sqrt(jnp.sum(data * data, axis=-1))
    q = data[:NQ]

    gt = []
    for i in range(0, NQ, 64):
        s = (q[i:i + 64] @ data.T) / (xn[i:i + 64, None]
                                      * jnp.maximum(xn[None, :], 1e-9))
        gt.append(np.asarray(jax.lax.top_k(s, K)[1]))
    gt = np.concatenate(gt)
    print(f"gt done ({time.time() - t0:.0f}s)", flush=True)

    from erlvectordb_tpu.ops.kmeans import kmeans_fit
    from erlvectordb_tpu.quant.opq import OPQCodebook

    results = {}
    for kcells in (4096, 16384):
        samp = data[:: N // 262144][:262144]
        cents, _ = kmeans_fit(samp, jnp.uint32(0), k=kcells, iters=8,
                              init="kpp")
        owner_j = owners_for(data, cents)
        tag0 = f"c{kcells//1024}k"
        print(f"[{tag0}] owners done ({time.time() - t0:.0f}s)", flush=True)

        # ---- stage 1: production int4 affine -----------------------------
        q4, s4 = int4_encode_all(data, cents, owner_j)
        q4j = jnp.asarray(q4)
        s4j = jnp.asarray(s4)

        def rec_i4(i, ln):
            return (cents[owner_j[i:i + ln]]
                    + q4j[i:i + ln].astype(jnp.float32)
                    * s4j[i:i + ln, None])

        results[f"{tag0}+i4"] = recall_of_recon(
            data, xn, rec_i4, gt, f"{tag0}+i4", 58)

        # ---- stage 2 candidates over the int4 error -----------------------
        # error sample for codebook training
        idx = np.arange(0, N, N // 131072)[:131072]
        err_s = np.asarray(data[idx]) - np.asarray(rec_i4_rows(
            data, cents, owner_j, q4j, s4j, idx))
        for m2 in (10, 20):
            cb2 = OPQCodebook.fit(err_s, m=m2, k=256, iters=10, opq_iters=3,
                                  seed=1)
            codes2 = []
            for i in range(0, N, 300_000):
                ln = min(300_000, N - i)
                e = data[i:i + ln] - rec_i4(i, ln)
                codes2.append(np.asarray(cb2.encode(e)))
            codes2 = jnp.asarray(np.concatenate(codes2))

            def rec_2(i, ln, cb2=cb2, codes2=codes2):
                return rec_i4(i, ln) + cb2.decode(codes2[i:i + ln])

            results[f"{tag0}+i4+e{m2}"] = recall_of_recon(
                data, xn, rec_2, gt, f"{tag0}+i4+e-m{m2}", 58 + m2)

        # ---- cells + OPQ m=50 + error m=10 (drops the per-row scale) ------
        if kcells == 4096:
            res_s = np.asarray(data[idx]) - np.asarray(cents)[
                np.asarray(owner_j)[idx]]
            cb1 = OPQCodebook.fit(res_s, m=50, k=256, iters=10, opq_iters=3,
                                  seed=0)
            codes1 = []
            for i in range(0, N, 300_000):
                r = data[i:i + 300_000] - cents[owner_j[i:i + 300_000]]
                codes1.append(np.asarray(cb1.encode(r)))
            codes1 = jnp.asarray(np.concatenate(codes1))

            def rec_o50(i, ln):
                return (cents[owner_j[i:i + ln]]
                        + cb1.decode(codes1[i:i + ln]))

            # sampled error, chunk-gathered
            err_rows = []
            for j0 in range(0, len(idx), 32768):
                sel = idx[j0:j0 + 32768]
                r = (jnp.asarray(np.asarray(data)[sel])
                     - cents[owner_j[jnp.asarray(sel)]]
                     - cb1.decode(codes1[jnp.asarray(sel)]))
                err_rows.append(np.asarray(r))
            err_s2 = np.concatenate(err_rows)
            cb2b = OPQCodebook.fit(err_s2, m=10, k=256, iters=10,
                                   opq_iters=3, seed=2)
            codes2b = []
            for i in range(0, N, 300_000):
                ln = min(300_000, N - i)
                e = data[i:i + ln] - rec_o50(i, ln)
                codes2b.append(np.asarray(cb2b.encode(e)))
            codes2b = jnp.asarray(np.concatenate(codes2b))

            def rec_o50e(i, ln):
                return rec_o50(i, ln) + cb2b.decode(codes2b[i:i + ln])

            results["c4k+opq50+e10"] = recall_of_recon(
                data, xn, rec_o50e, gt, "c4k+opq50+e-m10", 64)
        del q4j, s4j

    print(f"total {time.time() - t0:.0f}s", flush=True)
    print(results)


def rec_i4_rows(data, cents, owner_j, q4j, s4j, idx):
    sel = jnp.asarray(idx)
    return (cents[owner_j[sel]]
            + q4j[sel].astype(jnp.float32) * s4j[sel, None])


if __name__ == "__main__":
    main()
