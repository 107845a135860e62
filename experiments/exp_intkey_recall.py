"""Recall simulation for the intkey (raw-int32-dot ranking) scan variant.

The intkey kernel ranks candidates by dot(q8, c8u) where c8u are
SHARED-SCALE (unit-norm) int8 codes — cross-row comparable without the
per-row affine, but with coarser per-element quantization than today's
absmax codes (elements use ~absmax/|x| of the int8 range).  Selection is
slice-top-1 (1024 rows) + pool rescore; this script measures end-to-end
recall@10 of each candidate-selection scheme on the config-3 corpus:

  posF    float affine keys from absmax codes (today's pos path)
  intU    int keys from unit codes, rescore with UNIT codes (1-plane store)
  intU+A  int keys from unit codes, rescore with ABSMAX codes (2-plane)

at pools 64 / 128 / 256.  Decides whether intkey can hold recall >= 0.95.
"""

import sys
import time

import jax

jax.devices()  # init the axon backend BEFORE /root/repo shadows its config
sys.path.insert(0, "/root/repo")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench import make_corpus  # noqa: E402

N = 1_200_128          # 293 * 4096: the kernel's padded tile coverage
D = 100
W = 128
NQ = 256
K = 10
SLICE = 1024


def quant_absmax(x):
    am = jnp.max(jnp.abs(x), axis=-1)
    s = jnp.where(am > 0, am / 127.0, 1.0)
    return jnp.clip(jnp.round(x / s[:, None]), -127, 127).astype(jnp.int8), s


def quant_unit(x):
    n = jnp.sqrt(jnp.sum(x * x, axis=-1))
    s = jnp.where(n > 0, n / 127.0, 1.0)
    return jnp.clip(jnp.round(x / s[:, None]), -127, 127).astype(jnp.int8), s


def main():
    key = jax.random.PRNGKey(3)
    data = make_corpus(key, N, D)
    pad = jnp.pad(data, ((0, 0), (0, W - D)))
    xn = jnp.sqrt(jnp.sum(pad * pad, axis=-1))
    c8a, sa = quant_absmax(pad)
    c8u, su = quant_unit(pad)
    q = pad[: NQ]                       # self-queries, standard for recall
    q8, qs = quant_absmax(q)
    qn = xn[:NQ]

    # f32 exact ground truth
    def exact_chunk(qc):
        sims = (qc @ pad.T) / (jnp.linalg.norm(qc, axis=1, keepdims=True)
                               * jnp.maximum(xn[None, :], 1e-9))
        return jax.lax.top_k(sims, K)[1]

    gt = np.concatenate([np.asarray(exact_chunk(q[i:i + 64]))
                         for i in range(0, NQ, 64)])

    n_slices = N // SLICE

    def run_scheme(sel_codes, sel_mult, rescore_codes, rescore_scale, pool):
        """sel: keys[b, slice] = max over slice of (q8 . c) * mult; take
        top-pool slices + their argmax row; rescore pool rows exactly."""
        hits = 0
        for i in range(0, NQ, 32):
            qc8 = q8[i:i + 32]
            dots = jnp.dot(qc8, sel_codes.T,
                           preferred_element_type=jnp.int32).astype(
                               jnp.float32)
            skey = dots * sel_mult[None, :]
            sk3 = skey.reshape(-1, n_slices, SLICE)
            smax = jnp.max(sk3, axis=2)
            sarg = jnp.argmax(sk3, axis=2)
            _, ssel = jax.lax.top_k(smax, pool)            # [b, pool]
            rows = ssel * SLICE + jnp.take_along_axis(sarg, ssel, axis=1)
            cand = rescore_codes[rows]                     # [b, pool, W]
            rdots = jnp.einsum("bpw,bw->bp", cand.astype(jnp.float32),
                               qc8.astype(jnp.float32))
            rs = rescore_scale[rows]
            sims = (rdots * rs * qs[i:i + 32, None]
                    / (qn[i:i + 32, None] * xn[rows]))
            _, top = jax.lax.top_k(sims, K)
            got = np.asarray(jnp.take_along_axis(rows, top, axis=1))
            for b in range(got.shape[0]):
                hits += len(set(got[b].tolist())
                            & set(gt[i + b].tolist()))
        return hits / (NQ * K)

    mult_a = np.asarray(sa / jnp.maximum(xn, 1e-9))        # absmax affine
    mult_u = np.ones(N, np.float32)                        # unit: raw dots
    for pool in (64, 128, 256):
        t0 = time.time()
        r_pos = run_scheme(c8a, jnp.asarray(mult_a), c8a, sa, pool)
        r_iu = run_scheme(c8u, jnp.asarray(mult_u), c8u, su, pool)
        r_iua = run_scheme(c8u, jnp.asarray(mult_u), c8a, sa, pool)
        print(f"pool={pool:3d}  posF={r_pos:.4f}  intU={r_iu:.4f}  "
              f"intU+A={r_iua:.4f}   ({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
