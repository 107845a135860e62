"""Why does the packed residual scan lose 0.94 -> 0.60 at 8M x 768?

Isolates the two suspects on the REAL config-10 store:
  (a) STRUCTURE: top-t-per-1024-slice + pool-P selection with EXACT f32
      keys — if this already loses the top-10, no key encoding can fix it
      (the manifold corpus packs a query's co-neighbors into ONE cell,
      and a 512-row cell sits inside one slice).
  (b) QUANTIZATION: the kernel's scaled-int key (round((s-f)*g), low 10
      bits replaced by lane) vs those exact keys.

Prints candidate-recall@10 against the store's own full-precision
ranking score for each variant + the slice-occupancy histogram of the
true top-10.
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

n = 8_388_608
d, nq = 768, 64
ch = 262_144
n_chunks = -(-n // ch)

key = jax.random.PRNGKey(0)
kq = key
gen_chunk, centers = _manifold_gen(key, d)
queries = np.asarray(gen_chunk(jax.random.fold_in(kq, 10**6), centers, 1024))
queries = queries[:nq]


def chunks():
    for i in range(n_chunks):
        yield gen_chunk(jax.random.fold_in(kq, i), centers, ch)


log(f"[diag] building int4r store {n} x {d}...")
t0 = time.perf_counter()
store = VectorStore.from_chunks(
    "diagw", chunks(), cell_rows=448, cell_cap=512, aniso_eta=4.0,
    n=n, dim=d, train_rows=262_144, kmeans_iters=6,
    kmeans_init="random", refits=1, j=16)
log(f"[diag] build {time.perf_counter()-t0:.1f}s "
    f"(assign {store.build_stats['assign_s']}s)")

codes = store._vectors          # [cap, W/2] uint8 packed
scales = store._scales
norms = store._norms
valid = store._valid
cents = store._centroids
cell_cap = store._cell_cap
cap = codes.shape[0]
kreal = cap // cell_cap
w = cents.shape[1]
q = jnp.asarray(queries)

q_in, qmult, rowmult, rowbias, post = ft._affine_factors(
    "cosine", scales, norms, valid, q)
qn = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
qmult2, rowmult2 = ft._affine_factors_residual(
    "cosine", scales, norms, valid, q, qn)
table = jnp.dot(q, cents.T, preferred_element_type=jnp.float32)  # [B, K]

qa = qmult * qn   # cosine: q_scale
qf = q_in.astype(jnp.float32)
qb_per = jnp.sqrt(jnp.sum(qf * qf, axis=-1, keepdims=True))
cnb = store._code_norm_max
if cnb is None:
    cnb = ft.max_code_norm(codes)
dots_bound = jnp.max(qa * qb_per) * cnb
C = (dots_bound * jnp.max(rowmult)
     + jnp.max(jnp.abs(table)) * jnp.max(rowmult2) + 1.0)
ma = jnp.where(valid, rowmult, 0.0).astype(jnp.float32)
mb = jnp.where(valid, rowmult2, 0.0).astype(jnp.float32)

# exact per-row kernel ranking score s (f32, the value the key encodes).
# All arrays are explicit args: closure capture bakes the 3.7 GB codes
# plane into the executable as a CONSTANT, which the remote compiler
# cannot digest.  CH must divide cap exactly (dynamic_slice clamps the
# tail, which would silently re-read earlier rows under wrong cell ids).
CH = cap // 16
assert cap % 16 == 0


@jax.jit
def s_chunk(i, codes, ma, mb, valid, table_k, qf, qa, C):
    c = lax.dynamic_slice(codes, (i * CH, 0), (CH, codes.shape[1]))
    ci = c.astype(jnp.int32)
    hi = ci >> 4
    lo = ci & 0xF
    hi = jnp.where(hi > 7, hi - 16, hi)
    lo = jnp.where(lo > 7, lo - 16, lo)
    dec = jnp.stack([hi, lo], axis=-1).reshape(CH, -1).astype(jnp.int8)
    # store packs element 2j in the HIGH nibble (store.py _pack_int4)
    dots = jnp.dot(qf, dec.T.astype(jnp.float32),
                   preferred_element_type=jnp.float32)      # [B, CH]
    mac = lax.dynamic_slice(ma, (i * CH,), (CH,))
    mbc = lax.dynamic_slice(mb, (i * CH,), (CH,))
    vc = lax.dynamic_slice(valid, (i * CH,), (CH,))
    cells = (jnp.arange(CH) + i * CH) // cell_cap
    td = table_k[:, cells]                                   # [B, CH]
    s = dots * qa * mac[None, :] + td * mbc[None, :]
    return jnp.where(vc[None, :], s + C, 0.0)


table_k = table[:, :kreal]
parts = [s_chunk(i, codes, ma, mb, valid, table_k, qf, qa, C)
         for i in range(cap // CH)]
s = jnp.concatenate(parts, axis=1)                           # [B, cap]
del parts
s.block_until_ready()
log(f"[diag] exact s computed: {s.shape}")

k = 10
top_vals, top_rows = lax.top_k(s, k)                         # true top-10
n_slices = cap // 1024
occ = np.asarray(top_rows) // 1024
occ_counts = [len(set(r.tolist())) for r in occ]
log(f"[diag] distinct slices holding the true top-10: "
    f"mean {np.mean(occ_counts):.2f} min {np.min(occ_counts)} "
    f"hist {np.bincount(occ_counts, minlength=11)[1:11].tolist()}")
cells_occ = np.asarray(top_rows) // cell_cap
log(f"[diag] distinct CELLS holding the true top-10: "
    f"mean {np.mean([len(set(r.tolist())) for r in cells_occ]):.2f}")

lane = jnp.arange(cap, dtype=jnp.int32) % 1024


def sel_recall(keyvals, t, pool, w=1024):
    """top-t per w-row slice by keyvals, pool-P by keyvals, recall vs
    top_rows."""
    ns = cap // w
    kv = keyvals.reshape(nq, ns, w)
    v2, l2 = lax.top_k(kv, t)                    # [B, S, t]
    rows2 = (jnp.arange(ns)[None, :, None] * w + l2)
    v2 = v2.reshape(nq, -1)
    rows2 = rows2.reshape(nq, -1)
    _, sel = lax.top_k(v2, min(pool, v2.shape[1]))
    prows = jnp.take_along_axis(rows2, sel, axis=1)
    pr = np.asarray(prows)
    tr = np.asarray(top_rows)
    hit = sum(len(set(pr[i].tolist()) & set(tr[i].tolist()))
              for i in range(nq))
    return hit / (nq * k)


def slice_rescue_recall(keyvals, w, S):
    """top-S w-row slices per query by slice-max key; candidate set = ALL
    rows of those slices (post-kernel exact rescore of whole slices)."""
    ns = cap // w
    smax = jnp.max(keyvals.reshape(nq, ns, w), axis=2)
    _, sl = lax.top_k(smax, S)                   # [B, S] slice ids
    slc = np.asarray(sl)
    tr = np.asarray(top_rows) // w               # true rows' slice ids
    hit = sum(len([1 for c in tr[i] if c in set(slc[i].tolist())])
              for i in range(nq))
    return hit / (nq * k)


for t in (1, 2, 4, 8):
    for pool in (256, 1024):
        r = sel_recall(s, t, pool)
        log(f"[diag] EXACT keys  t={t} pool={pool}: cand-recall {r:.4f}")

# kernel quantization emulation: f, g as fused_topk_residual computes
validc = valid.reshape(kreal, cell_cap)
has_valid = jnp.any(validc, axis=1)
mbc2 = mb.reshape(kreal, cell_cap)
mbmax_c = jnp.max(mbc2, axis=1)
mbmin_c = jnp.min(jnp.where(validc, mbc2, jnp.inf), axis=1)
tb = table[:, :kreal]
cellterm = jnp.where(tb >= 0, tb * mbmax_c[None, :], tb * mbmin_c[None, :])
cell_lb = jnp.where(has_valid[None, :], cellterm, -jnp.inf)
cell_ub = cell_lb
rmax_q = jnp.abs(qa) * qb_per * cnb * jnp.max(ma)
top_lb = jnp.max(cell_lb, axis=1, keepdims=True)
top_ub = jnp.max(cell_ub, axis=1, keepdims=True)
f = jnp.maximum(top_lb + C - 2.0 * rmax_q, 0.0)
f = jnp.where(jnp.isfinite(f), f, 0.0)
s_ub = top_ub + C + rmax_q
g = (float(1 << 30) - 1.0) / jnp.maximum(s_ub - f, 1e-20)

band = top_vals[:, 0] - top_vals[:, k - 1]
step = (s_ub[:, 0] - f[:, 0]) / float(1 << 20)
log(f"[diag] C={float(C):.4g}  rmax med {float(jnp.median(rmax_q)):.4g}  "
    f"f med {float(jnp.median(f)):.4g}  V med "
    f"{float(jnp.median(s_ub - f)):.4g}")
log(f"[diag] top-10 band med {float(jnp.median(band)):.4g}  "
    f"key step med {float(jnp.median(step)):.4g}  "
    f"band/step med {float(jnp.median(band / step)):.3g}")
gap_lb = top_vals[:, 0] - (top_lb[:, 0] + C)
log(f"[diag] s_top - (top_lb+C) med {float(jnp.median(gap_lb)):.4g} "
    f"(bound slack); 2rmax med {float(jnp.median(2 * rmax_q)):.4g}")

si = jnp.clip(jnp.round((s - f) * g), -2.0e9, 2.0e9).astype(jnp.int32)
del s
si.block_until_ready()

# Structural sweep on QUANT keys (shown lossless vs exact at w=1024):
# same-extraction-cost variants (cost in the kernel scales with t only,
# not slice width: t masked-max passes x TILE_N lanes) and the
# whole-slice rescue.  Lane bits = log2(w) per width.
for w, t in ((1024, 2), (1024, 4), (1024, 8), (512, 2), (512, 4),
             (256, 2), (256, 4), (128, 2)):
    keys_w = (si & jnp.int32(-w)) | (lane[None, :] & jnp.int32(w - 1))
    for pool in (256, 1024):
        r = sel_recall(keys_w, t, pool, w=w)
        log(f"[diag] QUANT keys  w={w} t={t} pool={pool}: "
            f"cand-recall {r:.4f}  (extract-cost x{t / 2:.1f}, "
            f"cols/query {t * cap // w})")
    del keys_w

# whole-slice rescue: select top-S slices by slice-max, exact-rescore all
# rows of those slices (reuses the multiprobe gather machinery; cost ~
# multiprobe at nprobe = S * w / cell_cap)
for w in (512, 1024):
    for S in (16, 32, 64, 128):
        r = slice_rescue_recall(si, w, S)
        log(f"[diag] SLICE-RESCUE w={w} S={S}: cand-recall {r:.4f}  "
            f"(rescore rows/query {S * w})")
