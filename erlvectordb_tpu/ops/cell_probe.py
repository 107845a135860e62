"""Multiprobe cell-gather search — the sub-linear path over cell-residual
layouts.

The brute-force fused scan (ops/fused_topk.py) reads every code row per
batch: at 10M x 768 that is ~4-8 GB of HBM per dispatch, so a SINGLE query
costs the same ~10 ms as a thousand — great throughput, terrible latency.
This op is the other end of the tradeoff, the capability the reference's
``hnsw`` index type advertises (src/vector_index_manager.erl:25-31 — never
implemented there): route each query to its ``nprobe`` nearest cells by one
tiny [B, K] centroid matmul, GATHER only those cells' code blocks
(nprobe * cell_cap rows ~ a few MB), and score them exactly with the raw
f32 query.  Traffic per query drops from O(N) to O(nprobe * cell_cap * W):
sub-linear in the corpus, which is what makes small-batch / low-latency
serving possible at flagship scale.

Graph indexes (HNSW proper) are pointer-chasing — the anti-pattern on a
systolic-array machine.  This partition + residual-quantize + exact-rerank
design is the TPU-native occupant of that slot (the same architecture as
SCaNN's recommended config: coarse partitions, quantized residuals, f32
rescore).  Recall is the classic IVF tradeoff controlled by ``nprobe``;
the balanced assignment (core/ivf.py::_balanced_assign) bounds cell skew so
the fixed-capacity gather loses nothing.

Layouts accepted (detected by ``codes.dtype``):
  * uint8 — packed int4 nibble pairs [N, W/2], dims 2p in the high nibble:
    the int4r VectorStore's own buffers (zero extra memory — the store IS
    the index);
  * int8  — full-width residual codes [N, W] with per-row scales: the
    CellProbeIndex build (index-grade recall; int4's 15 levels cap recall
    ~0.84 on clustered corpora, int8 residuals push quantization error far
    below the routing loss).

Scoring matches fused_topk_residual's exact rescore: q.x decomposes as
q.c_cell + q.res; the centroid term is recomputed in f32 for the probed
cells only, so the bf16 routing matmul never touches reported distances.

Measured (v5e, synthetic 8M x 768 int8 cell store, nprobe=64, bq=8,
per-dispatch over pipelined separate programs — the serving pattern):
0.45 ms per dispatch vs 9.3 ms for the brute fused scan — ~21x.  Three lowering details carry
that number: (1) the probed cells are fetched by a fused Pallas
gather+dot kernel (scalar-prefetched probe ids feed the codes BlockSpec
index_map, so Mosaic double-buffers each ~100 KB block's DMA behind the
previous block's matmul — the same bytes through an XLA cell gather are
DESCRIPTOR-bound at ~1-2 us/block and measured ~3x slower; row-granular
~6x slower again); (2) the routing table is a PERSISTENT bf16 copy (an
in-program astype makes XLA read the full f32 table anyway); (3) the
residual dots are reduced-precision: the kernel issues an f32 matmul but
Mosaic lowers it at bf16-class precision (measured ~0.16% of dot
magnitude; int8 codes are exact in bf16, and the f32 centroid term
carries the reported distances' precision).  At 1.2M x 100 the corpus is only
~60 MB and the brute MXU scan is already ~1.8 ms — multiprobe pays off
above roughly 1 GB of codes, exactly the flagship-scale regime.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def dedup_rows_topk(dists, rows, k):
    """Host-side per-query dedup for spilled (multi-assigned) layouts.

    ``rows`` [B, K'] store rows sorted best-first with possible duplicates
    (a spilled row lives in two cells); keeps each query's FIRST occurrence
    of every row and trims to k.  Vectorized: one stable argsort marks
    later duplicates, a second packs survivors left.  Returns
    (dists [B, k], rows [B, k]) with -1/inf past the unique hits."""
    dists = np.asarray(dists)
    rows = np.asarray(rows)
    order = np.argsort(rows, axis=1, kind="stable")
    sv = np.take_along_axis(rows, order, 1)
    dup_sorted = np.zeros_like(sv, bool)
    dup_sorted[:, 1:] = sv[:, 1:] == sv[:, :-1]
    dup = np.zeros_like(dup_sorted)
    np.put_along_axis(dup, order, dup_sorted, 1)
    keep = ~dup
    sel = np.argsort(~keep, axis=1, kind="stable")[:, :k]
    out_r = np.take_along_axis(rows, sel, 1)
    out_d = np.take_along_axis(dists, sel, 1)
    mask = np.take_along_axis(keep, sel, 1)
    return (np.where(mask, out_d, np.inf),
            np.where(mask, out_r, -1))


def _gather_dots_kernel(probe_ref, q_ref, codes_ref, out_ref):
    """One grid step = one (query, probed cell): dot the query row against
    the cell's [cap, W] int8 block (DMA'd here by the BlockSpec index_map
    reading the scalar-prefetched probe table).  Mosaic double-buffers the
    block DMAs across grid steps, hiding the per-block descriptor latency
    that dominates an XLA gather of the same bytes."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    q = q_ref[pl.ds(i, 1), :]                      # [1, W] f32 (dynamic row)
    blk = codes_ref[0]                             # [cap, W] int8
    out_ref[0, j] = lax.dot_general(
        q, blk.astype(jnp.float32),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[0]


def _gather_dots_kernel_packed(probe_ref, q_ref, codes_ref, out_ref):
    """Packed-int4 variant: the block is [cap, W/2] uint8 nibble pairs
    (dims 2p in the high nibble); the query arrives [evens | odds]-
    reordered so the dot splits into two contiguous half-width matmuls —
    the same unpack scheme as ops/fused_topk.py."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    q = q_ref[pl.ds(i, 1), :]                      # [1, W] f32 reordered
    praw = codes_ref[0].astype(jnp.int32)          # [cap, W/2]
    hw = praw.shape[1]
    hi32 = praw >> 4
    lo32 = praw & 0xF
    hi = jnp.where(hi32 > 7, hi32 - 16, hi32).astype(jnp.float32)
    lo = jnp.where(lo32 > 7, lo32 - 16, lo32).astype(jnp.float32)
    dots = (
        lax.dot_general(q[:, :hw], hi, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
        + lax.dot_general(q[:, hw:], lo, (((1,), (1,)), ((), ())),
                          preferred_element_type=jnp.float32)
    )
    out_ref[0, j] = dots[0]


@functools.partial(jax.jit, static_argnames=("cell_cap",))
def _dma_gather_dots(codes3, probe, queries, *, cell_cap):
    """Fused gather+dot for residual cells on TPU.

    codes3 [K, cap, W] int8 (or [K, cap, W/2] packed uint8); probe
    [B, nprobe] int32; queries [B, W] f32.  Returns raw residual dots
    [B, nprobe, cap] f32."""
    b, nprobe = probe.shape
    wc = codes3.shape[2]
    packed = codes3.dtype == jnp.uint8
    if packed:
        # [evens | odds] query reorder lines up with the hi/lo nibble planes
        queries = jnp.concatenate([queries[:, 0::2], queries[:, 1::2]],
                                  axis=1)
    w = queries.shape[1]
    return pl.pallas_call(
        _gather_dots_kernel_packed if packed else _gather_dots_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, nprobe),
            in_specs=[
                # full query batch in VMEM, row-indexed in-kernel (a (1, W)
                # block would violate Mosaic's 8-sublane block rule)
                pl.BlockSpec((b, w), lambda i, j, probe_ref: (0, 0)),
                pl.BlockSpec((1, cell_cap, wc),
                             lambda i, j, probe_ref: (probe_ref[i, j], 0, 0)),
            ],
            # one [nprobe, cap] output block per query, resident across the
            # fast j axis (each step writes row j) — a (1, 1, cap) block
            # would violate Mosaic's 8-sublane rule
            out_specs=pl.BlockSpec((1, nprobe, cell_cap),
                                   lambda i, j, probe_ref: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, nprobe, cell_cap), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(probe, queries, codes3)


@functools.partial(jax.jit,
                   static_argnames=("metric", "k", "nprobe", "cell_cap",
                                    "child_cap", "sprobe", "rq_pool"))
def multiprobe_topk(
    codes: jax.Array,       # [K*cell_cap, W] int8 residual or [.., W/2] uint8
    scales: jax.Array,      # [K*cell_cap] f32 per-row residual scales
    norms: jax.Array,       # [K*cell_cap] f32 norms of the (reconstructed) rows
    valid: jax.Array,       # [K*cell_cap] bool
    centroids: jax.Array,   # [K, W] f32 cell centroids
    queries: jax.Array,     # [B, W] f32 raw queries
    *,
    metric: str,
    k: int,
    nprobe: int,
    cell_cap: int,
    centroids_route: jax.Array | None = None,  # persistent bf16 [K, W] copy
    cn2: jax.Array | None = None,              # persistent [K] |c|^2 buffer
    super_route: jax.Array | None = None,      # bf16 [S, W] supercentroids
    child_cap: int = 0,                        # children per supercell
    sprobe: int = 0,                           # L1 width (0 = auto)
    rq_codes: jax.Array | None = None,         # [K*cell_cap, M2] uint8 stage-2
    rq_lut: jax.Array | None = None,           # [B, M2, 256] f32 IP tables
    rq_pool: int = 128,                        # stage-2 rescore pool size
) -> Tuple[jax.Array, jax.Array]:
    """Sub-linear multiprobe search. Returns (distances [B, k], rows [B, k]);
    rows are device-row indices into the cell-major layout, distances inf
    past the valid hits.

    ``centroids_route``: optional pre-converted bf16 centroid table for the
    routing matmul.  Without it the in-program astype makes XLA read the
    full f32 table anyway; callers that search repeatedly should keep a
    persistent bf16 copy (halves the dominant HBM read at large K).

    ``rq_codes``/``rq_lut``: optional RESIDUAL-QUANTIZATION second stage
    (VectorStore ``rq_m``).  The stage-1 int4 scores select a per-query
    pool of ``rq_pool`` candidates; their stage-2 error codes are gathered
    (row-granular but tiny: M2 bytes/row) and the pool is re-ranked with
    q.x corrected by the LUT term q.e = sum_m LUT[b, m, code] — the
    two-stage retrieve+rerank that buys back the int4 quantization loss
    the exp_rq sweeps measured (+0.04 recall@10 at 100-d) for ~10 B/row.

    ``super_route``/``child_cap``: optional HIERARCHICAL route.  The flat
    [B, K] routing matmul dominates the op's HBM traffic at large K (96 MB
    bf16 at 62k cells x 768).  With cells laid out supercell-major
    (K == S * child_cap; see CellProbeIndex hierarchy build), routing
    becomes: L1 over the [S, W] supercentroid table (sub-MB) -> top-sprobe
    supercells -> L2 over only their children's centroid blocks
    (contiguous gathers, a few MB) -> top-nprobe cells.  Recall knob:
    auto sprobe covers ~8x nprobe children (min 8 supercells)."""
    if metric not in ("cosine", "euclidean", "dot"):
        raise ValueError(f"multiprobe does not support metric {metric!r}")
    b, w = queries.shape
    n_cells = centroids.shape[0]
    nprobe = min(nprobe, n_cells)

    # ---- route: top-nprobe cells by the metric's centroid proxy ----------
    # Route in BF16 (ranking-grade; half the HBM read) and recompute the
    # probed cells' centroid dots exactly in f32 below (1-2 MB gather), so
    # scoring precision is unaffected.
    cr = (centroids_route if centroids_route is not None
          else centroids.astype(jnp.bfloat16))
    qbf = queries.astype(jnp.bfloat16)
    if cn2 is None:
        # recomputing |c|^2 here reads the FULL f32 table (192 MB at
        # 62.5k x 768) every dispatch — callers that search repeatedly
        # should pass a persistent [K] buffer (2x the route's own read)
        cn2 = jnp.sum(centroids * centroids, axis=-1)          # [K]
    # cells with no valid row are routed around (their slots would all be
    # masked anyway — a wasted probe)
    active = valid.reshape(n_cells, cell_cap).any(axis=1)      # [K]

    def _score(dots, c2, act):
        if metric == "euclidean":
            r = 2.0 * dots - c2
        elif metric == "cosine":
            cnorm = jnp.sqrt(c2)
            r = jnp.where(cnorm > 0, dots / jnp.where(cnorm > 0, cnorm, 1.0),
                          0.0)
        else:  # dot
            r = dots
        return jnp.where(act, r, _NEG)

    if super_route is not None and child_cap:
        s_count = super_route.shape[0]
        if not sprobe:
            # auto L1 width: cover ~8x nprobe children, at least 8
            # supercells — L1 misses cost whole child blocks of recall
            sprobe = max(8, -(-8 * nprobe // child_cap))
        sprobe = min(s_count, sprobe)
        scn2 = jnp.sum(super_route.astype(jnp.float32) ** 2, axis=-1)  # [S]
        sactive = active.reshape(s_count, child_cap).any(axis=1)
        l1 = jnp.dot(qbf, super_route.T,
                     preferred_element_type=jnp.float32)       # [B, S]
        _, sp_idx = lax.top_k(
            _score(l1, scn2[None, :], sactive[None, :]), sprobe)  # [B, sp]
        # L2: contiguous child centroid blocks of the probed supercells only
        cr3 = cr.reshape(s_count, child_cap, w)
        csub = cr3[sp_idx]                                     # [B, sp, cc, W]
        l2 = jnp.einsum("bsgw,bw->bsg", csub, qbf,
                        preferred_element_type=jnp.float32)
        cn2g = cn2.reshape(s_count, child_cap)[sp_idx]         # [B, sp, cc]
        actg = active.reshape(s_count, child_cap)[sp_idx]
        flat = _score(l2, cn2g, actg).reshape(b, -1)           # [B, sp*cc]
        nprobe = min(nprobe, flat.shape[1])
        _, sel = lax.top_k(flat, nprobe)
        probe = (jnp.take_along_axis(sp_idx, sel // child_cap, axis=1)
                 * child_cap + sel % child_cap)                # [B, nprobe]
    else:
        table_r = jnp.dot(qbf, cr.T,
                          preferred_element_type=jnp.float32)  # [B, K]
        route = _score(table_r, cn2[None, :], active[None, :])
        _, probe = lax.top_k(route, nprobe)                    # [B, nprobe]

    # ---- gather: only the probed cells' code blocks ----------------------
    # CELL-granularity gather: B*nprobe contiguous (cell_cap * W)-byte
    # blocks instead of B*nprobe*cell_cap per-row descriptors — TPU gather
    # throughput is descriptor-bound, and a row-granularity gather of the
    # same bytes measured ~6x slower at 8M x 768.
    slot = lax.broadcasted_iota(jnp.int32, (1, nprobe, cell_cap), 2)
    rows = (probe[:, :, None] * cell_cap + slot).reshape(b, -1)  # [B, P]
    codes3 = codes.reshape(n_cells, cell_cap, codes.shape[1])
    # Fused Pallas gather+dot for BOTH layouts (int8 residual and the int4r
    # store's packed nibbles): the XLA cell gather is DESCRIPTOR-bound
    # (~1-2 us per ~100 KB block, serialized) and dominated the op at
    # 8M x 768; the kernel's BlockSpec index_map DMAs each probed block
    # while the previous one computes.  Gated: TPU only (interpret mode on
    # CPU would run b*nprobe Python-level steps), and the kernel's VMEM
    # residents (full query batch + per-query [nprobe, cap] output block +
    # double-buffered code blocks) must fit — else the XLA gather path.
    use_kernel = (
        jax.default_backend() == "tpu"
        and nprobe * cell_cap * 4 <= 4 * 1024 * 1024
        and 2 * cell_cap * codes.shape[1] <= 4 * 1024 * 1024
    )
    if use_kernel:
        # Chunk the query batch so each kernel call's residents fit their
        # budgets: the probe table is a scalar-prefetch operand in 1 MB SMEM
        # (b=1024 x nprobe=256 int32 is exactly 1 MB and spills), and the
        # full query chunk sits in VMEM.
        bc = b
        while bc > 8 and (bc * nprobe * 4 > 512 * 1024
                          or bc * w * 4 > 4 * 1024 * 1024):
            bc -= bc // 2  # halve, rounding up for odd sizes
        if bc * nprobe * 4 > 512 * 1024 or bc * w * 4 > 4 * 1024 * 1024:
            # even the floor chunk (bc=8) spills the SMEM/VMEM budgets
            # (legal when cell_cap <= 32 permits nprobe > 16k): fall back
            # to the XLA gather path instead of invoking a spilling kernel
            use_kernel = False
    if use_kernel:
        if bc >= b:
            dots_raw = _dma_gather_dots(codes3, probe, queries,
                                        cell_cap=cell_cap)  # [B, np, cap]
        else:
            # pad the batch to a multiple of bc: a ragged last chunk would
            # be a fresh kernel compile per remainder shape
            bpad = (-b) % bc
            pq = jnp.pad(probe, ((0, bpad), (0, 0))) if bpad else probe
            qq = jnp.pad(queries, ((0, bpad), (0, 0))) if bpad else queries
            dots_raw = jnp.concatenate([
                _dma_gather_dots(codes3, pq[i:i + bc], qq[i:i + bc],
                                 cell_cap=cell_cap)
                for i in range(0, b + bpad, bc)
            ], axis=0)[:b]
    else:
        cand = codes3[probe]                               # [B, np, cap, Wc]
        if codes.dtype == jnp.uint8:                       # packed int4
            hi = (cand >> 4).astype(jnp.int8)
            lo = (cand & 0xF).astype(jnp.int8)
            hi = jnp.where(hi > 7, hi - 16, hi)
            lo = jnp.where(lo > 7, lo - 16, lo)
            cand = jnp.stack([hi, lo], axis=-1).reshape(
                b, nprobe, cell_cap, -1)
        dots_raw = jnp.einsum(
            "bpcw,bw->bpc", cand.astype(jnp.bfloat16),
            queries.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    pscales = scales.reshape(n_cells, cell_cap)[probe]  # [B, np, cap]
    dots_res = dots_raw.reshape(b, -1) * pscales.reshape(b, -1)  # [B, P]
    # exact f32 centroid dots for the PROBED cells only (the bf16 routing
    # table is ranking-grade, not scoring-grade)
    pcents = centroids[probe]                                  # [B, np, W]
    tgath = jnp.einsum("bpw,bw->bp", pcents, queries,
                       preferred_element_type=jnp.float32)     # [B, nprobe]
    qx = dots_res + jnp.repeat(tgath, cell_cap, axis=1)        # q . x

    # ---- exact distances + top-k ----------------------------------------
    vmask = valid.reshape(n_cells, cell_cap)[probe].reshape(b, -1)
    rnorm = norms.reshape(n_cells, cell_cap)[probe].reshape(b, -1)
    if metric == "cosine":
        qn = jnp.sqrt(jnp.sum(queries * queries, axis=-1, keepdims=True))

        def _final(qx_, rn_, vm_):
            denom = qn * rn_
            sim = jnp.where(denom > 0,
                            qx_ / jnp.where(denom > 0, denom, 1.0), 0.0)
            return jnp.where(vm_, sim, _NEG)
        dist_of = lambda s: 1.0 - s
    elif metric == "euclidean":
        qsq = jnp.sum(queries * queries, axis=-1, keepdims=True)

        def _final(qx_, rn_, vm_):
            return jnp.where(vm_, 2.0 * qx_ - rn_ * rn_, _NEG)
        dist_of = lambda s: jnp.sqrt(jnp.maximum(qsq - s, 0.0))
    else:  # dot
        def _final(qx_, rn_, vm_):
            return jnp.where(vm_, qx_, _NEG)
        dist_of = lambda s: -s
    score = _final(qx, rnorm, vmask)
    if rq_codes is not None and rq_lut is not None:
        # stage-2 pooled rescore: top-rq_pool by stage-1 score, correct
        # q.x by the LUT'd error dot, re-rank the pool only.  The stored
        # norms are FULL-reconstruction norms (set by the rq encode), so
        # the corrected numerator and the denominator describe the same
        # vector.
        m2 = rq_codes.shape[1]
        r0 = min(rq_pool, score.shape[1])
        _, psel = lax.top_k(score, r0)                       # [B, r0]
        prow = jnp.take_along_axis(rows, psel, axis=1)       # global rows
        pcodes = rq_codes[prow].astype(jnp.int32)            # [B, r0, M2]
        sub = lax.broadcasted_iota(jnp.int32, (1, 1, m2), 2)
        flat = (sub * rq_lut.shape[2] + pcodes).reshape(b, -1)
        qe = jnp.take_along_axis(
            rq_lut.reshape(b, -1), flat, axis=1
        ).reshape(b, r0, m2).sum(axis=-1)                    # [B, r0] q.e
        qx_p = jnp.take_along_axis(qx, psel, axis=1) + qe
        rn_p = jnp.take_along_axis(rnorm, psel, axis=1)
        vm_p = jnp.take_along_axis(vmask, psel, axis=1)
        score_p = _final(qx_p, rn_p, vm_p)
        kk = min(k, r0)
        best, sel2 = lax.top_k(score_p, kk)
        out_rows = jnp.take_along_axis(prow, sel2, axis=1)
        dists = dist_of(best)
        dists = jnp.where(best <= _NEG / 2, jnp.inf, dists)
        return dists, out_rows
    kk = min(k, score.shape[1])
    best, sel = lax.top_k(score, kk)
    out_rows = jnp.take_along_axis(rows, sel, axis=1)
    dists = dist_of(best)
    dists = jnp.where(best <= _NEG / 2, jnp.inf, dists)
    return dists, out_rows
