"""Fused distance-matmul + top-k Pallas kernel — the framework's hot kernel.

The XLA path (core/search.py) materializes the [B, N] score matrix in HBM:
for 1024 queries over 1.2M rows that is ~5 GB written + read per batch, and
the whole search is HBM-bandwidth-bound (~12 ms/batch measured on v5e).
This kernel never leaves VMEM with the scores:

  grid (n_tiles, b_tiles), codes-tile outer so each [TILE_N, W] code tile is
  DMA'd from HBM exactly once per query sweep:

    scores[B_T, TILE_N] = dot(q_tile, codes_tile^T)   (MXU, int8->int32)
    sims = scores * q_mult * row_mult + row_bias      (VPU, affine form
                                                       covers cosine /
                                                       euclidean / dot)
    top-2 of each tile per query                      (VPU lane reductions)
    write ONLY (2 values, 2 global rows) per (query, tile) to HBM

HBM traffic per 1024-query batch drops from ~10 GB to ~150 MB (the codes) +
~5 MB of candidates.  The final exact top-k over the [B, 2*n_tiles]
candidates runs in XLA.  Keeping the per-tile top-2 (not top-1) makes the
candidate set lossless unless >=3 of the true top-k land in one 4096-row
tile (probability ~0.1% for k=10 at N=1.2M).

The affine trick: all three matmul metrics rank by an expression of the form
``dot * q_mult * row_mult + row_bias``:

  cosine:    q_mult = q_scale/|q|, row_mult = scale/|x|, bias = 0
  dot:       q_mult = q_scale,     row_mult = scale,     bias = 0
  euclidean: q_mult = 2*q_scale,   row_mult = scale,     bias = -|x|^2
             (rank by max of 2*q.x - |x|^2; |q|^2 is constant per query)

Invalid (deleted/padded) rows get bias -1e30.  Zero-norm rows/queries get
mult 0 — cosine similarity 0, i.e. distance 1.0, the reference's semantics
(src/vector_store.erl:238-246).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 4096      # code rows per grid step (per-tile top-2 extracted)
LANES = 128

_NEG = -1e30  # python float: jnp scalars would be captured consts in the kernel


def _pick_bt(b: int, row_bytes: int = 0) -> int:
    """Query-tile height: >=32 (int8 sublane tile), <=256.

    ``row_bytes`` (codes bytes per row) caps bt at 128 for WIDE rows on the
    residual/packed paths: their kernels keep several [bt, TILE_N] f32
    intermediates (scores, bias expand, packed keys) live at once, and at
    row_bytes >= 256 the added unpack/bias scratch pushes the bt=256 variant
    just past the 16 MB scoped-VMEM stack (compile failure at W=768)."""
    cap = 128 if row_bytes >= 256 else 256
    bt = 32
    while bt < min(b, cap):
        bt *= 2
    return bt


_UNPACK_CHUNK = 128  # byte columns per int4 unpack step: int32 scratch stays
#                      <= TILE_N*128*4 = 2 MB.  Unpacking the whole row span
#                      at once materializes [TILE_N, W/2] int32 — 6 MB at
#                      W=768 — which blew the 16 MB scoped-VMEM limit.


def _packed_int4_dots(q, codes_ref, sl):
    """dot(q_even, hi) + dot(q_odd, lo) over packed nibble codes.

    ``q`` is the [evens | odds]-reordered query tile; codes byte j of a row
    packs element 2j in the high nibble and 2j+1 in the low (store.py
    _pack_int4).  Unpacks in
    <=_UNPACK_CHUNK-byte column chunks so the int32 nibble scratch is
    VMEM-bounded regardless of row width; the MXU contraction chunks along
    K (128 = one MXU pass) and accumulates in int32.  Mosaic note: uint8
    shifts and sub-32-bit compares don't legalize — unpack and sign-extend
    entirely in int32."""
    hw = codes_ref.shape[1]
    acc = None
    for c0 in range(0, hw, _UNPACK_CHUNK):
        c1 = min(c0 + _UNPACK_CHUNK, hw)
        praw = codes_ref[sl, c0:c1].astype(jnp.int32)
        hi32 = praw >> 4
        lo32 = praw & 0xF
        hi = jnp.where(hi32 > 7, hi32 - 16, hi32).astype(jnp.int8)
        lo = jnp.where(lo32 > 7, lo32 - 16, lo32).astype(jnp.int8)
        d = (lax.dot_general(q[:, c0:c1], hi, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.int32)
             + lax.dot_general(q[:, hw + c0:hw + c1], lo,
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.int32))
        acc = d if acc is None else acc + d
    return acc.astype(jnp.float32)


def _make_scan_kernel(t_per_tile: int, sub: int, packed_int4: bool = False,
                      cell_cap: int = 0):
    """``sub`` sub-tiles of TILE_N rows are processed per grid step: the
    scores buffer stays [B_T, TILE_N] (VMEM-friendly) while the grid has
    ``sub``x fewer steps — measured ~7% on v5e (per-step overhead).

    ``packed_int4``: codes arrive as packed nibble pairs [rows, W/2] uint8
    (dims 2p in the high nibble).  Rather than interleaving after unpack
    (lane shuffles are expensive), the WRAPPER reorders the query to
    [evens | odds], so the dot decomposes into two contiguous half-width
    int8 matmuls: dot(q_even, hi) + dot(q_odd, lo).  HBM scan traffic
    halves vs int8."""

    def _scan_kernel(q_ref, qmult_ref, codes_ref, rowmult_ref, rowbias_ref,
                     *rest):
        if cell_cap:
            # residual stores: per-(query, cell) bias table, expanded to
            # lanes by an element repeat (cell-major fixed-capacity layout
            # makes the cluster term a cheap block broadcast)
            qmult2_ref, rowmult2_ref, table_ref, vals_ref, rows_ref = rest
        else:
            vals_ref, rows_ref = rest
        j = pl.program_id(0)  # big-tile index (sub * TILE_N rows)

        q = q_ref[:]            # [B_T, W] int8/f32 ([evens|odds] if packed)
        for t in range(sub):
            sl = slice(t * TILE_N, (t + 1) * TILE_N)
            if packed_int4:
                dots = _packed_int4_dots(q, codes_ref, sl)
            else:
                c = codes_ref[sl, :]                       # [TILE_N, W]
                if q.dtype == jnp.int8:
                    dots = lax.dot_general(
                        q, c, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    ).astype(jnp.float32)
                else:
                    dots = lax.dot_general(
                        q, c, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
            # [B_T, TILE_N] affine-scored similarities (bigger = closer)
            sims = (dots * qmult_ref[:] * rowmult_ref[:, sl]
                    + rowbias_ref[:, sl])
            if cell_cap:
                cpt = TILE_N // cell_cap
                # table arrives TRANSPOSED [cells, B_T] (Mosaic block-shape
                # rules: lane dim must be 128-aligned, and B_T is); small
                # in-kernel transpose, then element-repeat each cell's bias
                # across its cap lanes (pltpu.repeat TILES — wrong shape —
                # so broadcast+reshape)
                tblk = table_ref[t * cpt:(t + 1) * cpt, :].T  # [B_T, cpt]
                trep = jnp.broadcast_to(
                    tblk[:, :, None], (tblk.shape[0], cpt, cell_cap)
                ).reshape(tblk.shape[0], TILE_N)
                sims = sims + trep * qmult2_ref[:] * rowmult2_ref[:, sl]

            lane = lax.broadcasted_iota(jnp.int32, sims.shape, 1)

            # Packed top-T extraction: encode (value, lane) into ONE int32 —
            # monotone float->int key with the low 12 mantissa bits replaced
            # by the lane — so each extraction is a single integer max
            # instead of max + locate-min + mask (3 full passes -> 2).
            # Value precision drops to an 11-bit mantissa (~2.4e-4 relative),
            # far below the int8 quantization error of the scores themselves.
            imin = jnp.int32(-2147483648)
            si = lax.bitcast_convert_type(sims, jnp.int32)
            key = jnp.where(si >= 0, si, imin - si)  # float order -> int order
            packed = (key & jnp.int32(~0xFFF)) | lane  # TILE_N = 4096 lanes
            vals, idxs = [], []
            for _ in range(t_per_tile):
                m = jnp.max(packed, axis=1, keepdims=True)   # [B_T, 1]
                kt = m & jnp.int32(~0xFFF)
                sr = jnp.where(kt >= 0, kt, imin - kt)
                vals.append(lax.bitcast_convert_type(sr, jnp.float32))
                idxs.append(m & jnp.int32(0xFFF))
                packed = jnp.where(packed == m, imin, packed)

            base = (j * sub + t) * TILE_N
            osl = slice(t * t_per_tile, (t + 1) * t_per_tile)
            vals_ref[0, :, osl] = jnp.concatenate(vals, axis=1)  # [B_T, T]
            rows_ref[0, :, osl] = jnp.concatenate(idxs, axis=1) + base

    return _scan_kernel


MAX_T_PER_TILE = 8

# ---------------------------------------------------------------------------
# Positive-packed scan ("pos path") — the fast ranking variant for big stores.
#
# Scoring cost in the kernel above is ~15 VPU ops/element (f32 affine,
# monotone float->int key fix-up, and t_per_tile masked extraction passes).
# The pos path cuts that to ~7:
#
#   * the per-query factor (qmult) is DROPPED from ranking for cosine/dot —
#     it is a positive per-query scale, so per-query top-k is unchanged
#     (euclidean keeps it: its row bias term is not query-scaled);
#   * scores become SCALED-INT keys: key value = round((s - f) * g) with
#     f/g a provable per-query window offset and gain (every valid score
#     lies in [f, s_ub]; g = (2^30-1)/(s_ub-f)), so the key's 20 value
#     bits are spent uniformly across the query's own score range.  The
#     original bitcast-f32 key (score + offset C, bits as sort key)
#     quantized relative to C — ~13 mantissa bits that collapsed to ~16
#     effective levels on near-tie corpora (measured: int4r packed scan
#     0.59 recall at 8M x 768; the window keys restore the extraction
#     ceiling exactly — int8 manifold 2M x 768: 0.9734 == masked path);
#   * the low 10 bits are replaced by the lane index:
#     key = (round((s-f)*g) & ~1023) | lane.  One max per 1024-lane slice
#     then yields value AND location in a single pass — no masked second
#     pass, and the kernel emits ONE packed int32 per (query, slice)
#     instead of separate value/row planes;
#   * invalid/padded rows score s = 0 and key round((0-f)*g) <= -g,
#     ranked below every valid row (valid s >= f) and rejected by the
#     exact rescore.
#
# Per 4096-row tile the pos path emits the top-1 of each of its four
# 1024-lane slices.  A candidate is lost only when two of the true top-k
# fall in the SAME 1024-row slice: expected losses per query are about
# C(k,2) * 1024 / N, so the path is gated on large N (POS_MIN_TILES) where
# that rate is <1% — measured 0.995 top-10 overlap vs the masked-extraction
# kernel at N=1.2M with recall 0.961 vs f32 exact (target >=0.95).
# Measured on v5e config-3 shapes: 3.81 ms vs 5.51 ms per 1024-query batch
# (269k vs 186k QPS, dispatch-overhead-corrected).
# ---------------------------------------------------------------------------

POS_SLICE = 1024
POS_LANE_MASK = POS_SLICE - 1
POS_MIN_TILES = 144          # ~590k rows: expected candidate loss < 0.8%/query
# Default extraction structure for the RESIDUAL (int4r cell store) scan:
# cell-major layout concentrates a query's true top-k into ~2-4 cells
# (measured 8M x 768 manifold: mean 3.5 cells hold the top-10), so
# per-slice capacity bounds candidate recall — top-2/1024 caps at 0.60
# there while top-8 reaches 0.998 (exp_slice_diag).  Cost scales with
# t_top only (masked-max passes), not slice width.
POS_RES_W = 1024
POS_RES_T = 8
POS_MAX_K = 16
# Opt-out (ADVICE r2): EVDB_EXACT_SCAN=1 disables the approximate pos path
# so large-N searches stay on the (near-)exact masked-extraction kernel.
POS_PATH_ENABLED = os.environ.get("EVDB_EXACT_SCAN", "0") != "1"


def _pick_sub(n_cap: int, n_tiles: int, row_bytes: int, max_sub: int = 4) -> int:
    """Sub-tiles per grid step: the codes tile (sub*TILE_N rows) must fit
    VMEM next to the [bt, TILE_N] f32 scores buffer (~8 MB codes budget)."""
    sub = max_sub
    while sub > 1 and (
        n_cap % (sub * TILE_N) != 0
        or n_tiles < sub
        or sub * TILE_N * row_bytes > 8 * 1024 * 1024
    ):
        sub //= 2
    return sub


def _make_pos_kernel(sub: int, packed_int4: bool, use_qm: bool):
    """Positive-packed scan kernel: one int32 key per (query, 1024-slice).

    Keys are SCALED-INT: key value = round((s - f) * g) with the low 10
    bits replaced by the lane.  f/g are a provable per-query window
    offset and gain (see _pos_topk) — valid scores land in [0, 2^30), so
    the 20 value bits are spent uniformly across the query's own score
    range instead of bitcast-relative to the global offset C (whose 13
    mantissa bits collapse to ~16 effective levels on near-tie corpora —
    same mechanism as the residual path's measured 0.59-recall collapse).
    Scores below the window go negative but stay ORDERED (round((s-f)g)
    is monotone until the ±2e9 clip, two windows out); invalid rows
    (s=0, f>=1) clip to -2e9, below every valid key."""
    s_per_tile = TILE_N // POS_SLICE

    def kern(q_ref, qm_ref, f_ref, g_ref, m_ref, b_ref, codes_ref, out_ref):
        q = q_ref[:]
        lane = None
        for t in range(sub):
            sl = slice(t * TILE_N, (t + 1) * TILE_N)
            if packed_int4:
                dots = _packed_int4_dots(q, codes_ref, sl)
            else:
                c = codes_ref[sl, :]
                if q.dtype == jnp.int8:
                    dots = lax.dot_general(
                        q, c, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    ).astype(jnp.float32)
                else:
                    dots = lax.dot_general(
                        q, c, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
            s = dots * m_ref[:, sl]
            if use_qm:  # euclidean: row bias is not query-scaled
                s = s * qm_ref[:]
            s = (s + b_ref[:, sl] - f_ref[:]) * g_ref[:]
            # round+clip+convert measured FASTEST of the monotone f32->i32
            # chains on Mosaic (exp_pos_key: 4.56 ms/batch vs 5.26 trunc,
            # 6.40 lax.round, 4.58 no-cancel fold; bitcast floor 3.56) —
            # the ~1 ms/batch window-key overhead buys near-tie recall
            # (0.9734 == masked ceiling at 2M x 768 vs bitcast collapse)
            si = jnp.clip(jnp.round(s), -2.0e9, 2.0e9).astype(jnp.int32)
            if lane is None:
                lane = (lax.broadcasted_iota(jnp.int32, s.shape, 1)
                        & POS_LANE_MASK)
            key = (si & jnp.int32(~POS_LANE_MASK)) | lane
            for sidx in range(s_per_tile):
                ssl = slice(sidx * POS_SLICE, (sidx + 1) * POS_SLICE)
                out_ref[0, :, t * s_per_tile + sidx] = jnp.max(
                    key[:, ssl], axis=1)

    return kern


@functools.partial(jax.jit, static_argnames=("n_tiles", "use_qm"))
def _pos_scan(codes, q, qm, f, g, m, b, *, n_tiles, use_qm):
    """Run the positive-packed kernel.  Returns keys [B, n_slices] int32
    where key = (round((score - f) * g) & ~1023) | lane; slice i covers
    rows [i*1024, (i+1)*1024).  ``f``/``g`` [B, 1] are the per-query
    window offset and gain (f=0, g=1 degrades to raw-score keys)."""
    bq, w = q.shape
    packed = codes.dtype == jnp.uint8
    if packed:
        q = jnp.concatenate([q[:, 0::2], q[:, 1::2]], axis=1)
    cw = codes.shape[1]
    bt = _pick_bt(bq, cw * codes.dtype.itemsize if packed else 0)
    nb = bq // bt
    sub = _pick_sub(codes.shape[0], n_tiles, cw * codes.dtype.itemsize)
    n_big = -(-n_tiles // sub)
    big_n = sub * TILE_N
    spt = sub * (TILE_N // POS_SLICE)

    out = pl.pallas_call(
        _make_pos_kernel(sub, packed, use_qm),
        grid=(n_big, nb),
        in_specs=[
            pl.BlockSpec((bt, q.shape[1]), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, big_n), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, big_n), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((big_n, cw), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bt, spt), lambda j, i: (j, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_big, bq, spt), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * bq * w * n_big * big_n,
            bytes_accessed=(n_big * big_n * cw * codes.dtype.itemsize
                            + bq * w + bq * n_big * spt * 4),
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(q, qm, f, g, m, b, codes)
    return out.transpose(1, 0, 2).reshape(bq, n_big * spt)


# ---------------------------------------------------------------------------
# Intkey scan — the raw-integer ranking variant for big COSINE stores.
#
# The pos path still pays ~5 f32 VPU ops/element to make absmax-quantized
# dots cross-row comparable (dots * rowmult + bias, window shift/gain) plus
# the float->int round.  The intkey path removes scoring math from the kernel entirely by
# changing the CODES instead: a second int8 plane quantized with a SHARED
# per-row scale (|x|/127 — "unit codes", c8u ~ 127 * x/|x|) makes the raw
# int32 MXU dot itself rank cosine similarity across rows.  The kernel is
# then just
#
#     key[b, slice] = max over slice of (dot(q8, c8u) << 10) | lane
#
# 3 integer VPU ops/element (shift, or, max) and nothing else.  The shift
# cannot wrap: |c8u|_2 <= 127 + rounding, |q8|_2 <= 127*sqrt(W), so
# |dot| < 2^18 for W <= 2048 and the key fits int32 with FULL dot precision
# (unlike the pos key, no value bits are sacrificed to the lane).
#
# Unit codes are ~3x coarser per element than absmax codes (the row's energy
# spreads over sqrt(D) lanes), which is fine for slice-winner SELECTION but
# not for final ranking — the pool rescore gathers the store's ABSMAX plane
# and re-ranks exactly (measured on the config-3 corpus: candidate recall
# 0.9227 intkey-select + absmax-rescore vs 0.9234 pos-select at pool 64;
# rescoring with the unit plane itself collapses to 0.77).  Costs: a second
# [N, W] int8 plane in HBM (2x code memory — still under the f32 rows the
# reference stores), maintained by insert/delete and derivable on device
# from the absmax plane (requantize) for restored snapshots.
#
# Deleted rows hold ZERO unit codes: their key is (0 << 10) | lane, ranked
# below every positive-dot row, and the exact rescore rejects any that still
# reach the pool (bias -1e30).  A deleted row can displace one pool slot
# only in the corner where every valid row in its slice scores negative for
# that query — same approximation class as the pos path's slice-top-1.
#
# Measured (v5e, 1.2M x 128, same window): intkey scan 2.94 ms vs pos scan
# 3.34 ms per 1024-query batch, with the software-pipelined sub=8 body
# (exp_intkey_pipe.py) at 2.84-2.94 ms vs the MXU floor of 2.10 ms.
#
# EUCLIDEAN / DOT (round 5, exp_intkey_l2.py): the same trick extends to the
# other two MXU metrics via a MAGNITUDE plane c8m = round(127 * x / S) with
# one GLOBAL scale S >= max row norm ("plane scale"): |c8m|_2 <= 127 keeps
# the raw dot inside the same 2^18-class bound, and D = q8 . c8m is
# proportional to q.x ACROSS rows.  metric=dot therefore reuses _intkey_scan
# verbatim on the magnitude plane.  metric=euclidean ranks 2 q.x - |x|^2;
# with a BATCH-shared query scale s_b (instead of per-query absmax) the row
# bias quantizes into the same scaled-int domain as D —
# bias_i = round(127 |x_i|^2 / (2 S s_b)), one O(N) elementwise multiply per
# batch — and the kernel computes ((D - bias) << 10) | lane, 4 integer VPU
# ops/element (_l2key_scan) vs the pos path's ~6 f32 ops + round.  Measured
# at 1.2M x 128 (config-3-class width, where extraction is ~30% of scan):
# euclid 1.41x device-true over the pos path at equal recall (0.9352 vs
# 0.9342), dot 1.58x (0.9725 vs 0.9718).  At W=768 the scan is MXU-bound and
# the key trick measured 1.00-1.04x — the plane still ships there (no
# regression), the win is at narrow rows.  Bound: bias is clamped to 2^20 so
# (D - bias) << 10 cannot wrap int32 for W <= 2048; rows whose true bias
# exceeds the clamp (queries ~130x smaller than the largest row norm) degrade
# to selection-grade ties at the bottom and the exact rescore re-ranks any
# that reach the pool.
# ---------------------------------------------------------------------------

INTKEY_SHIFT = 10  # log2(POS_SLICE): low bits carry the lane


def _make_intkey_kernel(sub: int):
    """Software-pipelined intkey body: sub-tile t+1's MXU dot is issued
    before sub-tile t's VPU extraction, so Mosaic can overlap them (the
    naive dot->extract body measured exactly additive)."""
    s_per_tile = TILE_N // POS_SLICE

    def dot_tile(q, codes_ref, t):
        sl = slice(t * TILE_N, (t + 1) * TILE_N)
        return lax.dot_general(q, codes_ref[sl, :], (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.int32)

    def kern(q_ref, codes_ref, out_ref):
        q = q_ref[:]

        def extract(d, lane, t):
            kk = (d << INTKEY_SHIFT) | lane
            for sx in range(s_per_tile):
                ssl = slice(sx * POS_SLICE, (sx + 1) * POS_SLICE)
                out_ref[0, :, t * s_per_tile + sx] = jnp.max(
                    kk[:, ssl], axis=1)

        d_prev = dot_tile(q, codes_ref, 0)
        lane = (lax.broadcasted_iota(jnp.int32, d_prev.shape, 1)
                & POS_LANE_MASK)
        for t in range(sub - 1):
            d_next = dot_tile(q, codes_ref, t + 1)
            extract(d_prev, lane, t)
            d_prev = d_next
        extract(d_prev, lane, sub - 1)

    return kern


@functools.partial(jax.jit, static_argnames=("n_tiles",))
def _intkey_scan(codes_unit, q_in, *, n_tiles):
    """Raw-int-dot scan over the unit plane.  Returns keys [B, n_slices]
    int32 with key = (dot << 10) | lane; slice i covers rows
    [i*1024, (i+1)*1024)."""
    bq, w = q_in.shape
    bt = _pick_bt(bq)
    nb = bq // bt
    # sub=8 halves per-step overhead vs 4 (measured); VMEM at W=128:
    # codes 4 MB + two live [bt, TILE_N] i32 dots 8 MB
    sub = _pick_sub(codes_unit.shape[0], n_tiles, w, max_sub=8)
    n_big = -(-n_tiles // sub)
    big_n = sub * TILE_N
    spt = sub * (TILE_N // POS_SLICE)

    out = pl.pallas_call(
        _make_intkey_kernel(sub),
        grid=(n_big, nb),
        in_specs=[
            pl.BlockSpec((bt, w), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((big_n, w), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bt, spt), lambda j, i: (j, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_big, bq, spt), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * bq * w * n_big * big_n,
            bytes_accessed=n_big * big_n * w + bq * w
            + bq * n_big * spt * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(q_in, codes_unit)
    return out.transpose(1, 0, 2).reshape(bq, n_big * spt)


def _make_l2key_kernel(sub: int):
    """intkey body + per-row integer bias subtract (euclidean ranking):
    key = ((D - bias) << 10) | lane, 4 integer VPU ops/element.  Software-
    pipelined like _make_intkey_kernel (sub-tile t+1's MXU dot issues before
    sub-tile t's extraction)."""
    s_per_tile = TILE_N // POS_SLICE

    def dot_tile(q, codes_ref, t):
        sl = slice(t * TILE_N, (t + 1) * TILE_N)
        return lax.dot_general(q, codes_ref[sl, :], (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.int32)

    def kern(q_ref, codes_ref, bias_ref, out_ref):
        q = q_ref[:]

        def extract(d, lane, t):
            sl = slice(t * TILE_N, (t + 1) * TILE_N)
            kk = ((d - bias_ref[:, sl]) << INTKEY_SHIFT) | lane
            for sx in range(s_per_tile):
                ssl = slice(sx * POS_SLICE, (sx + 1) * POS_SLICE)
                out_ref[0, :, t * s_per_tile + sx] = jnp.max(
                    kk[:, ssl], axis=1)

        d_prev = dot_tile(q, codes_ref, 0)
        lane = (lax.broadcasted_iota(jnp.int32, d_prev.shape, 1)
                & POS_LANE_MASK)
        for t in range(sub - 1):
            d_next = dot_tile(q, codes_ref, t + 1)
            extract(d_prev, lane, t)
            d_prev = d_next
        extract(d_prev, lane, sub - 1)

    return kern


@functools.partial(jax.jit, static_argnames=("n_tiles",))
def _l2key_scan(codes_mag, q_in, bias_int, *, n_tiles):
    """Euclidean integer-key scan over the magnitude plane.  ``bias_int``
    is the per-row [N_cap] int32 quantized -|x|^2/2 bias in the batch's
    scaled-int dot domain (caller clamps it to < 2^20 so the shifted key
    cannot wrap; see the intkey block comment)."""
    bq, w = q_in.shape
    bt = _pick_bt(bq)
    nb = bq // bt
    sub = _pick_sub(codes_mag.shape[0], n_tiles, w, max_sub=8)
    n_big = -(-n_tiles // sub)
    big_n = sub * TILE_N
    spt = sub * (TILE_N // POS_SLICE)

    out = pl.pallas_call(
        _make_l2key_kernel(sub),
        grid=(n_big, nb),
        in_specs=[
            pl.BlockSpec((bt, w), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((big_n, w), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, big_n), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bt, spt), lambda j, i: (j, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_big, bq, spt), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * bq * w * n_big * big_n,
            bytes_accessed=n_big * big_n * w + bq * w + n_big * big_n * 4
            + bq * n_big * spt * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(q_in, codes_mag, bias_int[None, :])
    return out.transpose(1, 0, 2).reshape(bq, n_big * spt)


# keys carry (dot - bias) in the high 22 bits; clamping bias below 2^20
# keeps |(D - bias)| < 2^21 for W <= 2048, so the << 10 never wraps int32
L2KEY_BIAS_MAX = float(1 << 20)


def intkey_applies(metric: str, n_tiles: int, k: int) -> bool:
    """Key-plane gate: pos-path size/k gates, the three MXU metrics
    (cosine rides the unit plane; euclidean/dot the magnitude plane —
    see block comment), and the same EVDB_EXACT_SCAN opt-out."""
    return (POS_PATH_ENABLED and metric in ("cosine", "euclidean", "dot")
            and n_tiles >= POS_MIN_TILES and k <= POS_MAX_K)


def _rescore_pool(codes, q_in, qmult, m, rowbias, top_rows, post, queries,
                  kk, b_orig, pad_b):
    """Shared exact-rescore tail: gather the pool's absmax rows + one packed
    [N, 2] aux plane, re-rank by the exact affine score, map to distances."""
    cand = codes[top_rows]
    if codes.dtype == jnp.uint8:
        hi = (cand >> 4).astype(jnp.int8)
        lo = (cand & 0xF).astype(jnp.int8)
        hi = jnp.where(hi > 7, hi - 16, hi)
        lo = jnp.where(lo > 7, lo - 16, lo)
        cand = jnp.stack([hi, lo], axis=-1).reshape(
            cand.shape[0], cand.shape[1], -1)
    dots = jnp.einsum(
        "bkw,bw->bk", cand, q_in,
        preferred_element_type=jnp.int32 if q_in.dtype == jnp.int8
        else jnp.float32,
    ).astype(jnp.float32)
    # rescore aux rides ONE packed [N, 2] gather: per-pool-row SCALAR
    # gathers are descriptor-bound on TPU, and two separate [B, pool]
    # gathers (rowmult, rowbias) measured ~2.5x the cost of one packed
    # [B, pool, 2] fetch at pool=64
    aux = jnp.stack([m, rowbias.astype(jnp.float32)], axis=1)  # [N, 2]
    auxg = aux[top_rows]                                   # [B, pool, 2]
    exact_vals = dots * qmult * auxg[:, :, 0] + auxg[:, :, 1]
    exact_sorted, sel2 = lax.top_k(exact_vals, kk)
    top_rows = jnp.take_along_axis(top_rows, sel2, axis=1)
    qsq = jnp.sum(queries * queries, axis=-1, keepdims=True)
    dists = post(exact_sorted, qsq)
    dists = jnp.where(exact_sorted <= _NEG / 2, jnp.inf, dists)
    if pad_b:
        dists, top_rows = dists[:b_orig], top_rows[:b_orig]
    return dists, top_rows


def _intkey_topk(codes, codes_unit, norms, valid, queries, q_in, qmult,
                 rowmult, rowbias, post, *, metric, k, n_tiles, b_orig,
                 pad_b, plane_scale=None):
    """Key-plane merge: raw-int-key pool selection + exact absmax-plane
    rescore.  cosine selects on the unit plane and dot on the magnitude
    plane with the same 3-op kernel (any per-query scale preserves
    within-query rank); euclidean folds the row bias into the key domain
    via a BATCH-shared query scale (``plane_scale`` = the magnitude
    plane's global scale S, traced f32 scalar)."""
    if metric == "euclidean":
        # batch-shared re-quantization: one scale for the whole batch so
        # bias_i = 127 |x_i|^2 / (2 S s_b) is a per-row int valid batch-wide
        s_b = jnp.maximum(jnp.max(jnp.abs(queries)), 1e-30) / 127.0
        q8b = jnp.clip(jnp.round(queries / s_b), -127, 127).astype(jnp.int8)
        bias_f = norms * norms * (127.0 / 2.0) / (plane_scale * s_b)
        bias_i = jnp.minimum(bias_f, L2KEY_BIAS_MAX).astype(jnp.int32)
        keys = _l2key_scan(codes_unit, q8b, bias_i, n_tiles=n_tiles)
    else:
        keys = _intkey_scan(codes_unit, q_in, n_tiles=n_tiles)
    kk = min(k, keys.shape[1])
    pool = min(max(4 * kk, 64), keys.shape[1])
    topkeys, sel = lax.top_k(keys, pool)
    top_rows = sel * POS_SLICE + (topkeys & POS_LANE_MASK)
    m = jnp.where(valid, rowmult, 0.0).astype(jnp.float32)
    return _rescore_pool(codes, q_in, qmult, m, rowbias, top_rows, post,
                         queries, kk, b_orig, pad_b)


@functools.partial(jax.jit, static_argnames=("chunk",))
def requantize_unit(codes: jax.Array, scales: jax.Array, norms: jax.Array,
                    valid: jax.Array, chunk: int = 65536) -> jax.Array:
    """Derive the unit plane from an existing absmax int8 plane on device
    (snapshot restore / lazy enable): unit ~ round(codes * 127*scale/norm).
    Double quantization adds ~absmax-step noise — selection-grade (the
    exact rescore uses the absmax plane).  Invalid/zero-norm rows get ZERO
    codes so their intkey ranks below every positive-dot row."""
    f = jnp.where(valid & (norms > 0),
                  127.0 * scales / jnp.where(norms > 0, norms, 1.0), 0.0)
    return _requantize_rows(codes, f, chunk)


@functools.partial(jax.jit, static_argnames=("chunk",))
def requantize_mag(codes: jax.Array, scales: jax.Array, valid: jax.Array,
                   plane_scale, chunk: int = 65536) -> jax.Array:
    """Derive the MAGNITUDE plane (euclidean/dot key plane, 127*x/S with
    the global ``plane_scale`` S) from an existing absmax int8 plane on
    device: mag ~ round(codes * 127*scale/S).  Selection-grade like
    requantize_unit; invalid rows get ZERO codes."""
    f = jnp.where(valid, 127.0 * scales / plane_scale, 0.0)
    return _requantize_rows(codes, f, chunk)


def _requantize_rows(codes, f, chunk):
    n, w = codes.shape
    ch = min(chunk, n)
    n_ch = -(-n // ch)

    def body(i, out):
        c = lax.dynamic_slice(codes, (i * ch, 0), (ch, w))
        fc = lax.dynamic_slice(f, (i * ch,), (ch,))
        u = jnp.clip(jnp.round(c.astype(jnp.float32) * fc[:, None]),
                     -127, 127).astype(jnp.int8)
        return lax.dynamic_update_slice(out, u, (i * ch, 0))

    return lax.fori_loop(0, n_ch, body, jnp.zeros((n, w), jnp.int8))


def _pos_dot_term_bound(codes, scales, norms, rowmult, q_in):
    """Per-row bound on |dots * rowmult| (the ranking dot term).

    Must be TIGHT, not just valid: the per-query window the packed key
    quantizes over is built from this bound, so a loose bound (e.g. the
    blanket 127^2*W Cauchy-Schwarz) stretches the window and quantizes
    real score gaps away.  Per-row, |codes_row|_2 is bounded by
    norms/scale + sqrt(W)/2 (rounding slack; clipping only shrinks), which
    for cosine collapses to |q_in|_2 * (1 + sqrt(W)/(2*127)) — within 5% of
    the true maximum.  All [N]-vector math on existing stats; the corpus is
    never read."""
    w = q_in.shape[1]
    qf = q_in.astype(jnp.float32)
    qb = jnp.sqrt(jnp.max(jnp.sum(qf * qf, axis=-1)))
    if codes.dtype in (jnp.int8, jnp.uint8):
        cb = norms / scales + 0.5 * jnp.sqrt(float(w))
    else:
        cb = norms
    return qb * cb * rowmult     # [N] per-row bound


def _pos_topk(codes, scales, norms, valid, queries, q_in, qmult, rowmult,
              rowbias, post, *, metric, k, n_tiles, b_orig, pad_b):
    """Pos-path merge: packed-key pool selection + exact affine rescore."""
    use_qm = metric == "euclidean"
    dot_term = _pos_dot_term_bound(codes, scales, norms, rowmult, q_in)
    qf = q_in.astype(jnp.float32)
    qb_per = jnp.sqrt(jnp.sum(qf * qf, axis=-1, keepdims=True))  # [B,1]
    qb_all = jnp.maximum(jnp.max(qb_per), 1e-9)
    # per-ROW coefficient max over valid rows (dot_term carries the
    # batch-max query norm; divide it back out for the per-query window)
    row_coef = jnp.max(jnp.where(valid, dot_term, 0.0)) / qb_all
    if use_qm:
        # euclidean keeps qmult on the dot term (the -|x|^2 row bias is not
        # query-scaled, so qmult cannot be dropped from ranking).  The
        # per-query factor must be coupled with each query's own norm:
        # PADDED (all-zero) queries get a defaulted q_scale of 1.0, so a
        # bare max(qmult) can inflate C ~100x, and the packed key's value
        # bits quantize relative to C — real score gaps would vanish.
        qm_eff = jnp.max(qmult * qb_per) / qb_all   # 0-weighted for padding
        C = jnp.max(dot_term * qm_eff + norms * norms) + 1.0
        b = jnp.where(valid, C + rowbias, 0.0).astype(jnp.float32)
        # per-query window: s = (dots*m)*qm + C + rowbias with
        # |dots*m| <= qb_per*row_coef and rowbias in [min_rb, 0]
        rmax_q = qmult * qb_per * row_coef                      # [B, 1]
        min_rb = jnp.min(jnp.where(valid, rowbias, 0.0))
        f = C - rmax_q + min_rb
    else:
        C = jnp.max(dot_term) + 1.0
        b = jnp.where(valid, C, 0.0).astype(jnp.float32)
        # s = dots*m + C with |dots*m| <= qb_per*row_coef
        rmax_q = qb_per * row_coef                              # [B, 1]
        f = C - rmax_q
    # every valid score lies in [f, s_ub]: the window is the PROVABLE
    # per-query score range, so g spends the key's 20 value bits
    # uniformly across it — >=2^7x finer than bitcast's C*2^-13 step
    # (see _make_pos_kernel; same fix as the residual path's measured
    # 0.59 -> 0.94 recall recovery on near-tie corpora)
    s_ub = C + rmax_q
    f = jnp.maximum(f, 0.0).astype(jnp.float32)
    g = (float(1 << 30) - 1.0) / jnp.maximum(s_ub - f, 1e-20)
    g = jnp.where(jnp.isfinite(g) & (g > 0), g, 1.0).astype(jnp.float32)
    m = jnp.where(valid, rowmult, 0.0).astype(jnp.float32)
    keys = _pos_scan(codes, q_in, qmult, f, g, m.reshape(1, -1),
                     b.reshape(1, -1), n_tiles=n_tiles, use_qm=use_qm)
    kk = min(k, keys.shape[1])
    pool = min(max(4 * kk, 64), keys.shape[1])
    topkeys, sel = lax.top_k(keys, pool)
    top_rows = sel * POS_SLICE + (topkeys & POS_LANE_MASK)
    return _rescore_pool(codes, q_in, qmult, m, rowbias, top_rows, post,
                         queries, kk, b_orig, pad_b)


def pos_path_applies(metric: str, n_tiles: int, k: int) -> bool:
    """Big-store gate for the positive-packed scan (see block comment).

    The pos path trades ~0.4-0.8% of true top-k candidates per query (top-1
    per 1024-row slice extraction) for ~1.4x throughput at n_tiles >=
    POS_MIN_TILES.  Set ``EVDB_EXACT_SCAN=1`` (checked at import) or flip
    ``fused_topk.POS_PATH_ENABLED`` to force the (near-)exact
    masked-extraction kernel at any N.
    """
    return (POS_PATH_ENABLED and metric in ("cosine", "euclidean", "dot")
            and n_tiles >= POS_MIN_TILES and k <= POS_MAX_K)


def _make_pos_residual_kernel(sub: int, cell_cap: int,
                              slice_w: int = POS_SLICE, t_top: int = 2):
    """Positive-packed scan for cell-residual (int4r) stores.

    Score (all metrics, divided by the positive per-query factor qmult2):
        s = (dots_res * qA) * mA + tdot * mB + b
    where tdot is the per-(query, cell) centroid-dot bias EXPANDED TO LANES
    BY AN MXU MATMUL against a constant block-indicator matrix E
    [cells_per_tile, TILE_N] (E[c, l] = 1 iff lane l belongs to cell c).
    The masked-extraction kernel expands the same term with an in-kernel
    transpose + broadcast/reshape — both lower to expensive VPU
    lane-shuffles in Mosaic; one [cpt, bt] x [cpt, TILE_N] contraction is
    ~34 M MACs of MXU time instead (and consumes the transposed table
    layout directly, no transpose at all).

    Unlike the plain pos kernel this extracts MULTIPLE keys per slice:
    int4r's cell-major layout puts a row's nearest neighbors in the SAME
    cell, and a cell always fits inside one slice, so slice-top-1
    systematically drops same-cell co-neighbors.

    ``slice_w``/``t_top`` control the extraction structure: top-t_top of
    each slice_w-row slice.  Extraction cost scales with t_top only
    (t_top masked-max passes x TILE_N lanes, width-independent); output
    columns scale with t_top / slice_w.  On manifold corpora the true
    top-k concentrate in ~2-4 CELLS (measured 8M x 768: mean 3.5 distinct
    cells hold the top-10), so per-slice capacity — not key precision —
    bounds candidate recall: with PERFECT keys, top-2/1024 caps at 0.595
    there, top-4 at 0.875, top-8 at 0.998 (exp_slice_diag); the real
    kernel at top-8/1024 measures 0.9415 == the multiprobe ceiling on
    the same build."""
    s_per_tile = TILE_N // slice_w
    lane_mask = slice_w - 1          # python int: jnp consts can't be
    cpt = TILE_N // cell_cap         # closure-captured by a pallas kernel

    def kern(q_ref, qa_ref, f_ref, g_ref, ma_ref, mb_ref, b_ref, table_ref,
             codes_ref, out_ref):
        q = q_ref[:]
        lane = None
        ecell = None
        for t in range(sub):
            sl = slice(t * TILE_N, (t + 1) * TILE_N)
            dots = _packed_int4_dots(q, codes_ref, sl)
            if ecell is None:
                cell_of_lane = (
                    lax.broadcasted_iota(jnp.int32, (cpt, TILE_N), 1)
                    // cell_cap)
                cell_idx = lax.broadcasted_iota(jnp.int32, (cpt, TILE_N), 0)
                ecell = (cell_of_lane == cell_idx).astype(jnp.float32)
                lane = (lax.broadcasted_iota(jnp.int32, dots.shape, 1)
                        & jnp.int32(lane_mask))
            # [cpt, bt] x [cpt, TILE_N] -> [bt, TILE_N] (contract cell dim);
            # consumes the transposed table block directly
            tdot = lax.dot_general(
                table_ref[t * cpt:(t + 1) * cpt, :], ecell,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # SCALED-INT key: (s - f) * g quantized to int32.  f is a
            # provable per-query lower bound on the near-top scores and
            # g = (2^30-1) / (s_ub - f) a provable gain (see caller), so
            # valid scores land in [?, 2^30) — the key's 20 usable value
            # bits are spent UNIFORMLY across the query's own score range
            # instead of bitcast-relative to the global offset C (2^13
            # levels at the band; measured collapsing to ~16 effective
            # levels on the 8M near-tie corpus, recall 0.59).  Scores
            # below the window go negative and rank below all positives
            # (junk candidates, discarded by the exact rescore).  ~4 extra
            # VPU ops/element; at wide D the scan is MXU/HBM bound.
            s = ((dots * qa_ref[:]) * ma_ref[:, sl] + tdot * mb_ref[:, sl]
                 + b_ref[:, sl] - f_ref[:]) * g_ref[:]
            # round+clip+convert: fastest monotone chain (_make_pos_kernel)
            si = jnp.clip(jnp.round(s), -2.0e9, 2.0e9).astype(jnp.int32)
            key = (si & jnp.int32(~lane_mask)) | lane
            imin = jnp.int32(-2147483648)
            for sidx in range(s_per_tile):
                ssl = slice(sidx * slice_w, (sidx + 1) * slice_w)
                kb = key[:, ssl]
                o = t_top * (t * s_per_tile + sidx)
                for r in range(t_top):
                    m = jnp.max(kb, axis=1)
                    out_ref[0, :, o + r] = m
                    if r + 1 < t_top:
                        # lane bits make keys unique: exactly one masked
                        kb = jnp.where(kb == m[:, None], imin, kb)

    return kern


@functools.partial(jax.jit, static_argnames=("n_tiles", "cell_cap",
                                              "slice_w", "t_top"))
def _pos_residual_scan(codes, q, qa, f, g, ma, mb, b, table, *, n_tiles,
                       cell_cap, slice_w=POS_SLICE, t_top=2):
    """Scaled-int-key residual scan; returns keys [B, t_top*n_slices]
    int32 — the top-t_top of slice s at columns t_top*s .. t_top*s+t_top-1
    (row = (col//t_top)*slice_w + (key & (slice_w-1))).  ``f``/``g``
    [B, 1] are the per-query window offset and gain: key value =
    round((s - f) * g) with the low log2(slice_w) bits replaced by the
    lane (f=0, g=1 degrades to raw-score keys)."""
    bq, w = q.shape
    q = jnp.concatenate([q[:, 0::2], q[:, 1::2]], axis=1)
    cw = codes.shape[1]
    bt = _pick_bt(bq, cw)
    nb = bq // bt
    # deep extraction (t_top > 4) keeps a longer masked-max temp chain
    # live in scoped VMEM; shrink the codes double-buffer (sub=1) to make
    # room — measured: sub=2 + t_top=8 exceeds the 16 MB scoped limit by
    # 1.5 MB at W=768, sub=1 frees 3.1 MB
    sub = _pick_sub(codes.shape[0], n_tiles, cw,
                    max_sub=2 if t_top <= 4 else 1)
    n_big = -(-n_tiles // sub)
    big_n = sub * TILE_N
    spt = t_top * sub * (TILE_N // slice_w)   # top-t_top keys per slice
    cells_per_big = big_n // cell_cap

    out = pl.pallas_call(
        _make_pos_residual_kernel(sub, cell_cap, slice_w, t_top),
        grid=(n_big, nb),
        in_specs=[
            pl.BlockSpec((bt, w), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, big_n), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, big_n), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, big_n), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            # transposed [cells, B] table block (Mosaic lane alignment);
            # the kernel contracts it without transposing back
            pl.BlockSpec((cells_per_big, bt), lambda j, i: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((big_n, cw), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bt, spt), lambda j, i: (j, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_big, bq, spt), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * bq * w * n_big * big_n,
            bytes_accessed=(n_big * big_n * cw + bq * w
                            + bq * n_big * spt * 4),
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(q, qa, f, g, ma, mb, b, table, codes)
    return out.transpose(1, 0, 2).reshape(bq, n_big * spt)


@functools.partial(jax.jit,
                   static_argnames=("n_tiles", "t_per_tile", "cell_cap"))
def _fused_scan(codes, q, qmult, rowmult, rowbias, qmult2=None, rowmult2=None,
                table=None, *, n_tiles, t_per_tile, cell_cap=0):
    """Run the scan kernel. codes [N, W] (or packed uint8 [N, W/2]);
    q [B, W]; qmult [B, 1]; rowmult/rowbias [1, N].  Returns
    (vals [B, T*sub*n_big], rows) covering at least n_tiles*TILE_N rows.

    Residual (int4r) stores additionally pass ``cell_cap`` (rows per cell,
    dividing TILE_N), ``table`` [B, K] per-(query, cell) raw dots, and the
    second affine pair qmult2 [B,1] / rowmult2 [1, N] scaling the table term."""
    b, w = q.shape
    packed = codes.dtype == jnp.uint8
    if packed:
        # reorder query to [evens | odds] so the kernel's half-width matmuls
        # line up with the hi/lo nibble planes (see _make_scan_kernel)
        q = jnp.concatenate([q[:, 0::2], q[:, 1::2]], axis=1)
    cw = codes.shape[1]
    bt = _pick_bt(b, cw * codes.dtype.itemsize if (packed or cell_cap) else 0)
    nb = b // bt
    t = t_per_tile
    # two TILE_N sub-tiles per grid step when capacity allows (fewer grid
    # steps) — but only while the doubled code tile still fits VMEM next to
    # the [bt, TILE_N] scores buffer (~16 MB budget): wide rows get sub=1.
    n_cap = codes.shape[0]
    bytes_per_row = cw * codes.dtype.itemsize
    sub = (
        2
        if n_cap % (2 * TILE_N) == 0 and n_tiles > 1 and bytes_per_row <= 256
        and not cell_cap  # residual path: keep VMEM room for the bias expand
        else 1
    )
    n_big = -(-n_tiles // sub)
    big_n = sub * TILE_N
    grid = (n_big, nb)  # codes-tile outer, so each code tile is DMA'd once

    flops = 2 * b * w * n_big * big_n
    bytes_accessed = (
        n_big * big_n * w * codes.dtype.itemsize + b * w + b * n_big * t * sub * 8
    )

    in_specs = [
        pl.BlockSpec((bt, w), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bt, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((big_n, cw), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, big_n), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, big_n), lambda j, i: (0, j), memory_space=pltpu.VMEM),
    ]
    operands = [q, qmult, codes, rowmult, rowbias]
    if cell_cap:
        cells_per_big = big_n // cell_cap
        in_specs += [
            pl.BlockSpec((bt, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, big_n), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            # transposed [cells, B]: (cells_per_big, bt) satisfies Mosaic's
            # (sublane % 8, lane % 128) block rules where (bt, cpb) cannot
            pl.BlockSpec((cells_per_big, bt), lambda j, i: (j, i),
                         memory_space=pltpu.VMEM),
        ]
        operands += [qmult2, rowmult2, table]

    vals, rows = pl.pallas_call(
        _make_scan_kernel(t, sub, packed, cell_cap),
        grid=grid,
        in_specs=in_specs,
        # Outputs are [n_big, B, T*sub] so each block's trailing dims equal
        # the array dims (a Mosaic layout requirement); flattened for the
        # caller's merge.
        out_specs=[
            pl.BlockSpec((1, bt, t * sub), lambda j, i: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, t * sub), lambda j, i: (j, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_big, b, t * sub), jnp.float32),
            jax.ShapeDtypeStruct((n_big, b, t * sub), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=jax.default_backend() != "tpu",  # CPU CI runs interpreted
    )(*operands)
    vals = vals.transpose(1, 0, 2).reshape(b, t * sub * n_big)
    rows = rows.transpose(1, 0, 2).reshape(b, t * sub * n_big)
    return vals, rows


def _affine_factors(metric, scales, norms, valid, queries):
    """Per-row and per-query affine factors for the kernel (see module doc).
    queries are f32 [B, D_pad]; returns (q_i8_or_f32, qmult, rowmult, rowbias,
    postprocess_fn(vals)->distances)."""
    b = queries.shape[0]
    if scales is not None:  # int8 store: quantize queries symmetrically
        q_absmax = jnp.max(jnp.abs(queries), axis=-1, keepdims=True)
        q_scale = jnp.where(q_absmax > 0, q_absmax / 127.0, 1.0)
        q_in = jnp.clip(jnp.round(queries / q_scale), -127, 127).astype(jnp.int8)
        row_scale = scales
    else:
        q_scale = jnp.ones((b, 1), jnp.float32)
        q_in = queries
        row_scale = jnp.ones_like(norms)

    invalid_bias = jnp.where(valid, 0.0, _NEG)

    if metric == "cosine":
        qn = jnp.sqrt(jnp.sum(queries * queries, axis=-1, keepdims=True))
        qmult = jnp.where(qn > 0, q_scale / jnp.where(qn > 0, qn, 1.0), 0.0)
        rowmult = jnp.where(norms > 0, row_scale / jnp.where(norms > 0, norms, 1.0), 0.0)
        rowbias = invalid_bias
        post = lambda vals, qsq: 1.0 - vals
    elif metric == "dot":
        qmult = q_scale
        rowmult = row_scale
        rowbias = invalid_bias
        post = lambda vals, qsq: -vals
    elif metric == "euclidean":
        qmult = 2.0 * q_scale
        rowmult = row_scale
        rowbias = -(norms * norms) + invalid_bias
        post = lambda vals, qsq: jnp.sqrt(jnp.maximum(qsq - vals, 0.0))
    else:
        raise ValueError(f"fused path does not support metric {metric!r}")
    return q_in, qmult, rowmult, rowbias, post


@functools.partial(jax.jit, static_argnames=("metric", "k", "n_tiles"))
def fused_topk(
    codes: jax.Array,            # [N_cap, W] int8 or f32, W % 128 == 0
    scales,                      # [N_cap] f32 for int8 stores, None for f32
    norms: jax.Array,            # [N_cap] f32 norms of original rows
    valid: jax.Array,            # [N_cap] bool
    queries: jax.Array,          # [B, W] f32
    *,
    metric: str,
    k: int,
    n_tiles: int,                # scan only the first n_tiles*TILE_N rows
    codes_unit: Optional[jax.Array] = None,  # [N_cap, W] int8 key plane
    plane_scale=None,            # traced f32 scalar: magnitude-plane S
) -> Tuple[jax.Array, jax.Array]:
    """Fused scan + candidate top-k. Returns (distances [B, k], rows [B, k]).

    ``codes_unit``: optional shared-scale int8 key plane for the intkey
    scan — selection by raw int32 dots, exact rescore on the absmax plane
    (big-store gated; see the intkey block comment).  For cosine this is
    the UNIT plane (127*x/|x|); for euclidean/dot the MAGNITUDE plane
    (127*x/S) whose global scale ``plane_scale`` the euclidean bias fold
    needs."""
    b = queries.shape[0]
    bt = _pick_bt(b)
    pad_b = (-b) % bt
    if pad_b:
        queries = jnp.pad(queries, ((0, pad_b), (0, 0)))

    # No slicing: the kernel's index maps only touch the first n_tiles
    # blocks of the full-capacity arrays (slicing would copy 100s of MB).
    q_in, qmult, rowmult, rowbias, post = _affine_factors(
        metric, scales, norms, valid, queries,
    )

    if codes_unit is not None and intkey_applies(metric, n_tiles, k):
        return _intkey_topk(codes, codes_unit, norms, valid, queries, q_in,
                            qmult, rowmult, rowbias, post, metric=metric,
                            k=k, n_tiles=n_tiles, b_orig=b, pad_b=pad_b,
                            plane_scale=plane_scale)

    if pos_path_applies(metric, n_tiles, k):
        return _pos_topk(codes, scales, norms, valid, queries, q_in, qmult,
                         rowmult, rowbias, post, metric=metric, k=k,
                         n_tiles=n_tiles, b_orig=b, pad_b=pad_b)

    # Per-tile extraction depth: with many tiles, top-2 per tile loses a
    # candidate only when >=3 of the true top-k collide in one 4096-row tile
    # (P ~ C(k,3)/n_tiles^2).  Deepen extraction as tiles get scarce; for
    # k <= t_per_tile the candidate set is exact regardless of distribution.
    t_per_tile = 2
    while t_per_tile < MAX_T_PER_TILE and t_per_tile * n_tiles < max(k, 512):
        t_per_tile *= 2
    vals, rows = _fused_scan(
        codes,
        q_in,
        qmult,
        rowmult.reshape(1, -1),
        rowbias.reshape(1, -1),
        n_tiles=n_tiles,
        t_per_tile=t_per_tile,
    )
    kk = min(k, vals.shape[1])
    pool = min(max(4 * kk, 32), vals.shape[1])
    _pv, sel = lax.top_k(vals, pool)                       # [B+pad, pool]
    top_rows = jnp.take_along_axis(rows, sel, axis=1)
    # Exact rescore of a 4x candidate pool: the in-kernel packed extraction
    # keeps only an 11-bit value mantissa (selection-grade); one tiny
    # gather + batched dot recomputes the pool's exact affine scores, so
    # selection AND reported distances match the unfused XLA path.
    return _rescore_pool(codes, q_in, qmult, rowmult, rowbias, top_rows,
                         post, queries, kk, b, pad_b)


def _affine_factors_residual(metric, scales, norms, valid, queries, qn):
    """Second affine pair for the residual (cluster-bias) term: the score is
    dot(q, x) = dot(q, c_cell) + dot(q, res); the kernel computes
    ``dots_res * qmult * rowmult + table * qmult2 * rowmult2 + rowbias``.
    Returns (qmult2 [B,1], rowmult2 [N])."""
    if metric == "cosine":
        qmult2 = jnp.where(qn > 0, 1.0 / jnp.where(qn > 0, qn, 1.0), 0.0)
        rowmult2 = jnp.where(norms > 0, 1.0 / jnp.where(norms > 0, norms, 1.0),
                             0.0)
    elif metric == "dot":
        qmult2 = jnp.ones_like(qn)
        rowmult2 = jnp.ones_like(norms)
    elif metric == "euclidean":
        qmult2 = jnp.full_like(qn, 2.0)
        rowmult2 = jnp.ones_like(norms)
    else:
        raise ValueError(f"residual path does not support metric {metric!r}")
    return qmult2, rowmult2


@functools.partial(jax.jit, static_argnames=("chunk",))
def max_code_norm(codes: jax.Array, chunk: int = 4096) -> jax.Array:
    """max over rows of |unpacked int4 code|_2 — the REALIZED bound for the
    pos path's positive offset C.

    The worst-case bound 8*sqrt(W) assumes an all-sevens row; real residual
    codes sit far below it (measured 5-20x), and the packed key's value
    bits quantize relative to C, so the realized bound is worth 2-4 extra
    bits of score resolution — the difference between resolving and
    collapsing near-tie corpora (BENCH_NOTES 'packed-scan keys').  Chunked
    fori so the int32 unpack scratch stays ~<= chunk * W * 4 bytes."""
    n, hw = codes.shape
    n_ch = -(-n // chunk)

    def body(i, best):
        c = lax.dynamic_slice(codes, (i * chunk, 0), (chunk, hw))
        ci = c.astype(jnp.int32)
        hi = ci >> 4
        lo = ci & 0xF
        hi = jnp.where(hi > 7, hi - 16, hi)
        lo = jnp.where(lo > 7, lo - 16, lo)
        n2 = jnp.sum((hi * hi + lo * lo).astype(jnp.float32), axis=1)
        return jnp.maximum(best, jnp.max(n2))

    # rows past n are padding zeros in a fixed-capacity layout, and a
    # trailing partial chunk re-reads earlier rows (dynamic_slice clamps) —
    # both only ever LOWER the max, never inflate it
    best = lax.fori_loop(0, n_ch, body, jnp.float32(0))
    return jnp.sqrt(best)


@functools.partial(jax.jit,
                   static_argnames=("metric", "k", "n_tiles", "cell_cap",
                                    "slice_w", "t_top"))
def fused_topk_residual(
    codes: jax.Array,       # [N_cap, W/2] packed int4 RESIDUAL codes
    scales: jax.Array,      # [N_cap] f32 residual scales
    norms: jax.Array,       # [N_cap] f32 norms of the ORIGINAL rows
    valid: jax.Array,       # [N_cap] bool
    centroids: jax.Array,   # [K, W] f32 cell centroids
    queries: jax.Array,     # [B, W] f32
    *,
    metric: str,
    k: int,
    n_tiles: int,
    cell_cap: int,          # rows per cell; divides TILE_N; N_cap == K*cell_cap
    code_norm_bound: Optional[jax.Array] = None,  # realized max |code|_2
    slice_w: int = POS_SLICE,  # extraction slice width (divides TILE_N)
    t_top: int = 2,            # keys kept per slice (extract cost ~ t_top)
) -> Tuple[jax.Array, jax.Array]:
    """Fused scan over a cell-residual int4 store: per-row int4 residual dot
    on the MXU + per-(query, cell) centroid-dot bias expanded in-kernel.
    Quantization error shrinks by the residual/full norm ratio (~3-4x on
    clustered corpora), which is what makes 4-bit rows usable for search."""
    b = queries.shape[0]
    bt = _pick_bt(b)
    pad_b = (-b) % bt
    if pad_b:
        queries = jnp.pad(queries, ((0, pad_b), (0, 0)))

    t_per_tile = 2
    while t_per_tile < MAX_T_PER_TILE and t_per_tile * n_tiles < max(k, 512):
        t_per_tile *= 2

    q_in, qmult, rowmult, rowbias, post = _affine_factors(
        metric, scales, norms, valid, queries,
    )
    qn = jnp.sqrt(jnp.sum(queries * queries, axis=-1, keepdims=True))
    qmult2, rowmult2 = _affine_factors_residual(
        metric, scales, norms, valid, queries, qn)
    # per-(query, cell) raw centroid dots; pad the cell axis to cover the
    # scan's big tiles exactly.  Kept [B, K] for the rescore gather; the
    # scan takes the TRANSPOSE (Mosaic lane-alignment, see _fused_scan).
    table = jnp.dot(queries, centroids.T, preferred_element_type=jnp.float32)
    # pad the cell axis to the scan's worst-case big-tile coverage (sub=2
    # rounds n_tiles up to even, so cover ceil(n_tiles/2)*2 tiles)
    need_cells = (-(-n_tiles // 2) * 2) * TILE_N // cell_cap
    if table.shape[1] < need_cells:
        table = jnp.pad(table, ((0, 0), (0, need_cells - table.shape[1])))
    if pos_path_applies(metric, n_tiles, k):
        # positive-packed residual scan (ranking score = s / qmult2, the
        # positive per-query factor; the exact rescore below restores true
        # distances).  Kernel: s = (dots * qA) * mA + tdot * mB + b.
        if metric == "cosine":
            qa = qmult * qn                 # = q_scale, 0 for zero-norm q
        elif metric == "dot":
            qa = qmult
        else:                              # euclidean: qmult = 2 * q_scale
            qa = qmult * 0.5
        w = q_in.shape[1]
        qf = q_in.astype(jnp.float32)
        # couple the per-query factor with that query's own int8 norm:
        # padded queries (q_in == 0, defaulted q_scale 1.0) contribute 0,
        # and the bound stays tight — a loose C quantizes real score gaps
        # out of the packed key's value bits (see _pos_topk)
        qb_per = jnp.sqrt(jnp.sum(qf * qf, axis=-1, keepdims=True))  # [B,1]
        # code-norm bound: the REALIZED max |code|_2 when the caller has it
        # (stores cache max_code_norm; 5-20x under the all-sevens worst
        # case) — every factor of 2 saved here is one more usable bit of
        # score resolution in the packed key.  An underestimate (stale
        # cache after inserts) is SAFE: scores below the window go
        # negative and rank last, which only affects worst-match rows.
        cnb = (code_norm_bound if code_norm_bound is not None
               else 8.0 * jnp.sqrt(float(w)))
        dots_bound = jnp.max(qa * qb_per) * cnb
        C = (dots_bound * jnp.max(rowmult)
             + jnp.max(jnp.abs(table)) * jnp.max(rowmult2) + 1.0)
        extra = -0.5 * norms * norms if metric == "euclidean" else 0.0
        ma = jnp.where(valid, rowmult, 0.0).astype(jnp.float32)
        mb = jnp.where(valid, rowmult2, 0.0).astype(jnp.float32)
        if metric == "euclidean":
            C = C + 0.5 * jnp.max(norms * norms)
        bb = jnp.where(valid, C + extra, 0.0).astype(jnp.float32)
        # Per-query WINDOW (f) + GAIN (g): scores span [0, ~2C] but the
        # top-k band's gaps are tiny — a bitcast key's 13 mantissa bits
        # quantize RELATIVE to C and collapse to ~16 effective levels on
        # near-tie corpora (measured 0.59 recall at 8M x 768 vs the 0.94
        # code ceiling; window-shift alone did not move it: 0.60).  So
        # bound each query's score range PROVABLY on both sides and spend
        # the key's 20 value bits uniformly across it:
        #   f  = lower bound on the near-top band.  Achievable-row: for
        #        any cell c with a valid row, s_top >= cellterm_c +
        #        extra_min_c + C - rmax (the residual dot is >= -rmax,
        #        and cellterm_c = max over the cell's rows of tdot_c*mb
        #        is attained by a real row); maximize over cells, subtract
        #        ONE extra rmax as the top-k band margin — a true top-k
        #        row can fall under f only if the band spans > rmax, which
        #        rmax (a bound on the only per-row score term) forbids.
        #   s_ub = upper bound on ANY valid score: max_c(cellterm_c +
        #        extra_max_c) + C + rmax.
        #   g  = (2^30 - 1) / (s_ub - f): keys hit [0, 2^30) exactly, no
        #        saturation, ~2^20 uniform levels across the real range —
        #        vs bitcast's C * 2^-13 absolute step, a >= 128x finer
        #        grid wherever s_ub - f <= 2C (always).
        # Scores under the window go negative and rank below all
        # positives, costing only junk candidates the rescore discards.
        kreal = mb.shape[0] // cell_cap
        validc = valid.reshape(kreal, cell_cap)
        has_valid = jnp.any(validc, axis=1)
        mbc = mb.reshape(kreal, cell_cap)
        mbmax_c = jnp.max(mbc, axis=1)
        mbmin_c = jnp.min(jnp.where(validc, mbc, jnp.inf), axis=1)
        if metric == "euclidean":
            extrac = extra.reshape(kreal, cell_cap)
            extramin_c = jnp.min(jnp.where(validc, extrac, jnp.inf), axis=1)
            extramax_c = jnp.max(jnp.where(validc, extrac, -jnp.inf), axis=1)
        else:
            extramin_c = jnp.zeros_like(mbmax_c)
            extramax_c = extramin_c
        tb = table[:, :kreal]
        cellterm = jnp.where(tb >= 0, tb * mbmax_c[None, :],
                             tb * mbmin_c[None, :])
        cell_lb = jnp.where(has_valid[None, :],
                            cellterm + extramin_c[None, :], -jnp.inf)
        cell_ub = jnp.where(has_valid[None, :],
                            cellterm + extramax_c[None, :], -jnp.inf)
        rmax_q = jnp.abs(qa) * qb_per * cnb * jnp.max(ma)       # [B, 1]
        top_lb = jnp.max(cell_lb, axis=1, keepdims=True)        # [B, 1]
        top_ub = jnp.max(cell_ub, axis=1, keepdims=True)        # [B, 1]
        f = jnp.maximum(top_lb + C - 2.0 * rmax_q, 0.0)
        f = jnp.where(jnp.isfinite(f), f, 0.0).astype(jnp.float32)
        s_ub = top_ub + C + rmax_q
        g = (float(1 << 30) - 1.0) / jnp.maximum(s_ub - f, 1e-20)
        g = jnp.where(jnp.isfinite(g) & (g > 0), g, 1.0).astype(jnp.float32)
        keys = _pos_residual_scan(
            codes, q_in, qa, f, g, ma.reshape(1, -1), mb.reshape(1, -1),
            bb.reshape(1, -1), table.T, n_tiles=n_tiles, cell_cap=cell_cap,
            slice_w=slice_w, t_top=t_top)
        kk = min(k, keys.shape[1])
        # Deep pool (8k, >=256): on near-tie corpora the surviving score
        # quantization makes the top tens of keys interchangeable; the
        # exact f32 rescore below recovers ids as long as the true top-k
        # are IN the pool.  Rescore cost grows linearly in pool and is a
        # small fraction of the scan.
        pool = min(max(8 * kk, 256), keys.shape[1])
        topkeys, sel = lax.top_k(keys, pool)
        # columns come in top-t_top-per-slice runs: slice = col // t_top
        top_rows = ((sel // t_top) * slice_w
                    + (topkeys & jnp.int32(slice_w - 1)))
    else:
        vals, rows = _fused_scan(
            codes,
            q_in,
            qmult,
            rowmult.reshape(1, -1),
            rowbias.reshape(1, -1),
            qmult2,
            rowmult2.reshape(1, -1),
            table.T,
            n_tiles=n_tiles,
            t_per_tile=t_per_tile,
            cell_cap=cell_cap,
        )
        kk = min(k, vals.shape[1])
        pool = min(max(4 * kk, 32), vals.shape[1])
        _pv, sel = lax.top_k(vals, pool)
        top_rows = jnp.take_along_axis(rows, sel, axis=1)
    # f32-query rescore of a 4x candidate pool: the scan quantizes queries
    # to int8 for the MXU; re-scoring the pool with the RAW query removes
    # that noise from the final ranking (the per-metric query factor for a
    # raw-dot is exactly qmult2 — the same one the centroid table uses)
    cand = codes[top_rows]
    hi = (cand >> 4).astype(jnp.int8)
    lo = (cand & 0xF).astype(jnp.int8)
    hi = jnp.where(hi > 7, hi - 16, hi)
    lo = jnp.where(lo > 7, lo - 16, lo)
    cand = jnp.stack([hi, lo], axis=-1).reshape(
        cand.shape[0], cand.shape[1], -1)
    dots = jnp.einsum("bkw,bw->bk", cand.astype(jnp.float32), queries,
                      preferred_element_type=jnp.float32)
    tgath = jnp.take_along_axis(table, top_rows // cell_cap, axis=1)
    # one packed [N, 3] aux gather instead of three scalar gathers (see
    # _pos_topk: per-pool-row scalar gathers are descriptor-bound)
    aux = jnp.stack([rowmult, rowmult2, rowbias.astype(jnp.float32)],
                    axis=1)
    auxg = aux[top_rows]                                  # [B, pool, 3]
    exact_vals = ((dots * auxg[:, :, 0] + tgath * auxg[:, :, 1])
                  * qmult2 + auxg[:, :, 2])
    exact_sorted, sel2 = lax.top_k(exact_vals, kk)
    top_rows = jnp.take_along_axis(top_rows, sel2, axis=1)
    qsq = jnp.sum(queries * queries, axis=-1, keepdims=True)
    dists = post(exact_sorted, qsq)
    dists = jnp.where(exact_sorted <= _NEG / 2, jnp.inf, dists)
    if pad_b:
        dists, top_rows = dists[:b], top_rows[:b]
    return dists, top_rows


def fused_topk_available(
    count: int, capacity: int, metric: str, backend: str, k: int = 10
) -> bool:
    """The fused kernel applies on TPU, matmul-form metrics, >=1 full tile,
    and k small enough for the per-tile candidate sets to cover it."""
    if backend != "tpu" or metric not in ("cosine", "euclidean", "dot"):
        return False
    if capacity < TILE_N:
        return False
    return k <= MAX_T_PER_TILE * n_tiles_for(count, capacity)


def n_tiles_for(count_hwm: int, capacity: int) -> int:
    """Tiles needed to cover rows [0, count_hwm); recompiles at 4096-row
    granularity as a store grows."""
    used = min(max(count_hwm, 1), capacity)
    return -(-used // TILE_N)
