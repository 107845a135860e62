"""Fused ADC scan Pallas kernel — PQ search on the MXU.

The XLA ADC path (ops/adc.py) evaluates ``dist[b,n] = sum_m LUT[b,m,code]``
with 8 VPU gathers over [B, N] and materializes the distance matrix —
measured ~1.3k QPS at N=1M on v5e.  TPUs hate gathers and love matmuls, so
this kernel reformulates the table lookup as a one-hot contraction:

  per 1024-row code tile (streamed through VMEM, 8 bytes/row of HBM traffic):
    onehot[TILE_N, M*K] = (codes[:, m] == iota(K))        (VPU, one pass)
    dists[B_T, TILE_N]  = LUT_flat @ onehot^T             (MXU, bf16)
    per-tile top-T candidates                             (VPU reductions)

One-hot entries are exactly representable in bf16 and each output is a sum
of M=8 LUT entries, so the bf16 contraction loses ~2^-8 relative precision —
irrelevant for candidate selection, and the int8 rerank stage restores exact
distances.  Grid is (b_tiles, n_tiles) with the LUT tile resident across the
inner sweep, so HBM traffic is ~codes only (8 MB per 1M rows).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from erlvectordb_tpu.quant.pq import _adc_l2_tables

ADC_TILE_N = 1024

_NEG = -1e30


def _make_adc_kernel(m: int, k: int, t_per_tile: int, tile_n: int,
                     int8_lut: bool):
    def kernel(codes_ref, lut_ref, vals_ref, rows_ref):
        j = pl.program_id(1)  # code-tile index (inner grid dim)

        codes = codes_ref[:].astype(jnp.int32)                  # [TILE_N, M]
        lane = lax.broadcasted_iota(jnp.int32, (tile_n, k), 1)  # [TILE_N, K]
        cdt = jnp.int8 if int8_lut else jnp.bfloat16
        parts = [
            (lane == codes[:, mm : mm + 1]).astype(cdt)
            for mm in range(m)
        ]
        onehot = jnp.concatenate(parts, axis=1)                 # [TILE_N, M*K]

        if int8_lut:
            # LUT pre-quantized per query row (selection-only precision;
            # the rerank stage restores exact distances): int8 MXU = 2x bf16
            dists = lax.dot_general(
                lut_ref[:], onehot, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
        else:
            lut = lut_ref[:].astype(jnp.bfloat16)               # [B_T, M*K]
            dists = lax.dot_general(
                lut, onehot, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                   # [B_T, TILE_N]
        sims = -dists  # bigger = closer, for shared top-T extraction

        lane_n = lax.broadcasted_iota(jnp.int32, sims.shape, 1)
        big = jnp.int32(tile_n)
        vals, idxs = [], []
        cur = sims
        for _ in range(t_per_tile):
            mx = jnp.max(cur, axis=1, keepdims=True)
            ix = jnp.min(jnp.where(cur == mx, lane_n, big), axis=1, keepdims=True)
            vals.append(mx)
            idxs.append(ix)
            cur = jnp.where(lane_n == ix, _NEG, cur)

        base = j * tile_n
        vals_ref[0] = jnp.concatenate(vals, axis=1)             # [B_T, T]
        rows_ref[0] = jnp.concatenate(idxs, axis=1) + base

    return kernel


@functools.partial(jax.jit, static_argnames=("n_tiles", "t_per_tile"))
def adc_pallas_scan(
    codes: jax.Array,     # [N_cap, M] uint8 PQ codes
    lut_flat: jax.Array,  # [B, M*K] f32 flattened per-query tables
    *,
    n_tiles: int,
    t_per_tile: int = 4,
) -> Tuple[jax.Array, jax.Array]:
    """Per-tile candidate scan. Returns (neg-dist vals [B, T*n_tiles], rows).

    When ``lut_flat`` arrives as int8 (pre-quantized per query row), the
    one-hot contraction runs on the int8 MXU path (2x bf16 rate); values
    stay in that row's quantized units — fine for per-row candidate
    selection, meaningless across rows.
    """
    b, mk = lut_flat.shape
    int8_lut = lut_flat.dtype == jnp.int8
    n_cap, m = codes.shape
    k = mk // m
    bt = min(256, b) if b >= 256 else max(8, 1 << (b - 1).bit_length())
    pad_b = (-b) % bt
    if pad_b:
        lut_flat = jnp.pad(lut_flat, ((0, pad_b), (0, 0)))
    nb = lut_flat.shape[0] // bt
    t = t_per_tile
    tile_n = ADC_TILE_N

    grid = (nb, n_tiles)  # LUT-outer: the code sweep reuses the resident LUT

    vals, rows = pl.pallas_call(
        _make_adc_kernel(m, k, t, tile_n, int8_lut),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, m), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, mk), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bt, t), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, t), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, lut_flat.shape[0], t), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, lut_flat.shape[0], t), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * lut_flat.shape[0] * mk * n_tiles * tile_n,
            bytes_accessed=n_tiles * tile_n * m + lut_flat.size * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(codes, lut_flat)
    vals = vals.transpose(1, 0, 2).reshape(lut_flat.shape[0], t * n_tiles)
    rows = rows.transpose(1, 0, 2).reshape(lut_flat.shape[0], t * n_tiles)
    if pad_b:
        vals, rows = vals[:b], rows[:b]
    return vals, rows


def _make_adc_exact_kernel(m: int, k: int, t_per_tile: int, tile_n: int):
    """ADC candidate selection + IN-KERNEL exact rerank.

    Stage 1 scores the tile by int8-LUT ADC (as _make_adc_kernel).  Stage 2,
    for each of the per-tile top-T candidates, gathers the candidate's int8
    row from the tile ALREADY IN VMEM via a one-hot contraction (TPUs hate
    gathers, love matmuls) and emits the EXACT quantized-domain squared-L2
    distance.  No [B, c, D] host-side row gather ever happens — the merge
    outside is a plain top-k over exact values.
    """

    def kernel(codes_ref, lut_ref, q_ref, i8_ref, iaux_ref,
               vals_ref, rows_ref):
        j = pl.program_id(1)  # code-tile index (inner grid dim)

        codes = codes_ref[:].astype(jnp.int32)                  # [TILE_N, M]
        lane = lax.broadcasted_iota(jnp.int32, (tile_n, k), 1)  # [TILE_N, K]
        parts = [
            (lane == codes[:, mm : mm + 1]).astype(jnp.int8)
            for mm in range(m)
        ]
        onehot = jnp.concatenate(parts, axis=1)                 # [TILE_N, M*K]
        sims = -lax.dot_general(
            lut_ref[:], onehot, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)                                   # [B_T, TILE_N]

        q = q_ref[:]                                            # [B_T, D] f32
        qsq = jnp.sum(q * q, axis=1, keepdims=True)             # [B_T, 1]
        rows_i8 = i8_ref[:].astype(jnp.bfloat16)                # [TILE_N, D]
        # iaux packs per-row [scale; |x|^2] as two stacked rows [2, TILE_N]
        scale_row = iaux_ref[0:1, :]                            # [1, TILE_N]
        n2_row = iaux_ref[1:2, :]                               # [1, TILE_N]

        lane_n = lax.broadcasted_iota(jnp.int32, sims.shape, 1)
        big = jnp.int32(tile_n)
        vals, idxs = [], []
        cur = sims
        base = j * tile_n
        for _ in range(t_per_tile):
            mx = jnp.max(cur, axis=1, keepdims=True)
            ix = jnp.min(jnp.where(cur == mx, lane_n, big), axis=1,
                         keepdims=True)                          # [B_T, 1]
            sel = (lane_n == ix)                                 # [B_T, TILE_N]
            self_bf = sel.astype(jnp.bfloat16)
            xcand = lax.dot_general(
                self_bf, rows_i8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                    # [B_T, D]
            selc = sel.astype(jnp.float32)
            scale_c = lax.dot_general(
                selc, scale_row, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                    # [B_T, 1]
            n2_c = lax.dot_general(
                selc, n2_row, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                    # [B_T, 1]
            qdot = jnp.sum(q * xcand, axis=1, keepdims=True) * scale_c
            d2 = qsq - 2.0 * qdot + n2_c
            vals.append(-d2)                                     # exact!
            idxs.append(ix)
            cur = jnp.where(lane_n == ix, _NEG, cur)

        vals_ref[0] = jnp.concatenate(vals, axis=1)              # [B_T, T]
        rows_ref[0] = jnp.concatenate(idxs, axis=1) + base

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "n_tiles", "t_per_tile"))
def adc_search_exact_fused(
    pq_codes: jax.Array,   # [N_pad, M] uint8 (N_pad = n_tiles * ADC_TILE_N)
    codebooks: jax.Array,  # [M, K, Dsub] f32
    i8_codes: jax.Array,   # [N_pad, D] int8 rerank rows
    i8_scales: jax.Array,  # [N_pad] f32
    i8_norms2: jax.Array,  # [N_pad] f32  |x|^2 of the dequantized rows
    queries: jax.Array,    # [B, D] f32 (D == M * Dsub)
    n_valid,               # scalar: rows >= n_valid are padding
    *,
    k: int,
    n_tiles: int,
    t_per_tile: int = 4,
) -> Tuple[jax.Array, jax.Array]:
    """Single-pass ADC select + exact in-kernel rerank + top-k merge."""
    b, d = queries.shape
    # per-subspace min-shift before int8 quantization: ranking-invariant
    # (shifts every row's distance by the same per-query constant) and
    # spends the 127 levels on the spread instead of the offset floor
    lut3 = _adc_l2_tables(queries, codebooks)             # [B, M, KK]
    lut3 = lut3 - jnp.min(lut3, axis=2, keepdims=True)
    lut = lut3.reshape(b, -1)
    row_max = jnp.max(lut, axis=1, keepdims=True)
    lut_q = jnp.clip(jnp.round(lut / jnp.maximum(row_max, 1e-20) * 127.0),
                     0, 127).astype(jnp.int8)

    n_cap, m = pq_codes.shape
    kk = lut.shape[1] // m
    bt = min(256, b) if b >= 256 else max(8, 1 << (b - 1).bit_length())
    pad_b = (-b) % bt
    if pad_b:
        lut_q = jnp.pad(lut_q, ((0, pad_b), (0, 0)))
        queries = jnp.pad(queries, ((0, pad_b), (0, 0)))
    nb = lut_q.shape[0] // bt
    t = t_per_tile
    while t < 8 and t * n_tiles < 512:
        t *= 2
    tile_n = ADC_TILE_N
    iaux = jnp.stack([i8_scales, i8_norms2], axis=0)  # [2, N_pad]

    vals, rows = pl.pallas_call(
        _make_adc_exact_kernel(m, kk, t, tile_n),
        grid=(nb, n_tiles),
        in_specs=[
            pl.BlockSpec((tile_n, m), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, m * kk), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bt, t), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, t), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, lut_q.shape[0], t), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, lut_q.shape[0], t), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * lut_q.shape[0] * (m * kk + t * d) * n_tiles * tile_n,
            bytes_accessed=n_tiles * tile_n * (m + d) + lut_q.size,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(pq_codes, lut_q, queries, i8_codes, iaux)
    bb = lut_q.shape[0]
    vals = vals.transpose(1, 0, 2).reshape(bb, t * n_tiles)
    rows = rows.transpose(1, 0, 2).reshape(bb, t * n_tiles)
    if pad_b:
        vals, rows = vals[:b], rows[:b]
        queries = queries[:b]

    vals = jnp.where(rows < jnp.int32(n_valid), vals, -jnp.inf)
    kf = min(k, vals.shape[1])
    best, sel = lax.top_k(vals, kf)
    rows_out = jnp.take_along_axis(rows, sel, axis=1)
    rows_out = jnp.where(jnp.isfinite(best), rows_out, -1)
    dist = jnp.sqrt(jnp.maximum(-best, 0.0))
    dist = jnp.where(rows_out >= 0, dist, jnp.inf)
    return dist, rows_out


def _make_adc_pos_kernel(m: int, k: int, sub: int, slice_w: int):
    """Packed-key ADC selection + one in-kernel exact rerank per slice.

    The exact-fused kernel above spends its VPU time on t-unrolled masked
    extraction (t x (max + locate + mask) over [B_T, 1024]) and its MXU
    time on t one-hot rerank contractions — at 1M rows that is 977 grid
    steps each doing 12-24 extraction passes.  This variant applies the
    pos-path trick (ops/fused_topk.py): the int8-LUT ADC distances are
    SMALL ints (<= 127*M), so (-dist << 10) | lane is a single int32 sort
    key per row and ONE max per 1024-row slice yields both the winner's
    quantized distance and its lane.  Each slice winner is exactly
    reranked in-kernel (one-hot contraction against the slice's int8 rows
    already in VMEM).  Grid steps shrink ``sub``x (4096-row tiles);
    extraction is 1 pass per slice instead of ~3t.

    Candidate set: exact-reranked TOP-2 per 1024-row slice.  Top-1 lost
    ~6% recall@10 at 1M (measured 0.916 vs 0.978) not from slice
    collisions (C(k,2)*1024/N ~ 0.5%) but from QUANTIZED near-ties: the
    int8 LUT resolves ~127 levels, so the true neighbor often isn't the
    slice's quantized argmin.  The second extraction (one more masked
    max + rerank contraction, ~6% extra MXU) plus the min-shifted LUT
    (see caller) recovers it.  The exact rerank keeps reported
    distances exact either way."""

    def kernel(codes_ref, lut_ref, q_ref, i8_ref, iaux_ref,
               vals_ref, rows_ref):
        j = pl.program_id(1)
        q = q_ref[:]                                      # [B_T, D] f32
        qsq = jnp.sum(q * q, axis=1, keepdims=True)
        lane_k = None
        lane = None
        for s in range(sub):
            sl = slice(s * slice_w, (s + 1) * slice_w)
            codes = codes_ref[sl, :].astype(jnp.int32)    # [SLICE, M]
            if lane_k is None:
                lane_k = lax.broadcasted_iota(jnp.int32, (slice_w, k), 1)
            onehot = jnp.concatenate(
                [(lane_k == codes[:, mm:mm + 1]).astype(jnp.int8)
                 for mm in range(m)], axis=1)             # [SLICE, M*K]
            dist = lax.dot_general(
                lut_ref[:], onehot, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)         # [B_T, SLICE] >= 0
            if lane is None:
                lane = lax.broadcasted_iota(jnp.int32, dist.shape, 1)
            # low 10 bits of a multiple of 1024 are zero even in two's
            # complement, so OR-ing the lane in is exact for negatives
            key = ((-dist) << 10) | lane
            for c in range(2):                            # top-2 per slice
                m1 = jnp.max(key, axis=1, keepdims=True)  # [B_T, 1]
                w = m1 & jnp.int32(slice_w - 1)
                sel = lane == w                           # [B_T, SLICE]
                xcand = lax.dot_general(
                    sel.astype(jnp.bfloat16),
                    i8_ref[sl, :].astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [B_T, D]
                self_f = sel.astype(jnp.float32)
                scale_c = lax.dot_general(
                    self_f, iaux_ref[0:1, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [B_T, 1]
                n2_c = lax.dot_general(
                    self_f, iaux_ref[1:2, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                qdot = jnp.sum(q * xcand, axis=1, keepdims=True) * scale_c
                d2 = qsq - 2.0 * qdot + n2_c
                vals_ref[0, :, 2 * s + c] = -d2[:, 0]     # exact
                rows_ref[0, :, 2 * s + c] = (
                    j * (sub * slice_w) + s * slice_w + w[:, 0])
                if c == 0:
                    key = jnp.where(sel, jnp.int32(-(1 << 30)), key)

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "n_tiles", "sub"))
def adc_search_exact_pos(
    pq_codes: jax.Array,   # [N_pad, M] uint8; N_pad % (4*ADC_TILE_N) == 0
    codebooks: jax.Array,  # [M, K, Dsub] f32
    i8_codes: jax.Array,   # [N_pad, D] int8 rerank rows
    i8_scales: jax.Array,  # [N_pad] f32
    i8_norms2: jax.Array,  # [N_pad] f32
    queries: jax.Array,    # [B, D] f32
    n_valid,               # scalar: rows >= n_valid are padding
    *,
    k: int,
    n_tiles: int,          # 1024-row tiles covering the live rows
    sub: int = 8,          # slices per grid step (rows pad to sub*1024);
                           # 8 measured +13% over 4 at 1M x 128 (grid-step
                           # overhead), 16 regresses (VMEM pressure)
) -> Tuple[jax.Array, jax.Array]:
    """Packed-key ADC select + exact in-kernel rerank + top-k merge.

    Candidates are the exact-reranked top-2 of every 1024-row slice;
    padding slices can win their own slice but are masked before the
    final top-k (costing at most their own candidates).

    LUT min-shift: subtracting each subspace's per-query minimum before
    int8 quantization shifts every row's distance by the same constant
    (ranking-invariant) and removes the offset floor that otherwise
    burns most of the 127 levels — near-tie rows stop collapsing onto
    one quantized value."""
    b, d = queries.shape
    lut3 = _adc_l2_tables(queries, codebooks)             # [B, M, KK]
    lut3 = lut3 - jnp.min(lut3, axis=2, keepdims=True)
    lut = lut3.reshape(b, -1)
    row_max = jnp.max(lut, axis=1, keepdims=True)
    lut_q = jnp.clip(jnp.round(lut / jnp.maximum(row_max, 1e-20) * 127.0),
                     0, 127).astype(jnp.int8)

    n_cap, m = pq_codes.shape
    kk = lut.shape[1] // m
    big_n = sub * ADC_TILE_N
    if n_cap % big_n:
        raise ValueError(f"pq_codes rows ({n_cap}) must be padded to "
                         f"a multiple of {big_n}")
    n_big = min(-(-n_tiles // sub), n_cap // big_n)
    bt = min(256, b) if b >= 256 else max(8, 1 << (b - 1).bit_length())
    pad_b = (-b) % bt
    if pad_b:
        lut_q = jnp.pad(lut_q, ((0, pad_b), (0, 0)))
        queries = jnp.pad(queries, ((0, pad_b), (0, 0)))
    nb = lut_q.shape[0] // bt
    iaux = jnp.stack([i8_scales, i8_norms2], axis=0)      # [2, N_pad]

    vals, rows = pl.pallas_call(
        _make_adc_pos_kernel(m, kk, sub, ADC_TILE_N),
        grid=(nb, n_big),
        in_specs=[
            pl.BlockSpec((big_n, m), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, m * kk), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((big_n, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, big_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bt, 2 * sub), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, 2 * sub), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_big, lut_q.shape[0], 2 * sub),
                                 jnp.float32),
            jax.ShapeDtypeStruct((n_big, lut_q.shape[0], 2 * sub),
                                 jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * lut_q.shape[0] * (m * kk + 2 * d) * n_big * big_n,
            bytes_accessed=n_big * big_n * (m + d) + lut_q.size,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(pq_codes, lut_q, queries, i8_codes, iaux)
    bb = lut_q.shape[0]
    vals = vals.transpose(1, 0, 2).reshape(bb, 2 * sub * n_big)
    rows = rows.transpose(1, 0, 2).reshape(bb, 2 * sub * n_big)
    if pad_b:
        vals, rows = vals[:b], rows[:b]
    vals = jnp.where(rows < jnp.int32(n_valid), vals, -jnp.inf)
    kf = min(k, vals.shape[1])
    best, sel = lax.top_k(vals, kf)
    rows_out = jnp.take_along_axis(rows, sel, axis=1)
    rows_out = jnp.where(jnp.isfinite(best), rows_out, -1)
    dist = jnp.sqrt(jnp.maximum(-best, 0.0))
    dist = jnp.where(rows_out >= 0, dist, jnp.inf)
    return dist, rows_out


@functools.partial(jax.jit, static_argnames=("k", "c", "n_tiles"))
def adc_search_fused(
    pq_codes: jax.Array,   # [N_cap, M] uint8
    codebooks: jax.Array,  # [M, K, Dsub] f32
    i8_codes: jax.Array,   # [N_cap, D] int8 rerank rows
    i8_scales: jax.Array,  # [N_cap] f32
    queries: jax.Array,    # [B, D] f32 (D == M * Dsub)
    n_valid,               # scalar: rows >= n_valid are padding, never returned
    *,
    k: int,
    c: int = 2048,         # rerank pool size
    n_tiles: int,
) -> Tuple[jax.Array, jax.Array]:
    """Pallas ADC scan -> candidate pool -> exact int8 rerank -> top-k.

    ``pq_codes``/``i8_codes`` must have >= n_tiles*ADC_TILE_N rows (pad with
    anything); candidates in the padded range are masked out at rerank.
    """
    b = queries.shape[0]
    lut = _adc_l2_tables(queries, codebooks)          # [B, M, K]
    lut_flat = lut.reshape(b, -1)
    # per-row int8 quantization of the LUT: selection-only precision (the
    # rerank stage restores exact distances); halves the scan's MXU time
    row_max = jnp.max(lut_flat, axis=1, keepdims=True)
    lut_q = jnp.clip(jnp.round(lut_flat / jnp.maximum(row_max, 1e-20) * 127.0),
                     0, 127).astype(jnp.int8)
    # deepen per-tile extraction when tiles are scarce so the candidate
    # pool can actually reach c (or at least well past k)
    t = 4
    while t < 8 and t * n_tiles < min(c, 512):
        t *= 2
    vals, rows = adc_pallas_scan(pq_codes, lut_q, n_tiles=n_tiles,
                                 t_per_tile=t)

    cc = min(c, vals.shape[1])
    _, sel = lax.top_k(vals, cc)                      # best (least-distance)
    cand = jnp.take_along_axis(rows, sel, axis=1)     # [B, cc]

    x = i8_codes[cand].astype(jnp.float32) * i8_scales[cand][:, :, None]
    dots = jnp.einsum("bcd,bd->bc", x, queries, preferred_element_type=jnp.float32)
    xn2 = jnp.sum(x * x, axis=-1)
    qsq = jnp.sum(queries * queries, axis=-1, keepdims=True)
    d2 = qsq - 2.0 * dots + xn2
    d2 = jnp.where(cand < jnp.int32(n_valid), d2, jnp.inf)  # mask padded rows
    neg, ksel = lax.top_k(-d2, min(k, cc))
    rows_out = jnp.take_along_axis(cand, ksel, axis=1)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), rows_out


def adc_n_tiles(count: int) -> int:
    return -(-max(count, 1) // ADC_TILE_N)
