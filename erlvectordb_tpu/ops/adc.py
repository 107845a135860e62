"""ADC (asymmetric distance computation) search over PQ codes.

Searches the compressed domain directly: per-query lookup tables
LUT[B, M, K] of partial squared-L2 distances (quant/pq.py), then
``dist[b, n] = sum_m LUT[b, m, codes[n, m]]`` — 1 byte of HBM traffic per
(vector, subspace) instead of 4*D bytes, which is what lets corpora that
cannot fit uncompressed (10M x 768) live on one chip.

This module is the XLA implementation (gathers on the VPU + approx top-k);
a fused Pallas kernel with VMEM-resident LUTs is the planned upgrade for the
same signature.  The reference has no ADC at all — its "PQ search path"
decompresses, then scans floats (src/vector_persistence.erl:276-283).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from erlvectordb_tpu.quant.pq import _adc_l2_tables


@functools.partial(jax.jit, static_argnames=("k", "recall_target"))
def adc_search(
    codes: jax.Array,      # [N, M] uint8 PQ codes
    codebooks: jax.Array,  # [M, K, Dsub] f32
    queries: jax.Array,    # [B, D] f32
    *,
    k: int,
    recall_target: float = 0.99,
) -> Tuple[jax.Array, jax.Array]:
    """Approximate top-k by ADC. Returns (distances [B, k], rows [B, k])."""
    lut = _adc_l2_tables(queries, codebooks)  # [B, M, K]
    b = queries.shape[0]
    n, m = codes.shape

    codes_i = codes.astype(jnp.int32)

    def body(j, acc):
        table = lax.dynamic_index_in_dim(lut, j, axis=1, keepdims=False)  # [B, K]
        idx = lax.dynamic_index_in_dim(codes_i, j, axis=1, keepdims=False)  # [N]
        return acc + jnp.take(table, idx, axis=1)  # [B, N]

    dists = lax.fori_loop(0, m, body, jnp.zeros((b, n), jnp.float32))
    neg, rows = lax.approx_max_k(-dists, k, recall_target=recall_target)
    return -neg, rows


@functools.partial(jax.jit, static_argnames=("k", "c"))
def adc_search_rerank(
    pq_codes: jax.Array,     # [N, M] uint8 PQ codes (coarse stage)
    codebooks: jax.Array,    # [M, K, Dsub] f32
    i8_codes: jax.Array,     # [N, D] int8 rows (rerank stage)
    i8_scales: jax.Array,    # [N] f32 per-row scales
    queries: jax.Array,      # [B, D] f32
    *,
    k: int,
    c: int = 256,            # rerank candidate count
) -> Tuple[jax.Array, jax.Array]:
    """Two-stage search: ADC over PQ codes retrieves top-c candidates, an
    exact int8 distance pass re-ranks them (the standard ADC+R scheme — raw
    PQ distances cannot rank close neighbors whose separation is below the
    quantization error).  Memory stays at the int8+PQ footprint.

    Returns exact-L2 (distances [B, k], rows [B, k]).
    """
    lut = _adc_l2_tables(queries, codebooks)
    b = queries.shape[0]
    n, m = pq_codes.shape
    codes_i = pq_codes.astype(jnp.int32)

    def body(j, acc):
        table = lax.dynamic_index_in_dim(lut, j, axis=1, keepdims=False)
        idx = lax.dynamic_index_in_dim(codes_i, j, axis=1, keepdims=False)
        return acc + jnp.take(table, idx, axis=1)

    coarse = lax.fori_loop(0, m, body, jnp.zeros((b, n), jnp.float32))
    _, cand = lax.approx_max_k(-coarse, c, recall_target=0.99)  # [B, c]

    # exact rerank on the int8 rows of the candidates
    rows = i8_codes[cand].astype(jnp.float32)            # [B, c, D]
    scales = i8_scales[cand]                             # [B, c]
    x = rows * scales[:, :, None]
    dots = jnp.einsum("bcd,bd->bc", x, queries, preferred_element_type=jnp.float32)
    xn2 = jnp.sum(x * x, axis=-1)
    qsq = jnp.sum(queries * queries, axis=-1, keepdims=True)
    d2 = qsq - 2.0 * dots + xn2                          # [B, c]
    neg, sel = lax.top_k(-d2, k)
    rows_out = jnp.take_along_axis(cand, sel, axis=1)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), rows_out


@functools.partial(jax.jit, static_argnames=("k",))
def adc_search_exact_topk(
    codes: jax.Array,
    codebooks: jax.Array,
    queries: jax.Array,
    *,
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Same scan with an exact (sort-based) final top-k, for recall audits."""
    lut = _adc_l2_tables(queries, codebooks)
    b = queries.shape[0]
    n, m = codes.shape
    codes_i = codes.astype(jnp.int32)

    def body(j, acc):
        table = lax.dynamic_index_in_dim(lut, j, axis=1, keepdims=False)
        idx = lax.dynamic_index_in_dim(codes_i, j, axis=1, keepdims=False)
        return acc + jnp.take(table, idx, axis=1)

    dists = lax.fori_loop(0, m, body, jnp.zeros((b, n), jnp.float32))
    neg, rows = lax.top_k(-dists, k)
    return -neg, rows
