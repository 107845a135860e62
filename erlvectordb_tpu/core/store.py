"""HBM-resident vector store — capability parity with the reference's store engine.

The reference keeps each store as a gen_server process holding an Erlang map
``id -> {id, vector, metadata}`` and scans it per query
(reference: src/vector_store.erl:31-35, :227-236).  The TPU-native design is a
struct-of-arrays resident in device HBM:

  * ``vectors [N_cap, D]`` float32 (or int8 codes + per-row scales for a
    quantized store), capacity grown by doubling so JIT programs are reused;
  * ``norms [N_cap]`` float32 — row L2 norms precomputed at insert so cosine
    search never recomputes them (the reference recomputes the query norm N
    times per search, src/vector_store.erl:241);
  * ``valid [N_cap]`` bool — delete is a mask clear, insert reuses free rows;

plus host-side id<->row and metadata tables.  Inserts are *batched scatters*
(one compiled program per power-of-two batch size); searches are batched
matmul+top-k (see core/search.py).  All mutation goes through a lock — but
unlike the reference, searches never serialize behind each other.

Insert semantics preserved: dimension is fixed by the first insert (or at
creation), every element must be a finite real number, inserting an existing
id overwrites it (maps:put semantics, src/vector_store.erl:113-141, :213-225).
"""

from __future__ import annotations

import functools
import math
import threading
import time
from dataclasses import dataclass
from typing import Any, Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from erlvectordb_tpu.core import search as search_mod
from erlvectordb_tpu.core.calibration import CalibrationSet, measure_curve
from erlvectordb_tpu.utils.locks import RWLock
from erlvectordb_tpu.utils.metrics import metrics
from erlvectordb_tpu.core.search import VALID_METRICS

MIN_CAPACITY = 1024


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _unpack_int4_np(packed: np.ndarray) -> np.ndarray:
    hi = (packed >> 4).astype(np.int8)
    lo = (packed & 0xF).astype(np.int8)
    hi = np.where(hi > 7, hi - 16, hi)
    lo = np.where(lo > 7, lo - 16, lo)
    return np.stack([hi, lo], axis=-1).reshape(packed.shape[0], -1)


def _pad128(d: int) -> int:
    """Feature dims are stored padded to the TPU lane width (128): XLA pads
    internally anyway, and it lets the Pallas kernels assume aligned tiles.
    The padding columns are zero, so dots/norms/L1 are unaffected."""
    return ((d + 127) // 128) * 128


# --------------------------------------------------------------------------
# Jitted mutation kernels.  `rows` may contain out-of-range sentinels
# (= capacity) for padding lanes; mode="drop" makes those writes no-ops,
# so one compiled program serves any batch size <= its bucket.
# --------------------------------------------------------------------------

@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _scatter_insert_f32(vectors, norms, valid, rows, new_vecs):
    vectors = vectors.at[rows].set(new_vecs, mode="drop")
    new_norms = jnp.sqrt(jnp.sum(new_vecs * new_vecs, axis=-1))
    norms = norms.at[rows].set(new_norms, mode="drop")
    valid = valid.at[rows].set(True, mode="drop")
    return vectors, norms, valid


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
def _scatter_insert_int8(codes, scales, norms, valid, rows, new_vecs):
    absmax = jnp.max(jnp.abs(new_vecs), axis=-1)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(new_vecs / scale[:, None]), -127, 127).astype(jnp.int8)
    codes = codes.at[rows].set(q, mode="drop")
    scales = scales.at[rows].set(scale, mode="drop")
    new_norms = jnp.sqrt(jnp.sum(new_vecs * new_vecs, axis=-1))
    norms = norms.at[rows].set(new_norms, mode="drop")
    valid = valid.at[rows].set(True, mode="drop")
    return codes, scales, norms, valid


def _pack_int4(q):
    """int8 codes in [-7, 7] -> packed uint8, first value in the high nibble."""
    nib = (q & 0xF).astype(jnp.uint8)
    return (nib[:, 0::2] << 4) | nib[:, 1::2]


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_insert_unit(unit, rows, new_vecs):
    """Maintain the intkey unit plane (shared-scale int8 codes — raw int32
    dots rank cosine cross-row; see fused_topk's intkey block comment)."""
    n2 = jnp.sqrt(jnp.sum(new_vecs * new_vecs, axis=-1))
    f = jnp.where(n2 > 0, 127.0 / jnp.where(n2 > 0, n2, 1.0), 0.0)
    u = jnp.clip(jnp.round(new_vecs * f[:, None]), -127, 127).astype(jnp.int8)
    return unit.at[rows].set(u, mode="drop")


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_zero_unit(unit, rows):
    """Zero deleted rows in the unit plane: their intkey becomes (0 << 10) |
    lane, ranked below every positive-dot row (the exact rescore rejects
    any that still reach the pool)."""
    zero = jnp.zeros((rows.shape[0], unit.shape[1]), unit.dtype)
    return unit.at[rows].set(zero, mode="drop")


@functools.partial(jax.jit, static_argnames=("cap",))
def _bulk_build_unit(arr, cap):
    n = arr.shape[0]
    n2 = jnp.sqrt(jnp.sum(arr * arr, axis=-1))
    f = jnp.where(n2 > 0, 127.0 / jnp.where(n2 > 0, n2, 1.0), 0.0)
    u = jnp.clip(jnp.round(arr * f[:, None]), -127, 127).astype(jnp.int8)
    return jnp.pad(u, ((0, cap - n), (0, 0)))


def _plane_kind(metric: str) -> str:
    """Which int8 key plane a metric selects on: cosine ranks on the UNIT
    plane (127*x/|x|); euclidean/dot on the MAGNITUDE plane (127*x/S, one
    global scale S) — see fused_topk's intkey block comment."""
    return "unit" if metric == "cosine" else "mag"


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_insert_mag(plane, rows, new_vecs, inv_scale):
    """Maintain the magnitude plane (shared GLOBAL scale): codes are
    round(x * 127/S).  Callers guarantee |x| <= S (plane invalidated and
    lazily rebuilt otherwise), so the clip only catches rounding."""
    u = jnp.clip(jnp.round(new_vecs * inv_scale), -127, 127).astype(jnp.int8)
    return plane.at[rows].set(u, mode="drop")


@functools.partial(jax.jit, static_argnames=("cap",))
def _bulk_build_mag(arr, cap, inv_scale):
    n = arr.shape[0]
    u = jnp.clip(jnp.round(arr * inv_scale), -127, 127).astype(jnp.int8)
    return jnp.pad(u, ((0, cap - n), (0, 0)))


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
def _scatter_insert_int4(packed, scales, norms, valid, rows, new_vecs):
    absmax = jnp.max(jnp.abs(new_vecs), axis=-1)
    scale = jnp.where(absmax > 0, absmax / 7.0, 1.0)
    q = jnp.clip(jnp.round(new_vecs / scale[:, None]), -7, 7).astype(jnp.int8)
    packed = packed.at[rows].set(_pack_int4(q), mode="drop")
    scales = scales.at[rows].set(scale, mode="drop")
    new_norms = jnp.sqrt(jnp.sum(new_vecs * new_vecs, axis=-1))
    norms = norms.at[rows].set(new_norms, mode="drop")
    valid = valid.at[rows].set(True, mode="drop")
    return packed, scales, norms, valid


def _quantize_residual(res):
    """4-bit residual quantization with per-row optimal clipping: try a few
    clip fractions of absmax and keep the min-MSE one (clipping trades rare
    saturation for finer steps everywhere — worth ~half a recall point)."""
    absmax = jnp.max(jnp.abs(res), axis=-1)
    best_q = best_s = best_e = None
    for c in (0.7, 0.8, 0.9, 1.0):
        s = jnp.where(absmax > 0, c * absmax / 7.0, 1.0)
        q = jnp.clip(jnp.round(res / s[:, None]), -7, 7).astype(jnp.int8)
        e = jnp.sum((q.astype(jnp.float32) * s[:, None] - res) ** 2, axis=-1)
        if best_q is None:
            best_q, best_s, best_e = q, s, e
        else:
            take = e < best_e
            best_q = jnp.where(take[:, None], q, best_q)
            best_s = jnp.where(take, s, best_s)
            best_e = jnp.minimum(e, best_e)
    return best_q, best_s


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
def _scatter_insert_int4r(packed, scales, norms, valid, rows, new_vecs,
                          cents_rows):
    """Residual insert: quantize (x - centroid) to packed int4.  Stored
    norms are RECONSTRUCTION norms |c + q*s| — cosine/euclidean then rank by
    the quantized vector's own geometry (consistent numerator/denominator
    beats mixing the exact norm with a quantized dot)."""
    res = new_vecs - cents_rows
    q, scale = _quantize_residual(res)
    recon = cents_rows + q.astype(jnp.float32) * scale[:, None]
    packed = packed.at[rows].set(_pack_int4(q), mode="drop")
    scales = scales.at[rows].set(scale, mode="drop")
    norms = norms.at[rows].set(
        jnp.sqrt(jnp.sum(recon * recon, axis=-1)), mode="drop")
    valid = valid.at[rows].set(True, mode="drop")
    return packed, scales, norms, valid


@functools.partial(jax.jit, static_argnames=("n_rows",))
def _bulk_build_int4r(xp, cents_rows, pos, n_rows):
    """Bulk residual build: quantize all residuals and scatter into the
    cell-major layout in one program.  xp [n, W] f32; cents_rows [n, W]
    (each row's centroid, pre-gathered); pos [n] target rows.  Norms are
    reconstruction norms (see _scatter_insert_int4r)."""
    res = xp - cents_rows
    q, scale = _quantize_residual(res)
    recon = cents_rows + q.astype(jnp.float32) * scale[:, None]
    packed = jnp.zeros((n_rows, xp.shape[1] // 2), jnp.uint8)
    packed = packed.at[pos].set(_pack_int4(q))
    scales = jnp.ones((n_rows,), jnp.float32).at[pos].set(scale)
    norms = jnp.zeros((n_rows,), jnp.float32).at[pos].set(
        jnp.sqrt(jnp.sum(recon * recon, axis=-1)))
    valid = jnp.zeros((n_rows,), bool).at[pos].set(True)
    return packed, scales, norms, valid


def _unpack_int4(packed):
    """[R, W/2] uint8 nibble pairs -> [R, W] int4-valued int8 (dim 2p in
    the high nibble, the _pack_int4 layout)."""
    hi = (packed >> 4).astype(jnp.int8)
    lo = (packed & 0xF).astype(jnp.int8)
    hi = jnp.where(hi > 7, hi - 16, hi)
    lo = jnp.where(lo > 7, lo - 16, lo)
    return jnp.stack([hi, lo], axis=-1).reshape(packed.shape[0], -1)


@functools.partial(jax.jit, static_argnames=("d", "dp2"))
def _rq_encode_chunk(packed, scales, cents_rows, x_rows, rot, books, *,
                     d, dp2):
    """Second-stage encode of one slot chunk: stage-1 reconstruction from
    the packed codes, error vs the original rows, OPQ encode, and the
    FULL-reconstruction norm (numerator and denominator of the rescored
    cosine must describe the same vector)."""
    from erlvectordb_tpu.quant.pq import _decode, _encode

    q = _unpack_int4(packed)
    recon = cents_rows + q.astype(jnp.float32) * scales[:, None]
    e = x_rows[:, :d] - recon[:, :d]
    if dp2 > d:
        e = jnp.pad(e, ((0, 0), (0, dp2 - d)))
    er = jnp.dot(e, rot, preferred_element_type=jnp.float32)
    c2 = _encode(er, books)
    dec = jnp.dot(_decode(c2, books), rot.T,
                  preferred_element_type=jnp.float32)
    full = recon[:, :d] + dec[:, :d]
    nrm = jnp.sqrt(jnp.sum(full * full, axis=-1))
    return c2, nrm


@functools.partial(jax.jit, donate_argnums=(0, 1), static_argnames=("d", "dp2"))
def _scatter_insert_rq(codes2, norms, packed_rows, scales_rows, cents_rows,
                       new_vecs, rows, rot, books, *, d, dp2):
    """Per-insert second-stage encode + scatter (rq stores): the freshly
    written rows' int4 error is OPQ-encoded and their stored norms become
    full-reconstruction norms.  Pad rows (row == capacity) drop."""
    c2, nrm = _rq_encode_chunk(packed_rows, scales_rows, cents_rows,
                               new_vecs, rot, books, d=d, dp2=dp2)
    codes2 = codes2.at[rows].set(c2, mode="drop")
    norms = norms.at[rows].set(nrm, mode="drop")
    return codes2, norms


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_delete(valid, rows):
    return valid.at[rows].set(False, mode="drop")


@jax.jit
def _perm_map(perm, rows):
    """Slot rows -> original rows on device (streaming-built stores); empty
    slots carry perm == -1, matching the -1 no-hit convention."""
    return perm[jnp.clip(rows, 0, perm.shape[0] - 1)]


@jax.jit
def _pack_results(dists, rows):
    """Fuse (dists f32, rows int32) into ONE f32 array for a single
    device->host readback.  Every np.asarray readback costs a full link
    round-trip on tunneled rigs (~30-60 ms here); packing halves the
    per-search readbacks — the single largest controllable term in
    one-query serving latency.

    Rows ride as exact f32 VALUES, not bitcasts: on the tunneled v5e
    backend a concatenated bitcast half reads back as zeros for sub-tile
    shapes (measured: [8, 32] and [1, 32] corrupt, [64, 32] fine), and
    f32 holds integers exactly only below 2^24 — so stores above 2^24
    rows split each row index into two f32 columns (hi 12 bits, lo 12
    bits), [B, 3k] instead of [B, 2k]."""
    rows = rows.astype(jnp.int32)
    return jnp.concatenate(
        [dists, (rows >> 12).astype(jnp.float32),
         (rows & 0xFFF).astype(jnp.float32)], axis=1)


@functools.partial(jax.jit, static_argnames=("width",))
def _pad_width(arr, width):
    return jnp.pad(arr, ((0, 0), (0, width - arr.shape[1])))


@functools.partial(jax.jit, static_argnames=("cap",))
def _bulk_build_f32(arr, cap):
    n = arr.shape[0]
    norms = jnp.sqrt(jnp.sum(arr * arr, axis=-1))
    vecs = jnp.pad(arr, ((0, cap - n), (0, 0)))
    norms = jnp.pad(norms, ((0, cap - n),))
    valid = jnp.pad(jnp.ones((n,), bool), ((0, cap - n),))
    return vecs, norms, valid


@functools.partial(jax.jit, static_argnames=("cap",))
def _bulk_build_int8(arr, cap):
    n = arr.shape[0]
    absmax = jnp.max(jnp.abs(arr), axis=-1)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    codes = jnp.clip(jnp.round(arr / scale[:, None]), -127, 127).astype(jnp.int8)
    norms = jnp.sqrt(jnp.sum(arr * arr, axis=-1))
    codes = jnp.pad(codes, ((0, cap - n), (0, 0)))
    scales = jnp.pad(scale, ((0, cap - n),), constant_values=1.0)
    norms = jnp.pad(norms, ((0, cap - n),))
    valid = jnp.pad(jnp.ones((n,), bool), ((0, cap - n),))
    return codes, scales, norms, valid


@functools.partial(jax.jit, static_argnames=("cap",))
def _bulk_build_int4(arr, cap):
    n = arr.shape[0]
    absmax = jnp.max(jnp.abs(arr), axis=-1)
    scale = jnp.where(absmax > 0, absmax / 7.0, 1.0)
    q = jnp.clip(jnp.round(arr / scale[:, None]), -7, 7).astype(jnp.int8)
    packed = jnp.pad(_pack_int4(q), ((0, cap - n), (0, 0)))
    scales = jnp.pad(scale, ((0, cap - n),), constant_values=1.0)
    norms = jnp.pad(jnp.sqrt(jnp.sum(arr * arr, axis=-1)), ((0, cap - n),))
    valid = jnp.pad(jnp.ones((n,), bool), ((0, cap - n),))
    return packed, scales, norms, valid


@dataclass
class SearchTicket:
    """In-flight search: device results dispatched but not read back.

    Produced by ``search_batch_submit`` — the device program is already
    enqueued (JAX dispatch is async), so the caller can submit further
    batches to keep the device pipeline full, then harvest each ticket with
    ``search_batch_complete`` (which blocks on the device->host readback).
    """

    dists: Any   # jax.Array [B, kb]
    rows: Any    # jax.Array [B, kb]
    nq: int
    k: int       # caller's k (trim bound)
    kb: int      # compiled k bucket
    t0: float = 0.0  # submit timestamp (for the store.search latency metric)
    shard_cap: int = 0  # sharded stores: per-shard capacity AT SUBMIT TIME
    #                    (rows encode shard*cap+local; a grow between submit
    #                    and complete changes the flat id layout)
    rows_are_orig: bool = False  # streaming-built stores: rows were perm-
    #                    mapped slot->original ON DEVICE, so ids are
    #                    str(row) directly (valid even if the store
    #                    materializes host tables before completion)
    packed: Any = None  # [B, 3*kb] f32 fused (dists | row-hi | row-lo) device
    #                    array: completion reads ONE array back (one link
    #                    RTT) instead of two — see _pack_results


class DimensionMismatch(ValueError):
    """Vector dimension does not match the store's dimension."""


class InvalidVector(ValueError):
    """Vector contains non-finite or non-numeric elements."""


class VectorStore:
    """One named vector store: device arrays + host id/metadata tables.

    Parameters
    ----------
    name:       store name (unique within a registry).
    dim:        optional fixed dimension; otherwise set by the first insert.
    metric:     default distance metric ("cosine", like the reference).
    dtype:      "float32" (exact), "int8" (symmetric per-row quantized —
                search runs in the quantized domain on the int8 MXU path),
                or "int4" (packed nibbles, half of int8's memory).
    device:     optional jax.Device to pin arrays to.
    """

    def __init__(
        self,
        name: str,
        dim: Optional[int] = None,
        metric: str = "cosine",
        dtype: str = "float32",
        device: Optional[jax.Device] = None,
        intkey: bool = False,
    ):
        if metric not in VALID_METRICS:
            raise ValueError(f"metric must be one of {VALID_METRICS}, got {metric!r}")
        if dtype not in ("float32", "int8", "int4", "int4r"):
            raise ValueError(
                "dtype must be 'float32', 'int8', 'int4' or 'int4r', "
                f"got {dtype!r}"
            )
        if intkey and dtype != "int8":
            raise ValueError("intkey requires dtype='int8'")
        self.name = name
        self.metric = metric
        self.dtype = dtype
        self._device = device
        self._dim: Optional[int] = dim
        self._capacity = 0
        self._lock = RWLock()
        self._mat_lock = threading.Lock()  # guards _materialize (see there)

        # Device state (allocated lazily once dim is known).
        self._vectors: Optional[jax.Array] = None   # f32 rows or int8 codes
        self._scales: Optional[jax.Array] = None    # int8 stores only
        self._norms: Optional[jax.Array] = None
        self._valid: Optional[jax.Array] = None
        # intkey (int8 speed mode): second int8 plane with a SHARED scale so
        # the raw int32 MXU dot ranks the metric cross-row — the hot kernel
        # drops all scoring math (fused_topk intkey block comment).  cosine
        # stores keep a UNIT plane (per-row |x| scale); euclidean/dot stores
        # a MAGNITUDE plane (one global scale S = _plane_scale, with the
        # -|x|^2/2 row bias folded into the key domain per batch).  Costs 2x
        # code memory (still under f32 rows); derived on device from the
        # absmax plane when missing (snapshot restore / S outgrown).
        self.intkey = intkey
        self._codes_unit: Optional[jax.Array] = None
        self._plane_scale: Optional[float] = None  # mag plane's S

        # int4r (cell-residual) state: rows live at cell*cell_cap + slot,
        # codes are 4-bit RESIDUALS against the row's cell centroid — the
        # quantizer sees a 3-4x smaller dynamic range than whole-vector int4,
        # which is what makes 4-bit rows search-grade (recall ~0.9 vs ~0.6).
        self._centroids: Optional[jax.Array] = None  # [K, W] f32
        self._cents_rt: Optional[jax.Array] = None   # bf16 routing copy
        self._cents_cn2: Optional[jax.Array] = None  # |c|^2 routing buffer
        self._cents_rt_src: Optional[jax.Array] = None
        # Optional second-stage residual quantization (``rq_m`` on
        # from_matrix): OPQ error codes over the int4 reconstruction error,
        # +rq_m bytes/row.  Multiprobe searches rescore a small candidate
        # pool with the LUT'd error term (ops/cell_probe.py) — measured
        # +0.04 recall@10 at 100-d for 10 B/row (exp_rq2, round 4).
        self._rq_m = 0
        self._rq_codes: Optional[jax.Array] = None  # [capacity, M2] uint8
        self._rq_books: Optional[jax.Array] = None  # [M2, 256, ds] f32
        self._rq_rot: Optional[jax.Array] = None    # [dp2, dp2] f32
        self.rq_pool = 64  # stage-2 rescore pool floor (max(4k_bucket, this))
        # recall_target calibration curves, keyed (k, metric); lazy
        # first-use calibration serialized by the set's lock
        self._calib = CalibrationSet()
        self._cell_cap = 0
        self._cell_next: Optional[np.ndarray] = None   # per-cell slot HWM
        self._cell_avail: Optional[np.ndarray] = None  # free slots per cell
        self._cell_free: Dict[int, List[int]] = {}     # freed rows per cell

        # Host state.
        self._id_to_row: Dict[str, int] = {}
        self._row_to_id: Dict[int, str] = {}
        self._metadata: Dict[str, Any] = {}
        self._free_rows: List[int] = []
        self._next_row = 0
        # Columnar row -> id table (numpy object array [capacity], None for
        # dead rows).  The result-mapping hot path fancy-indexes this at C
        # speed instead of a per-hit dict lookup; kept in lockstep with
        # _row_to_id by every mutation.
        self._ids_np: Optional[np.ndarray] = None
        self._ids_contig_filled = 0  # rows [0, x) hold implicit str ids

        # Metadata filtering: columnar tag tables.  For each filtered-on
        # metadata key, an int32 code per row (0 = absent); the filter mask
        # is then one vectorized compare over [capacity] instead of a Python
        # loop over every row's metadata dict (round-1's O(count) loop made
        # filtering unusable at 1M rows).  Columns are built lazily on the
        # first filter touching a key and maintained by insert/delete.
        self._tag_cols: Dict[str, np.ndarray] = {}
        self._tag_vocab: Dict[str, Dict[Any, int]] = {}
        # Device-resident mask cache: (store version, mask) per filter key —
        # repeated identical filters skip both mask compute and the
        # host->device transfer.
        self._dmask_cache: Dict[str, Tuple[int, jax.Array]] = {}

        # Bulk-build fast path: when a store is built via from_matrix with
        # implicit ids, ids are "0".."n-1" and the dicts above stay empty
        # until the first targeted mutation materializes them.
        self._contig = 0
        # Streaming cell builds (from_chunks) leave rows PERMUTED by cell
        # with the slot -> original-row map resident on DEVICE: ids stay
        # implicit ("0".."n-1" by original row) and search results are
        # perm-mapped by a tiny device gather, so no O(N) id table or perm
        # readback ever crosses the tunnel.  The first targeted mutation
        # materializes host tables from one perm readback (documented cost).
        self._perm_dev: Optional[jax.Array] = None
        self._perm_count = 0
        # spill_mult builds (SOAR multi-assignment) carry duplicate rows:
        # searches over-fetch and dedup by id; targeted mutations are
        # rejected (a delete could not atomically kill both copies)
        self._spilled = False

        # Change tracking for persistence (dirty-flag, like the reference's
        # ETS dirty bit, src/vector_persistence.erl:131-135), plus the rows
        # touched since the last snapshot so the sync loop can write O(delta)
        # incremental snapshots instead of the reference's O(N)-every-30s
        # full DETS rewrite (src/vector_persistence.erl:255-273).
        self.version = 0
        self.dirty = False
        self.created_at = time.time()
        # Cell-layout drift tracking (int4r): mutations since the last bulk
        # build/refit.  Cell placement quality rots under churn (inserts
        # park in whatever cell has space, deletes hollow cells out), so
        # is_stale() exposes a refit trigger the maintenance loop polls.
        self._built_rows = 0
        self._churn_inserts = 0
        self._churn_deletes = 0
        self._cells_at_build = 0
        # realized max |int4 code|_2 (lazy; the packed-scan offset bound —
        # see fused_topk.max_code_norm).  Invalidated on int4r mutations;
        # a stale UNDERestimate is safe (worst-match rows rank last), so
        # recomputation is only a recall matter, never correctness.
        self._code_norm_max = None
        self._touched_rows: set = set()
        # False until a full snapshot anchors the delta chain (bulk builds,
        # capacity growth, and restores all force the next sync to be full).
        self._touched_reliable = False

    # ---------------------------------------------------------------- props

    @property
    def dim(self) -> Optional[int]:
        return self._dim

    @property
    def count(self) -> int:
        return len(self._id_to_row) + self._contig + self._perm_count

    @property
    def capacity(self) -> int:
        return self._capacity

    def __len__(self) -> int:
        return self.count

    def __contains__(self, vector_id: str) -> bool:
        implicit = self._contig or self._perm_count
        if implicit:
            sid = str(vector_id)
            # canonical form only: '007'/' 7'/'+7' are NOT stored ids, and
            # int() would accept them (disagreeing with get/delete)
            if not (sid.isdigit() and (sid == "0" or sid[0] != "0")):
                return False
            return 0 <= int(sid) < implicit
        return vector_id in self._id_to_row

    def _rid(self, row: int) -> Optional[str]:
        """Row -> id, without materializing implicit contiguous ids."""
        if self._contig:
            return str(row) if 0 <= row < self._contig else None
        return self._row_to_id.get(row)

    def _materialize(self) -> None:
        """Expand implicit contiguous ids into the dict tables (one-time,
        triggered by the first targeted mutation after a bulk build).

        Callers may hold only the READ side of the store RWLock (get,
        filter_mask, export paths run concurrently), so this is guarded by
        its own mutex with ``_contig`` cleared LAST: a concurrent reader
        either blocks here or sees the fully-built tables — never the
        half-built state."""
        if not self._contig and not self._perm_count:
            return
        with self._mat_lock:
            if self._perm_count and self._spilled:
                raise ValueError(
                    "store was built with spill_mult (multi-assigned rows): "
                    "targeted mutations are not supported on spilled "
                    "layouts — rebuild without spill for mutable use")
            if self._perm_count:
                # Streaming-built store: ONE perm readback (slot -> original
                # row; ~4 bytes/row through the tunnel — the documented cost
                # of the first targeted mutation on a bulk-streamed store),
                # then id tables keyed by original row, valued by slot.
                perm = np.asarray(self._perm_dev)
                slots = np.where(perm >= 0)[0]
                origs = perm[slots]
                sids = origs.astype(str)
                self._id_to_row = dict(zip(sids.tolist(), slots.tolist()))
                self._row_to_id = dict(zip(slots.tolist(), sids.tolist()))
                if self._ids_np is None or len(self._ids_np) < self._capacity:
                    self._ids_np = np.full((self._capacity,), None, object)
                self._ids_np[slots] = sids.astype(object)
                self._perm_count = 0   # publish: tables complete
                self._perm_dev = None  # dispatch stops perm-mapping rows
                return
            n = self._contig
            if not n:  # lost the race: another thread materialized
                return
            self._id_to_row = {str(i): i for i in range(n)}
            self._row_to_id = {i: str(i) for i in range(n)}
            self._fill_contig_ids(n)
            self._contig = 0  # publish: tables are complete

    def _fill_contig_ids(self, n: int) -> None:
        """Fill rows [0, n) of the columnar id table with implicit ids."""
        if self._ids_np is not None and self._ids_contig_filled < n:
            self._ids_np[self._ids_contig_filled:n] = np.arange(
                self._ids_contig_filled, n
            ).astype(str).astype(object)
            self._ids_contig_filled = n

    def _ids_view(self) -> Optional[np.ndarray]:
        """Row -> id object array for vectorized result mapping (fills the
        implicit-contiguous range lazily on first use)."""
        if self._contig:
            self._fill_contig_ids(self._contig)
        return self._ids_np

    # ------------------------------------------------------------ alloc/grow

    def _put(self, x: np.ndarray | jax.Array) -> jax.Array:
        if self._device is not None:
            return jax.device_put(x, self._device)
        return jnp.asarray(x)

    def _ensure_allocated(self, dim: int) -> None:
        if self._dim is None:
            self._dim = dim
        if self._vectors is not None:
            return
        width = _pad128(self._dim)
        if self.dtype == "int4r":
            # cell-residual stores start with zero cells; capacity grows by
            # appending cells as inserts arrive (_place_in_cells)
            self._cell_cap = self._cell_cap or 128
            self._capacity = 0
            self._vectors = self._put(np.zeros((0, width // 2), np.uint8))
            self._scales = self._put(np.ones((0,), np.float32))
            self._norms = self._put(np.zeros((0,), np.float32))
            self._valid = self._put(np.zeros((0,), bool))
            self._centroids = self._put(np.zeros((0, width), np.float32))
            self._cell_next = np.zeros((0,), np.int64)
            self._cell_avail = np.zeros((0,), np.int64)
            if self._ids_np is None:
                self._ids_np = np.full((0,), None, object)
            return
        cap = MIN_CAPACITY
        self._capacity = cap
        if self.dtype == "int8":
            self._vectors = self._put(np.zeros((cap, width), np.int8))
            self._scales = self._put(np.ones((cap,), np.float32))
            if self.intkey and _plane_kind(self.metric) == "unit":
                # mag planes wait for data: their global scale S comes from
                # the corpus (lazy derivation in _ensure_unit_plane)
                self._codes_unit = self._put(np.zeros((cap, width), np.int8))
        elif self.dtype == "int4":
            self._vectors = self._put(np.zeros((cap, width // 2), np.uint8))
            self._scales = self._put(np.ones((cap,), np.float32))
        else:
            self._vectors = self._put(np.zeros((cap, width), np.float32))
        self._norms = self._put(np.zeros((cap,), np.float32))
        self._valid = self._put(np.zeros((cap,), bool))
        if self._ids_np is None:
            self._ids_np = np.full((cap,), None, object)

    def _grow_to(self, new_cap: int) -> None:
        new_cap = max(_next_pow2(new_cap), MIN_CAPACITY)
        if new_cap <= self._capacity:
            return
        self._pad_capacity(new_cap)

    def _pad_capacity(self, new_cap: int) -> None:
        pad = new_cap - self._capacity
        self._vectors = jnp.pad(self._vectors, ((0, pad), (0, 0)))
        if self._codes_unit is not None:
            self._codes_unit = jnp.pad(self._codes_unit, ((0, pad), (0, 0)))
        if self._scales is not None:
            self._scales = jnp.pad(self._scales, ((0, pad),), constant_values=1.0)
        self._norms = jnp.pad(self._norms, ((0, pad),))
        self._valid = jnp.pad(self._valid, ((0, pad),))
        if self._rq_codes is not None:
            self._rq_codes = jnp.pad(self._rq_codes, ((0, pad), (0, 0)))
        if self._ids_np is not None:
            grown = np.full((new_cap,), None, object)
            grown[: self._capacity] = self._ids_np
            self._ids_np = grown
        for k, col in self._tag_cols.items():
            newcol = np.zeros(new_cap, np.int32)
            newcol[: self._capacity] = col
            self._tag_cols[k] = newcol
        self._capacity = new_cap
        # array shapes changed: the delta chain no longer applies cleanly
        self._touched_reliable = False

    # ------------------------------------------------- int4r cell machinery

    CELL_BLOCK = 64  # cells appended per growth step; keeps K a multiple of
    #                  TILE_N / cell_cap so the fused scan stays tile-aligned

    def _take_slot(self, cell: int) -> int:
        free = self._cell_free.get(cell)
        if free:
            row = free.pop()
            if not free:
                self._cell_free.pop(cell, None)
        else:
            row = cell * self._cell_cap + int(self._cell_next[cell])
            self._cell_next[cell] += 1
        self._cell_avail[cell] -= 1
        return row

    def _append_cells(self, new_cents: np.ndarray) -> int:
        """Append real cells (padded to a CELL_BLOCK multiple with blocked
        dummy cells so capacity stays scan-tile-aligned).  Returns the index
        of the first new real cell."""
        k_old = int(self._cell_next.shape[0])
        a_real = new_cents.shape[0]
        a_total = -(-(k_old + a_real) // self.CELL_BLOCK) * self.CELL_BLOCK - k_old
        width = self._centroids.shape[1] if self._centroids is not None else new_cents.shape[1]
        cents_pad = np.zeros((a_total, width), np.float32)
        cents_pad[:a_real] = new_cents
        self._centroids = jnp.concatenate(
            [self._centroids, self._put(cents_pad)], axis=0)
        next_pad = np.full((a_total,), 0, np.int64)
        next_pad[a_real:] = self._cell_cap  # blocked padding cells: full
        avail_pad = np.full((a_total,), self._cell_cap, np.int64)
        avail_pad[a_real:] = 0
        self._cell_next = np.concatenate([self._cell_next, next_pad])
        self._cell_avail = np.concatenate([self._cell_avail, avail_pad])
        self._pad_capacity(self._capacity + a_total * self._cell_cap)
        return k_old

    def _place_in_cells(self, vecs: np.ndarray) -> np.ndarray:
        """Assign fresh vectors to cells: nearest cell with space (top-J
        preference walk), overflow spawning new cells trained on the
        overflow itself.  Returns target rows."""
        m = vecs.shape[0]
        rows = np.empty(m, np.int64)
        unplaced = list(range(m))
        k_cur = int(self._cell_next.shape[0])
        if k_cur and int(self._cell_avail.sum()) > 0:
            from erlvectordb_tpu.core.ivf import _top_choices

            j = min(8, k_cur)
            width = self._centroids.shape[1]
            vp = np.zeros((m, width), np.float32)
            vp[:, : vecs.shape[1]] = vecs
            _, choices = _top_choices(jnp.asarray(vp), self._centroids, j=j)
            choices = np.asarray(choices)
            still = []
            for i in unplaced:
                for jj in range(j):
                    c = int(choices[i, jj])
                    if self._cell_avail[c] > 0:
                        rows[i] = self._take_slot(c)
                        break
                else:
                    still.append(i)
            unplaced = still
        if unplaced:
            ov = np.asarray(vecs[unplaced], np.float32)
            width = _pad128(self._dim)
            ovp = np.zeros((len(unplaced), width), np.float32)
            ovp[:, : ov.shape[1]] = ov
            # target half-full new cells so neighbors of these rows have room
            k_new = max(1, -(-len(unplaced) // max(1, self._cell_cap // 2)))
            if k_new == 1 or len(unplaced) <= 2:
                cents = ovp[:1]
                k_new = 1
            else:
                from erlvectordb_tpu.ops.kmeans import kmeans_fit

                cj, _ = kmeans_fit(jnp.asarray(ovp), jnp.uint32(7), k=k_new,
                                   iters=5)
                cents = np.asarray(cj)
            first = self._append_cells(cents)
            # nearest NEW cell with space (small set: host loop)
            d2 = ((ovp[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
            pref = np.argsort(d2, axis=1)
            for i_local, i in enumerate(unplaced):
                for c_local in pref[i_local]:
                    c = first + int(c_local)
                    if self._cell_avail[c] > 0:
                        rows[i] = self._take_slot(c)
                        break
                else:  # every new cell full: spawn a singleton cell
                    c = first2 = self._append_cells(ovp[i_local:i_local + 1])
                    rows[i] = self._take_slot(first2)
        return rows

    def _alloc_rows(self, n: int) -> List[int]:
        rows: List[int] = []
        while self._free_rows and len(rows) < n:
            rows.append(self._free_rows.pop())
        remaining = n - len(rows)
        if remaining:
            if self._next_row + remaining > self._capacity:
                self._grow_to(self._next_row + remaining)
            rows.extend(range(self._next_row, self._next_row + remaining))
            self._next_row += remaining
        return rows

    # ------------------------------------------------------------ validation

    def _validate_batch(self, vectors: np.ndarray) -> np.ndarray:
        arr = np.asarray(vectors, dtype=np.float32)
        if arr.ndim == 1:
            arr = arr[None, :]
        if arr.ndim != 2:
            raise InvalidVector("vectors must be 1-D or 2-D numeric arrays")
        if self._dim is not None and arr.shape[1] != self._dim:
            raise DimensionMismatch(
                f"store {self.name!r} has dimension {self._dim}, got {arr.shape[1]}"
            )
        if arr.shape[1] == 0:
            raise InvalidVector("vectors must be non-empty")
        if not np.all(np.isfinite(arr)):
            raise InvalidVector("vector elements must be finite numbers")
        return arr

    # ---------------------------------------------------------------- insert

    def insert(self, vector_id: str, vector, metadata: Optional[dict] = None) -> None:
        """Insert or overwrite one vector (reference insert/3 semantics)."""
        self.insert_batch([vector_id], [vector], [metadata or {}])

    def insert_batch(
        self,
        ids: Sequence[str],
        vectors,
        metadatas: Optional[Sequence[Optional[dict]]] = None,
    ) -> None:
        """Batched insert: one device scatter for the whole batch."""
        if len(ids) == 0:
            return
        arr = self._validate_batch(vectors)
        if arr.shape[0] != len(ids):
            raise ValueError("ids and vectors length mismatch")
        if metadatas is None:
            metadatas = [{}] * len(ids)
        if len(ids) > 1:
            # Batch-internal duplicates collapse to the LAST occurrence up
            # front (last-write-wins).  Without this, two new occurrences of
            # one id would each take a fresh row: _id_to_row keeps only the
            # last, leaving the first as a permanent valid "ghost" row that
            # search returns and delete cannot reach; duplicate EXISTING ids
            # would also race in the device scatter (duplicate-index winner
            # is unspecified).  int4r additionally re-places overwrites into
            # fresh slots, which requires the same collapse.
            last = {str(v): i for i, v in enumerate(ids)}
            if len(last) != len(ids):
                keep = sorted(last.values())
                ids = [ids[i] for i in keep]
                arr = arr[keep]
                metadatas = [metadatas[i] for i in keep]
        with self._lock.write(), metrics.timed("store.insert"):
            self._materialize()
            self._ensure_allocated(arr.shape[1])
            # Fast path for bulk loading: an empty (or append-only) store
            # with no free rows takes a contiguous row range and builds the
            # id tables with dict(zip(...)) at C speed — the per-id Python
            # loop below is ~50x slower at 1M ids.
            fast = (
                not self._id_to_row
                and not self._free_rows
                and self.dtype != "int4r"  # rows place by cell, not append
                and len(set(map(str, ids))) == len(ids)
            ) if len(ids) >= 1024 else False
            if fast:
                n_new = len(ids)
                if self._next_row + n_new > self._capacity:
                    self._grow_to(self._next_row + n_new)
                rows = np.arange(self._next_row, self._next_row + n_new,
                                 dtype=np.int64)
                self._next_row += n_new
            else:
                rows = np.empty(len(ids), np.int64)
                fresh_needed = []
                for i, vid in enumerate(ids):
                    vid = str(vid)
                    existing = self._id_to_row.get(vid)
                    if existing is not None:
                        rows[i] = existing
                    else:
                        fresh_needed.append(i)
                if self.dtype == "int4r":
                    # overwrites RE-PLACE: the residual of the new vector
                    # against the old cell's centroid can be whole-vector
                    # sized, which would quantize as badly as plain int4
                    stale = []
                    for i, vid in enumerate(ids):
                        vid = str(vid)
                        old = self._id_to_row.get(vid)
                        if old is not None:
                            stale.append(old)
                            cell = old // self._cell_cap
                            self._cell_free.setdefault(cell, []).append(old)
                            self._cell_avail[cell] += 1
                            del self._id_to_row[vid]
                            del self._row_to_id[old]
                            self._ids_np[old] = None
                            for col in self._tag_cols.values():
                                col[old] = 0
                    rows[:] = self._place_in_cells(arr)
                    self._churn_inserts += len(ids)
                    if stale:
                        # freed slots not reused by this batch become invalid
                        taken = set(rows.tolist())  # hoisted: O(n), not O(n^2)
                        dead = [r for r in stale if r not in taken]
                        if dead:
                            bucket_d = _next_pow2(len(dead))
                            padded_d = dead + [self._capacity] * (bucket_d - len(dead))
                            self._valid = _scatter_delete(
                                self._valid,
                                self._put(np.asarray(padded_d, np.int32)))
                            self._touched_rows.update(dead)
                else:
                    fresh_rows = self._alloc_rows(len(fresh_needed))
                    for i, row in zip(fresh_needed, fresh_rows):
                        rows[i] = row
            # Bucket the batch to a power of two; padding lanes scatter to an
            # out-of-range row and are dropped on device.
            bucket = _next_pow2(len(ids))
            pad = bucket - len(ids)
            width = _pad128(arr.shape[1])
            if pad or width != arr.shape[1]:
                rows_dev = np.concatenate([rows, np.full(pad, self._capacity, np.int64)])
                arr_dev = np.zeros((bucket, width), np.float32)
                arr_dev[: len(ids), : arr.shape[1]] = arr
            else:
                rows_dev, arr_dev = rows, arr
            rows_j = self._put(rows_dev.astype(np.int32))
            vecs_j = self._put(arr_dev)
            if self.dtype == "int4r":
                cells_j = self._put((rows_dev // self._cell_cap).astype(np.int32))
                cents_rows = self._centroids[cells_j]  # clip-gather; pad rows drop
                (self._vectors, self._scales, self._norms, self._valid) = _scatter_insert_int4r(
                    self._vectors, self._scales, self._norms, self._valid,
                    rows_j, vecs_j, cents_rows,
                )
                self._code_norm_max = None  # realized bound may have grown
                if self._rq_codes is not None:
                    # stage-2 encode of the freshly written rows (clip-
                    # gather reads garbage for pad rows; their scatter drops)
                    self._rq_codes, self._norms = _scatter_insert_rq(
                        self._rq_codes, self._norms,
                        self._vectors[rows_j], self._scales[rows_j],
                        cents_rows, vecs_j, rows_j,
                        self._rq_rot, self._rq_books,
                        d=self._dim, dp2=self._rq_rot.shape[0],
                    )
            elif self.dtype == "int8":
                (self._vectors, self._scales, self._norms, self._valid) = _scatter_insert_int8(
                    self._vectors, self._scales, self._norms, self._valid, rows_j, vecs_j
                )
                if self.intkey and self._codes_unit is not None:
                    if _plane_kind(self.metric) == "unit":
                        self._codes_unit = _scatter_insert_unit(
                            self._codes_unit, rows_j, vecs_j)
                    else:
                        # magnitude plane: a row outgrowing the global scale
                        # S invalidates the plane (rebuilt lazily with a
                        # fresh S on the next keyed search); otherwise one
                        # shared-scale scatter.  Host-side norm check — arr
                        # is the validated numpy batch.
                        mx = float(np.sqrt((arr.astype(np.float64) ** 2)
                                           .sum(axis=1).max()))
                        if (self._plane_scale is None
                                or mx > self._plane_scale):
                            self._codes_unit = None
                            self._plane_scale = None
                        else:
                            self._codes_unit = _scatter_insert_mag(
                                self._codes_unit, rows_j, vecs_j,
                                127.0 / self._plane_scale)
            elif self.dtype == "int4":
                (self._vectors, self._scales, self._norms, self._valid) = _scatter_insert_int4(
                    self._vectors, self._scales, self._norms, self._valid, rows_j, vecs_j
                )
            else:
                (self._vectors, self._norms, self._valid) = _scatter_insert_f32(
                    self._vectors, self._norms, self._valid, rows_j, vecs_j
                )
            if fast:
                sids = [str(v) for v in ids]
                row_list = rows.tolist()
                self._id_to_row.update(zip(sids, row_list))
                self._row_to_id.update(zip(row_list, sids))
                if any(m for m in metadatas):
                    self._metadata.update(
                        (v, m if m is not None else {})
                        for v, m in zip(sids, metadatas)
                    )
            else:
                sids = []
                for i, vid in enumerate(ids):
                    vid = str(vid)
                    sids.append(vid)
                    row = int(rows[i])
                    self._id_to_row[vid] = row
                    self._row_to_id[row] = vid
                    self._metadata[vid] = metadatas[i] if metadatas[i] is not None else {}
            self._ids_np[rows] = sids
            self._update_tags(rows, metadatas)
            self._touched_rows.update(
                rows.tolist() if hasattr(rows, "tolist") else rows)
            self.version += 1
            self.dirty = True

    # ---------------------------------------------------------------- delete

    def delete(self, vector_id: str) -> bool:
        """Delete by id; returns False if absent (reference {error, not_found})."""
        return self.delete_batch([vector_id]) == 1

    def delete_batch(self, ids: Iterable[str]) -> int:
        with self._lock.write():
            self._materialize()
            rows = []
            hit_ids = []
            seen = set()
            for vid in ids:
                vid = str(vid)
                if vid in seen:  # duplicate: second del would KeyError,
                    continue     # leaving the store half-mutated
                seen.add(vid)
                row = self._id_to_row.get(vid)
                if row is not None:
                    rows.append(row)
                    hit_ids.append(vid)
            if not rows:
                return 0
            bucket = _next_pow2(len(rows))
            padded = rows + [self._capacity] * (bucket - len(rows))
            rows_del = self._put(np.asarray(padded, np.int32))
            self._valid = _scatter_delete(self._valid, rows_del)
            if self._codes_unit is not None:
                self._codes_unit = _scatter_zero_unit(self._codes_unit,
                                                      rows_del)
            for vid, row in zip(hit_ids, rows):
                del self._id_to_row[vid]
                del self._row_to_id[row]
                self._metadata.pop(vid, None)
                if self.dtype == "int4r":
                    cell = row // self._cell_cap
                    self._cell_free.setdefault(cell, []).append(row)
                    self._cell_avail[cell] += 1
                    self._churn_deletes += 1
                else:
                    self._free_rows.append(row)
                self._ids_np[row] = None
            for col in self._tag_cols.values():
                col[rows] = 0
            self._touched_rows.update(rows)
            self.version += 1
            self.dirty = True
            return len(rows)

    # ---------------------------------------------------------------- search

    _NPROBE_GRID = (4, 8, 16, 32, 64, 128, 256, 512)

    def calibrate_nprobe(self, queries=None, n_sample: int = 256,
                         k: int = 10, metric: Optional[str] = None,
                         ground_truth=None) -> dict:
        """Measure the multiprobe recall@k curve so searches can take a
        ``recall_target=`` instead of a raw ``nprobe=`` (int4r stores).

        Two modes (core/calibration.py):

        * pass ``ground_truth`` ([S, >=k] exact store rows for
          ``queries``, computed on the ORIGINAL f32 data with
          calibration.exact_ground_truth — the store itself holds only
          int4 residuals, so the truth must come from outside) -> EXACT
          mode: curve values are absolute recall@k, the deep probe's
          value is the quantization CEILING, and recall_target refuses
          targets above it (RecallUnachievable);
        * otherwise -> CEILING mode against the store's own deep probe
          (nprobe = min(n_cells, 512)): recall at deep == 1.0 by
          construction; the int4 quantization loss is INVISIBLE to this
          curve (e.g. a layout whose true ceiling is 0.90 "meets" a 0.95
          ceiling-relative target at ~0.86 absolute).

        ``queries`` defaults to ``n_sample`` live rows decoded on device
        — member queries slightly flatter the curve vs genuine
        out-of-sample traffic, so pass a held-out sample for SLA-grade
        targeting.  Cost: one deep dispatch + one per grid point
        (~100 ms device total at 8M x 768).  Curves are keyed by
        (k, metric), persist with snapshots, and are consulted lazily on
        the first ``recall_target=`` search."""
        if self.dtype != "int4r":
            raise ValueError("calibrate_nprobe requires an int4r store")
        if self.count == 0:
            raise ValueError("empty store")
        metric = metric or self.metric
        if queries is None:
            if ground_truth is not None:
                raise ValueError("ground_truth requires explicit queries")
            with self._lock.read():
                valid = np.asarray(self._valid)
                rows = np.flatnonzero(valid)
                rng = np.random.default_rng(len(rows))
                rows = rng.choice(rows, size=min(n_sample, len(rows)),
                                  replace=False)
                res = _unpack_int4_np(np.asarray(self._vectors[rows]))
                res = res.astype(np.float32)
                res *= np.asarray(self._scales[rows])[:, None]
                cents = np.asarray(
                    self._centroids[rows // self._cell_cap])
                queries = (cents + res)[:, : self._dim]
        queries = np.asarray(queries, np.float32)
        deep = min(int(self._centroids.shape[0]), 512)

        if ground_truth is None:
            # ceiling mode compares the layout against itself: internal
            # cell-slot rows are a consistent space on both sides
            def search_rows(qs, kk, nprobe):
                t = self.search_batch_submit(qs, k=kk, metric=metric,
                                             nprobe=nprobe)
                _, rows_p, _ = self.search_batch_complete_raw(t)
                return rows_p
        else:
            # exact mode compares against ORIGINAL-ROW positions (from
            # calibration.exact_ground_truth over the original f32 data),
            # which equal the implicit ids of bulk-built stores
            # ("0".."n-1"); internal rows are cell-permuted, so map
            # results through their ids
            def search_rows(qs, kk, nprobe):
                t = self.search_batch_submit(qs, k=kk, metric=metric,
                                             nprobe=nprobe)
                dists_p, _rows_p, ids_p = self.search_batch_complete_raw(t)
                if ids_p is None:
                    return np.full((len(qs), kk), -1, np.int64)
                out = np.full(ids_p.shape, -1, np.int64)
                for i, row in enumerate(ids_p.tolist()):
                    for j, vid in enumerate(row):
                        if vid is None or not np.isfinite(dists_p[i, j]):
                            continue
                        try:
                            out[i, j] = int(vid)
                        except ValueError as e:
                            raise ValueError(
                                "exact-mode calibration compares ground-"
                                "truth positions against implicit integer "
                                "ids; this store has custom string ids — "
                                "map your ground truth to ids and "
                                "calibrate through the index surface "
                                "instead") from e
                return out

        curve = measure_curve(search_rows, queries, k=k, metric=metric,
                              deep=deep, grid=self._NPROBE_GRID,
                              ground_truth=ground_truth)
        self._calib.put(curve)
        return dict(curve.curve)

    def _nprobe_for_target(self, target: float, k: int,
                           metric: Optional[str] = None) -> int:
        """Smallest calibrated nprobe meeting ``target`` under the
        curve's mode (absolute recall@k for exact-mode curves, which
        raise RecallUnachievable above the quantization ceiling;
        deep-probe-relative for ceiling-mode).  Lazily self-calibrates
        (ceiling mode) per (k, metric) on first use."""
        if not (0.0 < target <= 1.0):
            raise ValueError("recall_target must be in (0, 1]")
        metric = metric or self.metric

        def compute():
            self.calibrate_nprobe(k=k, metric=metric)
            return self._calib.get(k, metric)

        cur = self._calib.get(k, metric)
        if cur is None:
            cur = self._calib.get_or_compute(k, metric, compute)
        return cur.nprobe_for(target)

    def search(
        self,
        query,
        k: int = 10,
        metric: Optional[str] = None,
        where: Optional[dict] = None,
        nprobe: Optional[int] = None,
        recall_target: Optional[float] = None,
    ) -> List[Tuple[str, Any, float]]:
        """Top-k search for one query (exact unless ``nprobe`` is given).

        Accuracy note: above ~590k rows (ops/fused_topk.POS_MIN_TILES) with
        k <= 16, the fused scan uses the positive-packed extraction, which
        drops ~0.4-0.8% of true top-k candidates per query in exchange for
        ~1.4x throughput (measured recall@10 0.9625 vs 0.9648 at N=1.2M).
        Set ``EVDB_EXACT_SCAN=1`` to force (near-)exact extraction at any N.

        Returns ``[(id, metadata, distance)]`` ascending by distance —
        the reference's result shape (src/vector_store.erl:234-236).
        ``where`` restricts results to vectors whose metadata matches every
        key/value equality predicate (a capability the reference lacks).
        ``nprobe`` (int4r stores only) switches to the sub-linear multiprobe
        gather over the store's own cell layout (ops/cell_probe.py): only
        the ``nprobe`` nearest cells are read — O(nprobe*cell_cap) HBM
        traffic instead of O(N), the low-latency path at large N.
        """
        results = self.search_batch(
            np.asarray(query, np.float32)[None, :], k, metric, where,
            nprobe=nprobe, recall_target=recall_target,
        )
        return results[0]

    @staticmethod
    def _filter_indexable(where: dict) -> bool:
        try:
            for v in where.values():
                hash(v)
            return True
        except TypeError:
            return False

    def filter_mask(self, where: dict) -> np.ndarray:
        """Row mask for metadata equality predicates (AND semantics).
        Hashable predicate values ride the columnar tag tables (one
        vectorized compare over [capacity]); unhashable values fall back to
        the per-row metadata walk."""
        if not self._metadata:  # no metadata anywhere: nothing can match
            return np.zeros(self._capacity, bool)
        if self._filter_indexable(where) and self._capacity:
            self._ensure_tag_cols(tuple(where))
            with self._lock.read():
                mask = np.ones(self._capacity, bool)
                for kk, vv in where.items():
                    code = self._tag_vocab.get(kk, {}).get(vv)
                    if code is None:  # value never seen for this key
                        mask[:] = False
                        break
                    mask &= self._tag_cols[kk] == code
                return mask
        mask = np.zeros(self._capacity, bool)
        with self._lock.read():
            self._materialize()
            for vid, meta in self._metadata.items():
                if all(meta.get(kk) == vv for kk, vv in where.items()):
                    row = self._id_to_row.get(vid)
                    if row is not None:
                        mask[row] = True
        return mask

    def _device_filter_mask(self, where: dict):
        """Device-resident filter mask, cached per (filter, store version):
        a repeated filter costs one dict probe instead of an O(capacity)
        mask build + host->device transfer per query batch."""
        import json as _json

        wk = _json.dumps(where, sort_keys=True, default=repr)
        cached = self._dmask_cache.get(wk)
        if cached is not None and cached[0] == self.version:
            return cached[1]
        # snapshot the version BEFORE building: a write landing during the
        # build would otherwise get its stale mask cached under the NEW
        # version and stay invisible to this filter until an unrelated write
        ver = self.version
        dm = self._put(self.filter_mask(where))
        if len(self._dmask_cache) >= 32:
            self._dmask_cache.pop(next(iter(self._dmask_cache)))
        self._dmask_cache[wk] = (ver, dm)
        return dm

    def _ensure_tag_cols(self, keys: Tuple[str, ...]) -> None:
        """Backfill tag columns for keys not yet indexed (one O(count) pass
        per NEW key; subsequent filters are vectorized compares)."""
        if all(k in self._tag_cols for k in keys):
            return
        with self._lock.write():
            self._materialize()
            for k in keys:
                if k in self._tag_cols:
                    continue
                col = np.zeros(self._capacity, np.int32)
                vocab = self._tag_vocab.setdefault(k, {})
                for vid, meta in self._metadata.items():
                    if isinstance(meta, dict) and k in meta:
                        try:
                            code = vocab.setdefault(meta[k], len(vocab) + 1)
                        except TypeError:
                            continue  # unhashable value: not indexable
                        row = self._id_to_row.get(vid)
                        if row is not None:
                            col[row] = code
                self._tag_cols[k] = col

    def _update_tags(self, rows, mds) -> None:
        """Maintain tag columns for written rows (caller holds write lock).
        Insert replaces a row's metadata wholesale, so absent keys clear."""
        if not self._tag_cols:
            return
        for i, row in enumerate(rows):
            md = mds[i] or {}
            for k, col in self._tag_cols.items():
                if k in md:
                    try:
                        col[row] = self._tag_vocab[k].setdefault(
                            md[k], len(self._tag_vocab[k]) + 1)
                    except TypeError:
                        col[row] = 0
                else:
                    col[row] = 0

    def search_batch(
        self,
        queries,
        k: int = 10,
        metric: Optional[str] = None,
        where: Optional[dict] = None,
        nprobe: Optional[int] = None,
        recall_target: Optional[float] = None,
    ) -> List[List[Tuple[str, Any, float]]]:
        """Batched exact top-k: one compiled program for B queries."""
        return self.search_batch_complete(
            self.search_batch_submit(queries, k, metric, where, nprobe=nprobe,
                                     recall_target=recall_target)
        )

    def search_batch_submit(
        self,
        queries,
        k: int = 10,
        metric: Optional[str] = None,
        where: Optional[dict] = None,
        nprobe: Optional[int] = None,
        recall_target: Optional[float] = None,
    ) -> SearchTicket:
        """Dispatch a batched search WITHOUT waiting for the device.

        JAX dispatch is asynchronous: this validates, enqueues the compiled
        search program, and returns a ticket immediately.  The serving
        batcher submits batch i+1 while batch i still executes, so the
        device pipeline never drains (the round-1 path serialized
        dispatch -> readback -> host mapping per batch)."""
        metric = metric or self.metric
        if metric not in VALID_METRICS:
            raise ValueError(f"metric must be one of {VALID_METRICS}, got {metric!r}")
        if recall_target is not None:
            # SLA knob: map a recall target to the smallest calibrated
            # nprobe under the curve's mode (calibrate_nprobe — exact
            # curves guarantee absolute recall, ceiling curves are
            # relative to the store's own deep probe)
            if nprobe is not None:
                raise ValueError(
                    "pass either nprobe or recall_target, not both")
            if self.dtype != "int4r":
                raise ValueError(
                    "recall_target requires an int4r store (cell layout)")
            nprobe = self._nprobe_for_target(recall_target, k, metric)
        if nprobe is not None:
            if self.dtype != "int4r":
                raise ValueError(
                    "nprobe requires an int4r store (cell-resident layout); "
                    "build a 'hnsw'/'cellprobe' index for other dtypes")
            if metric == "manhattan":
                raise ValueError("nprobe does not support metric 'manhattan'")
            if nprobe <= 0:
                raise ValueError("nprobe must be positive")
        t0 = time.perf_counter()
        q = self._validate_batch(queries)
        fmask = self._device_filter_mask(where) if where else None
        # read-side of the store lock: concurrent searches proceed in
        # parallel, but never against a buffer an insert is donating away.
        # Dispatch-under-lock is sufficient: once enqueued, the device
        # serializes this read before any later donated-buffer write.
        with self._lock.read():
            t = self._dispatch_locked(q, k, metric, fmask, nprobe=nprobe)
        t.t0 = t0
        return t

    def search_batch_complete(
        self, t: SearchTicket
    ) -> List[List[Tuple[str, Any, float]]]:
        """Block on a ticket's device results and map rows to ids/metadata."""
        if t.kb == 0 or t.dists is None:
            return [[] for _ in range(t.nq)]
        dists_np, rows_np = self._readback(t)
        if t.t0:
            metrics.observe("store.search", time.perf_counter() - t.t0)
        metrics.inc("store.search_total")
        metrics.inc("store.queries_total", t.nq)
        with self._lock.read():
            return self._map_results(dists_np, rows_np, t.k, t.kb,
                                     rows_are_orig=t.rows_are_orig,
                                     dedup=self._spilled)

    def search_batch_complete_raw(self, t: SearchTicket):
        """Columnar completion: (distances [nq, kk] f32, rows [nq, kk] int32,
        ids [nq, kk] object-or-None).  No per-hit tuple construction — the
        serving layer encodes these straight into binary/JSON columns."""
        if t.kb == 0 or t.dists is None:
            return (np.zeros((t.nq, 0), np.float32),
                    np.zeros((t.nq, 0), np.int32), None)
        kk = min(2 * t.k if self._spilled else t.k, t.kb)
        dists_np, rows_np = self._readback(t)
        dists_np = dists_np[:, :kk]
        rows_np = rows_np[:, :kk]
        if self._spilled:
            from erlvectordb_tpu.ops.cell_probe import dedup_rows_topk

            dists_np, rows_np = dedup_rows_topk(dists_np, rows_np, t.k)
        if t.rows_are_orig:
            # streaming-built store: rows already ARE the implicit ids
            ids = np.where(rows_np >= 0,
                           rows_np.astype(str).astype(object), None)
            return dists_np, rows_np, ids
        with self._lock.read():
            ids = self._ids_view()[rows_np]
        return dists_np, rows_np, ids

    def _readback(self, t: SearchTicket):
        """One fused device->host readback per ticket ([dists | row-hi |
        row-lo] f32 packed by _finish_ticket), trimmed to the real query
        count."""
        if t.packed is not None:
            arr = np.asarray(t.packed)[: t.nq]
            kb = t.kb
            rows = (arr[:, kb:2 * kb].astype(np.int64) * 4096
                    + arr[:, 2 * kb:3 * kb].astype(np.int64))
            return arr[:, :kb], rows.astype(np.int32)
        return np.asarray(t.dists)[: t.nq], np.asarray(t.rows)[: t.nq]

    def _map_results(self, dists_np, rows_np, k, kb, rows_are_orig=False,
                     dedup=False):
        """Vectorized row->id mapping: one fancy-index into the columnar id
        table + tolist(), instead of a per-hit dict lookup loop.  ``dedup``
        (spilled layouts) scans the over-fetched columns, keeps each id's
        first (best) hit and caps output at k."""
        kk = min(2 * k if dedup else k, kb)
        if rows_are_orig:
            # streaming-built store: the device already perm-mapped slots to
            # original rows, and ids are implicit str(original row)
            rr = rows_np[:, :kk]
            ids_l = np.where(rr >= 0, rr.astype(str).astype(object),
                             None).tolist()
        else:
            ids_arr = self._ids_view()
            ids_l = ids_arr[rows_np[:, :kk]].tolist()
        d_l = dists_np[:, :kk].tolist()
        md = self._metadata
        isfinite = math.isfinite
        out: List[List[Tuple[str, Any, float]]] = []
        for irow, drow in zip(ids_l, d_l):
            hits = []
            seen = set() if dedup else None
            for vid, d in zip(irow, drow):
                if not isfinite(d):
                    break  # ran past the valid rows
                if vid is None:
                    continue  # row deleted between device scan and host map
                if dedup:
                    if vid in seen or len(hits) >= k:
                        continue
                    seen.add(vid)
                hits.append((vid, md.get(vid, {}), d))
            out.append(hits)
        return out

    def _dispatch_locked(self, q, k, metric, fmask=None,
                         nprobe=None) -> SearchTicket:
        nq = q.shape[0]
        if self._vectors is None or self.count == 0 or k <= 0:
            return SearchTicket(None, None, nq, k, 0)
        # spilled layouts: over-fetch 2k so per-query dedup still fills k
        k_fetch = min(2 * k, self.count) if self._spilled else k
        kb = search_mod.k_bucket(min(k_fetch, self.count), self._capacity)
        # Bucket BOTH the batch size and the width: every distinct query
        # shape is a separate XLA compile (minutes via the remote TPU
        # compiler), and serving batches arrive at arbitrary sizes.
        width = _pad128(q.shape[1])
        bq = _next_pow2(max(nq, 8))
        if width != q.shape[1] or bq != nq:
            qp = np.zeros((bq, width), np.float32)
            qp[:nq, : q.shape[1]] = q
            q = qp
        q_j = self._put(q)
        valid = self._valid
        if fmask is not None:
            # the mask is built OUTSIDE the store lock; a concurrent insert
            # may have grown capacity since.  Snapshot semantics: rows added
            # after the mask was built are excluded from this search (pad
            # False) instead of raising a shape mismatch mid-batch.
            fm = fmask
            if fm.shape[0] < valid.shape[0]:
                fm = jnp.pad(fm, (0, valid.shape[0] - fm.shape[0]))
            elif fm.shape[0] > valid.shape[0]:
                fm = fm[: valid.shape[0]]
            valid = jnp.logical_and(valid, self._put(fm))
        from erlvectordb_tpu.ops import fused_topk as ft

        if self.dtype == "int4r":
            if nprobe is not None:
                # sub-linear multiprobe over the store's own cell layout:
                # only the probed cells' packed rows are gathered from HBM
                from erlvectordb_tpu.ops.cell_probe import multiprobe_topk

                if self._cents_rt_src is not self._centroids:
                    # persistent bf16 routing copy + |c|^2 buffer (see
                    # multiprobe_topk: recomputing either per dispatch
                    # re-reads the full f32 centroid table)
                    self._cents_rt = self._centroids.astype(jnp.bfloat16)
                    self._cents_cn2 = jnp.sum(
                        self._centroids * self._centroids, axis=-1)
                    self._cents_rt_src = self._centroids
                rq_kw = {}
                if self._rq_codes is not None:
                    # stage-2 pooled rescore: IP tables of the rotated
                    # (zero-padded to the rq dim) queries feed the LUT
                    from erlvectordb_tpu.quant.pq import _adc_ip_tables

                    dp2 = self._rq_rot.shape[0]
                    qe = q_j[:, : self._dim]
                    if dp2 > self._dim:
                        qe = jnp.pad(qe, ((0, 0), (0, dp2 - self._dim)))
                    qr = jnp.dot(qe, self._rq_rot,
                                 preferred_element_type=jnp.float32)
                    rq_kw = dict(
                        rq_codes=self._rq_codes,
                        rq_lut=_adc_ip_tables(qr, self._rq_books),
                        rq_pool=max(4 * kb, self.rq_pool),
                    )
                dists, rows = multiprobe_topk(
                    self._vectors, self._scales, self._norms, valid,
                    self._centroids, q_j, metric=metric, k=kb,
                    nprobe=min(nprobe, max(1, self._centroids.shape[0])),
                    cell_cap=self._cell_cap,
                    centroids_route=self._cents_rt, cn2=self._cents_cn2,
                    **rq_kw,
                )
                if self._perm_dev is not None:
                    rows = _perm_map(self._perm_dev, rows)
                    return self._finish_ticket(dists, rows, nq, k, kb,
                                               rows_are_orig=True)
                return self._finish_ticket(dists, rows, nq, k, kb)
            nt = ft.n_tiles_for(self._capacity, self._capacity)
            if (
                jax.default_backend() == "tpu"
                and metric in ("cosine", "euclidean", "dot")
                and self._capacity >= ft.TILE_N
                and self._capacity % ft.TILE_N == 0
                and ft.TILE_N % self._cell_cap == 0
                and kb <= ft.MAX_T_PER_TILE * nt
            ):
                if self._code_norm_max is None:
                    # realized packed-key offset bound (one device pass,
                    # cached; invalidated by int4r mutations)
                    self._code_norm_max = ft.max_code_norm(self._vectors)
                scan_w, scan_t = getattr(
                    self, "_scan_wt", (ft.POS_RES_W, ft.POS_RES_T))
                dists, rows = ft.fused_topk_residual(
                    self._vectors, self._scales, self._norms, valid,
                    self._centroids, q_j, metric=metric, k=kb,
                    n_tiles=nt, cell_cap=self._cell_cap,
                    code_norm_bound=self._code_norm_max,
                    slice_w=scan_w, t_top=scan_t,
                )
            else:
                dists, rows = search_mod.exact_topk_int4r(
                    self._vectors, self._scales, self._norms, valid,
                    self._centroids, q_j, metric=metric, k=kb,
                    cell_cap=self._cell_cap,
                )
            if self._perm_dev is not None:
                rows = _perm_map(self._perm_dev, rows)
                return self._finish_ticket(dists, rows, nq, k, kb,
                                           rows_are_orig=True)
            return self._finish_ticket(dists, rows, nq, k, kb)

        if ft.fused_topk_available(
            self.count, self._capacity, metric, jax.default_backend(), kb
        ):
            # Pallas fused scan: streams code tiles through VMEM, extracts
            # per-tile candidates on-chip — never materializes [B, N] in HBM.
            nt = ft.n_tiles_for(self._next_row, self._capacity)
            cu = None
            ps = None
            # the key plane only serves requests whose metric matches its
            # kind (a unit plane ranks cosine, a mag plane ranks dot AND
            # euclidean) — a per-request metric override outside the
            # plane's kind rides the pos path instead
            if (self.intkey and self.dtype == "int8"
                    and ft.intkey_applies(metric, nt, kb)
                    and _plane_kind(metric) == _plane_kind(self.metric)):
                cu = self._ensure_unit_plane()
                if metric == "euclidean" and cu is not None:
                    ps = self._plane_scale
            dists, rows = ft.fused_topk(
                self._vectors,
                self._scales if self.dtype in ("int8", "int4") else None,
                self._norms,
                valid,
                q_j,
                metric=metric,
                k=kb,
                n_tiles=nt,
                codes_unit=cu,
                plane_scale=ps,
            )
        elif self.dtype == "int8":
            dists, rows = search_mod.exact_topk_int8(
                self._vectors, self._scales, self._norms, valid, q_j,
                metric=metric, k=kb,
            )
        elif self.dtype == "int4":
            dists, rows = search_mod.exact_topk_int4(
                self._vectors, self._scales, self._norms, valid, q_j,
                metric=metric, k=kb,
            )
        else:
            dists, rows = search_mod.exact_topk(
                self._vectors, self._norms, valid, q_j, metric=metric, k=kb,
            )
        return self._finish_ticket(dists, rows, nq, k, kb)

    def _ensure_unit_plane(self):
        """The intkey key plane (unit for cosine stores, magnitude for
        euclidean/dot), derived on device from the absmax plane when missing
        (snapshot restore / first search after enabling / outgrown S).
        Idempotent cache fill, safe under the read lock like _cents_rt."""
        if self._vectors is None:
            return None
        if (self._codes_unit is None
                or self._codes_unit.shape[0] != self._capacity):
            from erlvectordb_tpu.ops import fused_topk as ft

            if _plane_kind(self.metric) == "unit":
                self._codes_unit = ft.requantize_unit(
                    self._vectors, self._scales, self._norms, self._valid)
            else:
                nmax = float(jnp.max(jnp.where(self._valid, self._norms,
                                               0.0)))
                if nmax <= 0.0:
                    return None  # nothing valid to key; pos path serves
                # 1.25x slack so typical future inserts stay inside S
                self._plane_scale = 1.25 * nmax
                self._codes_unit = ft.requantize_mag(
                    self._vectors, self._scales, self._valid,
                    self._plane_scale)
        return self._codes_unit

    def _finish_ticket(self, dists, rows, nq, k, kb, rows_are_orig=False):
        """Enqueue the fused single-readback pack alongside the search
        program (async — no extra round-trip) and wrap the ticket."""
        return SearchTicket(dists, rows, nq, min(k, self.count), kb,
                            rows_are_orig=rows_are_orig,
                            packed=_pack_results(dists, rows))

    # ------------------------------------------------------------- accessors

    def get(self, vector_id: str) -> Optional[Tuple[np.ndarray, Any]]:
        """Fetch one vector and its metadata (dequantized for int8 stores)."""
        with self._lock.read():
            self._materialize()
            row = self._id_to_row.get(str(vector_id))
            if row is None:
                return None
            if self.dtype == "int4":
                vec = _unpack_int4_np(np.asarray(self._vectors[row])[None, :])[0]
                vec = vec[: self._dim].astype(np.float32) * float(self._scales[row])
            elif self.dtype == "int4r":
                res = _unpack_int4_np(np.asarray(self._vectors[row])[None, :])[0]
                cent = np.asarray(self._centroids[row // self._cell_cap])
                vec = (cent + res.astype(np.float32)
                       * float(self._scales[row]))[: self._dim]
            else:
                vec = np.asarray(self._vectors[row])[: self._dim]
                if self.dtype == "int8":
                    vec = vec.astype(np.float32) * float(self._scales[row])
            return vec, self._metadata.get(str(vector_id), {})

    def get_all_vectors(self) -> List[Tuple[str, np.ndarray, Any]]:
        """All live (id, vector, metadata) — migration/backup path
        (reference get_all_vectors, src/vector_store.erl:184-190)."""
        with self._lock.read():
            self._materialize()
            if self.count == 0:
                return []
            rows = sorted(self._row_to_id)
            mat = np.asarray(self._vectors)  # one transfer
            if self.dtype in ("int4", "int4r"):
                mat = _unpack_int4_np(mat)
            if self.dtype in ("int8", "int4", "int4r"):
                scales = np.asarray(self._scales)
            cents = (np.asarray(self._centroids)
                     if self.dtype == "int4r" else None)
            out = []
            for row in rows:
                vid = self._row_to_id[row]
                vec = mat[row][: self._dim]
                if self.dtype in ("int8", "int4", "int4r"):
                    vec = vec.astype(np.float32) * scales[row]
                if cents is not None:
                    vec = vec + cents[row // self._cell_cap][: self._dim]
                out.append((vid, vec, self._metadata.get(vid, {})))
            return out

    def get_stats(self) -> dict:
        """Stats shape parity with reference get_stats (src/vector_store.erl:166-173)."""
        stats = {
            "name": self.name,
            "count": self.count,
            "dimension": self._dim,
            "metric": self.metric,
            "dtype": self.dtype,
            "capacity": self._capacity,
            "version": self.version,
            "memory_bytes": self.device_memory_bytes(),
        }
        if self._calib:
            # which guarantee recall_target gives on this store: exact
            # (absolute, ceiling enforced) vs ceiling (deep-probe-relative)
            stats["calibration"] = self._calib.summaries()
        return stats

    def device_memory_bytes(self) -> int:
        if self._vectors is None:
            return 0
        total = self._vectors.size * self._vectors.dtype.itemsize
        total += self._norms.size * 4 + self._valid.size
        if self._codes_unit is not None:
            total += self._codes_unit.size
        if self._scales is not None:
            total += self._scales.size * 4
        if self._centroids is not None:
            total += self._centroids.size * 4
        if self._rq_codes is not None:
            total += self._rq_codes.size
            total += self._rq_books.size * 4 + self._rq_rot.size * 4
        return int(total)

    # ----------------------------------------------------- state export/import
    # Used by persist/ for snapshots; arrays come back as host numpy.

    def export_state(self) -> dict:
        with self._lock.read():
            if not (self._spilled and self._perm_count):
                self._materialize()
            state = {
                "format": 1,
                "name": self.name,
                "dim": self._dim,
                "metric": self.metric,
                "dtype": self.dtype,
                "created_at": self.created_at,
                "version": self.version,
                "id_to_row": dict(self._id_to_row),
                "metadata": dict(self._metadata),
                "next_row": self._next_row,
                "free_rows": list(self._free_rows),
                "intkey": self.intkey,
            }
            if self._vectors is not None:
                state["vectors"] = np.asarray(self._vectors)
                state["norms"] = np.asarray(self._norms)
                state["valid"] = np.asarray(self._valid)
                if self._scales is not None:
                    state["scales"] = np.asarray(self._scales)
            if self.dtype == "int4r" and self._centroids is not None:
                state["centroids"] = np.asarray(self._centroids)
                state["cell_cap"] = self._cell_cap
                if self._calib:
                    state["calibrations"] = self._calib.to_json()
                    self._calib.mark_clean()
                state["cell_next"] = [int(x) for x in self._cell_next]
                state["cell_free"] = {
                    str(c): list(v) for c, v in self._cell_free.items()
                }
                if self._rq_codes is not None:
                    state["rq_m"] = self._rq_m
                    state["rq_codes"] = np.asarray(self._rq_codes)
                    state["rq_books"] = np.asarray(self._rq_books)
                    state["rq_rot"] = np.asarray(self._rq_rot)
            if self._spilled and self._perm_count:
                # spilled streaming layout: ids stay implicit (mutations are
                # rejected anyway) — persist the slot->row perm instead
                state["perm"] = np.asarray(self._perm_dev)
                state["perm_count"] = self._perm_count
                state["spilled"] = True
            return state

    @classmethod
    def from_state(cls, state: dict, device: Optional[jax.Device] = None) -> "VectorStore":
        store = cls(
            state["name"],
            dim=state.get("dim"),
            metric=state.get("metric", "cosine"),
            dtype=state.get("dtype", "float32"),
            device=device,
            intkey=bool(state.get("intkey", False)),
        )
        store.created_at = state.get("created_at", time.time())
        store.version = state.get("version", 0)
        if "vectors" in state and state["vectors"] is not None:
            vecs = np.asarray(state["vectors"])
            store._capacity = vecs.shape[0]
            store._vectors = store._put(vecs)
            store._norms = store._put(np.asarray(state["norms"], np.float32))
            store._valid = store._put(np.asarray(state["valid"], bool))
            if "scales" in state and state["scales"] is not None:
                store._scales = store._put(np.asarray(state["scales"], np.float32))
        if store.dtype == "int4r" and "centroids" in state:
            store._centroids = store._put(
                np.asarray(state["centroids"], np.float32))
            store._cell_cap = int(state.get("cell_cap", 64))
            if "calibrations" in state:
                store._calib = CalibrationSet.from_json(
                    state["calibrations"])
            elif "nprobe_curve" in state:  # pre-round-5 un-keyed curve
                store._calib = CalibrationSet.from_legacy(
                    {int(p): float(r)
                     for p, r in state["nprobe_curve"].items()},
                    metric=state.get("metric", "cosine"))
            store._cell_next = np.asarray(state.get("cell_next", []), np.int64)
            store._cell_free = {
                int(c): [int(r) for r in v]
                for c, v in (state.get("cell_free") or {}).items()
            }
            store._cell_avail = (
                store._cell_cap - store._cell_next
                + np.array([len(store._cell_free.get(c, []))
                            for c in range(len(store._cell_next))], np.int64)
            )
            if "rq_codes" in state:
                store._rq_m = int(state.get("rq_m", 0))
                store._rq_codes = store._put(
                    np.asarray(state["rq_codes"], np.uint8))
                store._rq_books = store._put(
                    np.asarray(state["rq_books"], np.float32))
                store._rq_rot = store._put(
                    np.asarray(state["rq_rot"], np.float32))
        if state.get("spilled") and "perm" in state:
            store._perm_dev = store._put(
                np.asarray(state["perm"], np.int32))
            store._perm_count = int(state["perm_count"])
            store._spilled = True
        store._id_to_row = {str(k): int(v) for k, v in state.get("id_to_row", {}).items()}
        store._row_to_id = {v: k for k, v in store._id_to_row.items()}
        if store._capacity and store._id_to_row:
            store._ids_np = np.full((store._capacity,), None, object)
            rows_arr = np.fromiter(store._row_to_id.keys(), np.int64,
                                   len(store._row_to_id))
            store._ids_np[rows_arr] = list(store._row_to_id.values())
        elif store._capacity:
            store._ids_np = np.full((store._capacity,), None, object)
        store._metadata = dict(state.get("metadata", {}))
        store._contig = int(state.get("contig", 0))
        store._next_row = int(state.get("next_row", store.count))
        store._free_rows = [int(r) for r in state.get("free_rows", [])]
        return store

    def warmup(self, batch_sizes=(1, 64, 256), ks=(1, 10)) -> int:
        """Pre-compile the search programs for common (batch, k) buckets so
        the first real query doesn't pay XLA/Mosaic compile time (minutes on
        remote-compile setups).  Returns the number of programs touched."""
        if self._vectors is None or self.count == 0 or self._dim is None:
            return 0
        n = 0
        for b in batch_sizes:
            q = np.zeros((b, self._dim), np.float32)
            for k in ks:
                self.search_batch(q, k=k)
                n += 1
        return n

    # ------------------------------------------------------- cell refit/drift

    def drift(self) -> dict:
        """Cell-layout drift since the last bulk build/refit (int4r).

        ``fraction`` is (inserts + deletes) / built_rows: every churned row
        either sits in a cell picked under space pressure (insert) or left
        a hole that skews its cell's geometry (delete) — the knob
        ``is_stale`` thresholds on.  ``overflow_cells`` counts cells
        spawned after the build (insert overflow), the other rot signal."""
        cells_now = (int(self._cell_next.shape[0])
                     if self._cell_next is not None else 0)
        churn = self._churn_inserts + self._churn_deletes
        return {
            "built_rows": self._built_rows,
            "inserts_since_build": self._churn_inserts,
            "deletes_since_build": self._churn_deletes,
            "overflow_cells": max(0, cells_now - self._cells_at_build),
            "fraction": churn / max(self._built_rows, 1),
        }

    def is_stale(self, threshold: float = 0.25) -> bool:
        """True when cell-layout churn exceeds ``threshold`` of the built
        corpus — the maintenance loop's refit trigger (the reference's
        index manager only tracks a built flag,
        src/vector_index_manager.erl:58-66; this measures actual rot)."""
        if self.dtype != "int4r" or not self._built_rows:
            return False
        return self.drift()["fraction"] > threshold

    def rebuild_cells(self) -> dict:
        """Refit the cell layout in place: dequantize the live corpus,
        re-run the bulk residual build (fresh k-means + balanced assign +
        encode), keep ids/metadata.  Blocking maintenance op — run it from
        the background loop (Database wires is_stale -> rebuild_cells).

        The refit sees only the store's QUANTIZED codes (int4r keeps no f32
        originals), so each refit re-quantizes reconstructions — recall
        lands at a fresh-build-of-the-dequantized-corpus level, not at
        first-build level (measured ~0.8-1.5 recall points per generation
        on clustered corpora).  Refit when layout churn exceeds that cost,
        which is what the is_stale threshold encodes.

        Returns the post-refit drift dict (zeroed counters)."""
        if self.dtype != "int4r":
            raise ValueError("rebuild_cells applies to int4r stores only")
        with self._lock.write():
            self._materialize()
            if not self._id_to_row:
                return self.drift()
            ids, rows = zip(*sorted(self._id_to_row.items(),
                                    key=lambda kv: kv[1]))
            rows_j = self._put(np.asarray(rows, np.int32))
            packed = self._vectors[rows_j]
            hi = (packed >> 4).astype(jnp.int8)
            lo = (packed & 0xF).astype(jnp.int8)
            hi = jnp.where(hi > 7, hi - 16, hi)
            lo = jnp.where(lo > 7, lo - 16, lo)
            q = jnp.stack([hi, lo], axis=-1).reshape(packed.shape[0], -1)
            cents_rows = self._centroids[rows_j // self._cell_cap]
            vecs = (cents_rows + q.astype(jnp.float32)
                    * self._scales[rows_j][:, None])
            if self._rq_codes is not None:
                # rebuild from the FULL reconstruction: the stage-2 error
                # term carries ~half the row's precision on rq stores
                from erlvectordb_tpu.quant.pq import _decode
                dec = jnp.dot(_decode(self._rq_codes[rows_j],
                                      self._rq_books),
                              self._rq_rot.T,
                              preferred_element_type=jnp.float32)
                vecs = vecs.at[:, : self._dim].add(dec[:, : self._dim])
            matrix = np.asarray(vecs)[:, : self._dim]
            self._build_int4r(matrix, list(ids), rq_m=self._rq_m)
            # layout changed wholesale: columnar caches rebuild lazily
            self._tag_cols = {}
            self._dmask_cache = {}
            self._touched_rows = set()
            self.version += 1
            self.dirty = True
            self._touched_reliable = False
            return self.drift()

    # ------------------------------------------------------------ bulk build

    def _fit_rq(self, x: np.ndarray, perm: np.ndarray, rq_m: int) -> None:
        """Fit + encode the second-stage residual quantizer (``rq_m``).

        OPQ (rotation + product codebooks) over the int4 reconstruction
        ERROR, rq_m bytes/row.  The round-4 sweeps (experiments/exp_rq*.py)
        measured why and how much: at 100-d every 4-bit-rate encoder sits
        on the same rate-distortion wall (ceiling 0.86-0.87 recall@10),
        and an OPQ m=10 error stage lifts the full-decode ceiling to ~0.91
        at exactly 0.5x int8 memory.  Stored norms become
        full-reconstruction norms.  Needs the original rows, so this runs
        on the from_matrix path (streaming from_chunks discards them)."""
        from erlvectordb_tpu.quant.opq import OPQCodebook

        d = self._dim
        dp2 = -(-d // rq_m) * rq_m
        perm = np.asarray(perm)
        cap_total = self._capacity
        cap = self._cell_cap

        def chunk_errors(lo, hi):
            sl = slice(lo, hi)
            orig = np.clip(perm[sl], 0, x.shape[0] - 1)
            cells = (np.arange(lo, hi) // cap).astype(np.int32)
            return _rq_encode_chunk(
                self._vectors[sl], self._scales[sl],
                self._centroids[self._put(cells)],
                self._put(np.ascontiguousarray(x[orig])),
                rot_j, books_j, d=d, dp2=dp2)

        # ---- sample the error field and fit the codebooks ---------------
        valid_slots = np.where(perm >= 0)[0]
        step = max(1, len(valid_slots) // 131072)
        samp = valid_slots[::step][:131072]
        sl_j = self._put(samp.astype(np.int32))
        q1 = _unpack_int4(self._vectors[sl_j])
        recon_s = (self._centroids[sl_j // cap]
                   + q1.astype(jnp.float32) * self._scales[sl_j][:, None])
        xs = self._put(np.ascontiguousarray(x[perm[samp]]))
        err_s = xs[:, :d] - recon_s[:, :d]
        if dp2 > d:
            err_s = jnp.pad(err_s, ((0, 0), (0, dp2 - d)))
        cb = OPQCodebook.fit(np.asarray(err_s), m=rq_m, k=256, iters=10,
                             opq_iters=3, seed=0, max_train=131072)
        rot_j = self._put(np.asarray(cb.rotation, np.float32))
        books_j = self._put(np.asarray(cb.pq.codebooks, np.float32))

        # ---- encode every slot; norms -> full-reconstruction norms ------
        codes2 = np.zeros((cap_total, rq_m), np.uint8)
        norms = np.asarray(self._norms).copy()
        ch = 262_144
        for lo in range(0, cap_total, ch):
            hi = min(lo + ch, cap_total)
            c2, nrm = chunk_errors(lo, hi)
            live = perm[lo:hi] >= 0
            codes2[lo:hi][live] = np.asarray(c2)[live]
            norms[lo:hi][live] = np.asarray(nrm)[live]
        self._rq_m = rq_m
        self._rq_codes = self._put(codes2)
        self._rq_books = books_j
        self._rq_rot = rot_j
        self._norms = self._put(norms)

    def _build_int4r(self, matrix, ids: Optional[Sequence[str]],
                     rq_m: int = 0) -> None:
        """Bulk cell-residual build: k-means cells (~48 rows each), balanced
        capacity-64 assignment, residual int4 quantization — one device
        program for the quantize+scatter.  See fused_topk_residual for why
        residual coding rescues 4-bit recall."""
        import os
        import sys

        from erlvectordb_tpu.core.ivf import _balanced_assign
        from erlvectordb_tpu.ops.kmeans import kmeans_fit

        _dbg = os.environ.get("EVDB_BUILD_TIMING") == "1"
        _t0 = time.perf_counter()

        def _tick(label):
            nonlocal _t0
            if _dbg:
                now = time.perf_counter()
                print(f"[int4r-build] {label}: {now - _t0:.2f}s",
                      file=sys.stderr, flush=True)
                _t0 = now

        x = np.asarray(matrix, np.float32)
        n, d = x.shape
        if n >= 200_000:
            # flagship sizes go through the device-side streaming engine
            # (ops/cell_build.py): the host greedy below reads [N, j]
            # choice lists back through the link (~5.6k vec/s on tunneled
            # rigs); the engine keeps everything on device (>100x)
            self._build_int4r_device(x, ids, rq_m=rq_m)
            _tick("device engine build")
            return
        width = _pad128(d)
        xp = x if width == d else np.pad(x, ((0, 0), (0, width - d)))
        cap_c = 128  # Mosaic lane width: the kernel's bias expand needs cap % 128 == 0
        k_real = max(1, -(-n // 96))  # 75% occupancy of cap-128 cells
        k_total = -(-k_real // self.CELL_BLOCK) * self.CELL_BLOCK
        # the initial k-means only SEEDS the cells — the capacity-constrained
        # refit rounds below run full-data Lloyd steps via segment-sums, so a
        # 300k sample here costs almost nothing in final quality while
        # keeping the seeding program small (full-data k-means at 12.5k
        # cells compiled for many minutes through the remote compiler)
        if n > 300_000:
            sel = np.random.default_rng(0).choice(n, 300_000, replace=False)
            train = xp[sel]
        else:
            train = xp
        _tick("prep")
        cents_j, _ = kmeans_fit(jnp.asarray(train), jnp.uint32(0),
                                k=k_real, iters=10)
        cents_np = np.asarray(cents_j)
        _tick(f"kmeans k={k_real}")
        # j=16 choices (not 32): each balanced_assign round reads the
        # choice lists back through the tunnel, and 16 is deep enough that
        # the 25% capacity slack places all but stragglers (which get the
        # exact nearest-cell-with-space pass)
        owner = _balanced_assign(xp, cents_np, cap_c, j=16)
        _tick("balanced_assign #1")
        # capacity-constrained Lloyd refinement: refit each centroid to the
        # members it actually GOT (capacity may have parked rows away from
        # their unconstrained nearest cell), then reassign.  This is what
        # keeps residuals small at 75% occupancy — without it, spilled rows
        # carry whole-vector-sized residuals and lose the 4-bit recall win.
        xp_j = self._put(xp)
        for _ in range(2):
            owner_j = self._put(owner.astype(np.int32))
            sums = jax.ops.segment_sum(xp_j, owner_j, num_segments=k_real)
            cnt = jax.ops.segment_sum(
                jnp.ones((n,), jnp.float32), owner_j, num_segments=k_real)
            cents_np = np.asarray(sums / jnp.maximum(cnt, 1.0)[:, None])
            owner = _balanced_assign(xp, cents_np, cap_c, j=16)
            _tick("refit+reassign")
        order = np.argsort(owner, kind="stable")
        counts = np.bincount(owner, minlength=k_real)
        starts = np.zeros(k_real, np.int64)
        starts[1:] = np.cumsum(counts)[:-1]
        rank = np.empty(n, np.int64)
        rank[order] = np.arange(n) - starts[owner[order]]
        pos = owner * cap_c + rank

        n_rows = k_total * cap_c
        xp_j = self._put(xp)
        cents_rows = self._put(cents_np)[self._put(owner.astype(np.int32))]
        packed, scales, norms, valid = _bulk_build_int4r(
            xp_j, cents_rows, self._put(pos.astype(np.int32)), n_rows=n_rows)
        jax.block_until_ready(valid)
        _tick("quantize+scatter")
        self._vectors, self._scales, self._norms, self._valid = (
            packed, scales, norms, valid)
        cents_pad = np.zeros((k_total, width), np.float32)
        cents_pad[:k_real] = cents_np
        self._centroids = self._put(cents_pad)
        self._cell_cap = cap_c
        self._capacity = n_rows
        self._next_row = n_rows
        cell_next = np.zeros(k_total, np.int64)
        cell_next[:k_real] = counts
        cell_next[k_real:] = cap_c  # blocked padding cells
        self._cell_next = cell_next
        self._cell_avail = np.where(
            np.arange(k_total) < k_real, cap_c - cell_next, 0)
        self._cell_free = {}
        # rows are permuted by cell, so ids materialize eagerly
        sids = ([str(v) for v in ids] if ids is not None
                else [str(i) for i in range(n)])
        if ids is not None and len(sids) != n:
            raise ValueError("ids and matrix length mismatch")
        if len(set(sids)) != n:
            raise ValueError("duplicate ids in bulk build")
        pos_l = pos.tolist()
        _tick("id prep")
        self._id_to_row = dict(zip(sids, pos_l))
        self._row_to_id = dict(zip(pos_l, sids))
        self._ids_np = np.full((n_rows,), None, object)
        self._ids_np[pos] = sids
        self._built_rows = n
        self._churn_inserts = self._churn_deletes = 0
        self._cells_at_build = k_real
        if rq_m:
            perm_h = np.full((n_rows,), -1, np.int64)
            perm_h[pos] = np.arange(n)
            self._fit_rq(x, perm_h, rq_m)
            _tick("rq error stage")

    def _build_int4r_device(self, x: np.ndarray,
                            ids: Optional[Sequence[str]],
                            rq_m: int = 0) -> None:
        """Bulk int4r build through the device streaming engine, with the
        from_matrix contract (explicit ids, materialized host tables).

        The engine stages rows as int8 before residual-encoding them; that
        staging noise (~0.4% of the row) is ~16x below the int4 residual
        step and does not move recall measurably.  The one O(N) readback
        is the [N] slot permutation (4 bytes/row — the corpus itself came
        from the host at 3 KB/row)."""
        from erlvectordb_tpu.ops.cell_build import build_cells_streaming

        n, d = x.shape
        ch = min(n, 262_144)

        def chunks():
            for i in range(0, n, ch):
                yield x[i:i + ch]

        res = build_cells_streaming(
            chunks(), n=n, dim=d, cell_rows=96, cell_cap=128,
            residual_bits=4, k_block=self.CELL_BLOCK,
            kmeans_init="random", kmeans_iters=6, refits=1,
            aniso_eta=4.0 if self.metric in ("cosine", "dot") else 1.0,
            device=self._device)
        self._vectors = res.codes
        self._scales = res.scales
        self._norms = res.norms
        self._code_norm_max = None
        self._valid = res.valid
        self._centroids = res.centroids
        self._cell_cap = res.cell_cap
        self._capacity = res.n_cells * res.cell_cap
        self._next_row = self._capacity
        k_real = res.stats["n_cells_real"]
        cell_next = res.counts.copy()
        cell_next[k_real:] = res.cell_cap
        self._cell_next = cell_next
        self._cell_avail = np.where(np.arange(res.n_cells) < k_real,
                                    res.cell_cap - cell_next, 0)
        self._cell_free = {}
        self.build_stats = res.stats
        # from_matrix contract: explicit ids, host tables materialized now
        perm = np.asarray(res.perm)
        slots = np.where(perm >= 0)[0]
        origs = perm[slots]
        sids = ([str(v) for v in ids] if ids is not None
                else [str(i) for i in range(n)])
        if ids is not None and len(sids) != n:
            raise ValueError("ids and matrix length mismatch")
        if len(set(sids)) != n:
            raise ValueError("duplicate ids in bulk build")
        sarr = np.asarray(sids, object)[origs]
        self._id_to_row = dict(zip(sarr.tolist(), slots.tolist()))
        self._row_to_id = dict(zip(slots.tolist(), sarr.tolist()))
        self._ids_np = np.full((self._capacity,), None, object)
        self._ids_np[slots] = sarr
        self._built_rows = n
        self._churn_inserts = self._churn_deletes = 0
        self._cells_at_build = k_real
        if rq_m:
            self._fit_rq(x, perm, rq_m)

    @classmethod
    def from_chunks(
        cls,
        name: str,
        chunks,
        *,
        n: int,
        dim: int,
        metric: str = "cosine",
        device: Optional[jax.Device] = None,
        cell_rows: int = 96,
        cell_cap: int = 128,
        **build_kw,
    ) -> "VectorStore":
        """Streaming int4r bulk build: consumes [CH, dim] f32 chunks (host
        or device) through the device-side cell build engine
        (ops/cell_build.py) — centroids, balanced assignment, residual
        encode and the slot->row permutation ALL stay on device, so build
        throughput is set by MXU/HBM rates, not the host link.  This is
        the flagship-scale path: an 8M x 768 corpus never exists as one
        host array (24.5 GB) nor as device f32.

        Ids are implicit ("0".."n-1" by arrival order); explicit ids would
        force an O(N) host table — use ``from_matrix`` for those.  The
        first targeted mutation (get/delete/insert) materializes host id
        tables from one perm readback.

        Build stats land in ``store.build_stats`` (phase timings,
        vec/sec, dumped rows)."""
        from erlvectordb_tpu.ops.cell_build import build_cells_streaming

        store = cls(name, dim=dim, metric=metric, dtype="int4r",
                    device=device)
        res = build_cells_streaming(
            chunks, n=n, dim=dim, cell_rows=cell_rows, cell_cap=cell_cap,
            residual_bits=4, k_block=cls.CELL_BLOCK, device=device,
            **build_kw)
        store._vectors = res.codes
        store._scales = res.scales
        store._norms = res.norms
        store._valid = res.valid
        store._centroids = res.centroids
        store._cell_cap = res.cell_cap
        store._capacity = res.n_cells * res.cell_cap
        store._next_row = store._capacity
        k_real = res.stats["n_cells_real"]
        cell_next = res.counts.copy()
        cell_next[k_real:] = res.cell_cap      # blocked padding cells
        store._cell_next = cell_next
        store._cell_avail = np.where(
            np.arange(res.n_cells) < k_real,
            res.cell_cap - cell_next, 0)
        store._cell_free = {}
        store._perm_dev = res.perm
        store._perm_count = n
        store._spilled = res.stats.get("spilled_rows", 0) > 0
        store._ids_np = None   # allocated on materialization only
        store.build_stats = res.stats
        store._built_rows = n
        store._cells_at_build = k_real
        store.version = 1
        store.dirty = True
        return store

    @classmethod
    def from_matrix(
        cls,
        name: str,
        matrix,
        ids: Optional[Sequence[str]] = None,
        metric: str = "cosine",
        dtype: str = "float32",
        device: Optional[jax.Device] = None,
        metadatas: Optional[Sequence[dict]] = None,
        intkey: bool = False,
        rq_m: int = 0,
    ) -> "VectorStore":
        """Bulk index build: one device transfer + one jitted program.

        ``rq_m`` (int4r only): second-stage residual quantization — OPQ
        error codes at rq_m bytes/row, rescored in multiprobe searches
        (see _fit_rq).  rq_m=9 at 100-d keeps the store at exactly 0.5x
        int8 memory.

        This is the high-throughput path the benchmark's "index build
        vectors/sec" measures — no per-row host bookkeeping.  With
        ``ids=None`` row i gets the implicit id ``str(i)`` and the id tables
        stay virtual until the first targeted mutation.
        """
        store = cls(name, metric=metric, dtype=dtype, device=device,
                    intkey=intkey)
        arr = matrix if isinstance(matrix, jax.Array) else np.ascontiguousarray(
            np.asarray(matrix, np.float32)
        )
        n, d = arr.shape
        store._dim = d
        cap = max(_next_pow2(n), MIN_CAPACITY)
        store._capacity = cap
        width = _pad128(d)
        if store.dtype == "int4r":
            # no arr_dev here: the residual build does its own transfers
            # (k-means sample + padded corpus) — a full-size f32 copy would
            # just sit in HBM doubling peak memory through the build
            store._build_int4r(arr, ids, rq_m=rq_m)
            if metadatas is not None:
                if len(metadatas) != n:
                    raise ValueError("metadatas and matrix length mismatch")
                eff = ids if ids is not None else range(n)
                store._metadata = {
                    str(v): (m or {}) for v, m in zip(eff, metadatas)
                }
            store.version = 1
            store.dirty = True
            return store
        arr_dev = store._put(arr)
        if width != d:
            arr_dev = _pad_width(arr_dev, width)
        if store.dtype == "int8":
            codes, scales, norms, valid = _bulk_build_int8(arr_dev, cap)
            store._vectors, store._scales, store._norms, store._valid = (
                codes, scales, norms, valid,
            )
            if intkey:
                # exact key plane from the f32 rows (no double quantization)
                if _plane_kind(metric) == "unit":
                    store._codes_unit = _bulk_build_unit(arr_dev, cap)
                else:
                    nmax = float(jnp.max(norms))
                    if nmax > 0.0:
                        store._plane_scale = 1.25 * nmax
                        store._codes_unit = _bulk_build_mag(
                            arr_dev, cap, 127.0 / store._plane_scale)
        elif store.dtype == "int4":
            packed, scales, norms, valid = _bulk_build_int4(arr_dev, cap)
            store._vectors, store._scales, store._norms, store._valid = (
                packed, scales, norms, valid,
            )
        else:
            vecs, norms, valid = _bulk_build_f32(arr_dev, cap)
            store._vectors, store._norms, store._valid = vecs, norms, valid
        store._next_row = n
        store._ids_np = np.full((cap,), None, object)
        if metadatas is not None:
            if len(metadatas) != n:
                raise ValueError("metadatas and matrix length mismatch")
            eff_ids = ids if ids is not None else range(n)
            store._metadata = {
                str(v): (m or {}) for v, m in zip(eff_ids, metadatas)
            }
        if ids is None:
            store._contig = n
        else:
            if len(ids) != n:
                raise ValueError("ids and matrix length mismatch")
            store._id_to_row = {str(v): i for i, v in enumerate(ids)}
            store._row_to_id = {i: str(v) for i, v in enumerate(ids)}
            if len(store._id_to_row) != n:
                raise ValueError("duplicate ids in bulk build")
            store._ids_np[:n] = [str(v) for v in ids]
        store.version = 1
        store.dirty = True
        return store
