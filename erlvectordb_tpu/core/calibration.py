"""Recall calibration for the ``recall_target`` SLA knob.

A calibration curve maps ``nprobe -> measured recall@k`` so a search can
take ``recall_target=`` instead of a raw probe width.  Two modes:

  * ``"exact"``   — recall measured against exact float32 ground truth
                    (one brute device scan, :func:`exact_ground_truth`).
                    The curve's values are ABSOLUTE recall@k; the deep
                    probe's value is the layout's quantization CEILING,
                    and a target above it raises
                    :class:`RecallUnachievable` (no silent
                    under-delivery).  This is the honest upgrade of the
                    reference's exact-scan semantics
                    (src/vector_store.erl:227-236).
  * ``"ceiling"`` — recall measured against the layout's own deep probe
                    (nprobe = min(n_cells, 512)), whose recall is 1.0 BY
                    CONSTRUCTION.  Cheap (no f32 corpus needed — this is
                    all a quantized store can self-measure), but the
                    quantization ceiling is invisible: an int4r layout
                    whose true ceiling is 0.90 will happily "meet" a 0.95
                    ceiling-relative target at ~0.86 absolute.  Every
                    protocol surface documents which mode a curve used
                    (stats ``calibration`` field).

Curves are keyed by ``(k, metric)`` — a curve measured at k=10/cosine
says nothing about k=100/euclidean — and lazy first-use calibration is
serialized by a lock (concurrent first searches otherwise each pay the
full multi-dispatch calibration).
"""

from __future__ import annotations

import functools
import json
import threading
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

NPROBE_GRID = (4, 8, 16, 32, 64, 128, 256, 512)
DEEP_NPROBE = 512  # deep-probe ceiling used as the reference ranking


class RecallUnachievable(ValueError):
    """recall_target above the calibrated maximum (exact-mode ceiling)."""


@dataclass
class CalibrationCurve:
    """One measured recall@k-vs-nprobe curve."""

    curve: Dict[int, float]     # nprobe -> recall@k
    mode: str                   # "exact" | "ceiling"
    ceiling: float              # deep-probe recall (1.0 in ceiling mode)
    k: int
    metric: str
    n_queries: int = 0

    def nprobe_for(self, target: float, clamp: bool = False) -> int:
        """Smallest nprobe whose measured recall@k meets ``target``.

        Exact-mode curves REFUSE targets above the quantization ceiling
        (``clamp=True`` instead returns the deepest calibrated nprobe) —
        the documented alternative to silently under-delivering."""
        if not (0.0 < target <= 1.0):
            raise ValueError("recall_target must be in (0, 1]")
        best = max(self.curve.values())
        if target > best + 1e-9:
            if clamp:
                return min(p for p, r in self.curve.items() if r >= best)
            raise RecallUnachievable(
                f"recall_target {target:g} exceeds the calibrated maximum "
                f"{best:.4f} (mode={self.mode!r}"
                + (f": quantization ceiling {self.ceiling:.4f} vs exact "
                   "float32 ground truth" if self.mode == "exact" else "")
                + f", k={self.k}, metric={self.metric!r}). Lower the "
                "target, or pass an explicit nprobe for best-effort.")
        for nprobe in sorted(self.curve):
            if self.curve[nprobe] >= target:
                return nprobe
        return max(self.curve)  # unreachable given the best check above

    def summary(self) -> dict:
        return {
            "mode": self.mode,
            "ceiling": round(float(self.ceiling), 4),
            "k": self.k,
            "metric": self.metric,
            "n_queries": self.n_queries,
        }

    def to_dict(self) -> dict:
        d = self.summary()
        d["ceiling"] = float(self.ceiling)  # full precision (summary rounds)
        d["curve"] = {str(p): float(r) for p, r in sorted(self.curve.items())}
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "CalibrationCurve":
        return cls(
            curve={int(p): float(r) for p, r in d["curve"].items()},
            mode=str(d.get("mode", "ceiling")),
            ceiling=float(d.get("ceiling", 1.0)),
            k=int(d.get("k", 10)),
            metric=str(d.get("metric", "cosine")),
            n_queries=int(d.get("n_queries", 0)),
        )


class CalibrationSet:
    """Thread-safe ``(k, metric) -> CalibrationCurve`` map.

    ``get_or_compute`` serializes lazy first-use calibration (one device
    calibration, not one per concurrent request) and keys the result by
    the REQUEST's (k, metric) — a later search with a different k or
    metric gets its own curve, never a stale reuse.  ``dirty`` flags
    curves added since the last persistence write so sync loops know to
    re-save the owning artifact."""

    def __init__(self):
        self._curves: Dict[Tuple[int, str], CalibrationCurve] = {}
        # reentrant: get_or_compute's compute callback may itself put()
        self._lock = threading.RLock()
        self.dirty = False

    def __bool__(self) -> bool:
        return bool(self._curves)

    def __len__(self) -> int:
        return len(self._curves)

    def get(self, k: int, metric: str) -> Optional[CalibrationCurve]:
        return self._curves.get((int(k), str(metric)))

    def put(self, curve: CalibrationCurve) -> None:
        with self._lock:
            self._curves[(curve.k, curve.metric)] = curve
            self.dirty = True

    def get_or_compute(
        self, k: int, metric: str,
        compute: Callable[[], CalibrationCurve],
    ) -> CalibrationCurve:
        key = (int(k), str(metric))
        cur = self._curves.get(key)
        if cur is not None:
            return cur
        with self._lock:
            cur = self._curves.get(key)
            if cur is None:
                cur = compute()
                assert (cur.k, cur.metric) == key, "curve keyed wrong"
                self._curves[key] = cur
                self.dirty = True
            return cur

    def summaries(self) -> List[dict]:
        return [c.summary() for _, c in sorted(self._curves.items())]

    def to_json(self) -> str:
        return json.dumps([c.to_dict() for _, c in
                           sorted(self._curves.items())])

    def mark_clean(self) -> None:
        self.dirty = False

    @classmethod
    def from_json(cls, s: str) -> "CalibrationSet":
        out = cls()
        for d in json.loads(s):
            c = CalibrationCurve.from_dict(d)
            out._curves[(c.k, c.metric)] = c
        return out

    @classmethod
    def from_legacy(cls, curve: Dict[int, float], k: int = 10,
                    metric: str = "cosine") -> "CalibrationSet":
        """Adopt a pre-round-5 single un-keyed curve (always
        ceiling-mode; recorded under the old defaults)."""
        out = cls()
        out._curves[(k, metric)] = CalibrationCurve(
            curve={int(p): float(r) for p, r in curve.items()},
            mode="ceiling", ceiling=1.0, k=k, metric=metric)
        return out


# --------------------------------------------------------------- measurement


def recall_vs(ref_rows, got_rows, k: int) -> float:
    """Mean recall@k of ``got`` against reference rows (−1 = empty slot)."""
    hits = 0
    total = 0
    for i in range(len(ref_rows)):
        ref = [int(x) for x in np.asarray(ref_rows[i][:k]).tolist()
               if int(x) >= 0]
        got = set(int(x) for x in np.asarray(got_rows[i][:k]).tolist())
        hits += len(set(ref) & got)
        total += len(ref)
    return hits / max(total, 1)


def measure_curve(
    search_rows: Callable[[np.ndarray, int, int], np.ndarray],
    queries: np.ndarray,
    *,
    k: int,
    metric: str,
    deep: int,
    grid: Tuple[int, ...] = NPROBE_GRID,
    ground_truth: Optional[np.ndarray] = None,
) -> CalibrationCurve:
    """Measure one curve. ``search_rows(queries, k, nprobe)`` returns the
    layout's result rows [S, k]; ``ground_truth`` rows [S, >=k] (from
    :func:`exact_ground_truth`) switch the curve to exact mode."""
    queries = np.asarray(queries, np.float32)
    if queries.ndim != 2 or queries.shape[0] == 0:
        raise ValueError("calibration needs a non-empty [S, D] query batch")
    deep_rows = search_rows(queries, k, deep)
    if ground_truth is not None:
        if len(ground_truth) != len(queries):
            raise ValueError("ground_truth/queries length mismatch")
        ref = np.asarray(ground_truth)[:, :k]
        ceiling = recall_vs(ref, deep_rows, k)
        mode = "exact"
    else:
        ref = deep_rows
        ceiling = 1.0
        mode = "ceiling"
    curve = {}
    for nprobe in [p for p in grid if p < deep]:
        got = search_rows(queries, k, nprobe)
        curve[nprobe] = round(recall_vs(ref, got, k), 4)
    curve[deep] = round(ceiling, 4)
    return CalibrationCurve(curve=curve, mode=mode, ceiling=ceiling, k=k,
                            metric=metric, n_queries=len(queries))


# ----------------------------------------------------------- exact GT scan

_GT_CHUNK = 262_144


@functools.partial(jax.jit, static_argnames=("metric", "k"))
def _gt_chunk_step(block, qs, qn, best_s, best_r, row0, n_valid,
                   metric: str, k: int):
    """Fold one [C, D] f32 chunk into the running exact top-k."""
    dots = jnp.dot(qs, block.T, preferred_element_type=jnp.float32)
    if metric == "cosine":
        bn = jnp.sqrt(jnp.sum(block * block, axis=1))
        denom = qn[:, None] * bn[None, :]
        sc = jnp.where(denom > 0, dots / jnp.where(denom > 0, denom, 1.0),
                       0.0)  # zero-norm => similarity 0 (store semantics)
    elif metric == "euclidean":
        bn2 = jnp.sum(block * block, axis=1)
        sc = 2.0 * dots - bn2[None, :]  # rank-equivalent (-|q-x|^2 + |q|^2)
    elif metric == "dot":
        sc = dots
    else:  # pragma: no cover - guarded by caller
        raise ValueError(metric)
    cols = jnp.arange(block.shape[0])
    sc = jnp.where(cols[None, :] < n_valid, sc, -jnp.inf)
    rows = row0 + cols
    cat_s = jnp.concatenate([best_s, sc], axis=1)
    cat_r = jnp.concatenate(
        [best_r, jnp.broadcast_to(rows[None, :], sc.shape)], axis=1)
    s, idx = lax.top_k(cat_s, k)
    return s, jnp.take_along_axis(cat_r, idx, axis=1)


def exact_ground_truth(data, queries, k: int = 10, metric: str = "cosine",
                       rows: Optional[np.ndarray] = None,
                       chunk: int = _GT_CHUNK) -> np.ndarray:
    """Exact float32 brute-force top-k row ids — the ground truth for
    exact-mode calibration.  ``data`` is a [N, D] array or an iterable of
    [n_i, D] f32 chunks (position = implicit row 0..N-1); ``rows`` maps
    positions to store rows.  One streaming device scan, O(S·k) host
    state — the corpus never lands on the host.  Returns [S, k] int64
    rows (−1 where the corpus is smaller than k)."""
    if metric == "manhattan":
        raise ValueError("exact_ground_truth supports cosine/euclidean/dot")
    q = np.asarray(queries, np.float32)
    if q.ndim == 1:
        q = q[None, :]
    s = q.shape[0]

    if hasattr(data, "shape") and not hasattr(data, "__next__"):
        arr = data
        chunks = (arr[i:i + chunk] for i in range(0, arr.shape[0], chunk))
    else:
        chunks = iter(data)

    best_s = best_r = None
    qs_dev = qn_dev = None
    pad_w = None
    row0 = 0
    for blk in chunks:
        blk = np.asarray(blk, np.float32)
        n_i, d = blk.shape
        if pad_w is None:
            pad_w = d
            if q.shape[1] != d:
                qp = np.zeros((s, d), np.float32)
                qp[:, : min(q.shape[1], d)] = q[:, :d]
                q = qp
            qs_dev = jnp.asarray(q)
            qn_dev = jnp.sqrt(jnp.sum(qs_dev * qs_dev, axis=1))
            best_s = jnp.full((s, k), -jnp.inf, jnp.float32)
            best_r = jnp.full((s, k), -1, jnp.int32)  # int32 rows: <2.1B
        if n_i < chunk and row0 > 0:
            # pad the ragged tail to the steady-state shape: one compile
            blk = np.pad(blk, ((0, chunk - n_i), (0, 0)))
        best_s, best_r = _gt_chunk_step(
            jnp.asarray(blk), qs_dev, qn_dev, best_s, best_r,
            jnp.int32(row0), jnp.int32(n_i), metric, k)
        row0 += n_i
    if best_r is None:
        raise ValueError("empty corpus")
    out = np.array(best_r, dtype=np.int64)  # writable host copy
    out[~np.isfinite(np.asarray(best_s))] = -1
    if rows is not None:
        rows = np.asarray(rows)
        mapped = np.where(out >= 0, rows[np.clip(out, 0, len(rows) - 1)], -1)
        out = mapped
    return out
