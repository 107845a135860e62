"""Query micro-batcher — coalesces concurrent search requests into one
device batch.

The TPU answers 1024 queries in barely more time than 1 (one matmul+top-k
program either way), but protocol requests arrive one at a time.  The
reference actually *serializes* concurrent searches through a gen_server
(src/vector_store.erl:143-150); this does the opposite: concurrent callers
block on a future while a collector thread drains the queue and issues ONE
``search_batch`` per (store, k, metric) group every ``max_wait`` (or sooner
when ``max_batch`` is reached).  Single callers pay at most ``max_wait``
extra latency; under load, throughput approaches the device's batched rate.
"""

from __future__ import annotations

import threading
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from erlvectordb_tpu.utils.metrics import metrics


@dataclass
class _Pending:
    query: np.ndarray
    event: threading.Event = field(default_factory=threading.Event)
    result: Any = None
    error: Optional[Exception] = None


class QueryBatcher:
    def __init__(self, get_store, max_batch: int = 256, max_wait: float = 0.002):
        """``get_store(name)`` resolves a store (Database.any_store)."""
        self._get_store = get_store
        self.max_batch = max_batch
        self.max_wait = max_wait
        self._queues: Dict[Tuple[str, int, Optional[str]], List[_Pending]] = (
            defaultdict(list)
        )
        self._lock = threading.Lock()
        self._wake = threading.Event()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    # ------------------------------------------------------------- lifecycle

    def start(self) -> "QueryBatcher":
        if self._thread is None:
            self._stop.clear()
            self._thread = threading.Thread(
                target=self._loop, name="evdb-batcher", daemon=True
            )
            self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        self._wake.set()
        if self._thread is not None:
            self._thread.join(timeout=2)
            self._thread = None
        # fail anything still queued
        with self._lock:
            leftovers = [p for q in self._queues.values() for p in q]
            self._queues.clear()
        for p in leftovers:
            p.error = RuntimeError("batcher stopped")
            p.event.set()

    def is_alive(self) -> bool:
        return self._thread is not None and not self._stop.is_set()

    # ----------------------------------------------------------------- API

    def search(self, store: str, query, k: int = 10,
               metric: Optional[str] = None, timeout: float = 300.0,
               where: Optional[dict] = None):
        """Blocking search that rides the next micro-batch."""
        if self._thread is None:
            # not started: degrade gracefully to a direct call
            return self._get_store(store).search(query, k=k, metric=metric,
                                                 where=where)
        p = _Pending(np.asarray(query, np.float32))
        # dimension is part of the key so one malformed query cannot poison
        # a whole batch with a stacking error; filters batch with equal filters
        import json as _json

        where_key = _json.dumps(where, sort_keys=True) if where else None
        key = (store, int(k), metric, int(p.query.shape[-1]), where_key)
        with self._lock:
            self._queues[key].append(p)
            depth = len(self._queues[key])
        metrics.inc("batcher.enqueued")
        if depth >= self.max_batch:
            self._wake.set()
        if not p.event.wait(timeout):
            raise TimeoutError("batched search timed out")
        if p.error is not None:
            raise p.error
        return p.result

    # ----------------------------------------------------------------- loop

    def _loop(self) -> None:
        while not self._stop.is_set():
            self._wake.wait(self.max_wait)
            self._wake.clear()
            with self._lock:
                batches = {k: v for k, v in self._queues.items() if v}
                self._queues.clear()
            for (store_name, k, metric, _dim, where_key), pendings in batches.items():
                self._run_batch(store_name, k, metric, pendings, where_key)

    def _run_batch(self, store_name: str, k: int, metric: Optional[str],
                   pendings: List[_Pending], where_key=None) -> None:
        try:
            import json as _json

            where = _json.loads(where_key) if where_key else None
            store = self._get_store(store_name)
            qs = np.stack([p.query for p in pendings])
            with metrics.timed("batcher.batch"):
                results = store.search_batch(qs, k=k, metric=metric,
                                             where=where)
            metrics.inc("batcher.batched_queries", len(pendings))
            metrics.observe("batcher.batch_size", float(len(pendings)))
            for p, r in zip(pendings, results):
                p.result = r
                p.event.set()
        except Exception as e:  # noqa: BLE001 — deliver the error per caller
            for p in pendings:
                p.error = e
                p.event.set()
