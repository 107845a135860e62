"""HBM allocator priming for large single-program builds.

The TPU runtime grows its device allocation pool incrementally.  Measured
on v5e (axon): a FRESH process can satisfy a single ~7.5 GB allocation but
not 8 GB, and once a few GB are resident, even a 6.9 GB request fails with
~9 GB free — the pool only extends by a bounded increment per request.
After an ascending alloc/free ladder (1 -> 2 -> 4 -> 8 GB, ~2 s once per
process) the same process satisfies single allocations up to the full
~15 GB usable HBM and sustains 13.5+ GB resident working sets.

Worse, a single failed allocation WEDGES the process's TPU session: every
subsequent allocation, dispatch, and device->host transfer fails with
RESOURCE_EXHAUSTED even after buffers are freed.  Priming must therefore
happen BEFORE the first large build, not as a retry.

``prime_hbm`` is idempotent per process and a no-op on CPU (tests) and on
any backend whose first rung fails (tiny chips).
"""

from __future__ import annotations

import gc
import logging
import threading

LOG = logging.getLogger("evdb.hbm")

_GB = 1 << 30
_primed_bytes = 0
# Single-primer lock: two stores built concurrently would otherwise run
# two alloc ladders at once, co-allocating multi-GB rungs — and one failed
# allocation permanently wedges the TPU session (the exact failure priming
# exists to prevent).
_prime_lock = threading.Lock()


def prime_hbm(need_bytes: int) -> None:
    """Grow the device allocation pool so single buffers up to
    ``need_bytes`` (and working sets several times that) succeed.

    Runs an ascending doubling ladder of alloc/free zeros buffers up to
    the smallest power-of-two rung >= ``need_bytes`` (capped at 8 GB —
    measured sufficient to unlock the full pool).  Safe to call eagerly:
    each rung is freed before the next allocates.
    """
    global _primed_bytes
    need = min(int(need_bytes), 8 * _GB)
    if need <= _primed_bytes:
        return
    import jax
    import jax.numpy as jnp

    if jax.default_backend() not in ("tpu",):
        _primed_bytes = max(_primed_bytes, need)
        return
    with _prime_lock:
        if need <= _primed_bytes:   # another thread primed while we waited
            return
        _prime_locked(need, jax, jnp)


def _prime_locked(need: int, jax, jnp) -> None:
    global _primed_bytes
    rung = _GB
    try:
        # carve the device->host TRANSFER pool before the arena grows:
        # measured on v5e/axon, pure allocation reaches 16 GB but the
        # first D2H transfer needs ~1 GB of device pool — if the compute
        # arena's high-water mark has already passed ~15 GB, that pool
        # can never be carved, and the first readback (however small)
        # fails with RESOURCE_EXHAUSTED and permanently wedges the
        # process's TPU session.  A tiny round-trip here reserves it.
        import numpy as np
        np.asarray(jnp.zeros((128,), jnp.int8))
        while True:
            buf = jnp.zeros((rung,), jnp.int8)
            jax.block_until_ready(buf)
            del buf
            gc.collect()
            _primed_bytes = max(_primed_bytes, rung)
            if rung >= need:
                break
            rung *= 2
    except Exception:  # noqa: BLE001 — smaller chip: stop at last rung
        LOG.info("HBM priming stopped at %.1f GB", _primed_bytes / _GB)
