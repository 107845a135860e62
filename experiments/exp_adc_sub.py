"""ADC pos kernel grid-overhead A/B (ROADMAP #1 leftover).

Times adc_search_exact_pos at sub in {4, 8, 16} on synthetic
SIFT1M-class shapes (1M x 128, OPQ 8x256).  Candidate selection is
IDENTICAL across sub (same slices, same keys) — only the grid step
count changes — so this is timing-only.  Config 4 measured 29.3k QPS
at sub=4 (bar: 30k).
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

from bench import log
from erlvectordb_tpu.ops.adc_pallas import ADC_TILE_N, adc_search_exact_pos

n, d, m, kk = 1_000_000, 128, 8, 256
batch, T = 512, 4
rng = np.random.default_rng(0)
codebooks = jnp.asarray(rng.standard_normal((m, kk, d // m)), jnp.float32)
codes = jnp.asarray(rng.integers(0, kk, (n, m)), jnp.uint8)
i8_codes = jnp.asarray(rng.integers(-127, 128, (n, d)), jnp.int8)
i8_scales = jnp.full((n,), 0.01, jnp.float32)
i8_norms2 = (i8_scales ** 2) * jnp.sum(
    i8_codes.astype(jnp.float32) ** 2, axis=1)
qstack = jnp.asarray(rng.standard_normal((T, batch, d)), jnp.float32)
nt = -(-n // ADC_TILE_N)

for sub in (4, 8, 16):
    big = sub * ADC_TILE_N
    pad = -(-n // big) * big - n
    cp = jnp.pad(codes, ((0, pad), (0, 0)))
    i8p = jnp.pad(i8_codes, ((0, pad), (0, 0)))
    sp = jnp.pad(i8_scales, ((0, pad),), constant_values=1.0)
    n2p = jnp.pad(i8_norms2, ((0, pad),))

    @functools.partial(jax.jit, static_argnames=("sub",))
    def search_many(cp, cbs, i8c, i8s, i8n2, qs, sub):
        def one(q):
            return adc_search_exact_pos(cp, cbs, i8c, i8s, i8n2, q, n,
                                        k=10, n_tiles=nt, sub=sub)
        return lax.map(one, qs)

    def run():
        dv, _ = search_many(cp, codebooks, i8p, sp, n2p, qstack, sub)
        float(dv[0, 0, 0])

    run()
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        run()
        ts.append((time.perf_counter() - t0) / T)
    sec = float(np.median(ts))
    log(f"[adc_sub] sub={sub:2d}: {sec*1e3:.2f} ms / {batch} queries -> "
        f"{batch/sec:,.0f} QPS  (spread {max(ts)/min(ts):.3f})")
