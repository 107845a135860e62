#!/usr/bin/env python
"""Benchmark harness — the five BASELINE.json configs.

Headline (default, printed as ONE JSON line on stdout):
  config 3 — GloVe-class corpus (1.2M x 100-d), cosine, int8 store searched
  in the quantized domain on the MXU, recall@10 measured against the f32
  exact scan.  Metric: QPS/chip at recall@10 >= 0.95.  Baseline target:
  100k QPS/chip (BASELINE.md).

Other configs via --config N; --quick shrinks sizes for smoke-testing.
All diagnostics go to stderr; stdout carries exactly one JSON line.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


_TIMING_LOG: list = []  # per-_timeit dispersion rows (bench hygiene)


def _timeit(fn, iters=5, warmup=2):
    """Median wall time of fn(). fn MUST force a device->host readback:
    on the tunneled TPU backend, block_until_ready can return before remote
    execution finishes, so only a readback gives honest timing.

    Every call also logs ``{n_runs, min, median, max, spread}`` into
    ``_TIMING_LOG`` (attached to the config's output row by main): the
    rig's tunnel congestion swings 2-3x minute to minute, and without
    recorded dispersion a later round cannot tell a real regression from
    a congested window (VERDICT r3 #10)."""
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    _TIMING_LOG.append({
        "n_runs": iters,
        "min": round(float(np.min(times)), 6),
        "median": round(med, 6),
        "max": round(float(np.max(times)), 6),
        "spread": round(float(np.max(times) / max(np.min(times), 1e-12)), 3),
    })
    return med


def make_corpus(key, n, d, n_centers=1024, noise=0.35, intrinsic_dim=None):
    """Clustered synthetic corpus (GloVe-like anisotropy), built on device.

    With ``intrinsic_dim`` the points live near a low-dimensional manifold
    embedded in R^d (SIFT-like) — isotropic high-d Gaussians have no
    meaningful nearest neighbors (concentration of measure), so quantizer
    recall numbers on them are not representative.
    """
    import jax
    import jax.numpy as jnp

    kc, ka, kn, kp, km = jax.random.split(key, 5)
    latent = intrinsic_dim or d
    centers = jax.random.normal(kc, (n_centers, latent), jnp.float32)
    assign = jax.random.randint(ka, (n,), 0, n_centers)
    z = centers[assign] + noise * jax.random.normal(kn, (n, latent), jnp.float32)
    if intrinsic_dim is None:
        return jax.block_until_ready(z)
    proj = jax.random.normal(kp, (latent, d), jnp.float32) / jnp.sqrt(latent)
    x = jnp.dot(z, proj) + 0.05 * jax.random.normal(km, (n, d), jnp.float32)
    return jax.block_until_ready(x)


def exact_ground_truth(data, norms, queries, k, chunk=64):
    """f32 exact cosine top-k (the recall reference), chunked over queries."""
    import jax.numpy as jnp

    from erlvectordb_tpu.core.search import exact_topk

    valid = jnp.ones((data.shape[0],), bool)
    rows = []
    for i in range(0, queries.shape[0], chunk):
        q = queries[i : i + chunk]
        _, idx = exact_topk(data, norms, valid, q, metric="cosine", k=k)
        rows.append(np.asarray(idx))
    return np.concatenate(rows)


def bench_config3(quick: bool) -> dict:
    """GloVe-1.2M x 100-d cosine: int8 quantized scan + top-k, recall@10."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from erlvectordb_tpu.core.search import int8_distances
    from erlvectordb_tpu.core.store import VectorStore

    n = 120_000 if quick else 1_200_000
    d, k, batch = 100, 10, 1024
    nq = 256

    log(f"[config3] generating corpus n={n} d={d} ...")
    key = jax.random.PRNGKey(0)
    data = make_corpus(key, n, d)
    norms = jnp.linalg.norm(data, axis=1)
    queries = make_corpus(jax.random.PRNGKey(1), max(nq, batch), d)

    # ---- index build rate (bulk build: quantize + norms + layout) --------
    # intkey=True: the build also encodes the unit-code plane (the intkey
    # scan's selection codes), so the build rate below includes it.
    float(jnp.sum(norms))  # force corpus completion before timing the build
    warm = VectorStore.from_matrix("warm", data, dtype="int8",
                                   intkey=True)  # compile warmup
    float(warm._norms[0])
    del warm
    t0 = time.perf_counter()
    store = VectorStore.from_matrix("glove", data, dtype="int8", intkey=True)
    float(store._norms[0])  # readback forces completion
    build_s = time.perf_counter() - t0
    build_rate = n / build_s
    log(f"[config3] index build: {build_s*1e3:.1f} ms -> {build_rate/1e6:.2f} M vec/s")

    codes, scales, snorms, valid = (
        store._vectors, store._scales, store._norms, store._valid,
    )
    codes_unit = store._codes_unit

    # ---- search path (the QPS measurement) -------------------------------
    # T batches run inside ONE executable (lax.map) so the tunnel's per-call
    # round-trip is amortized; the final float() readback forces completion.
    # The measured path is the fused Pallas scan (ops/fused_topk.py) — the
    # same kernel VectorStore.search dispatches to on TPU.
    from erlvectordb_tpu.ops.fused_topk import (
        fused_topk,
        fused_topk_available,
        n_tiles_for,
    )

    # T batches per executable: the tunnel adds ~30 ms of fixed dispatch +
    # readback per program; T=64 keeps that overhead <0.5 ms/batch so the
    # number reflects device throughput (measured: overhead-corrected slope
    # and T=64 agree within ~10%).
    T = 4 if quick else 64
    nt = n_tiles_for(store._next_row, store.capacity)
    use_fused = fused_topk_available(n, store.capacity, "cosine",
                                     jax.default_backend(), k)
    log(f"[config3] fused kernel: {use_fused} (n_tiles={nt})")

    width = codes.shape[1]

    @functools.partial(jax.jit, static_argnames=("kk", "ntl", "T2"))
    def search_many(codes, scales, snorms, valid, cu, qstack, kk, ntl,
                    T2=None):
        def one(q):
            if use_fused:
                return fused_topk(codes, scales, snorms, valid, q,
                                  metric="cosine", k=kk, n_tiles=ntl,
                                  codes_unit=cu)
            dists = int8_distances(codes, scales, snorms, q, "cosine")
            dists = jnp.where(valid[None, :], dists, jnp.inf)
            neg, idx = lax.approx_max_k(-dists, kk, recall_target=0.99)
            return -neg, idx
        return lax.map(one, qstack if T2 is None else qstack[:T2])

    rng = np.random.default_rng(7)
    qpad = np.zeros((T, batch, width), np.float32)
    qpad[:, :, :d] = rng.standard_normal((T, batch, d)).astype(np.float32)
    qstack = jax.device_put(qpad)

    # gt once, shared by both paths' recall
    log("[config3] computing exact ground truth ...")
    gt = exact_ground_truth(data, norms, queries[:nq], k)
    qr = np.zeros((nq, width), np.float32)
    qr[:, :d] = np.asarray(queries[:nq])
    qr_dev = jax.device_put(qr)[None]

    results = {}
    for name, cu in (("pos", None), ("intkey", codes_unit)):
        def run(cu=cu):
            dv, _ = search_many(codes, scales, snorms, valid, cu, qstack,
                                k, nt)
            float(dv[0, 0, 0])  # force completion

        sec_total = _timeit(run, iters=4, warmup=1)
        sec_per_batch = sec_total / T
        qps = batch / sec_per_batch
        # dispatch-overhead-corrected ("device-true"): slope between T and
        # T/4 executables cancels the tunnel's fixed per-program cost
        if not quick:
            T2 = T // 4

            def run_short(cu=cu):
                dv, _ = search_many(codes, scales, snorms, valid, cu,
                                    qstack, k, nt, T2=T2)
                float(dv[0, 0, 0])

            sec_short = _timeit(run_short, iters=4, warmup=1)
            sec_true = max((sec_total - sec_short) / (T - T2), 1e-9)
            qps_true = batch / sec_true
        else:
            qps_true = qps
        dvs, got = search_many(codes, scales, snorms, valid, cu, qr_dev,
                               k, nt)
        got = np.asarray(got)[0]
        recall = float(
            np.mean([len(set(gt[i]) & set(got[i])) / k for i in range(nq)])
        )
        log(f"[config3] {name}: {sec_per_batch*1e3:.2f} ms/batch -> "
            f"{qps:,.0f} QPS ({qps_true:,.0f} device-true), "
            f"recall@10 {recall:.4f}")
        results[name] = (qps, qps_true, recall)

    # headline: the intkey path (unit-plane selection + absmax rescore)
    # when it holds the recall bar, else the pos path
    head = "intkey" if results["intkey"][2] >= 0.95 else "pos"
    qps, qps_true, recall = results[head]

    return {
        "metric": "QPS/chip at recall@10 (GloVe-1.2M-class cosine, int8 store)",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / 100_000.0, 3),
        "path": head,
        "qps_device_true": round(qps_true, 1),
        "recall_at_10": round(recall, 4),
        "recall_target": 0.95,
        "pos_qps": round(results["pos"][0], 1),
        "pos_qps_device_true": round(results["pos"][1], 1),
        "pos_recall_at_10": round(results["pos"][2], 4),
        "intkey_qps": round(results["intkey"][0], 1),
        "intkey_qps_device_true": round(results["intkey"][1], 1),
        "intkey_recall_at_10": round(results["intkey"][2], 4),
        "index_build_vectors_per_sec": round(build_rate, 1),
        "build_vs_baseline": round(build_rate / 1_000_000.0, 3),
        "n": n,
        "dim": d,
        "batch": batch,
        "quick": quick,
    }


def _store_dispatch_rates(store, qs, k, batch):
    """Three-way rate measurement for a store's batched search (VERDICT r3
    #5 — the old sequential-call numbers recorded the rig's ~30-60 ms RTT
    per call, under-reporting device work up to 50x):

      per-dispatch  N separate async program dispatches, ONE readback at
                    the end; slope between N=4 and N=32, median-of-3 (the
                    honest serving rate — what a loaded server achieves
                    with requests in flight)
      pipelined     8 tickets in flight, every result read back (end-to-
                    end incl. readbacks, amortized)
      sequential    one call at a time (dominated by link RTT on this rig)
    """
    def pipe(nn):
        tickets = [store.search_batch_submit(qs, k=k) for _ in range(nn)]
        np.asarray(tickets[-1].packed)  # drains the in-order device queue

    pipe(2)
    pipe(2)
    ts = {}
    for nn in (4, 32):
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            pipe(nn)
            samples.append(time.perf_counter() - t0)
        ts[nn] = float(np.median(samples))
        # headline dispersion: the per-dispatch rate is the slope between
        # these two loop sizes, so their spread bounds the headline's
        _TIMING_LOG.append({
            "n_runs": len(samples), "min": round(min(samples), 6),
            "median": round(ts[nn], 6), "max": round(max(samples), 6),
            "spread": round(max(samples) / max(min(samples), 1e-9), 3),
            "what": f"dispatch-slope loop n={nn}",
        })
    sec_disp = max((ts[32] - ts[4]) / 28.0, 1e-9)

    def run_pipe():
        tickets = [store.search_batch_submit(qs, k=k) for _ in range(8)]
        for t_ in tickets:
            store.search_batch_complete(t_)

    sec_pipe = _timeit(run_pipe, iters=3, warmup=1) / 8
    sec_seq = _timeit(lambda: store.search_batch(qs, k=k), iters=5, warmup=2)
    return (batch / sec_disp, batch / sec_pipe, batch / sec_seq,
            sec_disp * 1e3)


def bench_config1(quick: bool) -> dict:
    """10k x 128 f32 cosine top-5 exact (reference-parity config)."""
    import jax

    from erlvectordb_tpu.core.store import VectorStore

    n, d, k, batch = 10_000, 128, 5, 256
    data = np.asarray(make_corpus(jax.random.PRNGKey(0), n, d))
    store = VectorStore.from_matrix("c1", data)
    qs = data[:batch]
    qps_disp, qps_pipe, qps_seq, ms_disp = _store_dispatch_rates(
        store, qs, k, batch)
    log(f"[config1] per-dispatch {ms_disp:.3f} ms/batch -> {qps_disp:,.0f} "
        f"QPS; pipelined {qps_pipe:,.0f}; sequential {qps_seq:,.0f}")
    return {
        "metric": "QPS exact f32 cosine top-5 (10k x 128, per-dispatch)",
        "value": round(qps_disp, 1),
        "unit": "qps",
        "vs_baseline": None,
        "pipelined_qps": round(qps_pipe, 1),
        "sequential_qps": round(qps_seq, 1),
        "per_dispatch_ms": round(ms_disp, 3),
        "n": n,
    }


def bench_config2(quick: bool) -> dict:
    """100k x 384 int8 store, euclidean top-10."""
    import jax

    from erlvectordb_tpu.core.store import VectorStore

    n, d, k, batch = (20_000 if quick else 100_000), 384, 10, 512
    data = np.asarray(make_corpus(jax.random.PRNGKey(0), n, d))
    store = VectorStore.from_matrix("c2", data, metric="euclidean", dtype="int8")
    qs = data[:batch]
    qps_disp, qps_pipe, qps_seq, ms_disp = _store_dispatch_rates(
        store, qs, k, batch)
    log(f"[config2] per-dispatch {ms_disp:.3f} ms/batch -> {qps_disp:,.0f} "
        f"QPS; pipelined {qps_pipe:,.0f}; sequential {qps_seq:,.0f}")
    return {
        "metric": "QPS int8 euclidean top-10 (100k x 384, per-dispatch)",
        "value": round(qps_disp, 1),
        "unit": "qps",
        "vs_baseline": None,
        "pipelined_qps": round(qps_pipe, 1),
        "sequential_qps": round(qps_seq, 1),
        "per_dispatch_ms": round(ms_disp, 3),
        "n": n,
    }


def bench_config4(quick: bool) -> dict:
    """SIFT1M-class: 1M x 128, OPQ 8x8-bit ADC retrieval + exact int8 rerank.

    Raw PQ distances cannot rank neighbors whose separation is below the
    quantization error, so (as real ADC systems do) the coarse scan retrieves
    top-c candidates and an int8 exact pass re-ranks them; the OPQ rotation
    (L2-preserving, applied to the whole space once) improves the coarse
    ordering enough to shrink c 4x at equal recall.  Memory footprint stays
    int8 + 8 PQ bytes per vector.
    """
    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax

    from erlvectordb_tpu.core.search import exact_topk
    from erlvectordb_tpu.quant.opq import OPQCodebook

    n = 100_000 if quick else 1_000_000
    c = 256 if quick else 512
    d, k, batch, nq = 128, 10, 512, 256
    # corpus and queries drawn from ONE low-intrinsic-dim manifold (SIFT-like)
    nq_all = max(nq, batch)
    allpts = make_corpus(jax.random.PRNGKey(0), n + nq_all, d, intrinsic_dim=20)
    data, queries = allpts[:n], allpts[n:]

    iters = 8 if quick else 15
    opq_iters = 2 if quick else 4
    t0 = time.perf_counter()
    cb = OPQCodebook.fit(data, m=8, k=256, iters=iters, opq_iters=opq_iters,
                         max_train=200_000)
    codes = cb.encode(data)
    float(codes[0, 0])  # readback forces completion
    build_s = time.perf_counter() - t0  # includes XLA compile on first run
    log(f"[config4] OPQ train+encode (incl. compile): {build_s:.1f}s")
    t0 = time.perf_counter()
    cb = OPQCodebook.fit(data, m=8, k=256, iters=iters, opq_iters=opq_iters,
                         max_train=200_000)
    codes = cb.encode(data)
    float(codes[0, 0])
    build_warm_s = time.perf_counter() - t0
    log(f"[config4] OPQ train+encode (warm): {build_warm_s:.1f}s "
        f"({n/build_warm_s/1e6:.2f} M vec/s)")

    # rotate the whole space once (orthogonal => L2-preserving): the scan's
    # LUTs and the int8 rerank both operate in rotated coordinates
    data_r = cb.rotate(data)
    queries_r = jnp.asarray(np.asarray(cb.rotate(queries)))
    absmax = jnp.max(jnp.abs(data_r), axis=-1)
    i8_scales = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    i8_codes = jnp.clip(jnp.round(data_r / i8_scales[:, None]), -127, 127).astype(jnp.int8)
    i8_norms2 = (i8_scales ** 2) * jnp.sum(
        i8_codes.astype(jnp.float32) ** 2, axis=1)

    from erlvectordb_tpu.ops.adc_pallas import (
        ADC_TILE_N,
        adc_search_exact_fused,
        adc_search_exact_pos,
    )

    nt = -(-n // ADC_TILE_N)
    # pad to the pos kernel's sub=8 big tiles (superset of the 1024 pad)
    pad_rows = -(-n // (8 * ADC_TILE_N)) * 8 * ADC_TILE_N - n
    codes_p = jnp.pad(codes, ((0, pad_rows), (0, 0)))
    i8_codes_p = jnp.pad(i8_codes, ((0, pad_rows), (0, 0)))
    i8_scales_p = jnp.pad(i8_scales, ((0, pad_rows),), constant_values=1.0)
    i8_norms2_p = jnp.pad(i8_norms2, ((0, pad_rows),))

    # T batches in one executable to amortize the tunnel RTT (see config 3)
    T = 2 if quick else 4
    rngq = np.random.default_rng(5)
    qstack = jnp.asarray(np.asarray(cb.rotate(jnp.asarray(
        rngq.standard_normal((T * batch, d)).astype(np.float32)
    ))).reshape(T, batch, d))

    @functools.partial(jax.jit, static_argnames=("kk", "ntl", "pos"))
    def search_many(codes_p, cbs, i8c, i8s, i8n2, qstack, kk, ntl, pos):
        fn = adc_search_exact_pos if pos else adc_search_exact_fused
        def one(q):
            return fn(codes_p, cbs, i8c, i8s, i8n2, q, n, k=kk, n_tiles=ntl)
        return lax.map(one, qstack)

    variants = {}
    for name, pos in (("tfused", False), ("pos", True)):
        def run(pos=pos):
            dv, _ = search_many(codes_p, cb.pq.codebooks, i8_codes_p,
                                i8_scales_p, i8_norms2_p, qstack, k, nt, pos)
            float(dv[0, 0, 0])
        sec = _timeit(run, iters=4, warmup=1) / T
        variants[name] = batch / sec
        log(f"[config4:{name}] {sec*1e3:.2f} ms / {batch} queries -> "
            f"{variants[name]:,.0f} QPS")

    norms = jnp.linalg.norm(data, axis=1)
    valid = jnp.ones((n,), bool)
    _, gt_l2 = exact_topk(data, norms, valid, queries[:nq], metric="euclidean", k=k)
    gt_l2 = np.asarray(gt_l2)
    recalls = {}
    for name, fn in (("tfused", adc_search_exact_fused),
                     ("pos", adc_search_exact_pos)):
        _, got = fn(codes_p, cb.pq.codebooks, i8_codes_p,
                    i8_scales_p, i8_norms2_p,
                    queries_r[:nq], n, k=k, n_tiles=nt)
        got = np.asarray(got)
        recalls[name] = float(np.mean(
            [len(set(gt_l2[i]) & set(got[i])) / k for i in range(nq)]))
        log(f"[config4:{name}] recall@10 = {recalls[name]:.4f}")
    # headline: the fastest variant holding the 0.95 recall bar
    pick = ("pos" if recalls["pos"] >= 0.95
            and variants["pos"] >= variants["tfused"] else "tfused")
    return {
        "metric": "QPS OPQ8x8 ADC + in-kernel exact rerank, euclidean top-10 (SIFT1M-class)",
        "value": round(variants[pick], 1),
        "unit": "qps",
        "vs_baseline": None,
        "recall_at_10": round(recalls[pick], 4),
        "kernel": pick,
        "qps_tfused": round(variants["tfused"], 1),
        "qps_pos": round(variants["pos"], 1),
        "recall_tfused": round(recalls["tfused"], 4),
        "recall_pos": round(recalls["pos"], 4),
        "pq_build_vectors_per_sec": round(n / build_warm_s, 1),
        "n": n,
    }


def bench_config5(quick: bool) -> dict:
    """Sharded int8 store at the blueprint's FULL scale: 10M x 768 (v5e-16
    config scaled to the available mesh).  The corpus is generated ON DEVICE
    chunk by chunk and streamed into the preallocated int8 store
    (ShardedVectorStore.from_chunks) — no [10M, 768] f32 temporary ever
    exists (that would be 30 GB; the int8 store is ~7.4 GB and fits v5e HBM
    next to one 256k-row f32 chunk)."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax

    from erlvectordb_tpu.parallel import ShardedVectorStore, make_mesh

    ndev = len(jax.devices())
    mesh = make_mesh(n_data=ndev, n_replica=1)
    n = 100_000 if quick else 10_000_000
    # batch 1024: at 10M rows the scan is compute-bound (~40 ms/batch), so
    # the tunnel's ~60 ms per-call readback (this rig's artifact; readbacks
    # serialize and do not pipeline) no longer dominates end-to-end
    d, k, batch = 768, 10, 1024
    T = 2 if quick else 4
    chunk_rows = 50_000 if quick else 262_144
    n_centers, noise = 1024, 0.35

    key = jax.random.PRNGKey(0)
    kc, kq = jax.random.split(key)
    centers = jax.random.normal(kc, (n_centers, d), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("c",))
    def gen_chunk(k2, centers, c):
        ka, kn = jax.random.split(k2)
        assign = jax.random.randint(ka, (c,), 0, n_centers)
        return centers[assign] + noise * jax.random.normal(kn, (c, d), jnp.float32)

    n_chunks = -(-n // chunk_rows)

    def chunks():
        for i in range(n_chunks):
            yield gen_chunk(jax.random.fold_in(kq, i), centers, chunk_rows)

    # warm build at the SAME shapes (compiles gen/write/alloc/reshape
    # programs — minutes via the remote compiler on a cold cache), then the
    # timed build measures steady-state streaming throughput
    warm = ShardedVectorStore.from_chunks("c5w", mesh, chunks(), n=n, dim=d,
                                          dtype="int8")
    jax.block_until_ready(warm._valid)
    del warm
    t0 = time.perf_counter()
    store = ShardedVectorStore.from_chunks("c5", mesh, chunks(), n=n, dim=d,
                                           dtype="int8")
    jax.block_until_ready(store._valid)
    build_s = time.perf_counter() - t0
    log(f"[config5] streaming build {n} x {d} (incl. on-device generation): "
        f"{build_s:.2f} s -> {n/build_s/1e6:.2f} M vec/s")

    # correctness probe: top-1 of a dequantized row is that row
    probe_q = (np.asarray(store._vectors[0, 37]).astype(np.float32)[:d]
               * float(store._scales[0, 37]))
    hit = store.search(probe_q, k=1)
    assert hit and hit[0][0] == "37", hit[:1]
    log("[config5] correctness probe ok (top-1 of row 37 == '37')")

    # end-to-end single-call path (includes tunnel RTT + host mapping)
    rng_e = np.random.default_rng(9)
    qs_host = rng_e.standard_normal((batch, d)).astype(np.float32)
    run = lambda: store.search_batch(qs_host, k=k)
    sec_e2e = _timeit(run, iters=3, warmup=1)
    log(f"[config5] end-to-end sequential: {sec_e2e*1e3:.1f} ms/batch "
        f"-> {batch/sec_e2e:,.0f} QPS")

    # end-to-end PIPELINED: submit T batches (async dispatch), then complete
    def run_pipe():
        tickets = [store.search_batch_submit(qs_host, k=k) for _ in range(T)]
        for t in tickets:
            store.search_batch_complete(t)
    for _ in range(1):
        run_pipe()
    sec_pipe = _timeit(run_pipe, iters=3, warmup=0) / T
    log(f"[config5] end-to-end pipelined: {sec_pipe*1e3:.1f} ms/batch "
        f"-> {batch/sec_pipe:,.0f} QPS")

    # device-side throughput: T batches in one executable over the same
    # compiled shard_map program the store dispatches to
    from erlvectordb_tpu.ops import fused_topk as ft
    from erlvectordb_tpu.parallel.sharded_store import _build_search

    kb = 16
    fused_nt = 0
    if ft.fused_topk_available(n, store._cap, "cosine",
                               jax.default_backend(), kb):
        fused_nt = ft.n_tiles_for(max(store._next_local), store._cap)
    fn = _build_search(mesh, "cosine", kb, True, fused_nt)
    rngq = np.random.default_rng(3)
    width = store._vectors.shape[2]
    qpad = np.zeros((T, batch, width), np.float32)
    qpad[:, :, :d] = rngq.standard_normal((T, batch, d)).astype(np.float32)
    qstack = jax.device_put(qpad)

    @jax.jit
    def many(vecs, scales, norms, valid, qstack):
        return lax.map(lambda q: fn(vecs, scales, norms, valid, q), qstack)

    def runk():
        dv, _ = many(store._vectors, store._scales, store._norms,
                     store._valid, qstack)
        float(dv[0, 0, 0])
    sec_dev = _timeit(runk, iters=3, warmup=1) / T
    qps = batch / sec_dev
    log(f"[config5] device path: {sec_dev*1e3:.2f} ms/batch -> {qps:,.0f} QPS")

    # ---- e2e decomposition (VERDICT r3 #5): split the pipelined gap into
    # submit-side host work, the rig's raw readback RTT for an equivalent
    # payload, and completion-side host mapping — so "host share" is
    # separable from the tunnel's unavoidable transfer cost.
    t0 = time.perf_counter()
    tickets = [store.search_batch_submit(qs_host, k=k) for _ in range(T)]
    submit_s = (time.perf_counter() - t0) / T
    # Drain the DEVICE queue before timing completions: a complete()
    # blocks until its batch's device work finishes, so timing them
    # while later batches still execute counts device wait as "host" —
    # the round-3 decomposition overstated the host share this way.
    for t in tickets:
        jax.block_until_ready(t.packed if t.packed is not None else t.dists)
    comp_samples = []
    for t in tickets:
        t1 = time.perf_counter()
        store.search_batch_complete(t)
        comp_samples.append(time.perf_counter() - t1)
    comp_s = float(np.median(comp_samples))
    # columnar completion (the serving stack's path: MCP batch/b64, gRPC)
    # skips the per-hit (id, metadata, dist) tuple mapping — its cost over
    # the raw link readback is the decode only (~0.2 ms measured)
    raw_samples = []
    for _ in range(len(tickets)):
        t = store.search_batch_submit(qs_host, k=k)
        jax.block_until_ready(t.packed if t.packed is not None else t.dists)
        t1 = time.perf_counter()
        store.search_batch_complete_raw(t)
        raw_samples.append(time.perf_counter() - t1)
    comp_raw_s = float(np.median(raw_samples))
    # raw-readback floor: an equivalent-size device array through the rig.
    # Must be a FRESH computed array per sample: jnp.zeros is a known
    # constant the client materializes host-side (measured 0.004 ms,
    # i.e. no wire transfer), and a jax.Array caches fetched host data
    # so a second np.asarray of the same array is free.
    mk_payload = jax.jit(
        lambda s: jnp.full((batch, 3 * 16), 1.0, jnp.float32) * s)
    rtts = []
    for i in range(5):
        payload = mk_payload(jnp.float32(i + 1))
        jax.block_until_ready(payload)
        t1 = time.perf_counter()
        np.asarray(payload)
        rtts.append(time.perf_counter() - t1)
    rtt_s = float(np.median(rtts))
    host_s = max(submit_s, 0.0) + max(comp_s - rtt_s, 0.0)
    log(f"[config5] decomposition per batch: submit {submit_s*1e3:.2f} ms, "
        f"complete {comp_s*1e3:.2f} ms (columnar {comp_raw_s*1e3:.2f}, raw "
        f"readback floor {rtt_s*1e3:.2f} ms) -> host share {host_s*1e3:.2f}"
        f" ms vs device {sec_dev*1e3:.2f} ms", )

    return {
        "metric": f"QPS sharded int8 cosine top-10 ({ndev}-device mesh, {n} x 768)",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": None,
        "devices": ndev,
        "end_to_end_qps": round(batch / sec_e2e, 1),
        "end_to_end_pipelined_qps": round(batch / sec_pipe, 1),
        "e2e_pipelined_vs_device": round(sec_dev / sec_pipe, 3),
        "e2e_submit_ms": round(submit_s * 1e3, 3),
        "e2e_complete_ms": round(comp_s * 1e3, 3),
        "e2e_complete_raw_ms": round(comp_raw_s * 1e3, 3),
        "rtt_floor_ms": round(rtt_s * 1e3, 3),
        "e2e_host_ms": round(host_s * 1e3, 3),
        "streaming_build_vectors_per_sec": round(n / build_s, 1),
        "n": n,
    }


def bench_config6(quick: bool) -> dict:
    """End-to-end serving QPS through the REAL MCP TCP path (VERDICT r1 #1).

    Starts the full Database + MCP server in this process (real sockets),
    loads a config-3-shaped corpus (1.2M x 100-d int8), and measures queries
    per second as seen by a TCP client in two modes:

      * pipelined  — one request per query, many in flight per connection,
                     responses matched out-of-order by JSON-RPC id;
      * batched    — search_vectors_batch with base64 f32 queries (the
                     production bulk encoding), compact responses.

    The machine has ONE host core shared by client and server, so the
    pipelined number is a floor on what a real (remote-client) deployment
    would see.  Client work is minimized: requests are pre-encoded before
    the clock starts; responses are counted by newline framing and only
    sampled for correctness.
    """
    import socket
    import threading

    import jax

    from erlvectordb_tpu.api import Database
    from erlvectordb_tpu.serve.mcp_server import MCPServer

    from erlvectordb_tpu.infra.config import load_config

    n = 120_000 if quick else 1_200_000
    d, k = 100, 10
    db = Database(load_config(overrides={"persistence_enabled": False},
                              env={}))
    db.oauth.enabled = False  # measuring the search path, not token checks
    db.start()
    log(f"[config6] building int8 corpus n={n} x {d} ...")
    data = make_corpus(jax.random.PRNGKey(0), n, d)
    from erlvectordb_tpu.core.store import VectorStore

    store = VectorStore.from_matrix("serve_bench", data, dtype="int8")
    db.registry.adopt(store)
    db.batcher.max_batch = 1024
    del data
    store.warmup(batch_sizes=(256, 512, 1024), ks=(16,))
    srv = MCPServer(db, host="127.0.0.1", port=0)
    # port 0 -> kernel-assigned; read it back
    srv.start()
    port = srv._sock.getsockname()[1]
    log(f"[config6] MCP server on :{port}")

    import base64

    rng = np.random.default_rng(11)

    def run_pipelined(n_reqs: int, n_conns: int = 4, window: int = 256) -> float:
        """Pre-encoded single-query requests, `window` in flight per conn."""
        qs = rng.standard_normal((256, d)).astype(np.float32)
        blobs = []
        for i in range(n_reqs):
            q = qs[i % 256]
            blobs.append((json.dumps({
                "jsonrpc": "2.0", "id": i, "method": "tools/call",
                "params": {"name": "search_vectors", "arguments": {
                    "store": "serve_bench",
                    "vector_b64": base64.b64encode(q.tobytes()).decode(),
                    "k": k}},
            }) + "\n").encode())
        per = n_reqs // n_conns
        done = threading.Barrier(n_conns + 1)

        def client(ci):
            sock = socket.create_connection(("127.0.0.1", port), timeout=300)
            my = blobs[ci * per:(ci + 1) * per]
            got = [0]

            def reader():
                buf = b""
                while got[0] < per:
                    chunk = sock.recv(1 << 18)
                    if not chunk:
                        break
                    buf += chunk
                    got[0] += chunk.count(b"\n")
            rt = threading.Thread(target=reader, daemon=True)
            done.wait()  # start line
            rt.start()
            w = 0
            for i in range(0, per, window):
                sock.sendall(b"".join(my[i:i + window]))
                w += window
            rt.join(timeout=300)
            sock.close()
            done.wait()  # finish line

        threads = [threading.Thread(target=client, args=(ci,), daemon=True)
                   for ci in range(n_conns)]
        for t in threads:
            t.start()
        done.wait()
        t0 = time.perf_counter()
        done.wait()
        dt = time.perf_counter() - t0
        return n_reqs / dt

    def run_batched(n_batches: int, bsz: int, encoding: str = "json") -> float:
        qs = rng.standard_normal((bsz, d)).astype(np.float32)
        blob_q = base64.b64encode(np.ascontiguousarray(qs).tobytes()).decode()
        extra = {"encoding": "b64"} if encoding == "b64" else {"compact": True}
        reqs = [(json.dumps({
            "jsonrpc": "2.0", "id": i, "method": "tools/call",
            "params": {"name": "search_vectors_batch", "arguments": {
                "store": "serve_bench", "vectors_b64": blob_q, "dim": d,
                "k": k, **extra}},
        }) + "\n").encode() for i in range(n_batches)]
        sock = socket.create_connection(("127.0.0.1", port), timeout=300)
        got = [0]

        def reader():
            buf = b""
            while got[0] < n_batches:
                chunk = sock.recv(1 << 20)
                if not chunk:
                    break
                buf += chunk
                got[0] += chunk.count(b"\n")
        t0 = time.perf_counter()
        rt = threading.Thread(target=reader, daemon=True)
        rt.start()
        for i in range(0, n_batches, 4):  # keep 4 batches in flight
            sock.sendall(b"".join(reqs[i:i + 4]))
        rt.join(timeout=300)
        dt = time.perf_counter() - t0
        sock.close()
        return n_batches * bsz / dt

    # correctness spot-check through the socket before timing (reconstruct
    # row 17's vector from device codes without materializing the id dicts)
    probe = socket.create_connection(("127.0.0.1", port), timeout=60)
    q0 = (np.asarray(store._vectors[17]).astype(np.float32)[:d]
          * float(store._scales[17]))
    probe.sendall((json.dumps({
        "jsonrpc": "2.0", "id": 1, "method": "tools/call",
        "params": {"name": "search_vectors", "arguments": {
            "store": "serve_bench",
            "vector_b64": base64.b64encode(
                np.ascontiguousarray(q0).tobytes()).decode(),
            "k": 1}}}) + "\n").encode())
    buf = b""
    while b"\n" not in buf:
        buf += probe.recv(65536)
    hit = json.loads(json.loads(buf.split(b"\n")[0])["result"]["content"][0]["text"])
    assert hit["results"][0]["id"] == "17", hit
    probe.close()
    log("[config6] correctness probe ok (top-1 of row 17 == '17')")

    store.warmup(batch_sizes=(4096,), ks=(16,))
    n_reqs = 2_000 if quick else 20_000
    run_pipelined(512, n_conns=2)  # warm the compiled (B, k) buckets
    qps_pipe = run_pipelined(n_reqs)
    log(f"[config6] pipelined single-query: {qps_pipe:,.0f} QPS over TCP")
    nb = 20 if quick else 100
    run_batched(4, 1024)
    qps_batch = run_batched(nb, 1024)
    log(f"[config6] batched compact-JSON (1024/req): {qps_batch:,.0f} QPS over TCP")
    run_batched(4, 4096, encoding="b64")
    qps_b64 = run_batched(max(nb // 2, 10), 4096, encoding="b64")
    log(f"[config6] batched binary-b64 (4096/req): {qps_b64:,.0f} QPS over TCP")

    # gRPC binary surface on the same Database (serve/grpc_server.py):
    # SearchBatch with packed-f32 rows — no base64, no JSON on the hot path
    qps_grpc = 0.0
    try:
        import grpc as _grpc

        from erlvectordb_tpu.serve import evdb_pb2 as pb
        from erlvectordb_tpu.serve.grpc_server import GrpcServer

        gsrv = GrpcServer(db, host="127.0.0.1", port=0).start()
        chan = _grpc.insecure_channel(f"127.0.0.1:{gsrv.port}")
        call = chan.unary_unary(
            "/evdb.ErlVectorDB/SearchBatch",
            request_serializer=pb.SearchBatchRequest.SerializeToString,
            response_deserializer=pb.SearchBatchReply.FromString)
        bsz = 4096
        qs = rng.standard_normal((bsz, d)).astype(np.float32)
        req = pb.SearchBatchRequest(
            store="serve_bench", vectors_f32=qs.tobytes(), dim=d, k=k)
        call(req)  # warm
        nb_g = 10 if quick else 50
        futs = []
        t0 = time.perf_counter()
        for i in range(nb_g):  # 4 in flight, like the MCP batched mode
            futs.append(call.future(req))
            if len(futs) >= 4:
                futs.pop(0).result()
        for fjob in futs:
            fjob.result()
        qps_grpc = nb_g * bsz / (time.perf_counter() - t0)
        log(f"[config6] gRPC SearchBatch binary (4096/req): "
            f"{qps_grpc:,.0f} QPS")
        chan.close()
        gsrv.stop()
    except Exception as e:  # noqa: BLE001 — grpcio absent or env-specific
        log(f"[config6] gRPC bench skipped: {type(e).__name__}: {e}")

    srv.stop()
    db.stop()
    best = max(qps_batch, qps_b64, qps_grpc)
    return {
        "metric": "end-to-end QPS through MCP TCP (1.2M x 100 int8 cosine top-10)",
        "value": round(best, 1),
        "unit": "qps",
        "vs_baseline": round(best / 100_000.0, 3),
        "mcp_qps_pipelined_single": round(qps_pipe, 1),
        "mcp_qps_batched_json": round(qps_batch, 1),
        "mcp_qps_batched_b64": round(qps_b64, 1),
        "grpc_qps_batched_f32": round(qps_grpc, 1),
        "n": n,
        "note": "client+server share this host's single core; pipelined mode "
                "is host-bound, batched modes approach device throughput",
    }


def bench_config7(quick: bool) -> dict:
    """Filtered search at 1.2M rows (VERDICT r1 #5): columnar tag-table
    masks pushed into the device scan as a validity AND.  Target: filtered
    QPS >= 50% of unfiltered at 1M+ rows, selective and non-selective."""
    import jax

    from erlvectordb_tpu.core.store import VectorStore

    n = 120_000 if quick else 1_200_000
    d, k, batch, T = 100, 10, 1024, 8
    data = np.asarray(make_corpus(jax.random.PRNGKey(0), n, d))
    log(f"[config7] building int8 store with metadata, n={n} ...")
    ids = [str(i) for i in range(n)]
    cats = np.arange(n) % 16
    metas = [{"cat": int(c), "hot": bool(i % 100 == 0)}
             for i, c in enumerate(cats)]
    store = VectorStore.from_matrix("filt", data, ids=ids, dtype="int8",
                                    metadatas=metas)
    qs = data[:batch]

    def timed_pipeline(where):
        def run():
            ts = [store.search_batch_submit(qs, k=k, where=where)
                  for _ in range(T)]
            for t in ts:
                store.search_batch_complete(t)
        run()  # warm (mask build + compile)
        return _timeit(run, iters=3, warmup=0) / T

    sec_plain = timed_pipeline(None)
    qps_plain = batch / sec_plain
    log(f"[config7] unfiltered: {qps_plain:,.0f} QPS")
    sec_sel = timed_pipeline({"cat": 3})        # 1/16 of rows match
    qps_sel = batch / sec_sel
    log(f"[config7] selective filter (1/16 rows): {qps_sel:,.0f} QPS "
        f"({100 * sec_plain / sec_sel:.0f}% of unfiltered)")
    sec_non = timed_pipeline({"hot": False})    # 99% of rows match
    qps_non = batch / sec_non
    log(f"[config7] non-selective filter (99% rows): {qps_non:,.0f} QPS "
        f"({100 * sec_plain / sec_non:.0f}% of unfiltered)")

    # correctness: every hit satisfies the predicate
    hits = store.search_batch(qs[:8], k=5, where={"cat": 3})
    assert all(h[1]["cat"] == 3 for row in hits for h in row)

    worst = min(qps_sel, qps_non)
    return {
        "metric": "filtered-search QPS vs unfiltered (1.2M x 100 int8, tag columns)",
        "value": round(worst, 1),
        "unit": "qps",
        "vs_baseline": round(worst / qps_plain, 3),
        "unfiltered_qps": round(qps_plain, 1),
        "selective_qps": round(qps_sel, 1),
        "non_selective_qps": round(qps_non, 1),
        "n": n,
    }


def bench_config8(quick: bool) -> dict:
    """int4r (cell-residual 4-bit) on the config-3 corpus (VERDICT r1 #8):
    recall@10 target >= 0.90 at int4 code footprint (round-1 whole-vector
    int4 measured 0.59), plus QPS through the residual fused kernel."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax

    from erlvectordb_tpu.core.store import VectorStore

    n = 120_000 if quick else 1_200_000
    d, k, batch, nq = 100, 10, 1024, 256
    log(f"[config8] generating corpus n={n} x {d} ...")
    data = make_corpus(jax.random.PRNGKey(0), n, d)
    norms = jnp.linalg.norm(data, axis=1)
    queries = make_corpus(jax.random.PRNGKey(1), max(nq, batch), d)

    data_np = np.asarray(data)
    t0 = time.perf_counter()
    store = VectorStore.from_matrix("r4", data_np, dtype="int4r")
    jax.block_until_ready(store._valid)
    build_s = time.perf_counter() - t0
    log(f"[config8] int4r build (k-means + balanced cells + encode): "
        f"{build_s:.1f}s -> {n/build_s/1e6:.2f} M vec/s")
    i8 = VectorStore.from_matrix("i8ref", data_np, dtype="int8")
    p4 = VectorStore.from_matrix("p4ref", data_np, dtype="int4")

    log("[config8] computing exact ground truth ...")
    gt = exact_ground_truth(data, norms, queries[:nq], k)

    def recall_of(st):
        # compare by id (int4r permutes device rows into cell-major order)
        t = st.search_batch_submit(np.asarray(queries[:nq]), k=k)
        _d, _rows, ids = st.search_batch_complete_raw(t)
        got = np.array([[int(v) if v is not None else -1 for v in row]
                        for row in ids.tolist()])
        return float(np.mean(
            [len(set(gt[i]) & set(got[i])) / k for i in range(nq)]))

    def recall_deep(st, nprobe):
        t = st.search_batch_submit(np.asarray(queries[:nq]), k=k,
                                   nprobe=nprobe)
        _d, _rows, ids = st.search_batch_complete_raw(t)
        got = np.array([[int(v) if v is not None else -1 for v in row]
                        for row in ids.tolist()])
        return float(np.mean(
            [len(set(gt[i]) & set(got[i])) / k for i in range(nq)]))

    # headline: deep multiprobe (f32 scoring of decoded residuals) — the
    # packed full scan's ~13-bit score keys lose ~0.1 recall on clustered
    # corpora (BENCH_NOTES "packed-scan keys vs manifold corpora"), which
    # is an extraction artifact, not the codes' quantization limit
    deep = min(512, int(store._centroids.shape[0]))
    r_resid = recall_deep(store, deep)
    r_packed = recall_of(store)
    r_i8 = recall_of(i8)
    r_p4 = recall_of(p4)
    log(f"[config8] recall@10: int4r(deep {deep})={r_resid:.4f}  "
        f"int4r(packed scan)={r_packed:.4f}  int8={r_i8:.4f}  "
        f"plain-int4={r_p4:.4f}")

    # rq second stage (VERDICT r3 #4): OPQ m=9 error codes — the largest
    # stage-2 that keeps the store at <= 0.5x int8 memory (58 + 9 B/row
    # vs 136).  Pool sweep shows where the pooled rescore saturates vs
    # the full-rerank ceiling (exp_rq2: 0.9078 at m=10 / infinite pool).
    t0 = time.perf_counter()
    srq = VectorStore.from_matrix("r4rq", data_np, dtype="int4r", rq_m=9)
    jax.block_until_ready(srq._rq_codes)
    rq_build_s = time.perf_counter() - t0
    rq_curve = {}
    for pool in (64, 128, 256):
        srq.rq_pool = pool
        rq_curve[str(pool)] = recall_deep(srq, deep)
        log(f"[config8] rq pool={pool}: recall@10 = {rq_curve[str(pool)]:.4f}")
    r_rq = max(rq_curve.values())
    mem_rq = srq.device_memory_bytes()

    # rq rescore cost: per-dispatch multiprobe at serving nprobe
    def probe_ms(st, nprobe=64, bq=64):
        qs = np.asarray(queries[:bq])
        t = st.search_batch_submit(qs, k=k, nprobe=nprobe)
        st.search_batch_complete_raw(t)  # warm
        def run():
            t = st.search_batch_submit(qs, k=k, nprobe=nprobe)
            st.search_batch_complete_raw(t)
        return _timeit(run, iters=5, warmup=1) * 1e3
    ms_plain = probe_ms(store)
    ms_rq = probe_ms(srq)
    log(f"[config8] multiprobe nprobe=64 per-dispatch: plain {ms_plain:.2f} "
        f"ms vs rq {ms_rq:.2f} ms")
    del srq

    # SOAR-style spill variant (VERDICT r3 #3's second technique): second
    # copies in the runner-up cell, same slot budget.  Spill lifts
    # small-nprobe recall; the DEEP-probe number tests whether it moves
    # the quantization ceiling itself.
    def sp_chunks():
        ch = 262_144
        for i in range(0, n, ch):
            yield data_np[i:i + ch]
    sp = VectorStore.from_chunks(
        "r4sp", sp_chunks(), n=n, dim=d, cell_rows=96, cell_cap=128,
        kmeans_init="random", kmeans_iters=6, refits=1, spill_mult=1.3,
        aniso_eta=4.0)
    r_spill_16 = recall_deep(sp, 16)
    r_spill = recall_deep(sp, min(deep, int(sp._centroids.shape[0])))
    r_plain_16 = recall_deep(store, 16)
    log(f"[config8] spill variant: deep={r_spill:.4f} nprobe16="
        f"{r_spill_16:.4f} (no-spill nprobe16={r_plain_16:.4f})")
    del sp

    # QPS through the residual fused kernel, T batches inside ONE executable
    # (amortizes this rig's ~50 ms serialized readback, like config 3)
    from jax import lax

    from erlvectordb_tpu.ops import fused_topk as ft

    T = 4 if quick else 8
    width = store._vectors.shape[1] * 2
    nt = ft.n_tiles_for(store.capacity, store.capacity)
    qpad = np.zeros((T, batch, width), np.float32)
    qpad[:, :, :d] = np.asarray(queries[:batch])[None]
    qstack = jax.device_put(qpad)
    kb = 16

    @jax.jit
    def many(codes, scales, norms, valid, cents, qstack):
        return lax.map(
            lambda q: ft.fused_topk_residual(
                codes, scales, norms, valid, cents, q,
                metric="cosine", k=kb, n_tiles=nt,
                cell_cap=store._cell_cap), qstack)

    def run():
        dv, _ = many(store._vectors, store._scales, store._norms,
                     store._valid, store._centroids, qstack)
        float(dv[0, 0, 0])
    sec = _timeit(run, iters=3, warmup=1) / T
    qps = batch / sec
    log(f"[config8] {sec*1e3:.2f} ms / {batch} queries -> {qps:,.0f} QPS")

    mem = store.device_memory_bytes()
    mem_i8 = i8.device_memory_bytes()
    # headline: the best recall among <= 0.5x-int8 configurations — the rq
    # store if its measured footprint holds the budget, else plain int4r
    rq_ok = mem_rq / mem_i8 <= 0.5
    headline = max(r_resid, r_rq) if rq_ok else r_resid
    return {
        "metric": "int4r recall@10 at int4 footprint (config-3 corpus)",
        "value": round(headline, 4),
        "unit": "recall",
        "vs_baseline": round(headline / 0.90, 3),
        "recall_target": 0.90,
        "recall_rq": round(r_rq, 4),
        "rq_pool_curve": {p: round(v, 4) for p, v in rq_curve.items()},
        "rq_memory_vs_int8": round(mem_rq / mem_i8, 3),
        "rq_build_s": round(rq_build_s, 1),
        "rq_probe_ms_vs_plain": [round(ms_rq, 2), round(ms_plain, 2)],
        "recall_stage1": round(r_resid, 4),
        "recall_nprobe": deep,
        "recall_packed_scan": round(r_packed, 4),
        "recall_spill_deep": round(r_spill, 4),
        "recall_spill_nprobe16": round(r_spill_16, 4),
        "recall_nospill_nprobe16": round(r_plain_16, 4),
        "recall_int8": round(r_i8, 4),
        "recall_plain_int4": round(r_p4, 4),
        "qps": round(qps, 1),
        "build_vectors_per_sec": round(n / build_s, 1),
        "memory_vs_int8": round(mem / mem_i8, 3),
        "n": n,
    }


def bench_config9(quick: bool) -> dict:
    """Sub-linear multiprobe (the hnsw-slot capability, ROADMAP #13): brute
    fused scan vs cell-probe gather on the SAME int4r store.  The brute
    scan reads every code row per dispatch, so one query costs the same
    device time as a thousand; the multiprobe path gathers only
    nprobe*cell_cap rows — the low-latency serving story at scale."""
    import jax
    import jax.numpy as jnp

    from erlvectordb_tpu.core.store import VectorStore

    n = 120_000 if quick else 1_200_000
    d, k = 100, 10
    nq = 128
    log(f"[config9] generating corpus n={n} x {d} ...")
    data = make_corpus(jax.random.PRNGKey(0), n, d)
    norms = jnp.linalg.norm(data, axis=1)
    queries = make_corpus(jax.random.PRNGKey(1), nq, d)
    data_np = np.asarray(data)
    log("[config9] building int4r store (shared layout: store IS the index)")
    store = VectorStore.from_matrix("c9", data_np, dtype="int4r")
    jax.block_until_ready(store._valid)

    log("[config9] computing exact ground truth ...")
    gt = exact_ground_truth(data, norms, queries[:nq], k)
    qs_np = np.asarray(queries[:nq])

    def recall_of(tick_rows):
        got = np.array([[int(v) if v is not None else -1 for v in row]
                        for row in tick_rows.tolist()])
        return float(np.mean(
            [len(set(gt[i]) & set(got[i])) / k for i in range(nq)]))

    # recall at a few nprobe settings (batch path, ids via raw completion)
    nprobes = (16, 32, 64)
    recalls = {}
    for npb in nprobes:
        t = store.search_batch_submit(qs_np, k=k, nprobe=npb)
        _d, _rows, ids = store.search_batch_complete_raw(t)
        recalls[npb] = recall_of(ids)
    log(f"[config9] multiprobe recall@10: " +
        "  ".join(f"nprobe={p}:{r:.4f}" for p, r in recalls.items()))

    # single-query end-to-end latency: brute fused scan vs multiprobe.
    # Median over reps of (submit + readback) — the real serving latency.
    def one_query_breakdown(nprobe=None, reps=12):
        """submit (validate+pad+h2d+dispatch enqueue), readback-to-results
        (completion incl. the link round-trip + row->id map), total.
        Completion goes through the REAL serving path (single fused packed
        readback), not block_until_ready — which returns early through
        this rig's tunnel and under-reports."""
        q = qs_np[:1]
        t_sub, t_read, t_tot = [], [], []
        for i in range(reps):
            t0 = time.perf_counter()
            tk = store.search_batch_submit(q, k=k, nprobe=nprobe)
            t1 = time.perf_counter()
            store.search_batch_complete_raw(tk)
            t2 = time.perf_counter()
            t_sub.append(t1 - t0)
            t_read.append(t2 - t1)
            t_tot.append(t2 - t0)
        med = lambda xs: float(np.median(xs[2:]))
        return med(t_sub), med(t_read), med(t_tot)

    # link round-trip floor: dispatch a trivial add + read its [8, 40]
    # result back — what ANY single search pays on this rig regardless of
    # the framework (excluded from the host-overhead attribution)
    def rtt_floor(reps=12):
        base = jnp.zeros((8, 40), jnp.float32)
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            np.asarray(base + np.float32(i))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts[2:]))

    rtt_ms = rtt_floor() * 1e3
    sub_b, read_b, lat_brute = one_query_breakdown(None)
    sub_p, read_p, lat_probe = one_query_breakdown(64)
    log(f"[config9] single-query e2e: brute={lat_brute*1e3:.2f} ms "
        f"(submit {sub_b*1e3:.2f} + complete {read_b*1e3:.2f})  "
        f"multiprobe(64)={lat_probe*1e3:.2f} ms (submit {sub_p*1e3:.2f} + "
        f"complete {read_p*1e3:.2f}); link RTT floor {rtt_ms:.2f} ms")

    # small-batch (16) QPS through the same end-to-end path
    def batch_qps(nprobe, b=16, reps=8):
        times = []
        for i in range(reps):
            t0 = time.perf_counter()
            tk = store.search_batch_submit(qs_np[:b], k=k, nprobe=nprobe)
            store.search_batch_complete_raw(tk)  # real readback (tunnel-
            times.append(time.perf_counter() - t0)  # safe, fused pack)
        return b / float(np.median(times[2:]))
    qps16_brute = batch_qps(None)
    qps16_probe = batch_qps(64)
    log(f"[config9] batch-16 e2e QPS: brute={qps16_brute:,.0f}  "
        f"multiprobe(64)={qps16_probe:,.0f}")

    # DEVICE-TRUE single-query latency: T one-query programs inside ONE
    # executable (lax.map) amortizes the tunnel RTT out of the measurement —
    # the number a local (non-tunneled) serving host would see.
    from jax import lax as _lax

    from erlvectordb_tpu.ops import fused_topk as ft
    from erlvectordb_tpu.ops.cell_probe import multiprobe_topk

    T = 8 if quick else 32
    width = store._vectors.shape[1] * 2
    nt = ft.n_tiles_for(store.capacity, store.capacity)
    qpad = np.zeros((T, 8, width), np.float32)     # bq bucket of 8
    qpad[:, 0, :d] = qs_np[:T]
    qstack = jax.device_put(qpad)

    @jax.jit
    def many_brute(codes, scales, norms, valid, cents, qstack):
        return _lax.map(
            lambda q: ft.fused_topk_residual(
                codes, scales, norms, valid, cents, q, metric="cosine",
                k=k, n_tiles=nt, cell_cap=store._cell_cap), qstack)

    @jax.jit
    def many_probe(codes, scales, norms, valid, cents, qstack):
        cr = cents.astype(jnp.bfloat16)  # hoisted out of the map
        return _lax.map(
            lambda q: multiprobe_topk(
                codes, scales, norms, valid, cents, q, metric="cosine",
                k=k, nprobe=64, cell_cap=store._cell_cap,
                centroids_route=cr), qstack)

    def dev_lat(fn):
        def run():
            dv, _ = fn(store._vectors, store._scales, store._norms,
                       store._valid, store._centroids, qstack)
            float(dv[0, 0, 0])
        return _timeit(run, iters=3, warmup=1) / T

    dev_brute = dev_lat(many_brute)
    dev_probe = dev_lat(many_probe)
    log(f"[config9] device-true single-query latency: "
        f"brute={dev_brute*1e3:.3f} ms  multiprobe(64)={dev_probe*1e3:.3f} ms"
        f"  speedup={dev_brute/dev_probe:.1f}x")

    # ---- flagship-scale section: synthetic 8M x 768 int8 cell store ------
    # At 1.2M x 100 the whole corpus is ~60 MB and the brute MXU scan is
    # already ~2 ms — multiprobe pays off above ~1 GB of codes.  Recall is
    # established on the real 1.2M store above; this section measures the
    # TRAFFIC contrast at the scale the capability exists for (6.1 GB of
    # codes).  Timed per-dispatch over pipelined separate programs.
    # TPU-only at full size: on CPU the Pallas kernels run interpreted and
    # a multi-GB scan is impractical — fall back to the int4r numbers.
    if quick or jax.default_backend() != "tpu":
        return {
            "metric": "sub-linear multiprobe speedup, device-true "
                      "single-query latency (int4r store, nprobe=64)",
            "value": round(dev_brute / dev_probe, 2),
            "unit": "x",
            "vs_baseline": round(dev_brute / dev_probe, 2),
            "int4r_device_latency_brute_ms": round(dev_brute * 1e3, 3),
            "int4r_device_latency_multiprobe_ms": round(dev_probe * 1e3, 3),
            "e2e_latency_brute_ms": round(lat_brute * 1e3, 2),
            "e2e_latency_multiprobe_ms": round(lat_probe * 1e3, 2),
            "recall_at_nprobe": {str(p): round(r, 4)
                                 for p, r in recalls.items()},
            "qps16_brute": round(qps16_brute, 1),
            "qps16_multiprobe": round(qps16_probe, 1),
            "n": n,
        }
    del data, store, qstack
    cap2 = 128
    K2 = 62500                                   # 8.0M rows
    N2, W2 = K2 * cap2, 768
    CH = 200_000
    import functools as _ft

    @_ft.partial(jax.jit, donate_argnums=0)
    def _fill(codes, key2, start):
        u8 = jax.random.bits(key2, (CH, W2), jnp.uint8)
        return _lax.dynamic_update_slice(
            codes, _lax.bitcast_convert_type(u8, jnp.int8), (start, 0))

    log(f"[config9] generating synthetic {N2}x{W2} int8 cell store "
        f"({N2*W2/1e9:.1f} GB) ...")
    codes2 = jnp.zeros((N2, W2), jnp.int8)
    for i in range(-(-N2 // CH)):
        codes2 = _fill(codes2, jax.random.PRNGKey(i), jnp.int32(i * CH))
    jax.block_until_ready(codes2)
    scales2 = jnp.full((N2,), 0.01, jnp.float32)
    norms2 = jnp.full((N2,), 1.0, jnp.float32)
    valid2 = jnp.ones((N2,), bool)
    cents2 = jax.random.normal(jax.random.PRNGKey(1), (K2, W2),
                               jnp.float32) * 0.1
    # Per-DISPATCH methodology: n separate async program dispatches with
    # one readback at the end — the real serving pattern.  (A lax.map
    # T-slope lets XLA keep the routing table VMEM-resident across loop
    # iterations, deflating the marginal cost ~25x below what any fresh
    # dispatch pays.)
    qs2 = [jax.random.normal(jax.random.PRNGKey(100 + i), (8, W2),
                             jnp.float32) for i in range(32)]
    nt2 = ft.n_tiles_for(N2, N2)
    cr2 = jax.device_put(np.asarray(cents2, np.float32)).astype(jnp.bfloat16)
    jax.block_until_ready(cr2)

    def probe_call(qq):
        return multiprobe_topk(codes2, scales2, norms2, valid2, cents2, qq,
                               metric="cosine", k=k, nprobe=64,
                               cell_cap=cap2, centroids_route=cr2)

    def brute_call(qq):
        return ft.fused_topk(codes2, scales2, norms2, valid2, qq,
                             metric="cosine", k=k, n_tiles=nt2)

    def pipe(call, n):
        outs = [call(qs2[i % 32]) for i in range(n)]
        float(outs[-1][0][0, 0])

    def per_dispatch(call):
        pipe(call, 2); pipe(call, 2)           # warm compile
        ts = {}
        for n in (4, 32):
            samples = []
            for _ in range(3):
                t0 = time.perf_counter()
                pipe(call, n)
                samples.append(time.perf_counter() - t0)
            ts[n] = float(np.median(samples))
        return max((ts[32] - ts[4]) / 28.0, 1e-6)

    big_probe_ms = per_dispatch(probe_call) * 1e3
    big_brute_ms = per_dispatch(brute_call) * 1e3
    speedup_big = big_brute_ms / big_probe_ms
    log(f"[config9] {N2/1e6:.1f}M x {W2} per-dispatch (pipelined separate "
        f"programs): brute={big_brute_ms:.2f} ms  "
        f"multiprobe(64)={big_probe_ms:.2f} ms  speedup={speedup_big:.1f}x")

    return {
        "metric": f"sub-linear multiprobe speedup, per-dispatch latency "
                  f"({N2/1e6:.1f}M x {W2} int8 cells, nprobe=64, pipelined "
                  f"separate programs)",
        "value": round(speedup_big, 2),
        "unit": "x",
        "vs_baseline": round(speedup_big, 2),
        "big_brute_ms": round(big_brute_ms, 3),
        "big_multiprobe_ms": round(big_probe_ms, 3),
        "big_n": N2,
        "int4r_device_latency_brute_ms": round(dev_brute * 1e3, 3),
        "int4r_device_latency_multiprobe_ms": round(dev_probe * 1e3, 3),
        "int4r_speedup": round(dev_brute / dev_probe, 2),
        "e2e_latency_brute_ms": round(lat_brute * 1e3, 2),
        "e2e_latency_multiprobe_ms": round(lat_probe * 1e3, 2),
        "e2e_submit_ms_brute": round(sub_b * 1e3, 3),
        "e2e_submit_ms_multiprobe": round(sub_p * 1e3, 3),
        "rtt_floor_ms": round(rtt_ms, 2),
        # builder-controlled overhead: everything the framework adds on
        # top of the device kernel and the rig's unavoidable link RTT
        "host_overhead_ms_brute": round(
            lat_brute * 1e3 - rtt_ms - dev_brute * 1e3, 2),
        "host_overhead_ms_multiprobe": round(
            lat_probe * 1e3 - rtt_ms - dev_probe * 1e3, 2),
        "recall_at_nprobe": {str(p): round(r, 4) for p, r in recalls.items()},
        "qps16_brute": round(qps16_brute, 1),
        "qps16_multiprobe": round(qps16_probe, 1),
        "n": n,
    }


def _manifold_gen(key, d, n_centers=4096, latent=48, noise=0.35):
    """Chunked on-device generator for an embedding-like corpus: clustered
    points near a ``latent``-dimensional manifold embedded in R^d (the
    make_corpus intrinsic_dim construction, streamed).  Isolated tight
    island mixtures at full 768-d are NOT representative — they have no
    smooth density for cells to tile (a 1M probe run measured 30% of rows
    unplaceable and flat recall on such a corpus) and real embedding
    spaces are manifold-like."""
    import functools

    import jax
    import jax.numpy as jnp

    kc, kp = jax.random.split(key)
    centers = jax.random.normal(kc, (n_centers, latent), jnp.float32)
    proj = (jax.random.normal(kp, (latent, d), jnp.float32)
            / jnp.sqrt(float(latent)))

    @functools.partial(jax.jit, static_argnames=("c",))
    def gen_chunk(k2, centers, c):
        ka, kn, km = jax.random.split(k2, 3)
        assign = jax.random.randint(ka, (c,), 0, n_centers)
        z = centers[assign] + noise * jax.random.normal(
            kn, (c, latent), jnp.float32)
        return (jnp.dot(z, proj)
                + 0.05 * jax.random.normal(km, (c, d), jnp.float32))

    return gen_chunk, centers


def bench_config10(quick: bool) -> dict:
    """Flagship-scale REAL streaming builds + recall-vs-nprobe (VERDICT r3
    #1-3): an 8M x 768 corpus generated on device chunk by chunk, exact
    f32 ground truth accumulated DURING generation, then

      phase A  int4r VectorStore.from_chunks (packed 4-bit residuals,
               anisotropic clip sweep): build rate, nprobe recall curve,
               exact-scan ceiling (the >= 0.90 int4r bar)
      phase B  CellProbeIndex.build_streaming (int8 residuals + SOAR
               spill): build rate, recall curve incl. the smallest nprobe
               >= 0.95, per-dispatch latency, speedup vs a brute int8
               flat-store scan of the same corpus

    Everything is built by the device-side engine (ops/cell_build.py) —
    no synthetic stores anywhere (round 2's 8M row was synthetic;
    VERDICT r2 weak #2).
    """
    import functools
    import gc

    import jax
    import jax.numpy as jnp
    from jax import lax

    from erlvectordb_tpu.core.cell_probe import CellProbeIndex
    from erlvectordb_tpu.core.store import VectorStore

    # n must be a MULTIPLE of ch: the chunk generator always yields full
    # chunks, and the ground-truth accumulator scans every generated row —
    # a ragged final chunk puts rows >= n into the GT that the store masks
    # invalid (23% phantom GT rows at 400k/131072 capped recall at ~0.76)
    n = 393_216 if quick else 8_388_608
    d, k, nq = 768, 10, 1024
    ch = 131_072 if quick else 262_144
    n_chunks = -(-n // ch)

    key = jax.random.PRNGKey(0)
    kq = key
    gen_chunk, centers = _manifold_gen(key, d)

    queries = np.asarray(gen_chunk(jax.random.fold_in(kq, 10**6), centers,
                                   nq))
    q_dev = jnp.asarray(queries)
    qn = q_dev / jnp.linalg.norm(q_dev, axis=1, keepdims=True)

    @jax.jit
    def gt_update(best_d, best_i, chunk, base):
        cn = jnp.linalg.norm(chunk, axis=1)
        sims = jnp.dot(qn, chunk.T, preferred_element_type=jnp.float32)
        sims = sims / jnp.maximum(cn[None, :], 1e-9)
        dd, ii = lax.top_k(sims, k)
        cd = jnp.concatenate([best_d, dd], axis=1)
        ci = jnp.concatenate([best_i, ii + base], axis=1)
        nd, sel = lax.top_k(cd, k)
        return nd, jnp.take_along_axis(ci, sel, axis=1)

    gt_box = [jnp.full((nq, k), -2.0, jnp.float32),
              jnp.full((nq, k), -1, jnp.int32)]

    def chunks(with_gt=False):
        for i in range(n_chunks):
            c = gen_chunk(jax.random.fold_in(kq, i), centers, ch)
            if with_gt:
                gt_box[0], gt_box[1] = gt_update(gt_box[0], gt_box[1], c,
                                                 i * ch)
            yield c

    build_kw = dict(n=n, dim=d, train_rows=262_144, kmeans_iters=6,
                    kmeans_init="random", refits=1, j=16)

    def recall_rows(rows, gt_rows):
        hit = 0
        for i in range(nq):
            hit += len(set(rows[i].tolist()) & set(gt_rows[i].tolist()))
        return hit / (nq * k)

    def per_dispatch(call, probe_q):
        def pipe(m):
            outs = [call(probe_q) for _ in range(m)]
            jnp.asarray(outs[-1][0]).block_until_ready()
            float(np.asarray(outs[-1][0]).ravel()[0])
        pipe(2); pipe(2)
        ts = {}
        for m in (4, 32):
            samples = []
            for _ in range(3):
                t0 = time.perf_counter()
                pipe(m)
                samples.append(time.perf_counter() - t0)
            ts[m] = float(np.median(samples))
        return max((ts[32] - ts[4]) / 28.0, 1e-6)

    # ---- phase A: int4r store ------------------------------------------
    log(f"[config10] building int4r store {n} x {d} (streaming, real)...")
    store = VectorStore.from_chunks(
        "flag10", chunks(with_gt=True), cell_rows=448, cell_cap=512,
        aniso_eta=4.0, **build_kw)
    gt_rows = np.asarray(gt_box[1])
    a_stats = store.build_stats
    log(f"[config10] int4r build: {a_stats}")

    int4r_curve = {}
    n_cells_a = int(store._centroids.shape[0])
    # the "ceiling" is a DEEP probe (512 cells): the quantization limit
    # of the int4 residual codes themselves, with full-precision f32
    # scoring of the decoded values — the curve plateaus two octaves
    # earlier, and nprobe in the tens of thousands crashes the remote
    # TPU compiler.  (The packed full-scan path is recorded separately
    # as packed_scan_recall: 0.9415 at 8M since the round-4 scaled-int
    # window keys + top-8/slice extraction — see BENCH_NOTES
    # "Packed-scan keys vs manifold corpora".)
    deep = min(n_cells_a, 512)
    for nprobe in sorted(set(
            p for p in (8, 16, 32, 64, 128, deep) if p <= n_cells_a)):
        t = store.search_batch_submit(queries, k=k, nprobe=nprobe)
        _, rows, _ = store.search_batch_complete_raw(t)
        r = round(recall_rows(rows, gt_rows), 4)
        int4r_curve[str(nprobe)] = r
    int4r_ceiling = int4r_curve[str(deep)]
    t = store.search_batch_submit(queries, k=k)
    _, rows, _ = store.search_batch_complete_raw(t)
    int4r_packed_scan = round(recall_rows(rows, gt_rows), 4)
    log(f"[config10] int4r recall curve {int4r_curve} "
        f"all-cell ceiling={int4r_ceiling} "
        f"packed-scan (approx keys)={int4r_packed_scan}")
    del store
    gc.collect()

    # warm rebuild: same shapes, programs already compiled — the build
    # rate a production host (persistent compile cache) sustains
    store = VectorStore.from_chunks(
        "flag10w", chunks(), cell_rows=448, cell_cap=512,
        aniso_eta=4.0, **build_kw)
    a_warm = store.build_stats
    log(f"[config10] int4r WARM build: {a_warm}")
    del store
    gc.collect()

    # ---- phase B: CellProbeIndex (int8 + spill) ------------------------
    log(f"[config10] building CellProbeIndex (int8 residual + spill)...")
    idx = CellProbeIndex.build_streaming(
        chunks(), cell_rows=416, cell_cap=512, spill_mult=1.3, **build_kw)
    b_stats = idx.build_stats
    log(f"[config10] cellprobe build: {b_stats}")

    cp_curve = {}
    cp_lat = {}
    min_nprobe_95 = None
    for nprobe in (8, 16, 32, 64, 128, 256):
        if nprobe > idx.n_cells:
            break
        _, rows = idx.search(queries, k=k, nprobe=nprobe)
        r = recall_rows(rows, gt_rows)
        cp_curve[str(nprobe)] = round(r, 4)
        if min_nprobe_95 is None and r >= 0.95:
            min_nprobe_95 = nprobe
    log(f"[config10] cellprobe recall curve {cp_curve} "
        f"min nprobe@0.95={min_nprobe_95}")

    # per-dispatch latency at the serving batch (bq=8) for key nprobes
    from erlvectordb_tpu.ops.cell_probe import multiprobe_topk

    bq = 8
    probe_q = jnp.asarray(queries[:bq])
    for nprobe in {32, 64, min_nprobe_95 or 128}:
        call = functools.partial(
            multiprobe_topk, idx.codes, idx.scales, idx.norms, idx.valid,
            idx.centroids, metric="cosine", k=2 * k, nprobe=int(nprobe),
            cell_cap=idx.cell_cap, centroids_route=idx.cents_route,
            cn2=idx.cn2)
        cp_lat[str(nprobe)] = round(
            per_dispatch(lambda q: call(q), probe_q) * 1e3, 3)
    log(f"[config10] cellprobe per-dispatch ms {cp_lat}")
    del idx, call           # the index (~8 GB at 8M x 768) must NOT stay
    gc.collect()            # resident while the brute store (~6.4 GB)
    #                         builds — `call` (a partial over idx.codes)
    #                         would keep it alive past the del

    # ---- brute comparator: int8 flat store over the same corpus --------
    from erlvectordb_tpu.ops import fused_topk as ft
    from erlvectordb_tpu.parallel import ShardedVectorStore, make_mesh
    from erlvectordb_tpu.parallel.sharded_store import _build_search

    mesh = make_mesh(n_data=1, n_replica=1)
    flat = ShardedVectorStore.from_chunks("flat10", mesh, chunks(), n=n,
                                          dim=d, dtype="int8")
    fused_nt = ft.n_tiles_for(max(flat._next_local), flat._cap)
    fn = _build_search(mesh, "cosine", 16, True, fused_nt)
    qpad = jnp.asarray(np.pad(queries[:bq],
                              ((0, 0), (0, flat._vectors.shape[2] - d))))
    brute_call = lambda q: fn(flat._vectors, flat._scales, flat._norms,
                              flat._valid, q)
    brute_ms = round(per_dispatch(brute_call, qpad) * 1e3, 3)
    probe_ms = cp_lat[str(min_nprobe_95 or 128)]
    log(f"[config10] brute per-dispatch {brute_ms} ms -> speedup at "
        f">=0.95 recall: {brute_ms / max(probe_ms, 1e-9):.1f}x")
    del flat, brute_call, qpad      # brute_call closes over flat's buffers
    gc.collect()

    # warm cellprobe rebuild (same shapes, compiled programs).
    # NB: no `idx = ...` rebind here without the del — the old ~8 GB index
    # would stay referenced while the new build stages (OOM at 8M x 768)
    idx = CellProbeIndex.build_streaming(
        chunks(), cell_rows=416, cell_cap=512, spill_mult=1.3, **build_kw)
    b_warm = idx.build_stats
    log(f"[config10] cellprobe WARM build: {b_warm}")

    return {
        "metric": f"real streaming cellprobe build rate ({n/1e6:.1f}M x "
                  f"{d}, device engine, warm programs)",
        "value": round(b_warm["vec_per_sec"] / 1e6, 3),
        "unit": "Mvec/s",
        "vs_baseline": round(b_warm["vec_per_sec"] / 1e6, 3),
        "n": n,
        "int4r_build_warm": a_warm,
        "cellprobe_build_warm": b_warm,
        "int4r_build": a_stats,
        "int4r_recall_at_nprobe": int4r_curve,
        "int4r_exact_ceiling": int4r_ceiling,
        "int4r_packed_scan_recall": int4r_packed_scan,
        "cellprobe_build": b_stats,
        "cellprobe_recall_at_nprobe": cp_curve,
        "cellprobe_min_nprobe_recall95": min_nprobe_95,
        "cellprobe_per_dispatch_ms": cp_lat,
        "brute_per_dispatch_ms": brute_ms,
        "speedup_at_recall95": round(brute_ms / max(probe_ms, 1e-9), 2),
    }


def bench_config11(quick: bool) -> dict:
    """Quantified EP (expert-parallel) story on ONE chip (VERDICT r3 #6).

    Measures one shard's REAL work at the per-device size a pod would hold
    (6.29M of a ~100M-row, 16-shard v5e-16 EP-cellprobe deployment, built
    by the device engine), then models the pod:

      * per-shard multiprobe per-dispatch ms at local nprobe 2..64 — in EP
        a query's global nprobe spreads across shards (cells are sharded,
        parallel/ep_cell_probe.py), so a global nprobe=64 over P=16 lands
        E[local] ~ 4 on each shard;
      * merge payload bytes + modeled all_gather cost over ICI
        (conservative 25 GB/s effective + 5 us latency per collective);
      * the same shard scanned BRUTE (int8 flat slice) — the replicated
        N-shard comparator — and the derived crossover corpus size where
        EP-cellprobe beats brute N-sharding (scan time scales linearly in
        slice rows; stated as a model).
    """
    import functools
    import gc

    import jax
    import jax.numpy as jnp

    from erlvectordb_tpu.core.cell_probe import CellProbeIndex
    from erlvectordb_tpu.ops import fused_topk as ft
    from erlvectordb_tpu.ops.cell_probe import multiprobe_topk
    from erlvectordb_tpu.parallel import ShardedVectorStore, make_mesh
    from erlvectordb_tpu.parallel.sharded_store import _build_search

    n = 393_216 if quick else 6_291_456      # one EP shard's rows
    d, k, bq = 768, 10, 8
    ch = 131_072 if quick else 262_144
    n_chunks = n // ch

    key = jax.random.PRNGKey(1)
    kq = key
    gen_chunk, centers = _manifold_gen(key, d)

    def chunks():
        for i in range(n_chunks):
            yield gen_chunk(jax.random.fold_in(kq, i), centers, ch)

    queries = np.asarray(gen_chunk(jax.random.fold_in(kq, 10**6), centers,
                                   bq))
    probe_q = jnp.asarray(queries)

    def per_dispatch(call):
        def pipe(m):
            outs = [call(probe_q) for _ in range(m)]
            float(np.asarray(outs[-1][0]).ravel()[0])
        pipe(2); pipe(2)
        ts = {}
        for m in (4, 32):
            samples = []
            for _ in range(3):
                t0 = time.perf_counter()
                pipe(m)
                samples.append(time.perf_counter() - t0)
            ts[m] = float(np.median(samples))
        return max((ts[32] - ts[4]) / 28.0, 1e-6)

    log(f"[config11] building EP shard index {n} x {d} (real, device "
        f"engine)...")
    idx = CellProbeIndex.build_streaming(
        chunks(), n=n, dim=d, cell_rows=448, cell_cap=512,
        train_rows=262_144, kmeans_iters=6, kmeans_init="random", refits=1)
    log(f"[config11] shard build: {idx.build_stats}")

    shard_ms = {}
    for nprobe in (2, 4, 8, 16, 32, 64):
        call = functools.partial(
            multiprobe_topk, idx.codes, idx.scales, idx.norms, idx.valid,
            idx.centroids, metric="cosine", k=k, nprobe=nprobe,
            cell_cap=idx.cell_cap, centroids_route=idx.cents_route,
            cn2=idx.cn2)
        shard_ms[str(nprobe)] = round(
            per_dispatch(lambda q: call(q)) * 1e3, 3)
    log(f"[config11] per-shard multiprobe per-dispatch ms: {shard_ms}")
    shard_stats = idx.build_stats
    del idx, call               # call (partial over idx.codes) keeps the
    gc.collect()                # ~5.5 GB shard index alive past the del

    # warm rebuild at shard shapes (VERDICT r3 #7): the cold number above
    # includes per-shape compiles; a pod host building P shards pays them
    # once, so the per-shard rate that matters is the warm one — directly
    # comparable to config 10's warm rate on the same engine
    idx = CellProbeIndex.build_streaming(
        chunks(), n=n, dim=d, cell_rows=448, cell_cap=512,
        train_rows=262_144, kmeans_iters=6, kmeans_init="random", refits=1)
    shard_warm = idx.build_stats
    log(f"[config11] shard WARM build: {shard_warm}")
    del idx
    gc.collect()

    # brute comparator: the same slice as an int8 flat store
    mesh = make_mesh(n_data=1, n_replica=1)
    flat = ShardedVectorStore.from_chunks("ep_flat", mesh, chunks(), n=n,
                                          dim=d, dtype="int8")
    fused_nt = ft.n_tiles_for(max(flat._next_local), flat._cap)
    fn = _build_search(mesh, "cosine", 16, True, fused_nt)
    qpad = jnp.asarray(np.pad(queries,
                              ((0, 0), (0, flat._vectors.shape[2] - d))))
    brute_ms = per_dispatch(
        lambda q: fn(flat._vectors, flat._scales, flat._norms,
                     flat._valid, q)) * 1e3
    log(f"[config11] brute slice scan per-dispatch: {brute_ms:.3f} ms")

    # ---- pod model ------------------------------------------------------
    ici_bw = 25e9           # conservative effective all_gather bandwidth
    ici_lat = 5e-6          # per-collective latency
    merge_bytes_per_shard = bq * k * 8        # dists f32 + rows i32
    pod = {}
    for p in (4, 16, 64):
        local = max(2, 64 // p)               # global nprobe 64 spread
        t_probe = shard_ms.get(str(local), shard_ms["2"]) / 1e3
        ag_bytes = merge_bytes_per_shard * (p - 1)
        t_merge = ag_bytes / ici_bw + ici_lat
        t_total = t_probe + t_merge
        pod[str(p)] = {
            "corpus_rows": p * n,
            "local_nprobe": local,
            "shard_ms": round(t_probe * 1e3, 3),
            "merge_modeled_ms": round(t_merge * 1e3, 4),
            "pod_qps_modeled": round(bq / t_total, 1),
        }
    # crossover vs brute N-sharding: scan time is linear in slice rows, so
    # EP wins once corpus/P exceeds rows where scan time == probe+merge
    t_ep16 = pod["16"]["shard_ms"] + pod["16"]["merge_modeled_ms"]
    crossover_rows_per_shard = int(n * t_ep16 / max(brute_ms, 1e-9))
    log(f"[config11] pod model {pod}; EP beats brute N-shard above "
        f"~{16 * crossover_rows_per_shard / 1e6:.1f}M rows at P=16")

    return {
        "metric": f"EP shard multiprobe per-dispatch, local nprobe=4 "
                  f"({n/1e6:.2f}M x {d} real shard, bq={bq})",
        "value": shard_ms["4"],
        "unit": "ms",
        "vs_baseline": None,
        "n_shard": n,
        "shard_build": shard_stats,
        "shard_build_warm": shard_warm,
        "per_shard_ms_at_nprobe": shard_ms,
        "brute_slice_ms": round(brute_ms, 3),
        "merge_bytes_per_shard": merge_bytes_per_shard,
        "pod_model": pod,
        "crossover_corpus_rows_p16": 16 * crossover_rows_per_shard,
    }


CONFIGS = {1: bench_config1, 2: bench_config2, 3: bench_config3,
           4: bench_config4, 5: bench_config5, 6: bench_config6,
           7: bench_config7, 8: bench_config8, 9: bench_config9,
           10: bench_config10, 11: bench_config11}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=3, choices=sorted(CONFIGS))
    ap.add_argument("--quick", action="store_true", help="shrunken sizes")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    # Persistent compilation cache: first-compile of the big scan programs
    # costs minutes via the remote compiler; cache them across runs.
    # (TPU only: CPU AOT entries are machine-feature-sensitive.)
    if not args.cpu:
        try:
            jax.config.update("jax_compilation_cache_dir", "/tmp/evdb_jax_cache")
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    _TIMING_LOG.clear()
    result = CONFIGS[args.config](args.quick)
    # bench hygiene (VERDICT r3 #10): every timed measurement's
    # min/median/max/spread rides the row, so regressions are separable
    # from tunnel congestion (spread >~ 1.5 means a noisy window)
    if _TIMING_LOG and isinstance(result, dict):
        result.setdefault("timing_dispersion", list(_TIMING_LOG))
        worst = max(t["spread"] for t in _TIMING_LOG)
        result.setdefault("worst_spread", worst)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
