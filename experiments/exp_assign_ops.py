"""Round-4 micro-bench: per-op costs of the capacity-assign round at 8.4M
rows / 18.75k cells (config-10 shapes), plus the candidate fused designs.

Round body today (cell_build._make_round_body):
    key-pack -> sort(key, rows) -> searchsorted(starts) -> cutoff-gather
    -> compare -> owner scatter -> segment_sum(fill)

Candidate "marker" design: K synthetic marker entries (dq=0) carry each
cell's cutoff through the SORT itself; a cummax propagates the latest
marker's cutoff position down the sorted array, so acceptance is a pure
compare — no [K]-table gather, no segment_sum (fill via the K+1-value
searchsorted on the packed keys).

Measures (same-window, min of 3 x T=8 pipelined dispatches):
    sort1/sort2     sort with 1 / 2 payloads
    searchsorted    K+1 boundary values into the sorted [N] keys
    gatherK         [N] gather from a [K+1] table (the cutoff gather)
    scatter_i32     [N] int32 owner scatter
    segsum          [N] -> [K+1] segment_sum (the fill update)
    cummax          [N] int32 cumulative max
    round_now       the current full round body, jitted standalone
    round_marker    the marker-based fused round body
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

N = 8_388_608          # 2^23 ~ the 8.4M config-10 corpus
K = 18_750
CAP = 512


def timed(name, fn, t=8, reps=3):
    fn(); fn()
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(t):
            out = fn()
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[:2]))
        best = min(best, (time.perf_counter() - t0) / t)
    print(f"{name:14s} {best * 1e3:8.2f} ms", flush=True)
    return best


def main():
    assert jax.default_backend() == "tpu"
    import sys
    sys.path.insert(0, "/root/repo")
    from erlvectordb_tpu.utils.hbm import prime_hbm
    prime_hbm(N * 16)

    key = jax.random.PRNGKey(0)
    cells = jax.random.randint(key, (N,), 0, K, jnp.int32)
    dq = jax.random.randint(jax.random.fold_in(key, 1), (N,), 1, 65535,
                            jnp.int32)
    rows_idx = jnp.arange(N, dtype=jnp.int32)
    packed = cells * 65536 + dq
    fill = jnp.zeros((K,), jnp.int32)
    rem0 = jnp.full((K,), CAP, jnp.int32)
    owner = jnp.full((N,), -1, jnp.int32)
    jax.block_until_ready((packed, fill, owner))

    sort1 = jax.jit(lambda k_, r: lax.sort((k_, r), num_keys=1))
    timed("sort1", lambda: sort1(packed, rows_idx))

    aux = jnp.zeros((N,), jnp.int32)
    sort2 = jax.jit(lambda k_, r, a: lax.sort((k_, r, a), num_keys=1))
    timed("sort2", lambda: sort2(packed, rows_idx, aux))

    skey, sr = jax.block_until_ready(sort1(packed, rows_idx))
    sc = jax.block_until_ready(skey >> 16)

    ss = jax.jit(lambda s: jnp.searchsorted(
        s, jnp.arange(K + 1, dtype=jnp.int32)))
    timed("searchsorted", lambda: ss(sc))

    table = jnp.arange(K + 1, dtype=jnp.int32)
    gk = jax.jit(lambda s, t: t[jnp.clip(s, 0, K)])
    timed("gatherK", lambda: gk(sc, table))

    acc = jax.block_until_ready(dq < 30000)
    sct = jax.jit(lambda o, a, r, c: o.at[jnp.where(a, r, N)].set(
        jnp.where(a, c, 0), mode="drop"))
    timed("scatter_i32", lambda: sct(jnp.full((N,), -1, jnp.int32),
                                     acc, sr, sc))

    seg = jax.jit(lambda a, s: jax.ops.segment_sum(
        a.astype(jnp.int32), jnp.clip(s, 0, K), num_segments=K + 1))
    timed("segsum", lambda: seg(acc, sc))

    cm = jax.jit(lambda v: lax.cummax(v))
    vv = jnp.where(acc, rows_idx, -1)
    jax.block_until_ready(vv)
    timed("cummax", lambda: cm(vv))

    # ---- full round bodies -------------------------------------------------
    @jax.jit
    def round_now(cell, d, own, fl):
        act = own < 0
        c = jnp.where(act, cell, K)
        dqq = jnp.where(act, d, 65535)
        kk = c * 65536 + dqq
        sk, srr = lax.sort((kk, rows_idx), num_keys=1)
        scc = sk >> 16
        starts = jnp.searchsorted(scc, jnp.arange(K + 1, dtype=jnp.int32))
        rem = jnp.append(jnp.maximum(CAP - fl, 0), 0)
        cutoff = starts[:K + 1] + rem
        acc_s = (scc < K) & (rows_idx < cutoff[jnp.clip(scc, 0, K)])
        own = own.at[jnp.where(acc_s, srr, N)].set(
            jnp.where(acc_s, scc, 0), mode="drop")
        fl = fl + jax.ops.segment_sum(
            acc_s.astype(jnp.int32), jnp.clip(scc, 0, K),
            num_segments=K + 1)[:K]
        return own, fl

    timed("round_now", lambda: round_now(cells, dq, owner, fill))

    nm = N + K
    rows_m = jnp.arange(nm, dtype=jnp.int32)

    @jax.jit
    def round_marker(cell, d, own, fl):
        """Marker design: K marker entries (dq=0) ride the sort; the
        LATEST preceding marker's position comes from a monotone cummax;
        its rem comes from a [K]-table gather (gatherK measures whether
        that is cheap); fill comes from the marker-boundary diff — no
        searchsorted, no segment_sum."""
        act = own < 0
        c = jnp.where(act, cell, K)
        dqq = jnp.where(act, d, 65535)
        rem = jnp.maximum(CAP - fl, 0)
        # K+1 markers: one per cell plus a sentinel for the inactive bin
        # (cell K), so members[K-1] is not polluted by inactive rows
        kk = jnp.concatenate([c * 65536 + dqq,
                              jnp.arange(K + 1, dtype=jnp.int32) * 65536])
        pay = jnp.concatenate([rows_idx, jnp.full((K + 1,), -1, jnp.int32)])
        sk, srr = lax.sort((kk, pay), num_keys=1)
        rm = jnp.arange(N + K + 1, dtype=jnp.int32)
        is_m = srr < 0
        # nearest PRECEDING marker position (monotone -> cummax is exact)
        p_latest = lax.cummax(jnp.where(is_m, rm, -1))
        rank = rm - p_latest - 1
        scc = sk >> 16
        remg = rem[jnp.clip(scc, 0, K - 1)]
        acc_s = (~is_m) & (scc < K) & (rank < remg)
        own = own.at[jnp.where(acc_s, srr, N)].set(
            jnp.where(acc_s, scc, 0), mode="drop")
        # fill: marker positions ARE the cell starts; one [K+1]-output
        # scatter extracts them (no searchsorted, no segment_sum)
        starts = jnp.zeros((K + 1,), jnp.int32).at[
            jnp.where(is_m, jnp.clip(scc, 0, K), K + 1)].set(
                rm, mode="drop")
        members = jnp.diff(starts) - 1
        fl = fl + jnp.minimum(jnp.maximum(members, 0), rem)
        return own, fl

    timed("round_marker", lambda: round_marker(cells, dq, owner, fill))

    # correctness cross-check vs the current body, with UNEVEN fills so
    # varying rem is exercised
    fill_u = jax.random.randint(jax.random.fold_in(key, 3), (K,), 0, CAP,
                                jnp.int32)
    jax.block_until_ready(fill_u)
    o1, f1 = jax.block_until_ready(round_now(cells, dq, owner, fill_u))
    o2, f2 = jax.block_until_ready(round_marker(cells, dq, owner, fill_u))
    same_o = bool(jnp.all(o1 == o2))
    same_f = bool(jnp.all(f1 == f2))
    print(f"parity: owner={same_o} fill={same_f}", flush=True)


if __name__ == "__main__":
    main()
