"""Round-4 micro-bench: where do the flagship scan's 3.81 ms/batch go, and
which extraction variant buys the VERDICT-#2 2x (target: device-true >=
350k QPS on config-3 shapes at recall >= 0.95).

Variants (all config-3 shaped: N=1.2M pad, W=128, B=1024, int8 codes):

  mxu_floor   matmul only, minimal output — the MXU+HBM floor
  pos_now     current positive-packed kernel (ops/fused_topk.py)
  pos_scan    the pallas scan alone (no merge) — isolates merge cost
  nomul       pos kernel without the f32 affine (keys from raw f32 dots):
              upper bound for dropping the mul+add
  intkey      ranking on RAW int32 dots: key = (dots & ~1023) | lane —
              no astype, no mul, no add (needs shared-scale codes)
  intkey2048  intkey at 2048-lane slices (half the output, 1 more key bit)
  f32pref     preferred_element_type=f32 on the int8 matmul (skip astype?)
  merge_topk / merge_amk   pool selection cost: lax.top_k vs approx_max_k

Protocol (memory notes: tunnel congestion 2-3x, so同-window only): warm 2,
then 3 runs of T=16 pipelined dispatches ending in a tiny forced readback;
report min ms/dispatch.  Run everything in ONE process invocation.
"""

import functools
import sys
import time

import jax

jax.devices()  # init the axon backend BEFORE /root/repo shadows its config
sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 4096
SLICE = 1024
B = 1024
W = 128
N_TILES = 293                  # ceil(1.2e6 / 4096)
N = N_TILES * TILE_N
SUB = 4
BT = 256


def timed(name, fn, t=16, reps=3):
    try:
        fn(); fn()                                # warm (compile + cache)
    except Exception as e:  # noqa: BLE001 — variant may not compile
        print(f"{name:14s} FAILED: {type(e).__name__}: {str(e)[:120]}",
              flush=True)
        return np.inf
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(t):
            out = fn()
        np.asarray(jax.device_get(out.ravel()[:2]))   # forced tiny readback
        best = min(best, (time.perf_counter() - t0) / t)
    print(f"{name:14s} {best * 1e3:8.3f} ms/dispatch   "
          f"({B / best / 1e3:7.1f}k QPS)", flush=True)
    return best


# ---------------------------------------------------------------- kernels


def mk_mxu_floor(sub):
    def kern(q_ref, codes_ref, out_ref):
        q = q_ref[:]
        for tt in range(sub):
            sl = slice(tt * TILE_N, (tt + 1) * TILE_N)
            d = lax.dot_general(q, codes_ref[sl, :], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
            # cheapest legal consumption: one strided slice per tile
            out_ref[0, :, tt * 4:(tt + 1) * 4] = d[:, :4]
    return kern


def mk_pos(sub, *, affine=True, lane_mask=SLICE - 1, intkey=False,
           f32pref=False):
    s_per_tile = TILE_N // (lane_mask + 1)

    def kern(q_ref, m_ref, b_ref, codes_ref, out_ref):
        q = q_ref[:]
        lane = None
        for tt in range(sub):
            sl = slice(tt * TILE_N, (tt + 1) * TILE_N)
            if intkey:
                dots = lax.dot_general(
                    q, codes_ref[sl, :], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                si = dots
            else:
                dots = lax.dot_general(
                    q, codes_ref[sl, :], (((1,), (1,)), ((), ())),
                    preferred_element_type=(jnp.float32 if f32pref
                                            else jnp.int32))
                if not f32pref:
                    dots = dots.astype(jnp.float32)
                s = dots * m_ref[:, sl] + b_ref[:, sl] if affine else dots
                si = lax.bitcast_convert_type(s, jnp.int32)
            if lane is None:
                lane = (lax.broadcasted_iota(jnp.int32, si.shape, 1)
                        & lane_mask)
            key = (si & jnp.int32(~lane_mask)) | lane
            for sx in range(sub * 0 + s_per_tile):
                ssl = slice(sx * (lane_mask + 1), (sx + 1) * (lane_mask + 1))
                out_ref[0, :, tt * s_per_tile + sx] = jnp.max(
                    key[:, ssl], axis=1)
    return kern


def run_scan(kern, n_out_per_tile, codes, q, m, b, with_affine=True):
    n_big = N_TILES // SUB + (1 if N_TILES % SUB else 0)
    big_n = SUB * TILE_N
    spt = SUB * n_out_per_tile
    in_specs = [pl.BlockSpec((BT, W), lambda j, i: (i, 0),
                             memory_space=pltpu.VMEM)]
    ops = [q]
    if with_affine:
        in_specs += [
            pl.BlockSpec((1, big_n), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, big_n), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ]
        ops += [m, b]
    in_specs += [pl.BlockSpec((big_n, W), lambda j, i: (j, 0),
                              memory_space=pltpu.VMEM)]
    ops += [codes]
    return pl.pallas_call(
        kern,
        grid=(n_big, B // BT),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, BT, spt), lambda j, i: (j, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_big, B, spt), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * W * n_big * big_n,
            bytes_accessed=n_big * big_n * W + B * W + B * n_big * spt * 4,
            transcendentals=0),
    )(*ops)


def main():
    assert jax.default_backend() == "tpu", jax.devices()
    from erlvectordb_tpu.utils.hbm import prime_hbm
    prime_hbm(N * W * 2)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    codes = jax.random.randint(key, (N, W), -127, 128, jnp.int8)
    q = jax.random.randint(jax.random.fold_in(key, 1), (B, W), -127, 128,
                           jnp.int8)
    m = jnp.asarray(rng.uniform(0.5, 1.0, (1, N)).astype(np.float32))
    b = jnp.full((1, N), 1000.0, jnp.float32)
    jax.block_until_ready((codes, q, m, b))

    n_big = -(-N_TILES // SUB)
    spt1024 = SUB * (TILE_N // SLICE)

    floor_k = jax.jit(lambda c, qq: run_scan(
        mk_mxu_floor(SUB), 4, c, qq, None, None, with_affine=False))
    timed("mxu_floor", lambda: floor_k(codes, q))

    posnow = jax.jit(lambda c, qq, mm, bb: run_scan(
        mk_pos(SUB), TILE_N // SLICE, c, qq, mm, bb))
    timed("pos_scan", lambda: posnow(codes, q, m, b))

    nomul = jax.jit(lambda c, qq, mm, bb: run_scan(
        mk_pos(SUB, affine=False), TILE_N // SLICE, c, qq, mm, bb))
    timed("nomul", lambda: nomul(codes, q, m, b))

    intk = jax.jit(lambda c, qq, mm, bb: run_scan(
        mk_pos(SUB, intkey=True), TILE_N // SLICE, c, qq, mm, bb))
    timed("intkey", lambda: intk(codes, q, m, b))

    intk2 = jax.jit(lambda c, qq, mm, bb: run_scan(
        mk_pos(SUB, intkey=True, lane_mask=2047), TILE_N // 2048,
        c, qq, mm, bb))
    timed("intkey2048", lambda: intk2(codes, q, m, b))

    # (f32pref dropped: Mosaic rejects f32 accumulation on an int8 matmul —
    # "float acc with int lhs"; the astype after the int32 matmul stays)

    # ---- merge cost on [B, n_slices] keys --------------------------------
    keys = jax.random.randint(jax.random.fold_in(key, 2),
                              (B, n_big * spt1024), 0, 1 << 30, jnp.int32)
    jax.block_until_ready(keys)

    @jax.jit
    def merge_topk(kk):
        tk, sel = lax.top_k(kk, 64)
        return sel

    @jax.jit
    def merge_amk(kk):
        tk, sel = lax.approx_max_k(kk.astype(jnp.float32), 64)
        return sel

    timed("merge_topk", lambda: merge_topk(keys))
    timed("merge_amk", lambda: merge_amk(keys))

    # ---- full current path for reference ---------------------------------
    from erlvectordb_tpu.ops.fused_topk import fused_topk
    scales = jnp.ones((N,), jnp.float32)
    norms = jnp.full((N,), 10.0, jnp.float32)
    valid = jnp.ones((N,), bool)
    qf = q.astype(jnp.float32)
    jax.block_until_ready((scales, norms, valid, qf))
    full = jax.jit(functools.partial(fused_topk, metric="cosine", k=10,
                                     n_tiles=N_TILES))
    timed("full_fusedtk", lambda: full(codes, scales, norms, valid, qf)[0])


if __name__ == "__main__":
    main()
