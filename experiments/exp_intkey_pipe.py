"""Round-4: can the intkey extraction (3 VPU ops/element, ~0.85 ms at
config-3 shapes) overlap the MXU dots instead of adding serially?

Same-window evidence (exp_pos_kernel2): floor bt=256 sub=8 = 2.10 ms,
intkey = 2.94 ms at any sub — exactly additive, i.e. Mosaic stalls the
next sub-tile's dot on the previous extraction.  Variants:

  intkey      today's body: per sub-tile dot -> extract (baseline)
  shiftkey    (d << 10) | lane instead of (d & ~1023) | lane — same op
              count but keeps FULL dot precision in the key (the dot is
              bounded by |q8|_2 * 127 < 2^18, so the shift cannot wrap)
  pipe        software-pipelined body: sub-tile t's extraction issued
              after sub-tile t+1's dot (one tile of latency between the
              MXU result and its VPU consumer)
  allthen     all sub dots first, then all extractions
  sub16       sub=16 floor + intkey (fewer grid steps; codes tile 8 MB)
"""

import sys
import time

import jax

jax.devices()
sys.path.insert(0, "/root/repo")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

TILE_N = 4096
SLICE = 1024
B = 1024
W = 128
N_TILES = 293
N = N_TILES * TILE_N


def timed(name, fn, t=16, reps=3):
    try:
        fn(); fn()
    except Exception as e:  # noqa: BLE001
        print(f"{name:22s} FAILED: {type(e).__name__}: {str(e)[:120]}",
              flush=True)
        return np.inf
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(t):
            out = fn()
        np.asarray(jax.device_get(out.ravel()[:2]))
        best = min(best, (time.perf_counter() - t0) / t)
    print(f"{name:22s} {best * 1e3:8.3f} ms  ({B / best / 1e3:7.1f}k QPS)",
          flush=True)
    return best


def mk(sub, mode):
    s_per_tile = TILE_N // SLICE

    def dot_tile(q, codes_ref, t):
        sl = slice(t * TILE_N, (t + 1) * TILE_N)
        return lax.dot_general(q, codes_ref[sl, :], (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.int32)

    def extract(d, lane, out_ref, t, shift):
        if shift:
            kk = (d << 10) | lane
        else:
            kk = (d & jnp.int32(~(SLICE - 1))) | lane
        for sx in range(s_per_tile):
            ssl = slice(sx * SLICE, (sx + 1) * SLICE)
            out_ref[0, :, t * s_per_tile + sx] = jnp.max(kk[:, ssl], axis=1)

    def kern(q_ref, codes_ref, out_ref):
        q = q_ref[:]
        lane = None
        if mode in ("intkey", "shiftkey", "floor"):
            for t in range(sub):
                d = dot_tile(q, codes_ref, t)
                if mode == "floor":
                    out_ref[0, :, t * 4:(t + 1) * 4] = d[:, :4]
                    continue
                if lane is None:
                    lane = (lax.broadcasted_iota(jnp.int32, d.shape, 1)
                            & (SLICE - 1))
                extract(d, lane, out_ref, t, mode == "shiftkey")
        elif mode == "pipe":
            d_prev = dot_tile(q, codes_ref, 0)
            lane = (lax.broadcasted_iota(jnp.int32, d_prev.shape, 1)
                    & (SLICE - 1))
            for t in range(sub - 1):
                d_next = dot_tile(q, codes_ref, t + 1)
                extract(d_prev, lane, out_ref, t, True)
                d_prev = d_next
            extract(d_prev, lane, out_ref, sub - 1, True)
        elif mode == "allthen":
            ds = [dot_tile(q, codes_ref, t) for t in range(sub)]
            lane = (lax.broadcasted_iota(jnp.int32, ds[0].shape, 1)
                    & (SLICE - 1))
            for t in range(sub):
                extract(ds[t], lane, out_ref, t, True)
    return kern


def run(codes, q, bt, sub, mode):
    n_big = -(-N_TILES // sub)
    big_n = sub * TILE_N
    spt = sub * (4 if mode == "floor" else TILE_N // SLICE)
    return pl.pallas_call(
        mk(sub, mode),
        grid=(n_big, B // bt),
        in_specs=[
            pl.BlockSpec((bt, W), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((big_n, W), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bt, spt), lambda j, i: (j, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_big, B, spt), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * W * n_big * big_n,
            bytes_accessed=n_big * big_n * W + B * W + B * n_big * spt * 4,
            transcendentals=0),
    )(q, codes)


def main():
    assert jax.default_backend() == "tpu"
    from erlvectordb_tpu.utils.hbm import prime_hbm
    prime_hbm(N * W * 2)
    key = jax.random.PRNGKey(0)
    codes = jax.random.randint(key, (N, W), -127, 128, jnp.int8)
    q = jax.random.randint(jax.random.fold_in(key, 1), (B, W), -127, 128,
                           jnp.int8)
    jax.block_until_ready((codes, q))

    for mode, subs in (("floor", (8, 16)), ("intkey", (4,)),
                       ("shiftkey", (4, 8)), ("pipe", (4, 8, 16)),
                       ("allthen", (4, 8))):
        for sub in subs:
            f = jax.jit(lambda c, qq, sub=sub, mode=mode: run(
                c, qq, 256, sub, mode))
            timed(f"{mode} sub={sub}", lambda: f(codes, q))

    # correctness: pipe == shiftkey == reference argmax per slice
    ref_d = jnp.dot(q[:64].astype(jnp.int32),
                    codes[:TILE_N * 4].T.astype(jnp.int32))
    ref = (jnp.max(ref_d.reshape(64, 16, SLICE), axis=2) << 10) | \
        jnp.argmax(ref_d.reshape(64, 16, SLICE), axis=2).astype(jnp.int32)
    got = run(codes, q, 256, 4, "pipe")[0, :64, :16]
    print("pipe key parity:",
          bool(jnp.all(got == ref)), flush=True)


if __name__ == "__main__":
    main()
