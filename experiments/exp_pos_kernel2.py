"""Round-4 micro-bench #2: (bt, sub) sweep for the MXU floor and the
intkey extraction — the floor measured 42% MFU at (bt=256, sub=4); if a
taller query tile or deeper sub amortization lifts it, the intkey total
(2.63 ms this window) follows.

VMEM guardrails: dots [bt, TILE_N] i32 + key buffer ~ 2 * bt * 16 KB;
codes tile sub * 512 KB.  (512, 4) would blow 16 MB -> skipped.
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
        print(f"{name:22s} FAILED: {type(e).__name__}: {str(e)[:90]}",
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

    def kern(q_ref, codes_ref, out_ref):
        q = q_ref[:]
        lane = None
        for tt in range(sub):
            sl = slice(tt * TILE_N, (tt + 1) * TILE_N)
            d = lax.dot_general(q, codes_ref[sl, :], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
            if mode == "floor":
                out_ref[0, :, tt * 4:(tt + 1) * 4] = d[:, :4]
                continue
            if lane is None:
                lane = (lax.broadcasted_iota(jnp.int32, d.shape, 1)
                        & (SLICE - 1))
            kk = (d & jnp.int32(~(SLICE - 1))) | lane
            for sx in range(s_per_tile):
                ssl = slice(sx * SLICE, (sx + 1) * SLICE)
                out_ref[0, :, tt * s_per_tile + sx] = jnp.max(
                    kk[:, ssl], axis=1)
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

    for mode in ("floor", "intkey"):
        for bt, sub in ((256, 4), (256, 8), (512, 1), (512, 2), (128, 8),
                        (1024, 1)):
            f = jax.jit(lambda c, qq, bt=bt, sub=sub, mode=mode: run(
                c, qq, bt, sub, mode))
            timed(f"{mode} bt={bt} sub={sub}", lambda: f(codes, q))


if __name__ == "__main__":
    main()
