"""Round-4: the pool-rescore row gather is the flagship path's last big
cost (~1.2 ms at pool=64, descriptor-bound).  Measure, fused behind the
intkey scan so the dispatch floor cancels:

  pool scaling    codes[top_rows] at pool 16/32/64/128
  aux gathers     + rowmult/rowbias scalar gathers (separate vs packed
                  [N, 2] plane vs NONE — unit codes need none)
  full paths      select+gather+exact rescore+top-k at pool 32/64
"""

import sys
import time

import jax

jax.devices()
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

from exp_pos_kernel2 import B, N, W, run, timed  # noqa: E402

SLICE = 1024


def main():
    assert jax.default_backend() == "tpu"
    from erlvectordb_tpu.utils.hbm import prime_hbm
    prime_hbm(N * W * 2)
    key = jax.random.PRNGKey(0)
    codes = jax.random.randint(key, (N, W), -127, 128, jnp.int8)
    q = jax.random.randint(jax.random.fold_in(key, 1), (B, W), -127, 128,
                           jnp.int8)
    mult = jax.random.uniform(jax.random.fold_in(key, 2), (N,), jnp.float32)
    bias = jnp.zeros((N,), jnp.float32)
    aux2 = jnp.stack([mult, bias], axis=1)      # packed [N, 2]
    jax.block_until_ready((codes, q, mult, aux2))

    def scan_sel(c, qq, pool):
        out = run(c, qq, 256, 4, "intkey")
        keys = out.transpose(1, 0, 2).reshape(B, -1)
        tk, sel = lax.top_k(keys, pool)
        rows = sel * SLICE + (tk & jnp.int32(SLICE - 1))
        return rows

    for pool in (16, 32, 64, 128):
        f = jax.jit(lambda c, qq, pool=pool:
                    c[scan_sel(c, qq, pool)][:, :, :8])
        timed(f"gather p={pool}", lambda: f(codes, q))

    def with_aux(c, qq, mode):
        rows = scan_sel(c, qq, 64)
        cand = c[rows]
        dots = jnp.einsum("bkw,bw->bk", cand, qq,
                          preferred_element_type=jnp.int32).astype(
                              jnp.float32)
        if mode == "sep":
            ex = dots * mult[rows] + bias[rows]
        elif mode == "packed":
            a = aux2[rows]                       # [B, 64, 2] one gather
            ex = dots * a[:, :, 0] + a[:, :, 1]
        else:
            ex = dots * (1.0 / 127.0)
        v, s2 = lax.top_k(ex, 10)
        return jnp.take_along_axis(rows, s2, axis=1)

    for mode in ("none", "packed", "sep"):
        f = jax.jit(lambda c, qq, mode=mode: with_aux(c, qq, mode))
        timed(f"full64 aux={mode}", lambda: f(codes, q))

    f32 = jax.jit(lambda c, qq: with_aux(c, qq, "none"))
    # pool-32 full path
    def full32(c, qq):
        rows = scan_sel(c, qq, 32)
        cand = c[rows]
        dots = jnp.einsum("bkw,bw->bk", cand, qq,
                          preferred_element_type=jnp.int32).astype(
                              jnp.float32)
        v, s2 = lax.top_k(dots, 10)
        return jnp.take_along_axis(rows, s2, axis=1)
    timed("full32 aux=none", lambda: jax.jit(full32)(codes, q))


if __name__ == "__main__":
    main()
