"""Round-4: merge variants measured FUSED with the intkey scan in one
program (standalone dispatches bottom out at the ~1.6 ms dispatch floor,
hiding the real compute).  scan-only baseline vs scan+merge variants.

Variants (keys [B, S=1184] int32 positive from the scan):
  none        scan only
  topk        lax.top_k(keys, 64)            (today's pool selection)
  amk         approx_max_k(bitcast f32, 64, recall_target=0.9)
  g4top1      per-4-slice max/argmax -> top_k over S/4
  g4top2      per-4-slice top-2      -> top_k over S/2
  full        g4top2 + candidate gather + exact int8 rescore + top-k
              (the complete replacement merge)
"""

import sys
import time

import jax

jax.devices()
sys.path.insert(0, "/root/repo")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

sys.path.insert(0, "/root/repo/experiments")
from exp_pos_kernel2 import B, N, N_TILES, W, run, timed  # noqa: E402

POOL = 64
SLICE = 1024


def main():
    assert jax.default_backend() == "tpu"
    from erlvectordb_tpu.utils.hbm import prime_hbm
    prime_hbm(N * W * 2)
    key = jax.random.PRNGKey(0)
    codes = jax.random.randint(key, (N, W), -127, 128, jnp.int8)
    q = jax.random.randint(jax.random.fold_in(key, 1), (B, W), -127, 128,
                           jnp.int8)
    jax.block_until_ready((codes, q))

    def scan_keys(c, qq):
        out = run(c, qq, 256, 4, "intkey")      # [n_big, B, spt]
        return out.transpose(1, 0, 2).reshape(B, -1)

    def merge_none(keys, c, qq):
        return keys[:, :8]

    def merge_topk(keys, c, qq):
        tk, sel = lax.top_k(keys, POOL)
        return sel

    def merge_amk(keys, c, qq):
        f = lax.bitcast_convert_type(keys, jnp.float32)
        tk, sel = lax.approx_max_k(f, POOL, recall_target=0.9)
        return sel

    def g4(keys, top2):
        s = keys.shape[1]
        g = 4
        k3 = keys.reshape(B, s // g, g)
        m1 = jnp.max(k3, axis=2)
        a1 = jnp.argmax(k3, axis=2).astype(jnp.int32)
        cols = [m1]
        acols = [a1]
        if top2:
            iot = lax.broadcasted_iota(jnp.int32, k3.shape, 2)
            k3b = jnp.where(iot == a1[:, :, None], jnp.int32(-2**31), k3)
            m2 = jnp.max(k3b, axis=2)
            a2 = jnp.argmax(k3b, axis=2).astype(jnp.int32)
            cols.append(m2)
            acols.append(a2)
        mm = jnp.concatenate(cols, axis=1)
        aa = jnp.concatenate(acols, axis=1)
        return mm, aa, g

    def merge_g4top1(keys, c, qq):
        mm, aa, g = g4(keys, False)
        tk, sel = lax.top_k(mm, POOL)
        return sel

    def merge_g4top2(keys, c, qq):
        mm, aa, g = g4(keys, True)
        tk, sel = lax.top_k(mm, POOL)
        return sel

    def merge_full(keys, c, qq):
        s = keys.shape[1]
        mm, aa, g = g4(keys, True)
        tk, sel = lax.top_k(mm, POOL)
        grp = sel % (s // g)
        lane_in_g = jnp.take_along_axis(aa, sel, axis=1)
        slc = grp * g + lane_in_g                    # slice index
        rows = slc * SLICE + (tk & jnp.int32(SLICE - 1))
        cand = c[rows]                               # [B, POOL, W]
        dots = jnp.einsum("bkw,bw->bk", cand, qq,
                          preferred_element_type=jnp.int32).astype(
                              jnp.float32)
        ex, sel2 = lax.top_k(dots, 10)
        return jnp.take_along_axis(rows, sel2, axis=1)

    for name, mfn in (("none", merge_none), ("topk", merge_topk),
                      ("amk", merge_amk), ("g4top1", merge_g4top1),
                      ("g4top2", merge_g4top2), ("full", merge_full)):
        f = jax.jit(lambda c, qq, mfn=mfn: mfn(scan_keys(c, qq), c, qq))
        timed(f"scan+{name}", lambda: f(codes, q))


if __name__ == "__main__":
    main()
