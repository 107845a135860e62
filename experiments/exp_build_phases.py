"""Round-4: current cellprobe build baseline on BOTH corpus geometries
(manifold = bench config 10; iid-gaussian = the adversarial contention
case), warm, with EVDB_BUILD_LOG phase timestamps — establishes where the
iid cliff's time actually goes before touching the assign design.

Usage: python experiments/exp_build_phases.py [n_millions] [corpus]
  corpus: manifold | iid | both (default both; manifold runs twice for
  the warm rate)
"""

import os
import sys
import time

os.environ.setdefault("EVDB_BUILD_LOG", "1")

import jax

jax.devices()
sys.path.insert(0, "/root/repo")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    n_m = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    which = sys.argv[2] if len(sys.argv) > 2 else "both"
    # power-of-two rows like the bench: a non-multiple of the 2^19 chunk
    # pads the staged corpus (e.g. +0.4 GB at "8.4M") and OOMs the slot
    # scatter window
    n = int(n_m * (1 << 20))
    d = 768
    ch = 1 << 19
    from erlvectordb_tpu.core.cell_probe import CellProbeIndex

    def manifold_chunks():
        key = jax.random.PRNGKey(11)
        kc, kp = jax.random.split(key)
        latent = 48
        centers = jax.random.normal(kc, (4096, latent), jnp.float32)
        proj = jax.random.normal(kp, (latent, d), jnp.float32) / np.sqrt(
            latent)

        def gen(k, m):
            ka, kn, km = jax.random.split(k, 3)
            a = jax.random.randint(ka, (m,), 0, 4096)
            z = centers[a] + 0.35 * jax.random.normal(kn, (m, latent))
            return jnp.dot(z, proj) + 0.05 * jax.random.normal(km, (m, d))

        for i in range(-(-n // ch)):
            m = min(ch, n - i * ch)
            yield gen(jax.random.fold_in(key, i), m)

    def iid_chunks():
        key = jax.random.PRNGKey(12)
        for i in range(-(-n // ch)):
            m = min(ch, n - i * ch)
            yield jax.random.normal(jax.random.fold_in(key, i), (m, d),
                                    jnp.float32)

    def build(name, chunks):
        t0 = time.time()
        idx = CellProbeIndex.build_streaming(
            chunks, n=n, dim=d, cell_rows=416, cell_cap=512,
            spill_mult=1.3, train_rows=262_144, kmeans_iters=6,
            kmeans_init="random", refits=1, j=16)
        st = idx.build_stats
        print(f"[{name}] total={time.time() - t0:.1f}s stats={st}",
              flush=True)
        del idx
        import gc
        gc.collect()
        return st

    if which in ("manifold", "both"):
        build("manifold-cold", manifold_chunks())
        build("manifold-warm", manifold_chunks())
    if which in ("iid", "both"):
        build("iid-warm", iid_chunks())


if __name__ == "__main__":
    main()
