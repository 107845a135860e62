"""Cheap rig-congestion probe: times a fixed small device program.

The axon tunnel's dispatch+readback RTT swings 2-20x between windows
(BENCH_NOTES "Tunnel-timing variance").  Prints one line with the
median per-dispatch ms of a tiny matmul+top_k — compare against the
quiet-window floor (~1.3-2 ms) before trusting any timing run.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax


@jax.jit
def step(q, x):
    s = jnp.dot(q, x.T, preferred_element_type=jnp.float32)
    return lax.top_k(s, 10)


q = jnp.asarray(np.random.default_rng(0).normal(size=(64, 128)),
                jnp.float32)
x = jnp.asarray(np.random.default_rng(1).normal(size=(100_000, 128)),
                jnp.float32)
jax.block_until_ready(step(q, x))
ts = []
for _ in range(7):
    t0 = time.perf_counter()
    jax.block_until_ready(step(q, x))
    ts.append(1e3 * (time.perf_counter() - t0))
ts = sorted(ts)
print(f"probe: median {ts[len(ts)//2]:.2f} ms  min {ts[0]:.2f}  "
      f"max {ts[-1]:.2f}  (quiet floor ~1.3-2 ms)")
