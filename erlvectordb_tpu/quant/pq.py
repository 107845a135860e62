"""Product quantization: TPU-trained codebooks, device encode/decode, ADC tables.

The reference's PQ is a placeholder (subvector size 4, "quantize" =
``round(first_elem*10) rem 256``, dequantize duplicates one value —
src/vector_compression.erl:256-290, :342-352).  This is the real thing:

  * ``PQCodebook.fit``: M codebooks of K centroids trained with batched
    k-means entirely on device (ops/kmeans.py) — one jitted program.
  * ``encode``: nearest-centroid assignment per subspace = M distance
    matmuls, vmapped; yields uint8 codes [N, M] (for K <= 256).
  * ``decode``: centroid gather -> reconstruction.
  * ``adc_tables``: per-query lookup tables LUT[B, M, K] of partial
    (squared-L2 or inner-product) distances — the input to the ADC scan
    kernels in ops/adc.py.
"""

from __future__ import annotations

import functools
from typing import Optional
import jax
import jax.numpy as jnp
import numpy as np

from erlvectordb_tpu.ops.kmeans import (
    kmeans_fit_subspaces,
    kmeans_refine_subspaces,
)


@functools.partial(jax.jit, static_argnames=())
def _encode(x: jax.Array, codebooks: jax.Array) -> jax.Array:
    """x [N, D], codebooks [M, K, Dsub] -> codes uint8 [N, M]."""
    n = x.shape[0]
    m, k, dsub = codebooks.shape
    xs = x.reshape(n, m, dsub).transpose(1, 0, 2)  # [M, N, Dsub]

    def assign_sub(xsub, cents):
        dots = jnp.dot(xsub, cents.T, preferred_element_type=jnp.float32)
        cn = jnp.sum(cents * cents, axis=-1)
        return jnp.argmin(cn[None, :] - 2.0 * dots, axis=-1)

    codes = jax.vmap(assign_sub)(xs, codebooks)  # [M, N]
    return codes.T.astype(jnp.uint8)


@jax.jit
def _decode(codes: jax.Array, codebooks: jax.Array) -> jax.Array:
    """codes [N, M] uint8, codebooks [M, K, Dsub] -> x_hat [N, D]."""
    m = codebooks.shape[0]

    def gather_sub(codes_m, cents):
        return cents[codes_m.astype(jnp.int32)]  # [N, Dsub]

    parts = jax.vmap(gather_sub)(codes.T.reshape(m, -1), codebooks)  # [M, N, Dsub]
    n = codes.shape[0]
    return parts.transpose(1, 0, 2).reshape(n, -1)


@jax.jit
def _adc_l2_tables(queries: jax.Array, codebooks: jax.Array) -> jax.Array:
    """queries [B, D], codebooks [M, K, Dsub] -> LUT [B, M, K] of squared-L2
    partial distances ||q_m - c_{m,k}||^2."""
    b = queries.shape[0]
    m, k, dsub = codebooks.shape
    qs = queries.reshape(b, m, dsub)  # [B, M, Dsub]
    dots = jnp.einsum("bmd,mkd->bmk", qs, codebooks, preferred_element_type=jnp.float32)
    qn = jnp.sum(qs * qs, axis=-1)  # [B, M]
    cn = jnp.sum(codebooks * codebooks, axis=-1)  # [M, K]
    return qn[:, :, None] - 2.0 * dots + cn[None, :, :]


@jax.jit
def _adc_ip_tables(queries: jax.Array, codebooks: jax.Array) -> jax.Array:
    """Inner-product partial tables q_m . c_{m,k} -> LUT [B, M, K]."""
    b = queries.shape[0]
    m, k, dsub = codebooks.shape
    qs = queries.reshape(b, m, dsub)
    return jnp.einsum("bmd,mkd->bmk", qs, codebooks, preferred_element_type=jnp.float32)


class PQCodebook:
    """M x K product-quantization codebook over dimension D (D % M == 0)."""

    def __init__(self, codebooks: jax.Array):
        self.codebooks = jnp.asarray(codebooks, jnp.float32)  # [M, K, Dsub]

    @classmethod
    def fit(
        cls,
        data,
        m: int = 8,
        k: int = 256,
        iters: int = 25,
        seed: int = 0,
        max_train: int = 100_000,
        init_codebooks: Optional[jax.Array] = None,
    ) -> "PQCodebook":
        """Train codebooks; with ``init_codebooks`` the fit is a warm-started
        refinement (``iters`` Lloyd steps from the given centroids) — the OPQ
        alternation's inner retrain."""
        x = jnp.asarray(data, jnp.float32)
        if x.shape[1] % m:
            raise ValueError(f"dimension {x.shape[1]} not divisible by m={m}")
        if k > 256:
            raise ValueError("k > 256 does not fit uint8 codes")
        if x.shape[0] > max_train:
            idx = np.random.default_rng(seed).choice(x.shape[0], max_train, replace=False)
            x = x[jnp.asarray(idx)]
        if init_codebooks is not None:
            cb = kmeans_refine_subspaces(x, init_codebooks, m=m, k=k,
                                         iters=iters)
        else:
            cb = kmeans_fit_subspaces(x, jnp.uint32(seed), m=m, k=k,
                                      iters=iters)
        return cls(cb)

    @property
    def m(self) -> int:
        return self.codebooks.shape[0]

    @property
    def k(self) -> int:
        return self.codebooks.shape[1]

    @property
    def dim(self) -> int:
        return self.codebooks.shape[0] * self.codebooks.shape[2]

    def encode(self, x) -> jax.Array:
        return _encode(jnp.asarray(x, jnp.float32), self.codebooks)

    def decode(self, codes) -> jax.Array:
        return _decode(jnp.asarray(codes), self.codebooks)

    def adc_tables(self, queries, metric: str = "euclidean") -> jax.Array:
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None, :]
        if metric in ("euclidean", "l2"):
            return _adc_l2_tables(q, self.codebooks)
        if metric in ("dot", "ip", "cosine"):
            # cosine rides inner-product tables + norm correction downstream
            return _adc_ip_tables(q, self.codebooks)
        raise ValueError(f"unsupported ADC metric {metric!r}")

    def to_arrays(self) -> dict:
        return {"codebooks": np.asarray(self.codebooks)}

    @classmethod
    def from_arrays(cls, d: dict) -> "PQCodebook":
        return cls(jnp.asarray(d["codebooks"]))
