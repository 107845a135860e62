"""OPQ — optimized product quantization with a learned orthogonal rotation.

Plain PQ quantizes fixed coordinate blocks; when variance is unevenly
spread (almost always for real embeddings), a learned rotation R that
balances information across subspaces cuts quantization error substantially.
Training alternates, entirely on device:

  1. Y = X @ R;  (re)train PQ codebooks on Y          (ops/kmeans.py, MXU)
  2. Y_hat = decode(encode(Y))
  3. R <- argmin_R ||X R - Y_hat||_F  s.t. R orthogonal
         = U V^T from the SVD of X^T Y_hat            (orthogonal Procrustes)

Search-side everything reduces to "rotate the query, then do PQ": encode,
ADC tables, and the Pallas ADC scan all work unchanged on rotated inputs.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from erlvectordb_tpu.quant.pq import PQCodebook


class OPQCodebook:
    """Rotation + PQ codebook pair."""

    def __init__(self, rotation: jax.Array, pq: PQCodebook):
        self.rotation = jnp.asarray(rotation, jnp.float32)  # [D, D]
        self.pq = pq

    @classmethod
    def fit(
        cls,
        data,
        m: int = 8,
        k: int = 256,
        iters: int = 15,
        opq_iters: int = 5,
        seed: int = 0,
        max_train: int = 100_000,
        refine_iters: int = 4,
    ) -> "OPQCodebook":
        """Alternating OPQ fit.  Only the FIRST round trains codebooks from
        scratch (``iters`` Lloyd steps); later rounds warm-start from the
        previous round's codebooks and refine for ``refine_iters`` steps —
        the rotation moves little per round, so from-scratch retraining was
        pure waste (it was ~4x the total build time)."""
        x = jnp.asarray(data, jnp.float32)
        if x.shape[0] > max_train:
            idx = np.random.default_rng(seed).choice(
                x.shape[0], max_train, replace=False
            )
            x = x[jnp.asarray(idx)]
        d = x.shape[1]
        r = jnp.eye(d, dtype=jnp.float32)
        pq: Optional[PQCodebook] = None
        for it in range(opq_iters):
            y = jnp.dot(x, r, preferred_element_type=jnp.float32)
            if pq is None:
                pq = PQCodebook.fit(y, m=m, k=k, iters=iters, seed=seed + it,
                                    max_train=max_train)
            else:
                pq = PQCodebook.fit(y, m=m, k=k, iters=refine_iters,
                                    max_train=max_train,
                                    init_codebooks=pq.codebooks)
            y_hat = pq.decode(pq.encode(y))
            # orthogonal Procrustes: R = U V^T of X^T Y_hat
            u, _, vt = jnp.linalg.svd(
                jnp.dot(x.T, y_hat, preferred_element_type=jnp.float32),
                full_matrices=False,
            )
            r = jnp.dot(u, vt, preferred_element_type=jnp.float32)
        # final codebook refinement for the final rotation
        y = jnp.dot(x, r, preferred_element_type=jnp.float32)
        pq = PQCodebook.fit(y, m=m, k=k, iters=refine_iters,
                            max_train=max_train,
                            init_codebooks=pq.codebooks if pq else None)
        return cls(r, pq)

    # ----------------------------------------------------------- delegation

    @property
    def m(self) -> int:
        return self.pq.m

    @property
    def k(self) -> int:
        return self.pq.k

    @property
    def dim(self) -> int:
        return self.rotation.shape[0]

    @property
    def codebooks(self) -> jax.Array:
        return self.pq.codebooks

    def rotate(self, x) -> jax.Array:
        return jnp.dot(jnp.asarray(x, jnp.float32), self.rotation,
                       preferred_element_type=jnp.float32)

    def encode(self, x) -> jax.Array:
        return self.pq.encode(self.rotate(x))

    def decode(self, codes) -> jax.Array:
        y = self.pq.decode(codes)
        return jnp.dot(y, self.rotation.T, preferred_element_type=jnp.float32)

    def adc_tables(self, queries, metric: str = "euclidean") -> jax.Array:
        """Rotation is orthogonal, so L2 in rotated space == L2 in the
        original space: rotate the query and reuse the PQ tables."""
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None, :]
        return self.pq.adc_tables(self.rotate(q), metric=metric)

    def reconstruction_mse(self, x) -> float:
        x = jnp.asarray(x, jnp.float32)
        return float(jnp.mean((self.decode(self.encode(x)) - x) ** 2))

    def to_arrays(self) -> dict:
        return {
            "rotation": np.asarray(self.rotation),
            "codebooks": np.asarray(self.pq.codebooks),
        }

    @classmethod
    def from_arrays(cls, d: dict) -> "OPQCodebook":
        return cls(jnp.asarray(d["rotation"]),
                   PQCodebook(jnp.asarray(d["codebooks"])))
