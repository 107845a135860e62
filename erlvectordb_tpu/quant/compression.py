"""Unified compression API — surface parity with the reference's
compress/decompress/batch/ratio/benchmark verbs (src/vector_compression.erl:15-23),
with the placeholder algorithms upgraded to honest implementations.

Algorithms (reference list src/vector_compression.erl:25-31):

  * ``8bit``     — per-vector min/max affine -> uint8 codes (device VPU)
  * ``4bit``     — same with nibble packing (device VPU)
  * ``pca``      — REAL PCA when a training batch or fitted model is given;
                   single-vector calls use the documented truncate-to-half
                   fallback (what the reference always does, :207-229)
  * ``zlib``     — deflate over the f32 binary (lossless)
  * ``lz4``      — lz4 if available, else zlib fallback (like reference :247-254)
  * ``product``  — REAL product quantization: TPU-trained codebooks when a
                   batch/codebook is given; single vectors train a per-vector
                   micro-codebook over their own 4-wide subvectors

A compressed vector is a :class:`CompressedVector` carrying the algorithm,
payload bytes, and the side data needed to invert it; it serializes to a
single binary blob (header + payload) for persistence.
"""

from __future__ import annotations

import io
import json
import struct
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from erlvectordb_tpu.quant import affine, codecs
from erlvectordb_tpu.quant.pca import PCAModel, truncate_project, truncate_restore
from erlvectordb_tpu.quant.pq import PQCodebook

SUPPORTED_ALGORITHMS = ("8bit", "4bit", "pca", "zlib", "lz4", "product")

_MAGIC = b"EVQZ"


@dataclass
class CompressedVector:
    algorithm: str
    payload: bytes
    meta: Dict[str, Any] = field(default_factory=dict)
    arrays: Dict[str, np.ndarray] = field(default_factory=dict)

    @property
    def nbytes(self) -> int:
        return len(self.payload) + sum(a.nbytes for a in self.arrays.values())

    def to_bytes(self) -> bytes:
        buf = io.BytesIO()
        np.savez(buf, **self.arrays)
        arr_blob = buf.getvalue()
        header = json.dumps({"algorithm": self.algorithm, "meta": self.meta}).encode()
        return b"".join(
            [
                _MAGIC,
                struct.pack("<III", len(header), len(self.payload), len(arr_blob)),
                header,
                self.payload,
                arr_blob,
            ]
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CompressedVector":
        if blob[:4] != _MAGIC:
            raise ValueError("not a CompressedVector blob")
        hlen, plen, alen = struct.unpack("<III", blob[4:16])
        off = 16
        header = json.loads(blob[off : off + hlen].decode())
        off += hlen
        payload = blob[off : off + plen]
        off += plen
        arrays: Dict[str, np.ndarray] = {}
        if alen:
            with np.load(io.BytesIO(blob[off : off + alen])) as z:
                arrays = {k: z[k] for k in z.files}
        return cls(header["algorithm"], payload, header.get("meta", {}), arrays)


def get_supported_algorithms() -> List[str]:
    return list(SUPPORTED_ALGORITHMS)


# ------------------------------------------------------------------ compress


def compress_vector(vector, algorithm: str, **kw) -> CompressedVector:
    """Compress a single vector. ``kw`` may carry a fitted ``pca_model`` or
    ``pq_codebook`` for the model-based algorithms."""
    batch = compress_batch(np.asarray(vector, np.float32)[None, :], algorithm, **kw)
    return batch[0]


def compress_batch(vectors, algorithm: str, **kw) -> List[CompressedVector]:
    x = np.asarray(vectors, np.float32)
    if x.ndim == 1:
        x = x[None, :]
    n, d = x.shape
    if algorithm == "8bit":
        codes, mn, scale = affine.quantize_u8(x)
        codes, mn, scale = map(np.asarray, (codes, mn, scale))
        return [
            CompressedVector(
                "8bit",
                codes[i].tobytes(),
                {"dim": d, "min": float(mn[i, 0]), "scale": float(scale[i, 0])},
            )
            for i in range(n)
        ]
    if algorithm == "4bit":
        packed, mn, scale = affine.quantize_u4(x)
        packed, mn, scale = map(np.asarray, (packed, mn, scale))
        return [
            CompressedVector(
                "4bit",
                packed[i].tobytes(),
                {"dim": d, "min": float(mn[i, 0]), "scale": float(scale[i, 0])},
            )
            for i in range(n)
        ]
    if algorithm == "zlib":
        return [CompressedVector("zlib", codecs.zlib_compress(x[i]), {"dim": d}) for i in range(n)]
    if algorithm == "lz4":
        return [
            CompressedVector(
                "lz4", codecs.lz4_compress(x[i]), {"dim": d, "lz4_native": codecs.HAVE_LZ4}
            )
            for i in range(n)
        ]
    if algorithm == "pca":
        model: Optional[PCAModel] = kw.get("pca_model")
        n_components = kw.get("n_components")
        if model is None and n >= 8:
            model = PCAModel.fit(x, n_components or max(1, d // 2))
        if model is not None:
            z = np.asarray(model.transform(x), np.float32)
            marrs = model.to_arrays()
            return [
                CompressedVector(
                    "pca",
                    z[i].tobytes(),
                    {"dim": d, "mode": "model", "n_components": model.n_components},
                    {"mean": marrs["mean"], "components": marrs["components"]},
                )
                for i in range(n)
            ]
        # single-vector fallback: truncation (reference behavior :207-229)
        z = np.asarray(truncate_project(x, n_components), np.float32)
        return [
            CompressedVector("pca", z[i].tobytes(), {"dim": d, "mode": "truncate"})
            for i in range(n)
        ]
    if algorithm == "product":
        codebook: Optional[PQCodebook] = kw.get("pq_codebook")
        m = kw.get("m")
        if codebook is None and n >= 256:
            m = m or _default_m(d)
            codebook = PQCodebook.fit(x, m=m, k=min(256, max(16, n // 4)), seed=0)
        if codebook is not None:
            codes = np.asarray(codebook.encode(x))
            cb = codebook.to_arrays()["codebooks"]
            return [
                CompressedVector(
                    "product",
                    codes[i].tobytes(),
                    {"dim": d, "mode": "codebook", "m": codebook.m, "k": codebook.k},
                    {"codebooks": cb},
                )
                for i in range(n)
            ]
        # per-vector micro-codebook over the vector's own 4-wide subvectors
        return [_pq_single(x[i]) for i in range(n)]
    raise ValueError(f"unsupported algorithm {algorithm!r}; choose from {SUPPORTED_ALGORITHMS}")


def _default_m(d: int) -> int:
    for m in (8, 16, 4, 32, 2):
        if d % m == 0:
            return m
    return 1


def _pq_single(vec: np.ndarray) -> CompressedVector:
    d = vec.shape[0]
    sub = 4
    pad = (-d) % sub
    v = np.pad(vec, (0, pad))
    pts = v.reshape(-1, sub)  # subvectors as training points
    k = int(min(16, pts.shape[0]))
    from erlvectordb_tpu.ops.kmeans import kmeans_fit

    cents, assign = kmeans_fit(pts, np.uint32(0), k=k, iters=10)
    return CompressedVector(
        "product",
        np.asarray(assign, np.uint8).tobytes(),
        {"dim": d, "mode": "single", "sub": sub, "k": k},
        {"centroids": np.asarray(cents, np.float32)},
    )


# ---------------------------------------------------------------- decompress


def decompress_vector(cv: CompressedVector | bytes, **kw) -> np.ndarray:
    if isinstance(cv, (bytes, bytearray)):
        cv = CompressedVector.from_bytes(bytes(cv))
    return decompress_batch([cv], **kw)[0]


def decompress_batch(cvs: Sequence[CompressedVector], **kw) -> List[np.ndarray]:
    out: List[np.ndarray] = []
    for cv in cvs:
        if isinstance(cv, (bytes, bytearray)):
            cv = CompressedVector.from_bytes(bytes(cv))
        alg, meta = cv.algorithm, cv.meta
        d = int(meta["dim"])
        if alg == "8bit":
            codes = np.frombuffer(cv.payload, np.uint8).astype(np.float32)
            out.append(codes / 255.0 * meta["scale"] + meta["min"])
        elif alg == "4bit":
            packed = np.frombuffer(cv.payload, np.uint8)
            hi = (packed >> 4).astype(np.float32)
            lo = (packed & 0xF).astype(np.float32)
            codes = np.stack([hi, lo], -1).reshape(-1)[:d]
            out.append(codes / 15.0 * meta["scale"] + meta["min"])
        elif alg == "zlib":
            out.append(codecs.zlib_decompress(cv.payload))
        elif alg == "lz4":
            if meta.get("lz4_native") and not codecs.HAVE_LZ4:
                raise RuntimeError("blob was lz4-compressed but lz4 is unavailable")
            out.append(
                codecs.lz4_decompress(cv.payload)
                if meta.get("lz4_native")
                else codecs.zlib_decompress(cv.payload)
            )
        elif alg == "pca":
            z = np.frombuffer(cv.payload, np.float32)
            if meta.get("mode") == "model":
                model = kw.get("pca_model") or PCAModel.from_arrays(cv.arrays)
                out.append(np.asarray(model.inverse_transform(z[None, :]))[0])
            else:
                out.append(np.asarray(truncate_restore(z[None, :], d))[0])
        elif alg == "product":
            if meta.get("mode") == "codebook":
                codebook = kw.get("pq_codebook") or PQCodebook.from_arrays(cv.arrays)
                codes = np.frombuffer(cv.payload, np.uint8)[None, :]
                out.append(np.asarray(codebook.decode(codes))[0])
            else:
                cents = cv.arrays["centroids"]
                assign = np.frombuffer(cv.payload, np.uint8).astype(np.int64)
                recon = cents[assign].reshape(-1)[:d]
                out.append(recon.astype(np.float32))
        else:
            raise ValueError(f"unsupported algorithm {alg!r}")
    return out


# ------------------------------------------------------------------- ratios


def get_compression_ratio(original, compressed: CompressedVector) -> float:
    """original f32 bytes / compressed bytes (reference :121-126)."""
    orig_bytes = np.asarray(original, np.float32).nbytes
    comp = len(compressed.payload)
    # model-based algorithms amortize their side arrays; count payload only,
    # report side size separately in benchmark output.
    return orig_bytes / max(comp, 1)


def benchmark_compression(vector, algorithm: str, iterations: int = 10, **kw) -> dict:
    """Time compress/decompress, compute ratio and MSE accuracy loss —
    the reference's benchmark tool (src/vector_compression.erl:134-162)."""
    x = np.asarray(vector, np.float32)
    t0 = time.perf_counter()
    for _ in range(iterations):
        cv = compress_vector(x, algorithm, **kw)
    compress_us = (time.perf_counter() - t0) / iterations * 1e6
    t0 = time.perf_counter()
    for _ in range(iterations):
        recon = decompress_vector(cv, **kw)
    decompress_us = (time.perf_counter() - t0) / iterations * 1e6
    recon = np.asarray(recon, np.float32)
    mse = float(np.mean((x - recon[: x.shape[0]]) ** 2)) if recon.shape[0] >= x.shape[0] else float(
        np.mean((x[: recon.shape[0]] - recon) ** 2)
    )
    return {
        "algorithm": algorithm,
        "compress_time_us": compress_us,
        "decompress_time_us": decompress_us,
        "compression_ratio": get_compression_ratio(x, cv),
        "payload_bytes": len(cv.payload),
        "side_bytes": sum(a.nbytes for a in cv.arrays.values()),
        "mse": mse,
    }
