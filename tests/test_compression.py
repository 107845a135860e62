"""Compression tests — analogue of the reference compression_SUITE
(round-trip error bounds per algorithm, ratio > 1 on compressible input,
batch ops, benchmark output shape; test/compression_SUITE.erl:43-159),
plus real-PQ / real-PCA quality checks the reference could not have.
"""

import numpy as np
import pytest

from erlvectordb_tpu.quant import (
    CompressedVector,
    PCAModel,
    PQCodebook,
    benchmark_compression,
    compress_batch,
    compress_vector,
    decompress_batch,
    decompress_vector,
    get_compression_ratio,
    get_supported_algorithms,
)


@pytest.fixture
def vec(rng):
    return rng.standard_normal(128).astype(np.float32)


class TestRoundTrips:
    def test_8bit_bound(self, vec):
        cv = compress_vector(vec, "8bit")
        recon = decompress_vector(cv)
        # reference bound: per-element error < 0.1 on unit-scale data;
        # the tight bound is range/255.
        bound = (vec.max() - vec.min()) / 255 + 1e-6
        assert np.max(np.abs(recon - vec)) <= bound

    def test_4bit_bound(self, vec):
        cv = compress_vector(vec, "4bit")
        recon = decompress_vector(cv)
        bound = (vec.max() - vec.min()) / 15 + 1e-6
        assert np.max(np.abs(recon - vec)) <= bound

    def test_4bit_odd_dimension(self, rng):
        v = rng.standard_normal(7).astype(np.float32)
        recon = decompress_vector(compress_vector(v, "4bit"))
        assert recon.shape == (7,)
        assert np.max(np.abs(recon - v)) <= (v.max() - v.min()) / 15 + 1e-6

    def test_zlib_lossless(self, vec):
        recon = decompress_vector(compress_vector(vec, "zlib"))
        np.testing.assert_array_equal(recon, vec)

    def test_lz4_lossless(self, vec):
        recon = decompress_vector(compress_vector(vec, "lz4"))
        np.testing.assert_array_equal(recon, vec)

    def test_pca_single_vector_truncation(self, vec):
        cv = compress_vector(vec, "pca")
        assert cv.meta["mode"] == "truncate"
        recon = decompress_vector(cv)
        np.testing.assert_allclose(recon[:64], vec[:64], atol=1e-6)
        np.testing.assert_array_equal(recon[64:], 0)

    def test_product_single_vector(self, vec):
        cv = compress_vector(vec, "product")
        assert cv.meta["mode"] == "single"
        recon = decompress_vector(cv)
        assert recon.shape == (128,)
        # micro-codebook: reconstruction correlates strongly with the input
        corr = np.corrcoef(recon, vec)[0, 1]
        assert corr > 0.5


class TestModelBased:
    def test_pca_model_quality(self, rng):
        # low-rank data: PCA to the true rank is near-lossless
        basis = rng.standard_normal((8, 64)).astype(np.float32)
        coeffs = rng.standard_normal((200, 8)).astype(np.float32)
        data = coeffs @ basis
        model = PCAModel.fit(data, n_components=8)
        cvs = compress_batch(data, "pca", pca_model=model)
        recon = np.stack(decompress_batch(cvs))
        rel = np.linalg.norm(recon - data) / np.linalg.norm(data)
        assert rel < 1e-3

    def test_pca_autotrains_on_batch(self, rng):
        data = rng.standard_normal((100, 32)).astype(np.float32)
        cvs = compress_batch(data, "pca")
        assert cvs[0].meta["mode"] == "model"
        recon = np.stack(decompress_batch(cvs))
        assert recon.shape == data.shape

    def test_pq_codebook_roundtrip_quality(self, rng):
        # clustered data: PQ reconstruction error far below data scale
        centers = rng.standard_normal((32, 64)).astype(np.float32) * 5
        assign = rng.integers(0, 32, size=2000)
        data = centers[assign] + 0.1 * rng.standard_normal((2000, 64)).astype(np.float32)
        cb = PQCodebook.fit(data, m=8, k=64, iters=15)
        codes = np.asarray(cb.encode(data))
        assert codes.shape == (2000, 8)
        assert codes.dtype == np.uint8
        recon = np.asarray(cb.decode(codes))
        mse = np.mean((recon - data) ** 2)
        var = np.var(data)
        assert mse < 0.05 * var

    def test_pq_batch_api(self, rng):
        data = rng.standard_normal((600, 32)).astype(np.float32)
        cvs = compress_batch(data, "product")
        assert cvs[0].meta["mode"] == "codebook"
        recon = np.stack(decompress_batch(cvs))
        assert recon.shape == data.shape
        # codes are 1 byte per subvector
        assert len(cvs[0].payload) == cvs[0].meta["m"]

    def test_adc_tables_shapes(self, rng):
        data = rng.standard_normal((512, 32)).astype(np.float32)
        cb = PQCodebook.fit(data, m=4, k=16, iters=5)
        lut = np.asarray(cb.adc_tables(data[:3], metric="euclidean"))
        assert lut.shape == (3, 4, 16)
        # ADC distance == exact distance to reconstruction
        codes = cb.encode(data[:10])
        recon = np.asarray(cb.decode(codes))
        adc = lut[0].reshape(4, 16)
        codes0 = np.asarray(codes)
        d_adc = sum(adc[m, codes0[0, m]] for m in range(4))
        d_exact = np.sum((data[0] - recon[0]) ** 2)
        np.testing.assert_allclose(d_adc, d_exact, rtol=1e-3, atol=1e-3)


class TestApiSurface:
    def test_supported_algorithms(self):
        algs = get_supported_algorithms()
        assert set(algs) == {"8bit", "4bit", "pca", "zlib", "lz4", "product"}

    def test_ratio_gt_one_on_compressible(self):
        v = np.zeros(256, np.float32)  # maximally compressible
        for alg in ("8bit", "4bit", "zlib", "lz4"):
            cv = compress_vector(v, alg)
            assert get_compression_ratio(v, cv) > 1.0, alg

    def test_8bit_ratio_is_4x(self, vec):
        cv = compress_vector(vec, "8bit")
        assert get_compression_ratio(vec, cv) == pytest.approx(4.0)

    def test_4bit_ratio_is_8x(self, vec):
        cv = compress_vector(vec, "4bit")
        assert get_compression_ratio(vec, cv) == pytest.approx(8.0)

    def test_batch_roundtrip(self, rng):
        data = rng.standard_normal((16, 64)).astype(np.float32)
        cvs = compress_batch(data, "8bit")
        assert len(cvs) == 16
        recon = np.stack(decompress_batch(cvs))
        assert np.max(np.abs(recon - data)) < 0.05

    def test_serialization_roundtrip(self, vec):
        for alg in ("8bit", "4bit", "zlib", "lz4", "pca", "product"):
            cv = compress_vector(vec, alg)
            blob = cv.to_bytes()
            back = CompressedVector.from_bytes(blob)
            r1 = decompress_vector(cv)
            r2 = decompress_vector(back)
            np.testing.assert_array_equal(r1, r2)

    def test_unknown_algorithm(self, vec):
        with pytest.raises(ValueError):
            compress_vector(vec, "quantum")

    def test_benchmark_shape(self, vec):
        out = benchmark_compression(vec, "8bit", iterations=2)
        assert set(out) >= {
            "algorithm",
            "compress_time_us",
            "decompress_time_us",
            "compression_ratio",
            "mse",
        }
        assert out["mse"] >= 0


class TestOPQ:
    def test_opq_beats_pq_on_anisotropic_data(self, rng):
        from erlvectordb_tpu.quant.opq import OPQCodebook

        # anisotropic: a few dominant directions NOT axis-aligned
        basis = rng.standard_normal((32, 32)).astype(np.float32)
        scales = np.logspace(0, -2, 32).astype(np.float32)
        data = (rng.standard_normal((3000, 32)).astype(np.float32) * scales) @ basis
        pq = PQCodebook.fit(data, m=8, k=64, iters=10)
        opq = OPQCodebook.fit(data, m=8, k=64, iters=10, opq_iters=4)
        mse_pq = float(np.mean((np.asarray(pq.decode(pq.encode(data))) - data) ** 2))
        mse_opq = opq.reconstruction_mse(data)
        assert mse_opq < mse_pq * 0.9, (mse_opq, mse_pq)

    def test_opq_rotation_is_orthogonal(self, rng):
        from erlvectordb_tpu.quant.opq import OPQCodebook

        data = rng.standard_normal((1000, 16)).astype(np.float32)
        opq = OPQCodebook.fit(data, m=4, k=16, iters=5, opq_iters=2)
        r = np.asarray(opq.rotation)
        np.testing.assert_allclose(r @ r.T, np.eye(16), atol=1e-4)

    def test_opq_serialization(self, rng):
        from erlvectordb_tpu.quant.opq import OPQCodebook

        data = rng.standard_normal((500, 16)).astype(np.float32)
        opq = OPQCodebook.fit(data, m=4, k=16, iters=5, opq_iters=2)
        clone = OPQCodebook.from_arrays(opq.to_arrays())
        np.testing.assert_array_equal(
            np.asarray(opq.encode(data[:10])), np.asarray(clone.encode(data[:10]))
        )
