"""Fused Pallas scan kernel vs the XLA reference path (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from erlvectordb_tpu.core.search import exact_topk, exact_topk_int8
from erlvectordb_tpu.ops.fused_topk import TILE_N, fused_topk, n_tiles_for


def _quantize(data):
    absmax = np.abs(data).max(axis=1)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    codes = np.clip(np.round(data / scale[:, None]), -127, 127).astype(np.int8)
    return codes, scale


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(0)
    n_cap, n, d = 2 * TILE_N, TILE_N + 1234, 128
    data = np.zeros((n_cap, d), np.float32)
    data[:n] = rng.standard_normal((n, d)).astype(np.float32)
    valid = np.zeros(n_cap, bool)
    valid[:n] = True
    # a couple of deletions inside the live range
    valid[17] = False
    valid[4000] = False
    norms = np.linalg.norm(data, axis=1).astype(np.float32)
    queries = rng.standard_normal((40, d)).astype(np.float32)
    return data, norms, valid, queries, n


@pytest.mark.parametrize("metric", ["cosine", "euclidean", "dot"])
def test_fused_int8_matches_xla_int8(corpus, metric):
    data, norms, valid, queries, n = corpus
    codes, scales = _quantize(data)
    k = 8
    nt = n_tiles_for(n, data.shape[0])
    d_f, r_f = fused_topk(
        jnp.asarray(codes), jnp.asarray(scales), jnp.asarray(norms),
        jnp.asarray(valid), jnp.asarray(queries), metric=metric, k=k, n_tiles=nt,
    )
    d_x, r_x = exact_topk_int8(
        jnp.asarray(codes), jnp.asarray(scales), jnp.asarray(norms),
        jnp.asarray(valid), jnp.asarray(queries), metric=metric, k=k,
    )
    d_f, r_f, d_x, r_x = map(np.asarray, (d_f, r_f, d_x, r_x))
    # top-2-per-tile candidates: allow <=1 of k to differ per query (tie or
    # >2-in-tile collision), distances must agree elementwise where rows do
    for b in range(queries.shape[0]):
        same = set(r_f[b]) & set(r_x[b])
        assert len(same) >= k - 1, (metric, b, r_f[b], r_x[b])
    np.testing.assert_allclose(d_f[:, 0], d_x[:, 0], rtol=1e-4, atol=1e-4)


def test_fused_f32_matches_exact(corpus):
    data, norms, valid, queries, n = corpus
    k = 8
    nt = n_tiles_for(n, data.shape[0])
    d_f, r_f = fused_topk(
        jnp.asarray(data), None, jnp.asarray(norms), jnp.asarray(valid),
        jnp.asarray(queries), metric="cosine", k=k, n_tiles=nt,
    )
    d_x, r_x = exact_topk(
        jnp.asarray(data), jnp.asarray(norms), jnp.asarray(valid),
        jnp.asarray(queries), metric="cosine", k=k,
    )
    d_f, r_f, d_x, r_x = map(np.asarray, (d_f, r_f, d_x, r_x))
    for b in range(queries.shape[0]):
        assert len(set(r_f[b]) & set(r_x[b])) >= k - 1
    np.testing.assert_allclose(d_f[:, 0], d_x[:, 0], rtol=1e-4, atol=1e-4)


def test_deleted_rows_never_returned(corpus):
    data, norms, valid, queries, n = corpus
    codes, scales = _quantize(data)
    nt = n_tiles_for(n, data.shape[0])
    _, rows = fused_topk(
        jnp.asarray(codes), jnp.asarray(scales), jnp.asarray(norms),
        jnp.asarray(valid), jnp.asarray(queries), metric="cosine", k=16, n_tiles=nt,
    )
    rows = np.asarray(rows)
    assert 17 not in rows
    assert 4000 not in rows
    assert rows.max() < n  # never a padded row


def test_small_batch_padding(corpus):
    data, norms, valid, queries, n = corpus
    codes, scales = _quantize(data)
    nt = n_tiles_for(n, data.shape[0])
    d1, r1 = fused_topk(
        jnp.asarray(codes), jnp.asarray(scales), jnp.asarray(norms),
        jnp.asarray(valid), jnp.asarray(queries[:1]), metric="cosine", k=4, n_tiles=nt,
    )
    assert d1.shape == (1, 4)
    d40, r40 = fused_topk(
        jnp.asarray(codes), jnp.asarray(scales), jnp.asarray(norms),
        jnp.asarray(valid), jnp.asarray(queries), metric="cosine", k=4, n_tiles=nt,
    )
    np.testing.assert_array_equal(np.asarray(r1)[0], np.asarray(r40)[0])


def test_fused_int4_matches_xla_int4(corpus):
    import jax

    from erlvectordb_tpu.core.search import exact_topk_int4
    from erlvectordb_tpu.core.store import _pack_int4

    data, norms, valid, queries, n = corpus
    absmax = np.abs(data).max(axis=1)
    scales = np.where(absmax > 0, absmax / 7.0, 1.0).astype(np.float32)
    q4 = np.clip(np.round(data / scales[:, None]), -7, 7).astype(np.int8)
    packed = np.asarray(_pack_int4(jnp.asarray(q4)))
    k = 8
    nt = n_tiles_for(n, data.shape[0])
    d_f, r_f = fused_topk(
        jnp.asarray(packed), jnp.asarray(scales), jnp.asarray(norms),
        jnp.asarray(valid), jnp.asarray(queries), metric="cosine", k=k,
        n_tiles=nt,
    )
    d_x, r_x = exact_topk_int4(
        jnp.asarray(packed), jnp.asarray(scales), jnp.asarray(norms),
        jnp.asarray(valid), jnp.asarray(queries), metric="cosine", k=k,
    )
    d_f, r_f, d_x, r_x = map(np.asarray, (d_f, r_f, d_x, r_x))
    for b in range(queries.shape[0]):
        assert len(set(r_f[b]) & set(r_x[b])) >= k - 1, (b, r_f[b], r_x[b])
    np.testing.assert_allclose(d_f[:, 0], d_x[:, 0], rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("metric", ["euclidean", "dot"])
def test_fused_int4_other_metrics(corpus, metric):
    from erlvectordb_tpu.core.search import exact_topk_int4
    from erlvectordb_tpu.core.store import _pack_int4

    data, norms, valid, queries, n = corpus
    absmax = np.abs(data).max(axis=1)
    scales = np.where(absmax > 0, absmax / 7.0, 1.0).astype(np.float32)
    q4 = np.clip(np.round(data / scales[:, None]), -7, 7).astype(np.int8)
    packed = np.asarray(_pack_int4(jnp.asarray(q4)))
    k = 8
    nt = n_tiles_for(n, data.shape[0])
    d_f, r_f = fused_topk(
        jnp.asarray(packed), jnp.asarray(scales), jnp.asarray(norms),
        jnp.asarray(valid), jnp.asarray(queries), metric=metric, k=k,
        n_tiles=nt,
    )
    d_x, r_x = exact_topk_int4(
        jnp.asarray(packed), jnp.asarray(scales), jnp.asarray(norms),
        jnp.asarray(valid), jnp.asarray(queries), metric=metric, k=k,
    )
    d_f, r_f, d_x, r_x = map(np.asarray, (d_f, r_f, d_x, r_x))
    for b in range(queries.shape[0]):
        assert len(set(r_f[b]) & set(r_x[b])) >= k - 1
    np.testing.assert_allclose(d_f[:, 0], d_x[:, 0], rtol=1e-3, atol=1e-3)
