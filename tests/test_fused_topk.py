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


# ---------------------------------------------------------------------------
# Positive-packed big-store path (pos path).  Gated on POS_MIN_TILES in
# production; tests lower the gate via monkeypatch and use a corpus whose
# true top-k all live in DISTINCT 1024-row slices, where per-slice top-1
# extraction is provably lossless -> results must match the XLA exact path
# bit-for-bit in membership and to quantization tolerance in distance.
# NOTE: reference comparisons use the exact_topk_* XLA paths, never the
# non-pos fused kernel — jit caches key on (shapes, statics), so flipping
# POS_MIN_TILES between same-signature fused_topk calls would alias.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def spiked_corpus():
    """3-tile corpus with 6 dominant matches spaced >1024 rows apart."""
    import erlvectordb_tpu.ops.fused_topk as ft

    rng = np.random.default_rng(3)
    n_cap = 3 * TILE_N
    n, d = n_cap - 500, 128
    data = np.zeros((n_cap, d), np.float32)
    data[:n] = rng.standard_normal((n, d)).astype(np.float32)
    valid = np.zeros(n_cap, bool)
    valid[:n] = True
    queries = rng.standard_normal((8, d)).astype(np.float32)
    targets = [100, 2100, 4200, 6300, 8400, 10500]
    for i, t in enumerate(targets):
        # near-copies of query 0: nearest under cosine AND euclidean, and
        # |q|^2=d dominates random-row dots, so top under dot as well
        data[t] = queries[0] * (1.0 + 0.02 * (i + 1))
    norms = np.linalg.norm(data, axis=1).astype(np.float32)
    return data, norms, valid, queries, targets


@pytest.fixture
def pos_gate(monkeypatch):
    import erlvectordb_tpu.ops.fused_topk as ft

    monkeypatch.setattr(ft, "POS_MIN_TILES", 1)


def test_pos_path_opt_out(monkeypatch):
    """EVDB_EXACT_SCAN / POS_PATH_ENABLED forces exact extraction (ADVICE r2)."""
    import erlvectordb_tpu.ops.fused_topk as ft

    assert ft.pos_path_applies("cosine", ft.POS_MIN_TILES, 10)
    monkeypatch.setattr(ft, "POS_PATH_ENABLED", False)
    assert not ft.pos_path_applies("cosine", ft.POS_MIN_TILES, 10)


@pytest.mark.parametrize("metric", ["cosine", "euclidean", "dot"])
def test_pos_path_int8_matches_xla(spiked_corpus, pos_gate, metric):
    data, norms, valid, queries, targets = spiked_corpus
    codes, scales = _quantize(data)
    k = 6
    nt = n_tiles_for(data.shape[0], data.shape[0])
    d_f, r_f = fused_topk(
        jnp.asarray(codes), jnp.asarray(scales), jnp.asarray(norms),
        jnp.asarray(valid), jnp.asarray(queries), metric=metric, k=k,
        n_tiles=nt,
    )
    d_x, r_x = exact_topk_int8(
        jnp.asarray(codes), jnp.asarray(scales), jnp.asarray(norms),
        jnp.asarray(valid), jnp.asarray(queries), metric=metric, k=k,
    )
    _, r_wide = exact_topk_int8(
        jnp.asarray(codes), jnp.asarray(scales), jnp.asarray(norms),
        jnp.asarray(valid), jnp.asarray(queries), metric=metric, k=24,
    )
    d_f, r_f, d_x, r_x, r_wide = map(np.asarray, (d_f, r_f, d_x, r_x, r_wide))
    # query 0's top-6 are the planted spikes, all in distinct slices -> exact
    assert set(r_f[0]) == set(r_x[0]) == set(targets)
    np.testing.assert_allclose(np.sort(d_f[0]), np.sort(d_x[0]),
                               rtol=1e-4, atol=1e-4)
    # other (random) queries at this far-below-gate corpus size DO lose
    # same-slice collisions; assert quality instead: every returned row is a
    # genuine near neighbor (within the XLA top-24), and the global top-1
    # (always some slice's max) is exact
    for b in range(1, queries.shape[0]):
        assert set(r_f[b]) <= set(r_wide[b]), (metric, b)
    np.testing.assert_allclose(d_f[:, 0], d_x[:, 0], rtol=1e-4, atol=1e-4)


def test_pos_path_deleted_rows_excluded(spiked_corpus, pos_gate):
    data, norms, valid, queries, targets = spiked_corpus
    codes, scales = _quantize(data)
    valid = valid.copy()
    valid[targets[1]] = False
    k = 6
    nt = n_tiles_for(data.shape[0], data.shape[0])
    _, r_f = fused_topk(
        jnp.asarray(codes), jnp.asarray(scales), jnp.asarray(norms),
        jnp.asarray(valid), jnp.asarray(queries), metric="cosine", k=k,
        n_tiles=nt,
    )
    r_f = np.asarray(r_f)
    assert targets[1] not in r_f[0]
    assert set(targets) - {targets[1]} <= set(r_f[0])


def test_pos_path_f32_matches_exact(spiked_corpus, pos_gate):
    data, norms, valid, queries, targets = spiked_corpus
    k = 6
    nt = n_tiles_for(data.shape[0], data.shape[0])
    d_f, r_f = fused_topk(
        jnp.asarray(data), None, jnp.asarray(norms),
        jnp.asarray(valid), jnp.asarray(queries), metric="cosine", k=k,
        n_tiles=nt,
    )
    d_x, r_x = exact_topk(
        jnp.asarray(data), jnp.asarray(norms), jnp.asarray(valid),
        jnp.asarray(queries), metric="cosine", k=k,
    )
    d_f, r_f, d_x, r_x = map(np.asarray, (d_f, r_f, d_x, r_x))
    assert set(r_f[0]) == set(r_x[0]) == set(targets)
    np.testing.assert_allclose(d_f[:, 0], d_x[:, 0], rtol=1e-5, atol=1e-5)


def test_pos_path_int4_packed(spiked_corpus, pos_gate):
    from erlvectordb_tpu.core.search import exact_topk_int4
    from erlvectordb_tpu.core.store import _pack_int4

    data, norms, valid, queries, targets = spiked_corpus
    absmax = np.abs(data).max(axis=1)
    scales = np.where(absmax > 0, absmax / 7.0, 1.0).astype(np.float32)
    q4 = np.clip(np.round(data / scales[:, None]), -7, 7).astype(np.int8)
    packed = np.asarray(_pack_int4(jnp.asarray(q4)))
    k = 6
    nt = n_tiles_for(data.shape[0], data.shape[0])
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
    assert set(r_f[0]) == set(r_x[0]) == set(targets)
    np.testing.assert_allclose(d_f[:, 0], d_x[:, 0], rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# Intkey path (unit-code plane, raw-int32-dot selection + absmax rescore).
# Cosine only; gated like the pos path.  The spiked corpus's planted
# matches live in distinct 1024-row slices, so selection must be exact.
# ---------------------------------------------------------------------------


def _unit_quantize(data):
    n2 = np.linalg.norm(data, axis=1)
    f = np.where(n2 > 0, 127.0 / np.where(n2 > 0, n2, 1.0), 0.0)
    return np.clip(np.round(data * f[:, None]), -127, 127).astype(np.int8)


def test_intkey_gate_covers_mxu_metrics():
    import erlvectordb_tpu.ops.fused_topk as ft

    assert ft.intkey_applies("cosine", ft.POS_MIN_TILES, 10)
    # round 5: euclidean/dot ride the magnitude plane (exp_intkey_l2:
    # 1.41x/1.58x at 1.2M x 128)
    assert ft.intkey_applies("euclidean", ft.POS_MIN_TILES, 10)
    assert ft.intkey_applies("dot", ft.POS_MIN_TILES, 10)
    assert not ft.intkey_applies("manhattan", ft.POS_MIN_TILES, 10)
    assert not ft.intkey_applies("cosine", ft.POS_MIN_TILES - 1, 10)
    assert not ft.intkey_applies("cosine", ft.POS_MIN_TILES, ft.POS_MAX_K + 1)


def test_intkey_matches_xla(spiked_corpus, pos_gate):
    data, norms, valid, queries, targets = spiked_corpus
    codes, scales = _quantize(data)
    unit = _unit_quantize(data)
    unit[~valid] = 0
    k = 6
    nt = n_tiles_for(data.shape[0], data.shape[0])
    d_f, r_f = fused_topk(
        jnp.asarray(codes), jnp.asarray(scales), jnp.asarray(norms),
        jnp.asarray(valid), jnp.asarray(queries), metric="cosine", k=k,
        n_tiles=nt, codes_unit=jnp.asarray(unit),
    )
    d_x, r_x = exact_topk_int8(
        jnp.asarray(codes), jnp.asarray(scales), jnp.asarray(norms),
        jnp.asarray(valid), jnp.asarray(queries), metric="cosine", k=k,
    )
    _, r_wide = exact_topk_int8(
        jnp.asarray(codes), jnp.asarray(scales), jnp.asarray(norms),
        jnp.asarray(valid), jnp.asarray(queries), metric="cosine", k=24,
    )
    d_f, r_f, d_x, r_x, r_wide = map(np.asarray, (d_f, r_f, d_x, r_x, r_wide))
    assert set(r_f[0]) == set(r_x[0]) == set(targets)
    np.testing.assert_allclose(np.sort(d_f[0]), np.sort(d_x[0]),
                               rtol=1e-3, atol=1e-3)
    # random queries lose same-slice collisions at this tiny corpus; assert
    # every returned row is a genuine near neighbor and the top-1 is exact
    for b in range(1, queries.shape[0]):
        assert set(r_f[b]) <= set(r_wide[b]), b
    np.testing.assert_allclose(d_f[:, 0], d_x[:, 0], rtol=1e-3, atol=1e-3)


def test_intkey_deleted_rows_excluded(spiked_corpus, pos_gate):
    data, norms, valid, queries, targets = spiked_corpus
    codes, scales = _quantize(data)
    valid = valid.copy()
    valid[targets[1]] = False
    unit = _unit_quantize(data)
    unit[~valid] = 0
    k = 6
    nt = n_tiles_for(data.shape[0], data.shape[0])
    _, r_f = fused_topk(
        jnp.asarray(codes), jnp.asarray(scales), jnp.asarray(norms),
        jnp.asarray(valid), jnp.asarray(queries), metric="cosine", k=k,
        n_tiles=nt, codes_unit=jnp.asarray(unit),
    )
    r_f = np.asarray(r_f)
    assert targets[1] not in r_f[0]
    assert set(targets) - {targets[1]} <= set(r_f[0])


def _mag_quantize(data):
    s = float(np.linalg.norm(data, axis=1).max())
    return (np.clip(np.round(data * (127.0 / s)), -127, 127).astype(np.int8),
            s)


@pytest.mark.parametrize("metric", ["euclidean", "dot"])
def test_magplane_matches_xla(spiked_corpus, pos_gate, metric):
    """Round 5: euclidean/dot key selection on the MAGNITUDE plane (l2key
    bias fold / raw-dot ranking) matches the exact int8 scan's top results
    (exp_intkey_l2: 1.41x/1.58x at 1.2M x 128)."""
    data, norms, valid, queries, targets = spiked_corpus
    codes, scales = _quantize(data)
    mag, s = _mag_quantize(data)
    mag[~valid] = 0
    k = 6
    nt = n_tiles_for(data.shape[0], data.shape[0])
    ps = s if metric == "euclidean" else None
    d_f, r_f = fused_topk(
        jnp.asarray(codes), jnp.asarray(scales), jnp.asarray(norms),
        jnp.asarray(valid), jnp.asarray(queries), metric=metric, k=k,
        n_tiles=nt, codes_unit=jnp.asarray(mag), plane_scale=ps,
    )
    d_x, r_x = exact_topk_int8(
        jnp.asarray(codes), jnp.asarray(scales), jnp.asarray(norms),
        jnp.asarray(valid), jnp.asarray(queries), metric=metric, k=k,
    )
    _, r_wide = exact_topk_int8(
        jnp.asarray(codes), jnp.asarray(scales), jnp.asarray(norms),
        jnp.asarray(valid), jnp.asarray(queries), metric=metric, k=24,
    )
    d_f, r_f, d_x, r_x, r_wide = map(np.asarray, (d_f, r_f, d_x, r_x, r_wide))
    # planted near-copies of query 0 dominate under both metrics
    assert set(r_f[0]) == set(r_x[0]) == set(targets)
    np.testing.assert_allclose(np.sort(d_f[0]), np.sort(d_x[0]),
                               rtol=1e-3, atol=1e-3)
    for b in range(1, queries.shape[0]):
        assert set(r_f[b]) <= set(r_wide[b]), b
    # top-1 may swap with a NEAR-TIE neighbor (8-bit global-scale plane is
    # selection-grade); the returned distance must stay within tie width
    np.testing.assert_allclose(d_f[:, 0], d_x[:, 0], rtol=1e-2, atol=1e-2)


def test_magplane_deleted_rows_excluded(spiked_corpus, pos_gate):
    data, norms, valid, queries, targets = spiked_corpus
    codes, scales = _quantize(data)
    valid = valid.copy()
    valid[targets[1]] = False
    mag, s = _mag_quantize(data)
    mag[~valid] = 0
    k = 6
    nt = n_tiles_for(data.shape[0], data.shape[0])
    _, r_f = fused_topk(
        jnp.asarray(codes), jnp.asarray(scales), jnp.asarray(norms),
        jnp.asarray(valid), jnp.asarray(queries), metric="euclidean", k=k,
        n_tiles=nt, codes_unit=jnp.asarray(mag), plane_scale=s,
    )
    r_f = np.asarray(r_f)
    assert targets[1] not in r_f[0]
    assert set(targets) - {targets[1]} <= set(r_f[0])


def test_requantize_mag_matches_direct(spiked_corpus):
    """Deriving the magnitude plane from the absmax plane (snapshot
    restore) stays within one quantization step of direct-from-f32
    encoding and zeroes invalid rows."""
    from erlvectordb_tpu.ops.fused_topk import requantize_mag

    data, norms, valid, queries, targets = spiked_corpus
    codes, scales = _quantize(data)
    direct, s = _mag_quantize(data)
    derived = np.asarray(requantize_mag(
        jnp.asarray(codes), jnp.asarray(scales), jnp.asarray(valid), s))
    assert np.all(derived[~valid] == 0)
    diff = np.abs(derived[valid].astype(np.int32)
                  - direct[valid].astype(np.int32))
    assert diff.max() <= 2 and (diff > 1).mean() < 0.01


def test_requantize_unit_matches_direct(spiked_corpus):
    """Deriving the unit plane from the absmax plane (snapshot restore)
    stays within one quantization step of direct-from-f32 encoding and
    zeroes invalid rows."""
    from erlvectordb_tpu.ops.fused_topk import requantize_unit

    data, norms, valid, queries, targets = spiked_corpus
    codes, scales = _quantize(data)
    direct = _unit_quantize(data)
    derived = np.asarray(requantize_unit(
        jnp.asarray(codes), jnp.asarray(scales), jnp.asarray(norms),
        jnp.asarray(valid)))
    assert np.all(derived[~valid] == 0)
    diff = np.abs(derived[valid].astype(np.int32)
                  - direct[valid].astype(np.int32))
    assert diff.max() <= 2 and (diff > 1).mean() < 0.01
