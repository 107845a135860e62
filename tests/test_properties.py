"""Property-based tests (hypothesis) — parity with the reference's
property-test style (examples/test_socket_handler.py et al. used @given),
applied to the core invariants: quantization error bounds, search ordering,
round-trip identities, packing bijectivity."""

import numpy as np
from hypothesis import given, settings, strategies as st

from erlvectordb_tpu.quant import compress_vector, decompress_vector

_finite = st.floats(min_value=-1e4, max_value=1e4, allow_nan=False,
                    allow_infinity=False, width=32)


def _vec(min_size=2, max_size=64):
    return st.lists(_finite, min_size=min_size, max_size=max_size).map(
        lambda xs: np.asarray(xs, np.float32)
    )


@settings(max_examples=25, deadline=None)
@given(_vec())
def test_8bit_roundtrip_bound(v):
    recon = decompress_vector(compress_vector(v, "8bit"))
    bound = (float(v.max()) - float(v.min())) / 255 + 1e-3
    assert np.max(np.abs(recon - v)) <= bound


@settings(max_examples=25, deadline=None)
@given(_vec())
def test_4bit_roundtrip_bound(v):
    recon = decompress_vector(compress_vector(v, "4bit"))
    bound = (float(v.max()) - float(v.min())) / 15 + 1e-3
    assert np.max(np.abs(recon - v)) <= bound


@settings(max_examples=25, deadline=None)
@given(_vec())
def test_zlib_exact(v):
    recon = decompress_vector(compress_vector(v, "zlib"))
    np.testing.assert_array_equal(recon, v)


@settings(max_examples=10, deadline=None)
@given(
    st.integers(min_value=2, max_value=40),   # corpus size
    st.integers(min_value=2, max_value=16),   # dim
    st.integers(min_value=1, max_value=8),    # k
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_search_invariants(n, d, k, seed):
    """For any corpus: results sorted ascending, no duplicates, <= min(k, n),
    and the query vector itself (when present) ranks first for euclidean."""
    from erlvectordb_tpu.core.store import VectorStore

    rng = np.random.default_rng(seed)
    data = rng.standard_normal((n, d)).astype(np.float32)
    store = VectorStore(f"prop{seed}", metric="euclidean")
    store.insert_batch([f"v{i}" for i in range(n)], data)
    res = store.search(data[0], k=k)
    assert len(res) <= min(k, n)
    ids = [r[0] for r in res]
    assert len(set(ids)) == len(ids)
    dists = [r[2] for r in res]
    assert dists == sorted(dists)
    # the query itself ranks (near-)first; the matmul expansion
    # |q|^2 - 2q.x + |x|^2 loses ~sqrt(eps)*|x| to cancellation in f32
    norm = float(np.linalg.norm(data[0]))
    assert res[0][2] <= max(1e-2, 2e-3 * norm)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=-7, max_value=7), min_size=2,
                max_size=64).filter(lambda xs: len(xs) % 2 == 0))
def test_int4_pack_unpack_bijective(codes):
    import jax.numpy as jnp

    from erlvectordb_tpu.core.search import unpack_int4
    from erlvectordb_tpu.core.store import _pack_int4

    q = np.asarray(codes, np.int8)[None, :]
    packed = np.asarray(_pack_int4(jnp.asarray(q)))
    back = np.asarray(unpack_int4(jnp.asarray(packed)))
    np.testing.assert_array_equal(back, q)
