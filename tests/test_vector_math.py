"""vector_utils parity tests (reference src/vector_utils.erl:15-66 semantics)."""

import numpy as np
import pytest

from erlvectordb_tpu.utils import vector_math as vm


def test_cosine_similarity():
    assert float(vm.cosine_similarity([1, 0], [1, 0])) == pytest.approx(1.0)
    assert float(vm.cosine_similarity([1, 0], [0, 1])) == pytest.approx(0.0, abs=1e-7)
    assert float(vm.cosine_similarity([1, 0], [-1, 0])) == pytest.approx(-1.0)


def test_cosine_zero_norm_is_zero_similarity():
    assert float(vm.cosine_similarity([0, 0], [1, 0])) == 0.0
    assert float(vm.cosine_distance([0, 0], [1, 0])) == 1.0


def test_euclidean_manhattan_dot():
    assert float(vm.euclidean_distance([0, 0], [3, 4])) == pytest.approx(5.0)
    assert float(vm.manhattan_distance([0, 0], [3, 4])) == pytest.approx(7.0)
    assert float(vm.dot_product([1, 2, 3], [4, 5, 6])) == pytest.approx(32.0)


def test_normalize():
    n = np.asarray(vm.normalize([3.0, 4.0]))
    np.testing.assert_allclose(n, [0.6, 0.8], atol=1e-6)
    z = np.asarray(vm.normalize([0.0, 0.0]))
    np.testing.assert_allclose(z, [0.0, 0.0])


def test_norm_and_arithmetic():
    assert float(vm.vector_norm([3, 4])) == pytest.approx(5.0)
    np.testing.assert_allclose(np.asarray(vm.vector_add([1, 2], [3, 4])), [4, 6])
    np.testing.assert_allclose(np.asarray(vm.vector_subtract([3, 4], [1, 2])), [2, 2])
    np.testing.assert_allclose(np.asarray(vm.vector_multiply([1, 2], 2.5)), [2.5, 5.0])


def test_batched_forms():
    a = np.random.default_rng(0).standard_normal((5, 8)).astype(np.float32)
    b = np.random.default_rng(1).standard_normal((5, 8)).astype(np.float32)
    d = np.asarray(vm.euclidean_distance(a, b))
    assert d.shape == (5,)
    np.testing.assert_allclose(d, np.linalg.norm(a - b, axis=1), rtol=1e-5)
