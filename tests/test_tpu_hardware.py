"""Opt-in REAL-TPU smoke tests — skipped under the CPU CI platform.

Run on hardware with:  EVDB_TPU_TESTS=1 python -m pytest tests/test_tpu_hardware.py --no-header -q -p no:cacheprovider
(the repo conftest pins tests to CPU UNLESS EVDB_TPU_TESTS=1 is set —
see tests/conftest.py; without that variable every test here silently
skips.  This module also re-checks the actual backend and skips itself
when no TPU is present.)
"""

import numpy as np
import pytest

import jax

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a real TPU backend"
)


@requires_tpu
def test_fused_kernel_int8_on_tpu(rng):
    from erlvectordb_tpu.core.store import VectorStore

    data = rng.standard_normal((8192, 64)).astype(np.float32)
    store = VectorStore.from_matrix("tpu8", data, dtype="int8")
    res = store.search(data[123], k=1)
    assert res[0][0] == "123"


@requires_tpu
def test_fused_kernel_int4_on_tpu(rng):
    from erlvectordb_tpu.core.store import VectorStore

    data = rng.standard_normal((8192, 64)).astype(np.float32)
    store = VectorStore.from_matrix("tpu4", data, dtype="int4")
    res = store.search(data[99], k=1)
    assert res[0][0] == "99"


@requires_tpu
def test_adc_pallas_on_tpu(rng):
    import jax.numpy as jnp

    from erlvectordb_tpu.ops.adc_pallas import adc_n_tiles, adc_search_fused
    from erlvectordb_tpu.quant.pq import PQCodebook

    n, d = 4096, 64
    z = rng.standard_normal((n, 8)).astype(np.float32)
    proj = rng.standard_normal((8, d)).astype(np.float32)
    data = z @ proj
    cb = PQCodebook.fit(data, m=8, k=64, iters=8)
    codes = cb.encode(data)
    absmax = np.abs(data).max(axis=1)
    scales = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    i8 = np.clip(np.round(data / scales[:, None]), -127, 127).astype(np.int8)
    nt = adc_n_tiles(n)
    _, rows = adc_search_fused(
        codes, cb.codebooks, jnp.asarray(i8), jnp.asarray(scales),
        jnp.asarray(data[:4]), n, k=3, c=64, n_tiles=nt,
    )
    assert np.asarray(rows)[0][0] == 0


@requires_tpu
@pytest.mark.parametrize("dtype,d,k", [
    ("float32", 128, 8),    # deep extraction (t=8) on wide f32 rows
    ("float32", 32, 4),
    ("int8", 384, 10),      # wide int8 rows -> sub=1 branch
    ("int8", 64, 16),
    ("int4", 256, 8),
])
def test_fused_shape_matrix_on_tpu(rng, dtype, d, k):
    """Compile/VMEM coverage across the (dtype, width, extraction-depth)
    matrix — interpret-mode CI cannot catch Mosaic legalization or scoped
    VMEM failures."""
    from erlvectordb_tpu.core.store import VectorStore

    n = 9000  # 3 tiles: exercises odd-tile-count sub handling
    data = rng.standard_normal((n, d)).astype(np.float32)
    store = VectorStore.from_matrix(f"m_{dtype}_{d}", data, dtype=dtype)
    res = store.search_batch(data[:4], k=k)
    assert res[0][0][0] == "0"
    assert len(res[3]) == k


@requires_tpu
def test_sharded_fused_on_tpu(rng):
    from erlvectordb_tpu.parallel import ShardedVectorStore, make_mesh

    mesh = make_mesh(n_data=1, n_replica=1)
    data = rng.standard_normal((8192, 768)).astype(np.float32)
    sh = ShardedVectorStore.from_matrix("shtpu", mesh, data, dtype="int8")
    assert sh.search(data[77], k=1)[0][0] == "77"


@requires_tpu
@pytest.mark.parametrize("bq", [1, 2, 8])
def test_small_batch_rows_on_tpu(rng, bq):
    """Small-batch fused readback returns CORRECT row indices.

    Regression: on the tunneled v5e backend, the old (dists | bitcast
    rows) pack read back ZEROS for the rows half at sub-tile shapes
    ([8, 32] corrupt, [64, 32] fine) — every small-batch search returned
    id "0" for every hit while distances stayed correct, so only an
    id-checking test catches it.  The pack now carries rows as exact f32
    values (hi/lo 12-bit columns) — see core/store.py::_pack_results."""
    from erlvectordb_tpu.core.store import VectorStore

    data = rng.standard_normal((20000, 100)).astype(np.float32)
    store = VectorStore.from_matrix(f"smallb_{bq}", data, dtype="int8")
    res = store.search_batch(data[17:17 + bq], k=5)
    for i in range(bq):
        assert res[i][0][0] == str(17 + i), res[i][:2]


@requires_tpu
def test_absolute_recall_target_at_1m_on_tpu(rng):
    """VERDICT r4 #1 done-bar: measured ABSOLUTE recall@10 >= target on
    held-out queries at >= 1M rows, via an exact-mode calibration curve
    (exact f32 ground truth from one brute device scan), plus the
    documented rejection of targets above the quantization ceiling."""
    from erlvectordb_tpu.core.calibration import (
        RecallUnachievable,
        exact_ground_truth,
        recall_vs,
    )
    from erlvectordb_tpu.core.cell_probe import CellProbeIndex

    n, d = 1_048_576, 128
    centers = rng.standard_normal((2048, d)).astype(np.float32)
    owner = rng.integers(0, 2048, n)
    data = centers[owner] + 0.3 * rng.standard_normal((n, d)).astype(np.float32)
    held = (centers[rng.integers(0, 2048, 128)]
            + 0.3 * rng.standard_normal((128, d)).astype(np.float32))
    eval_q = (centers[rng.integers(0, 2048, 128)]
              + 0.3 * rng.standard_normal((128, d)).astype(np.float32))

    idx = CellProbeIndex.build(data, np.arange(n, dtype=np.int64),
                               cell_rows=96, cell_cap=128, iters=10)
    gt = exact_ground_truth(data, held, k=10, metric="cosine")
    idx.calibrate_nprobe(queries=held, k=10, metric="cosine",
                         ground_truth=gt)
    cal = idx._calib.get(10, "cosine")
    assert cal.mode == "exact" and 0.9 < cal.ceiling <= 1.0

    target = 0.95
    if cal.ceiling < target:  # int8 residuals should clear 0.95 easily
        pytest.fail(f"quantization ceiling {cal.ceiling:.4f} below 0.95")
    gt_eval = exact_ground_truth(data, eval_q, k=10, metric="cosine")
    _, got = idx.search(eval_q, k=10, recall_target=target, metric="cosine")
    measured = recall_vs(gt_eval, got, 10)
    # held-out absolute recall meets the target (small sampling slack)
    assert measured >= target - 0.02, (measured, target)

    if cal.ceiling < 1.0 - 1e-9:
        with pytest.raises(RecallUnachievable):
            idx.search(eval_q[:2], k=10, metric="cosine",
                       recall_target=min(1.0, cal.ceiling + 0.005))
