"""Matrix assign family + matrix eWiseAdd — implemented here where the
reference prints "not implemented" (operations.hpp:300-318, 440-552)."""
import numpy as np
import pytest

import graphblast_tpu as gb
from graphblast_tpu.dimension import DimensionException
from graphblast_tpu.semiring import (MinimumPlusSemiring, Minimum, Plus,
                                     PlusMultipliesSemiring)


def _mat(rng, nr, nc, m):
    flat = rng.choice(nr * nc, size=m, replace=False)  # unique (r, c):
    rows, cols = flat // nc, flat % nc  # duplicate slots are legal but
    #                                     their dense oracle is ambiguous
    vals = rng.standard_normal(m).astype(np.float32)
    A = gb.Matrix.from_coo(rows, cols, vals, nr, nc)
    return A, np.asarray(A.to_dense())


def test_assign_matrix_overwrite_and_accum():
    rng = np.random.default_rng(5)
    C, D = _mat(rng, 8, 8, 20)
    A, DA = _mat(rng, 3, 2, 5)
    ri, ci = np.asarray([1, 4, 6]), np.asarray([0, 7])

    C2 = gb.assign_matrix(C, A, ri, ci)
    want = D.copy()
    # subassign without accum: A's stored entries overwrite; other C
    # entries (incl. block slots A lacks) survive
    mask_entries = DA != 0
    for i in range(3):
        for j in range(2):
            if mask_entries[i, j]:
                want[ri[i], ci[j]] = DA[i, j]
    np.testing.assert_allclose(np.asarray(C2.to_dense()), want, rtol=1e-6)

    C3 = gb.assign_matrix(C, A, ri, ci, accum=Plus)
    want3 = D.copy()
    for i in range(3):
        for j in range(2):
            if mask_entries[i, j]:
                want3[ri[i], ci[j]] = D[ri[i], ci[j]] + DA[i, j]
    np.testing.assert_allclose(np.asarray(C3.to_dense()), want3, rtol=1e-6)


def test_assign_matrix_checks():
    rng = np.random.default_rng(6)
    C, _ = _mat(rng, 5, 5, 10)
    A, _ = _mat(rng, 2, 2, 3)
    with pytest.raises(DimensionException):
        gb.assign_matrix(C, A, [0, 1, 2], [0, 1])
    with pytest.raises(ValueError):
        gb.assign_matrix(C, A, [1, 1], [0, 1])


def test_assign_matrix_scalar_masked():
    rng = np.random.default_rng(7)
    C, D = _mat(rng, 6, 6, 12)
    M = gb.Matrix.from_coo([0, 1], [1, 0], np.ones(2), 2, 2)
    C2 = gb.assign_matrix_scalar(C, 9.0, [2, 5], [3, 0], mask=M)
    want = D.copy()
    want[2, 0] = 9.0   # mask (0,1) → (ri[0], ci[1])
    want[5, 3] = 9.0   # mask (1,0) → (ri[1], ci[0])
    np.testing.assert_allclose(np.asarray(C2.to_dense()), want, rtol=1e-6)


def test_assign_matrix_col_row():
    rng = np.random.default_rng(8)
    C, D = _mat(rng, 6, 5, 12)
    u = gb.Vector.dense_from(np.asarray([10.0, 20.0], np.float32))
    C2 = gb.assign_matrix_col(C, u, [4, 1], 2)
    want = D.copy()
    want[4, 2] = 10.0
    want[1, 2] = 20.0
    np.testing.assert_allclose(np.asarray(C2.to_dense()), want, rtol=1e-6)

    v = gb.Vector.dense_from(np.asarray([7.0, 8.0, 9.0], np.float32))
    C3 = gb.assign_matrix_row(C, v, 3, [0, 4, 2], accum=Minimum)
    want3 = D.copy()
    for j, val in zip([0, 4, 2], [7.0, 8.0, 9.0]):
        want3[3, j] = min(D[3, j], val) if D[3, j] != 0 else val
    np.testing.assert_allclose(np.asarray(C3.to_dense()), want3, rtol=1e-6)


def test_ewiseadd_matrix_union():
    rng = np.random.default_rng(9)
    A, DA = _mat(rng, 7, 7, 14)
    B, DB = _mat(rng, 7, 7, 14)
    C = gb.eWiseAdd_matrix(A, B, PlusMultipliesSemiring)
    np.testing.assert_allclose(np.asarray(C.to_dense()), DA + DB,
                               rtol=1e-5, atol=1e-6)
    # min-monoid union: entries in one operand pass through
    Cm = gb.eWiseAdd_matrix(A, B, MinimumPlusSemiring)
    both = (DA != 0) & (DB != 0)
    want = np.where(both, np.minimum(DA, DB), DA + DB)
    np.testing.assert_allclose(np.asarray(Cm.to_dense()), want,
                               rtol=1e-5, atol=1e-6)


def test_ewiseadd_matrix_masked_and_checks():
    rng = np.random.default_rng(10)
    A, DA = _mat(rng, 5, 5, 10)
    B, DB = _mat(rng, 5, 5, 10)
    M = gb.Matrix.from_coo([0, 2], [0, 2], np.ones(2), 5, 5)
    C = gb.eWiseAdd_matrix(A, B, PlusMultipliesSemiring, mask=M)
    want = np.zeros_like(DA)
    for i, j in [(0, 0), (2, 2)]:
        want[i, j] = DA[i, j] + DB[i, j]
    np.testing.assert_allclose(np.asarray(C.to_dense()), want,
                               rtol=1e-5, atol=1e-6)
    with pytest.raises(DimensionException):
        gb.eWiseAdd_matrix(A, _mat(rng, 5, 4, 5)[0], PlusMultipliesSemiring)


def test_scale_matrix_and_vector():
    """scale (reference operations.hpp:711-741 stubs): op(stored, val)."""
    rng = np.random.default_rng(11)
    A, D = _mat(rng, 6, 6, 12)
    B = gb.scale_matrix(A, gb.semiring.Multiplies, 3.0)
    np.testing.assert_allclose(np.asarray(B.to_dense()), D * 3.0, rtol=1e-6)

    u = gb.Vector.dense_from(np.arange(5, dtype=np.float32))
    np.testing.assert_allclose(
        gb.scale_vector(u, gb.semiring.Multiplies, 2.0).to_numpy(),
        np.arange(5) * 2.0)
    us = gb.Vector.sparse_from(8, [1, 4], [3.0, 5.0])
    ws = gb.scale_vector(us, gb.semiring.Plus, 10.0)
    out = ws.to_numpy()
    assert out[1] == 13.0 and out[4] == 15.0 and out[0] == 0.0


def test_review_regressions_empty_mask_and_dtype():
    """r3 self-review findings: empty-structure mask must not crash
    extract_matrix, and construction ops must keep the input dtype."""
    rng = np.random.default_rng(12)
    A, D = _mat(rng, 6, 6, 10)
    M0 = gb.Matrix.from_coo([], [], [], 3, 3)
    C = gb.extract_matrix(A, [0, 1, 2], [0, 1, 2], mask=M0)
    assert C.nvals == 0

    # int32 matrix above 2^24: float32 coercion would silently round
    big = np.int32(2**24 + 1)
    Ci = gb.Matrix.from_coo([0, 1], [0, 1], np.asarray([big, 7], np.int32),
                            4, 4, dtype=np.int32)
    out = gb.assign_matrix_scalar(Ci, 5, [2], [3])
    assert out.dtype == np.int32
    assert int(np.asarray(out.to_dense())[0, 0]) == int(big)
    out2 = gb.eWiseAdd_matrix(Ci, Ci, gb.semiring.PlusMultipliesSemiring)
    assert int(np.asarray(out2.to_dense())[1, 1]) == 14
