"""extract / extract_matrix / extract_col — implemented here where the
reference prints "not implemented" (operations.hpp:355-410)."""
import numpy as np
import pytest

import graphblast_tpu as gb
from graphblast_tpu.dimension import DimensionException
from graphblast_tpu.semiring import Plus


def _rand_matrix(nr, nc, m):
    rng = np.random.default_rng(77)
    flat = rng.choice(nr * nc, size=m, replace=False)  # unique (r, c):
    rows, cols = flat // nc, flat % nc  # duplicate slots are legal but
    #                                     their dense oracle is ambiguous
    vals = rng.standard_normal(m).astype(np.float32)
    A = gb.Matrix.from_coo(rows, cols, vals, nr, nc)
    dense = np.zeros((nr, nc), np.float32)
    dense[rows, cols] = 0.0
    # from_coo dedups by keeping combined values — rebuild the oracle from
    # the matrix itself to stay exact
    return A, np.asarray(A.to_dense())


def test_extract_vector():
    u = gb.Vector.dense_from(np.arange(10, dtype=np.float32))
    w = gb.extract(u, [7, 2, 2, 9])
    np.testing.assert_array_equal(w.to_numpy(), [7, 2, 2, 9])
    # GrB_ALL
    np.testing.assert_array_equal(gb.extract(u).to_numpy(), np.arange(10))


def test_extract_vector_mask_accum():
    u = gb.Vector.dense_from(np.arange(10, dtype=np.float32))
    base = gb.Vector.dense_from(np.full(3, 100, np.float32))
    mask = gb.Vector.dense_from(np.asarray([1, 0, 1], np.float32))
    w = gb.extract(u, [4, 5, 6], mask=mask, accum=Plus, w=base)
    # masked lanes: 100 + u[idx]; unmasked keep base
    np.testing.assert_array_equal(w.to_numpy(), [104, 100, 106])


def test_extract_vector_bounds():
    u = gb.Vector.dense_from(np.arange(4, dtype=np.float32))
    with pytest.raises(DimensionException):
        gb.extract(u, [0, 4])
    with pytest.raises(DimensionException):
        gb.extract(u, [0, 1], mask=gb.Vector.full(3, 1.0))


def test_extract_matrix_submatrix():
    A, D = _rand_matrix(12, 9, 40)
    ri = np.asarray([3, 0, 7, 7])
    ci = np.asarray([8, 1, 1, 5])
    C = gb.extract_matrix(A, ri, ci)
    assert (C.nrows, C.ncols) == (4, 4)
    np.testing.assert_allclose(np.asarray(C.to_dense()),
                               D[np.ix_(ri, ci)], rtol=1e-6)


def test_extract_matrix_all_rows_or_cols():
    A, D = _rand_matrix(8, 6, 25)
    C = gb.extract_matrix(A, None, [5, 0])
    np.testing.assert_allclose(np.asarray(C.to_dense()),
                               D[:, [5, 0]], rtol=1e-6)
    C2 = gb.extract_matrix(A, [2, 2], None)
    np.testing.assert_allclose(np.asarray(C2.to_dense()),
                               D[[2, 2], :], rtol=1e-6)


def test_extract_matrix_masked():
    A, D = _rand_matrix(10, 10, 35)
    ri = np.arange(5)
    ci = np.arange(5)
    mrows, mcols = [0, 1, 4], [2, 3, 3]
    M = gb.Matrix.from_coo(mrows, mcols, np.ones(3), 5, 5)
    C = gb.extract_matrix(A, ri, ci, mask=M)
    want = np.zeros((5, 5), np.float32)
    for r, c in zip(mrows, mcols):
        want[r, c] = D[ri[r], ci[c]]
    np.testing.assert_allclose(np.asarray(C.to_dense()), want,
                               rtol=1e-6)


def test_extract_col():
    A, D = _rand_matrix(12, 9, 40)
    j = 4
    w = gb.extract_col(A, [11, 0, 3], j)
    np.testing.assert_allclose(w.to_numpy(), D[[11, 0, 3], j], rtol=1e-6)
    wall = gb.extract_col(A, None, j)
    np.testing.assert_allclose(wall.to_numpy(), D[:, j], rtol=1e-6)
    with pytest.raises(DimensionException):
        gb.extract_col(A, [0], 9)
