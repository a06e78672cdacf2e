"""DenseMatrix container + dense contractions (reference surface:
backend/cuda/dense_matrix.hpp:17-80; gemm/gemv exceed the reference's
declared-but-unimplemented gemm.hpp/gemv.hpp)."""
import numpy as np
import pytest

import jax.numpy as jnp

from graphblast_tpu import DenseMatrix, Matrix, gemm, gemv, mxm_dense
from graphblast_tpu.semiring import (MinimumPlusSemiring, Plus,
                                     PlusMultipliesSemiring)
from graphblast_tpu.dimension import DimensionException


def test_build_roundtrip(rng):
    a = rng.randn(5, 7).astype(np.float32)
    D = DenseMatrix.from_dense(a)
    assert D.shape == (5, 7) and D.nvals == 35
    np.testing.assert_array_equal(D.to_dense(), a)
    r, c, v = D.extract_tuples()
    np.testing.assert_array_equal(v.reshape(5, 7), a)
    assert r[0] == 0 and c[0] == 0 and r[-1] == 4 and c[-1] == 6
    D.check()


def test_flat_build_and_coo_build():
    D = DenseMatrix.build(np.arange(12, dtype=np.float32), 3, 4)
    assert D.extract_element(1, 2) == 6.0
    # COO with plus-dup combining
    C = DenseMatrix.from_coo([0, 0, 2], [1, 1, 3], [2.0, 3.0, 7.0], 3, 4,
                             dup=Plus)
    want = np.zeros((3, 4), np.float32)
    want[0, 1] = 5.0
    want[2, 3] = 7.0
    np.testing.assert_array_equal(C.to_dense(), want)


def test_functional_updates():
    D = DenseMatrix.zeros(2, 3)
    D2 = D.set_element(9.0, 1, 2)
    assert D.extract_element(1, 2) == 0.0           # original untouched
    assert D2.extract_element(1, 2) == 9.0
    assert D2.fill(4.0).to_dense().sum() == 24.0
    asc = D.fill_ascending(10).to_dense()
    np.testing.assert_array_equal(asc.reshape(-1), np.arange(10, 16))
    assert D2.clear().to_dense().sum() == 0.0


def test_resize_and_transpose(rng):
    a = rng.randn(4, 3).astype(np.float32)
    D = DenseMatrix.from_dense(a)
    np.testing.assert_array_equal(D.T.to_dense(), a.T)
    grown = D.resize(6, 5).to_dense()
    assert grown.shape == (6, 5)
    np.testing.assert_array_equal(grown[:4, :3], a)
    assert grown[4:].sum() == 0
    shrunk = D.resize(2, 2).to_dense()
    np.testing.assert_array_equal(shrunk, a[:2, :2])


def test_gemm_plus_times(rng):
    a = rng.randn(5, 6).astype(np.float32)
    b = rng.randn(6, 4).astype(np.float32)
    C = gemm(DenseMatrix.from_dense(a), DenseMatrix.from_dense(b),
             PlusMultipliesSemiring)
    np.testing.assert_allclose(C.to_dense(), a @ b, rtol=1e-5)


def test_gemm_min_plus(rng):
    a = rng.rand(4, 5).astype(np.float32)
    b = rng.rand(5, 3).astype(np.float32)
    C = gemm(DenseMatrix.from_dense(a), DenseMatrix.from_dense(b),
             MinimumPlusSemiring)
    want = (a[:, :, None] + b[None, :, :]).min(axis=1)
    np.testing.assert_allclose(C.to_dense(), want, rtol=1e-6)


def test_gemv(rng):
    a = rng.randn(5, 6).astype(np.float32)
    x = rng.randn(6).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(gemv(DenseMatrix.from_dense(a), x,
                        PlusMultipliesSemiring)),
        a @ x, rtol=1e-5)
    want = (a + x[None, :]).min(axis=1)
    np.testing.assert_allclose(
        np.asarray(gemv(DenseMatrix.from_dense(a), x, MinimumPlusSemiring)),
        want, rtol=1e-6)


def test_gemm_dim_check():
    with pytest.raises(DimensionException):
        gemm(DenseMatrix.zeros(2, 3), DenseMatrix.zeros(4, 2),
             PlusMultipliesSemiring)
    with pytest.raises(DimensionException):
        gemv(DenseMatrix.zeros(2, 3), jnp.zeros(5), PlusMultipliesSemiring)


def test_mxm_dense_accepts_dense_matrix(rng):
    a = (rng.rand(6, 6) < 0.4).astype(np.float32)
    A = Matrix.from_dense(a)
    b = rng.randn(6, 3).astype(np.float32)
    got = np.asarray(mxm_dense(A, DenseMatrix.from_dense(b),
                               PlusMultipliesSemiring))
    np.testing.assert_allclose(got, a @ b, rtol=1e-5, atol=1e-6)


def test_pytree_flows_through_jit(rng):
    import jax

    D = DenseMatrix.from_dense(rng.randn(3, 3).astype(np.float32))

    @jax.jit
    def f(M: DenseMatrix):
        return DenseMatrix(M.nrows, M.ncols, M.data * 2.0)

    np.testing.assert_allclose(f(D).to_dense(), D.to_dense() * 2.0)
