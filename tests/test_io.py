"""IO tier-1 tests (reference analog: test/gmmio.cu, test/gbuild.cu,
test/gutil.cu — mtx parsing, COO canonicalization, CSR building)."""
import os

import numpy as np
import pytest

from graphblast_tpu import Matrix, SparseFormat
from graphblast_tpu.io import mmio


def test_read_banner():
    info = mmio.read_banner("%%MatrixMarket matrix coordinate pattern symmetric")
    assert info.is_symmetric and info.is_pattern


def test_symmetric_doubling(data_dir):
    # chesapeake is 'pattern symmetric': every off-diagonal edge appears twice
    rows, cols, vals, nrows, ncols, info = mmio.read_mtx(
        os.path.join(data_dir, "chesapeake.mtx"))
    assert nrows == ncols == 39
    assert info.is_symmetric
    # doubling: for every (r, c), (c, r) present
    fwd = set(zip(rows.tolist(), cols.tolist()))
    assert all((c, r) in fwd for r, c in fwd)
    # no self loops, no dups
    assert all(r != c for r, c in fwd)
    assert len(fwd) == len(rows)


def test_force_directed(data_dir):
    r1, *_ = mmio.read_mtx(os.path.join(data_dir, "chesapeake.mtx"), directed=1)
    r0, *_ = mmio.read_mtx(os.path.join(data_dir, "chesapeake.mtx"), directed=0)
    assert len(r1) * 2 == len(r0)  # no doubling when forced directed


def test_coo_to_csr_roundtrip(rng):
    n, nnz = 37, 200
    rows = rng.randint(0, n, nnz)
    cols = rng.randint(0, n, nnz)
    vals = rng.rand(nnz)
    rows, cols, vals = mmio.canonicalize_coo(rows, cols, vals, undirected=False,
                                             remove_self_loops=False)
    ptr, ci, v = mmio.coo_to_csr(rows, cols, vals, n)
    assert ptr[0] == 0 and ptr[-1] == len(rows)
    dense = np.zeros((n, n))
    for i in range(n):
        for e in range(ptr[i], ptr[i + 1]):
            dense[i, ci[e]] = v[e]
    expect = np.zeros((n, n))
    expect[rows, cols] = vals
    np.testing.assert_allclose(dense, expect)


def test_matrix_build_and_invariants(chesapeake):
    A = chesapeake
    assert A.check()
    assert A.symmetric  # undirected graph → CSC aliases CSR
    assert A.col_ptr is A.row_ptr


def test_matrix_dense_roundtrip(rng):
    d = (rng.rand(13, 17) < 0.2) * rng.rand(13, 17)
    A = Matrix.from_dense(d.astype(np.float32))
    np.testing.assert_allclose(A.to_dense(), d.astype(np.float32), rtol=1e-6)


def test_csronly_format(rng):
    d = (rng.rand(9, 9) < 0.3) * rng.rand(9, 9)
    A = Matrix.from_dense(d.astype(np.float32))
    r, c, v = A.extract_tuples()
    B = Matrix.from_coo(r, c, v, 9, 9, fmt=SparseFormat.CSRONLY)
    if not B.symmetric:
        assert B.col_ptr is None
