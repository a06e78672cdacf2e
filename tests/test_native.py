"""Native C++ ingest parity tests: the ctypes graphio library must match the
pure-Python mmio pipeline bit-for-bit (the Python module is ground truth)."""
import os

import numpy as np
import pytest

from graphblast_tpu import native
from graphblast_tpu.io import mmio


needs_native = pytest.mark.skipif(native.get_lib() is None,
                                  reason="native toolchain unavailable")


@needs_native
@pytest.mark.parametrize("fname,directed", [
    ("chesapeake.mtx", 0),
    ("chesapeake.mtx", 1),
    ("test_cc.mtx", 0),
    ("test_pr.mtx", 0),
    ("test_spgemm.mtx", 0),
])
def test_read_mtx_matches_python(data_dir, fname, directed):
    path = os.path.join(data_dir, fname)
    got = native.read_mtx_native(path, directed, remove_self_loops=True)
    assert got is not None
    r_n, c_n, v_n, nr_n, nc_n = got
    # python ground truth (bypass native inside read_mtx by direct parse)
    os.environ["GRB_NATIVE"] = "1"
    import importlib

    r_p, c_p, v_p, nr_p, nc_p, _ = _python_read(path, directed)
    assert (nr_n, nc_n) == (nr_p, nc_p)
    np.testing.assert_array_equal(r_n, r_p)
    np.testing.assert_array_equal(c_n, c_p)
    np.testing.assert_allclose(v_n, v_p)


def _python_read(path, directed):
    """Pure-python readMtx (native path bypassed)."""
    import numpy as np

    with open(path) as f:
        info = mmio.read_banner(f.readline())
        line = f.readline()
        while line.startswith("%"):
            line = f.readline()
        nrows, ncols, nvals = (int(x) for x in line.split())
        data = np.loadtxt(f, ndmin=2, max_rows=nvals)
    rows = data[:, 0].astype(np.int64) - 1
    cols = data[:, 1].astype(np.int64) - 1
    vals = (np.ones(nvals) if (info.is_pattern or data.shape[1] < 3)
            else data[:, 2])
    und = info.is_symmetric or directed == 2
    if directed == 1:
        und = False
    rows, cols, vals = mmio.canonicalize_coo(rows, cols, vals, undirected=und,
                                             remove_self_loops=True)
    return rows, cols, vals, nrows, ncols, info


@needs_native
def test_canonicalize_matches_python(rng):
    rows = rng.randint(0, 50, 300).astype(np.int64)
    cols = rng.randint(0, 50, 300).astype(np.int64)
    vals = rng.rand(300)
    for und in (False, True):
        got = native.canonicalize_native(rows, cols, vals, und, True)
        want = mmio.canonicalize_coo(rows, cols, vals, undirected=und,
                                     remove_self_loops=True)
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])
        np.testing.assert_allclose(got[2], want[2])


def test_native_coo_to_csr_matches_numpy():
    from graphblast_tpu.native import coo_to_csr_native

    rng = np.random.RandomState(0)
    m, n = 5000, 300
    rows = rng.randint(0, n, m).astype(np.int64)
    cols = rng.randint(0, n, m).astype(np.int64)
    vals = rng.rand(m)
    out = coo_to_csr_native(rows, cols, vals, n, n)
    if out is None:
        import pytest
        pytest.skip("native toolchain unavailable")
    ptr, c, v = out
    order = np.lexsort((cols, rows))
    want_ptr = np.zeros(n + 1, np.int64)
    np.add.at(want_ptr, rows + 1, 1)
    np.testing.assert_array_equal(ptr, np.cumsum(want_ptr))
    np.testing.assert_array_equal(c, cols[order])
    np.testing.assert_allclose(v, vals[order])
