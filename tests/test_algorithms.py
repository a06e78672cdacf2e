"""Tier-2 algorithm tests: device algorithms vs pure-NumPy goldens on the
reference's own fixtures (SURVEY.md §4 tier 2; reference: example/g*.cu
VERIFY_LIST pattern)."""
import numpy as np
import pytest

import graphblast_tpu as gb
from graphblast_tpu import Descriptor, Direction
from graphblast_tpu.algorithms import bfs, sssp, pr, reference

MAXF = float(np.finfo(np.float32).max)


@pytest.mark.parametrize("mode", ["fused", "stepped"])
@pytest.mark.parametrize("source", [0, 7])
def test_bfs_matches_golden(chesapeake, mode, source):
    got = bfs(chesapeake, source, mode=mode).to_numpy()
    want = reference.bfs_cpu(chesapeake, source)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("direction", [Direction.PUSHONLY, Direction.PULLONLY,
                                       Direction.PUSHPULL])
def test_bfs_directions_agree(test_cc, direction):
    desc = gb.BFS_TUNED.replace(mxv_mode=direction)
    got = bfs(test_cc, 0, desc=desc).to_numpy()
    want = reference.bfs_cpu(test_cc, 0)
    np.testing.assert_array_equal(got, want)


def test_bfs_disconnected(test_cc):
    # test_cc has multiple components: unreached stay 0
    got = bfs(test_cc, 0).to_numpy()
    want = reference.bfs_cpu(test_cc, 0)
    np.testing.assert_array_equal(got, want)
    assert (got == 0).any()


@pytest.mark.parametrize("mode", ["fused", "stepped"])
def test_sssp_unit_weights(chesapeake, mode):
    got = sssp(chesapeake, 3, mode=mode).to_numpy()
    want = reference.sssp_cpu(chesapeake, 3)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_sssp_weighted(rng):
    # random weighted digraph
    n = 30
    d = (rng.rand(n, n) < 0.15) * (rng.rand(n, n) * 5 + 0.1)
    np.fill_diagonal(d, 0)
    A = gb.Matrix.from_dense(d.astype(np.float32))
    got = sssp(A, 0).to_numpy()
    want = reference.sssp_cpu(A, 0)
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("direction", [Direction.PUSHONLY, Direction.PULLONLY])
def test_sssp_directions_agree(chesapeake, direction):
    desc = Descriptor(mxv_mode=direction)
    got = sssp(chesapeake, 0, desc=desc).to_numpy()
    want = reference.sssp_cpu(chesapeake, 0)
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.parametrize("mode", ["fused", "stepped"])
def test_pagerank(test_pr, mode):
    got = pr(test_pr, alpha=0.85, eps=1e-9, mode=mode).to_numpy()
    want = reference.pr_cpu(test_pr, alpha=0.85, eps=1e-12, max_niter=200)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-6)
    assert np.isclose(got.sum(), 1.0, atol=0.05)  # rank mass ≈ 1


def test_pagerank_chesapeake(chesapeake):
    got = pr(chesapeake, alpha=0.85, eps=1e-10).to_numpy()
    want = reference.pr_cpu(chesapeake, alpha=0.85, eps=1e-13, max_niter=300)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-6)


def test_sssp_monoid_pull_parity(chesapeake, monkeypatch):
    """SSSP with the Pallas monoid pull plan forced (interpret mode on CPU)
    must match the golden and the planless run exactly — the integrated
    dispatch branch (mxv_dual → spmv_monoid), not just the bare kernel."""
    monkeypatch.setenv("GRB_MONOID_PULL_FORCE", "1")
    desc = Descriptor(mxv_mode=Direction.PULLONLY)   # every iter on the plan
    got = sssp(chesapeake, 3, desc=desc).to_numpy()
    want = reference.sssp_cpu(chesapeake, 3)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    monkeypatch.delenv("GRB_MONOID_PULL_FORCE")
    base = sssp(chesapeake, 3, desc=desc).to_numpy()
    np.testing.assert_array_equal(got, base)


def test_cc_monoid_pull_parity(chesapeake, test_cc, monkeypatch):
    """CC with the Pallas monoid pull forced must produce the same labels
    as the planless run and satisfy the property verifier (parent ids are
    f32-exact below 2^24; the IMAX sentinel maps to >= n both ways)."""
    from graphblast_tpu.algorithms.cc import cc, verify_cc

    for A in (chesapeake, test_cc):
        base = cc(A).to_numpy()
        monkeypatch.setenv("GRB_MONOID_PULL_FORCE", "1")
        got = cc(A).to_numpy()
        monkeypatch.delenv("GRB_MONOID_PULL_FORCE")
        np.testing.assert_array_equal(got, base)
        assert verify_cc(A, got)
