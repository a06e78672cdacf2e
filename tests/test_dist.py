"""Multi-device tests on the 8-way virtual CPU mesh (SURVEY.md §4: the tier
the reference lacks): shard-exchange correctness == single-device results."""
import numpy as np
import pytest

import jax

import graphblast_tpu as gb
from graphblast_tpu.algorithms import reference
from graphblast_tpu.parallel import bfs_dist, pr_dist, sssp_dist, partition
from graphblast_tpu.semiring import (LogicalOrAndSemiring,
                                     MinimumPlusSemiring,
                                     PlusMultipliesSemiring)


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must force 8 virtual devices"
    return jax.make_mesh((8,), ("x",))


def test_partition_roundtrip(chesapeake, mesh):
    Ash = partition(chesapeake, mesh)
    assert Ash.P == 8
    assert Ash.n_pad % 8 == 0
    # reassemble CSR blocks → dense must equal original
    n, rows_per = Ash.n, Ash.rows_per
    dense = np.zeros((Ash.n_pad, Ash.n_pad), np.float32)
    ptr = np.asarray(Ash.csr_ptr)
    ind = np.asarray(Ash.csr_ind)
    val = np.asarray(Ash.csr_val)
    for k in range(8):
        for r in range(rows_per):
            for e in range(ptr[k, r], ptr[k, r + 1]):
                dense[k * rows_per + r, ind[k, e]] = val[k, e]
    np.testing.assert_allclose(dense[:n, :n], chesapeake.to_dense())


@pytest.mark.parametrize("mode", ["pull", "auto"])
def test_bfs_dist(chesapeake, mesh, mode):
    got = bfs_dist(chesapeake, 0, mesh, mode=mode)
    want = reference.bfs_cpu(chesapeake, 0)
    np.testing.assert_array_equal(got, want)


def test_bfs_dist_matches_single_device(test_cc, mesh):
    from graphblast_tpu.algorithms import bfs

    got = bfs_dist(test_cc, 0, mesh, mode="pull")
    single = bfs(test_cc, 0).to_numpy()
    np.testing.assert_array_equal(got, single)


def test_sssp_dist(chesapeake, mesh):
    got = sssp_dist(chesapeake, 3, mesh)
    want = reference.sssp_cpu(chesapeake, 3)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_pr_dist(test_pr, mesh):
    got = pr_dist(test_pr, mesh, alpha=0.85, eps=1e-9)
    want = reference.pr_cpu(test_pr, alpha=0.85, eps=1e-12, max_niter=200)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-6)


def test_push_combiner_generic_monoid(chesapeake, mesh):
    """all_to_all owner-routing with a non-plus monoid (min-plus push)."""
    import functools
    import jax.numpy as jnp

    from graphblast_tpu.parallel import ops as dops
    from graphblast_tpu.parallel.algorithms import _mat_spec, _shard_edge_cap
    from graphblast_tpu.types import INDEX_DTYPE

    Ash = partition(chesapeake, mesh)
    P_ = jax.sharding.PartitionSpec

    def push_step(Ash, f_block):
        f_ind, f_val, f_nv = dops.local_frontier(f_block, np.float32(np.finfo(np.float32).max))
        return dops.dist_vxm_push(
            Ash.csr_ptr[0], Ash.csr_ind[0], Ash.csr_val[0],
            f_ind, f_val, f_nv, MinimumPlusSemiring, Ash.P, Ash.rows_per,
            _shard_edge_cap(Ash, gb.DEFAULT))

    fn = jax.jit(jax.shard_map(
        push_step, mesh=mesh, in_specs=(_mat_spec(), P_("x")),
        out_specs=P_("x"), check_vma=False))

    MAXF = np.float32(np.finfo(np.float32).max)
    x = np.full(Ash.n_pad, MAXF, np.float32)
    x[0] = 0.0
    x[5] = 2.5
    sh = jax.sharding.NamedSharding(mesh, P_("x"))
    xd = jax.device_put(jnp.asarray(x), sh)
    got = np.asarray(fn(Ash, xd))[: Ash.n]

    Ad = chesapeake.to_dense()
    want = np.full(Ash.n, MAXF, np.float32)
    for i in [0, 5]:
        for j in np.nonzero(Ad[i])[0]:
            want[j] = min(want[j], x[i] + Ad[i, j])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_cc_dist_matches_single_chip(mesh):
    """Distributed FastSV labels == single-chip labels (same min-id
    convention) on a multi-component graph."""
    from graphblast_tpu.algorithms import cc
    from graphblast_tpu.parallel import cc_dist

    A = gb.Matrix.from_mtx("data/small/test_cc.mtx")
    want = cc(A).to_numpy()
    got = cc_dist(A, mesh)
    np.testing.assert_array_equal(got, want)


def test_partition_cache_roundtrip(tmp_path, chesapeake, mesh):
    from graphblast_tpu.parallel.partition import partition_cached, shard_cache_path

    base = str(tmp_path / "chesapeake.mtx")
    A = chesapeake
    Ash1 = partition_cached(A, mesh, base)
    import os
    assert os.path.exists(shard_cache_path(base, 8))
    Ash2 = partition_cached(A, mesh, base)  # loads from cache
    np.testing.assert_array_equal(np.asarray(Ash1.csr_ind), np.asarray(Ash2.csr_ind))
    np.testing.assert_array_equal(np.asarray(Ash1.csc_ptr), np.asarray(Ash2.csc_ptr))
    assert Ash2.n == A.nrows and Ash2.P == 8


def test_2d_partition_mxv(chesapeake):
    """2D SUMMA-style pull matvec == single-device over a 4x2 mesh
    (SURVEY.md §7 hard part (d): 2D option for push-volume skew)."""
    from graphblast_tpu.parallel.partition2d import partition_2d, mxv_2d
    from graphblast_tpu.semiring import (PlusMultipliesSemiring,
                                         MinimumPlusSemiring)

    A = chesapeake
    mesh2 = jax.make_mesh((4, 2), ("r", "c"))
    Ash = partition_2d(A, mesh2)
    rng = np.random.default_rng(0)
    x = rng.random(A.ncols).astype(np.float32)
    got = mxv_2d(Ash, mesh2, x, PlusMultipliesSemiring)
    np.testing.assert_allclose(got, A.to_dense() @ x, rtol=1e-4)

    # min-plus over stored entries
    got2 = mxv_2d(Ash, mesh2, x, MinimumPlusSemiring)
    Ad = A.to_dense()
    want = np.full(A.nrows, np.float32(np.finfo(np.float32).max))
    for i in range(A.nrows):
        for j in range(A.ncols):
            if Ad[i, j] != 0:
                want[i] = min(want[i], Ad[i, j] + x[j])
    np.testing.assert_allclose(got2, want, rtol=1e-4)


def test_ring_mxv_matches_dense(chesapeake, mesh):
    """Ring-pipelined pull (ppermute stages) == dense reference."""
    from graphblast_tpu.parallel.ring import mxv_ring
    from graphblast_tpu.semiring import (PlusMultipliesSemiring,
                                         MinimumPlusSemiring)

    A = chesapeake
    rng = np.random.default_rng(1)
    x = rng.random(A.ncols).astype(np.float32)
    got = mxv_ring(A, mesh, x, PlusMultipliesSemiring)
    np.testing.assert_allclose(got, A.to_dense() @ x, rtol=1e-4)

    got2 = mxv_ring(A, mesh, x, MinimumPlusSemiring)
    Ad = A.to_dense()
    want = np.full(A.nrows, np.float32(np.finfo(np.float32).max))
    for i in range(A.nrows):
        for j in range(A.ncols):
            if Ad[i, j] != 0:
                want[i] = min(want[i], Ad[i, j] + x[j])
    np.testing.assert_allclose(got2, want, rtol=1e-4)


def test_tc_dist_matches_single_chip(chesapeake, mesh):
    """Ring-staged distributed triangle count == single-chip tc == golden
    (reference has no distributed layer, SURVEY.md §2.8; single-chip contract
    is tc.hpp:15-54 on tril'd input)."""
    from graphblast_tpu.algorithms.tc import tc, tc_cpu
    from graphblast_tpu.operations import tril
    from graphblast_tpu.parallel import tc_dist

    L = tril(chesapeake)
    want = int(tc_cpu(L))
    assert tc(L) == want
    assert tc_dist(L, mesh) == want


def test_tc_dist_rmat(mesh):
    """tc_dist on a power-law RMAT graph (uneven buckets across devices)."""
    from graphblast_tpu.algorithms.tc import tc_cpu
    from graphblast_tpu.io.rmat import rmat_matrix
    from graphblast_tpu.operations import tril
    from graphblast_tpu.parallel import tc_dist

    A = rmat_matrix(8, 8, seed=5)
    L = tril(A)
    assert tc_dist(L, mesh) == int(tc_cpu(L))


def test_mis_dist_properties(chesapeake, mesh):
    """Distributed MIS satisfies independence + maximality (property
    verifier, reference test_mis.hpp model)."""
    from graphblast_tpu.parallel import mis_dist

    v = mis_dist(chesapeake, mesh, seed=3)
    assert reference.verify_mis(chesapeake, v)


def test_gc_dist_properties(chesapeake, mesh):
    """Distributed IS coloring is proper and complete."""
    from graphblast_tpu.parallel import gc_dist

    colors = gc_dist(chesapeake, mesh, seed=3)
    assert (colors > 0).all(), "every vertex colored"
    assert reference.verify_gc(chesapeake, colors)


def test_diameter_dist_matches_single_chip(chesapeake, mesh):
    from graphblast_tpu.algorithms.diameter import diameter
    from graphblast_tpu.parallel import diameter_dist

    want = diameter(chesapeake, 0, 4)
    got = diameter_dist(chesapeake, 0, 4, mesh)
    assert got == want


def test_lgc_dist_matches_single_chip(chesapeake, mesh):
    """Distributed PPR push == single-chip lgc (deterministic fixed point)."""
    from graphblast_tpu.algorithms.lgc import lgc
    from graphblast_tpu.parallel import lgc_dist

    want = lgc(chesapeake, 0, alpha=0.15, eps=1e-5).dense
    got = lgc_dist(chesapeake, 0, mesh, alpha=0.15, eps=1e-5)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4, atol=1e-7)


# ---------------------------------------------------------------------------
# Sparse push exchange + fused dual-direction BFS (VERDICT r1 next-#5)
# ---------------------------------------------------------------------------


def test_sparse_push_exchange_matches_dense(chesapeake, mesh):
    """dist_vxm_push_sparse == dist_vxm_push on a mid-BFS frontier, and the
    sparse path's exchange buffer (P·pair_cap pairs) is smaller than the
    dense partial (n_pad) it replaces."""
    import functools

    import jax.numpy as jnp

    from graphblast_tpu.parallel import ops as dops
    from graphblast_tpu.types import INDEX_DTYPE

    A = chesapeake
    Ash = partition(A, mesh)
    P, rows_per, n_pad = Ash.P, Ash.rows_per, Ash.n_pad
    edge_cap = int(Ash.csr_ind.shape[1])
    # exchange volume is STATIC at P·pair_cap pairs — independent of n
    # (the dense path ships an n_pad partial per device); at real scales
    # pair_cap ≪ n_pad/P and the win is proportional
    pair_cap = 16

    f = np.zeros(n_pad, np.float32)
    f[[0, 3, 7, 19, 25]] = 1.0   # small frontier
    P_ = jax.sharding.PartitionSpec
    vspec = P_("x")

    def step(kind, Ash, fblock):
        f_ind, f_val, f_nv = dops.local_frontier(fblock, 0.0)
        fn = (dops.dist_vxm_push_sparse if kind == "sparse"
              else dops.dist_vxm_push)
        kw = dict(structure_only=True)
        if kind == "sparse":
            return fn(Ash.csr_ptr[0], Ash.csr_ind[0], Ash.csr_val[0],
                      f_ind, None, f_nv, LogicalOrAndSemiring, P, rows_per,
                      edge_cap, pair_cap, **kw)
        return fn(Ash.csr_ptr[0], Ash.csr_ind[0], Ash.csr_val[0],
                  f_ind, None, f_nv, LogicalOrAndSemiring, P, rows_per,
                  edge_cap, **kw)

    sh = jax.sharding.NamedSharding(mesh, vspec)
    fdev = jax.device_put(jnp.asarray(f), sh)
    outs = {}
    for kind in ("sparse", "dense"):
        fn = jax.jit(jax.shard_map(
            functools.partial(step, kind),
            mesh=mesh, in_specs=(P_("x", None), vspec),
            out_specs=vspec, check_vma=False))
        outs[kind] = np.asarray(fn(Ash, fdev))
    np.testing.assert_array_equal(outs["sparse"] != 0, outs["dense"] != 0)


def test_sparse_push_overflow_falls_back(chesapeake, mesh):
    """pair_cap too small for the frontier → the traced overflow predicate
    routes every device through the dense path; results stay correct."""
    import functools

    import jax.numpy as jnp

    from graphblast_tpu.parallel import ops as dops

    A = chesapeake
    Ash = partition(A, mesh)
    P, rows_per, n_pad = Ash.P, Ash.rows_per, Ash.n_pad
    edge_cap = int(Ash.csr_ind.shape[1])
    P_ = jax.sharding.PartitionSpec
    vspec = P_("x")

    f = np.zeros(n_pad, np.float32)
    f[:A.nrows] = 1.0   # full frontier → guaranteed overflow at pair_cap=8

    def step(Ash, fblock):
        f_ind, f_val, f_nv = dops.local_frontier(fblock, 0.0)
        return dops.dist_vxm_push_sparse(
            Ash.csr_ptr[0], Ash.csr_ind[0], Ash.csr_val[0],
            f_ind, None, f_nv, LogicalOrAndSemiring, P, rows_per,
            edge_cap, 8, structure_only=True)

    sh = jax.sharding.NamedSharding(mesh, vspec)
    fn = jax.jit(jax.shard_map(
        step, mesh=mesh, in_specs=(P_("x", None), vspec),
        out_specs=vspec, check_vma=False))
    got = np.asarray(fn(Ash, jax.device_put(jnp.asarray(f), sh)))
    # golden: any vertex with an in-neighbor gets marked
    dense = np.asarray(chesapeake.to_dense())
    want = (dense.T @ (np.ones(A.nrows))) > 0
    np.testing.assert_array_equal(got[:A.nrows] != 0, want)


def test_bfs_dist_dual_matches_golden(chesapeake, mesh):
    """Fused dual-direction BFS (in-loop traced push/pull cond + sparse
    exchange) converges to the single-chip golden."""
    got = bfs_dist(chesapeake, 0, mesh, mode="dual")
    want = reference.bfs_cpu(chesapeake, 0)
    np.testing.assert_array_equal(got, want)


def test_dist_entry_points_cached(chesapeake, mesh):
    """Second call of any *_dist reuses the compiled closure (VERDICT r1
    weak-#6): the per-Ash cache must be populated and hit."""
    Ash = partition(chesapeake, mesh)
    bfs_dist(chesapeake, 0, mesh, mode="pull", Ash=Ash)
    sssp_dist(chesapeake, 0, mesh, Ash=Ash)
    pr_dist(chesapeake, mesh, Ash=Ash, prepared=True)
    cache = getattr(Ash, "_fn_cache")
    keys1 = set(cache.keys())
    assert any(k[0] == "bfs" for k in keys1)
    assert any(k[0] == "sssp" for k in keys1)
    assert any(k[0] == "pr" for k in keys1)
    fns = {k: v for k, v in cache.items()}
    bfs_dist(chesapeake, 1, mesh, mode="pull", Ash=Ash)
    sssp_dist(chesapeake, 1, mesh, Ash=Ash)
    assert set(cache.keys()) == keys1          # no new entries
    for k in keys1:
        assert cache[k] is fns[k]              # same compiled fns reused


def test_pr_dist_ring_matches_allgather(test_pr, mesh):
    """Ring-scheduled PR (ppermute-staged pull) == all_gather PR — the
    ring machinery's first full-algorithm consumer (VERDICT r1 missing-#5)."""
    a = pr_dist(test_pr, mesh, eps=1e-10)
    r = pr_dist(test_pr, mesh, eps=1e-10, comm="ring")
    np.testing.assert_allclose(r, a, atol=1e-6)


def test_pr_dist_2d_matches_allgather(test_pr, mesh):
    """SUMMA-style 2D PR == all_gather PR — the 2D layout's first full
    algorithm consumer (VERDICT r1 missing-#5)."""
    mesh2 = jax.make_mesh((4, 2), ("r", "c"))
    a = pr_dist(test_pr, mesh, eps=1e-10)
    d2 = pr_dist(test_pr, mesh2, eps=1e-10, comm="2d")
    np.testing.assert_allclose(d2, a, atol=1e-6)


def test_sparse_push_bucket_near_buffer_end(mesh):
    """Regression (ADVICE r2 high): a bucket starting within pair_cap of the
    end of the expansion buffer must not clamp-shift its dynamic_slice window
    and route earlier buckets' pairs to the wrong owner.

    Construction (P=8, rows_per=8, edge_cap=128, pair_cap=32): device 0's
    frontier expands to 124 pairs — owners 0..5 get 20 each (none exceeds
    pair_cap, so no overflow fallback), owner 7's 4 pairs start at s=120
    with s + pair_cap = 152 > 128."""
    import functools

    import jax.numpy as jnp

    from graphblast_tpu.parallel import ops as dops

    n = 64
    rows, cols = [], []
    for b in range(6):            # row 0 → 20 edges into each block 0..5
        for e in range(20):
            rows.append(0)
            cols.append(8 * b + (e % 8))
    for c in (56, 57, 58, 59):    # row 1 → 4 edges into block 7
        rows.append(1)
        cols.append(c)
    # duplicate-free CSR is not required for structure-only push, but
    # from_coo dedups — build the Matrix directly from CSR arrays instead
    import jax.numpy as jnp
    order = np.lexsort((cols, rows))
    r_np = np.asarray(rows, np.int32)[order]
    c_np = np.asarray(cols, np.int32)[order]
    ptr = np.zeros(n + 1, np.int64)
    np.add.at(ptr, r_np + 1, 1)
    ptr = np.cumsum(ptr)
    from graphblast_tpu.matrix import Matrix
    from graphblast_tpu.types import SparseFormat
    A = Matrix(n, n, len(r_np), jnp.asarray(ptr.astype(np.int32)),
               jnp.asarray(c_np), jnp.asarray(r_np),
               jnp.ones(len(r_np), jnp.float32),
               None, None, None, None, format=SparseFormat.CSRONLY)
    Ash = partition(A, mesh)
    P, rows_per, n_pad = Ash.P, Ash.rows_per, Ash.n_pad
    assert rows_per == 8
    edge_cap, pair_cap = 128, 32

    f = np.zeros(n_pad, np.float32)
    f[[0, 1]] = 1.0
    P_ = jax.sharding.PartitionSpec
    vspec = P_("x")

    def step(kind, Ash, fblock):
        f_ind, f_val, f_nv = dops.local_frontier(fblock, 0.0)
        if kind == "sparse":
            return dops.dist_vxm_push_sparse(
                Ash.csr_ptr[0], Ash.csr_ind[0], Ash.csr_val[0],
                f_ind, None, f_nv, LogicalOrAndSemiring, P, rows_per,
                edge_cap, pair_cap, structure_only=True)
        return dops.dist_vxm_push(
            Ash.csr_ptr[0], Ash.csr_ind[0], Ash.csr_val[0],
            f_ind, None, f_nv, LogicalOrAndSemiring, P, rows_per,
            edge_cap, structure_only=True)

    sh = jax.sharding.NamedSharding(mesh, vspec)
    fdev = jax.device_put(jnp.asarray(f), sh)
    outs = {}
    for kind in ("sparse", "dense"):
        fn = jax.jit(jax.shard_map(
            functools.partial(step, kind),
            mesh=mesh, in_specs=(P_("x", None), vspec),
            out_specs=vspec, check_vma=False))
        outs[kind] = np.asarray(fn(Ash, fdev))
    # golden: exactly the columns reachable from rows {0,1}
    want = np.zeros(n_pad, bool)
    want[np.unique(c_np)] = True
    np.testing.assert_array_equal(outs["dense"] != 0, want)
    np.testing.assert_array_equal(outs["sparse"] != 0, want)


def test_sparse_push_volume_scales_with_frontier(chesapeake, mesh):
    """Communication accounting cross-check (VERDICT r2 next-#7): the
    device-side owner bucketing's live pair counts equal the analytic
    ground truth (accounting.sparse_push_live_pairs), and the exchanged
    volume grows with frontier size."""
    import functools

    import jax.numpy as jnp

    from graphblast_tpu.parallel import ops as dops
    from graphblast_tpu.parallel.accounting import sparse_push_live_pairs

    A = chesapeake
    Ash = partition(A, mesh)
    P, rows_per, n_pad = Ash.P, Ash.rows_per, Ash.n_pad
    edge_cap = int(Ash.csr_ind.shape[1])
    P_ = jax.sharding.PartitionSpec
    vspec = P_("x")
    sh = jax.sharding.NamedSharding(mesh, vspec)

    def probe(Ash, fblock):
        f_ind, f_val, f_nv = dops.local_frontier(fblock, 0.0)
        _, _, _, (_, counts) = dops.owner_buckets(
            Ash.csr_ptr[0], Ash.csr_ind[0], Ash.csr_val[0],
            f_ind, None, f_nv, LogicalOrAndSemiring, P, rows_per,
            edge_cap, True, jnp.float32)
        return counts[None, :]

    fn = jax.jit(jax.shard_map(
        probe, mesh=mesh, in_specs=(P_("x", None), vspec),
        out_specs=P_("x", None), check_vma=False))

    # build a padded-global CSR for the golden (rows 0..n_pad)
    ptr = np.zeros(n_pad + 1, np.int64)
    pn = np.asarray(A.row_ptr)[: A.nrows + 1]
    ptr[: A.nrows + 1] = pn
    ptr[A.nrows + 1:] = pn[-1]
    ci = np.asarray(A.col_ind)[: A.nvals]

    vols = []
    for fsize in (3, 12, A.nrows):
        f = np.zeros(n_pad, np.float32)
        f[np.arange(fsize)] = 1.0
        got = np.asarray(fn(Ash, jax.device_put(jnp.asarray(f), sh)))
        want = sparse_push_live_pairs(ptr, ci, f[:n_pad] != 0, P, rows_per)
        np.testing.assert_array_equal(got, want)
        # off-shard exchange volume = pairs routed to other devices
        vols.append(int(want.sum() - np.trace(want)))
    assert vols[0] < vols[1] < vols[2], vols


def test_pull_plan_built_and_routed(chesapeake, mesh, monkeypatch):
    """partition() builds the stacked per-shard bitmap plans, the dist BFS
    pull routes through them, and disabling the path (GRB_DIST_PALLAS=0)
    still produces identical levels (the XLA or-pull fallback)."""
    A = chesapeake
    Ash = partition(A, mesh)
    assert Ash.pull_plan is not None
    assert Ash.pull_plan.loc.shape[0] == Ash.P
    want = bfs_dist(A, 0, mesh, Ash=Ash)

    monkeypatch.setenv("GRB_DIST_PALLAS", "0")
    Ash0 = partition(A, mesh)
    assert Ash0.pull_plan is None
    got = bfs_dist(A, 0, mesh, Ash=Ash0)
    np.testing.assert_array_equal(got, want)


def test_pr_dist_value_plan_route(test_pr, mesh, monkeypatch):
    """PR's windowed-DMA local pull (TPU-only by default — interpret-mode
    emulation costs seconds per iteration) matches the XLA route when
    forced, over a bounded iteration count."""
    from graphblast_tpu.algorithms.pr import prepare_pr_matrix
    from graphblast_tpu.descriptor import Descriptor

    Ap = prepare_pr_matrix(test_pr, 0.85)
    desc = Descriptor(max_niter=4)

    monkeypatch.setenv("GRB_DIST_PALLAS_FORCE", "1")
    Ashv = partition(Ap, mesh, build_value_plan=True)
    assert Ashv.value_pull_plan is not None
    got = pr_dist(test_pr, mesh, desc=desc, Ash=Ashv, prepared=True)

    monkeypatch.delenv("GRB_DIST_PALLAS_FORCE")
    Ash0 = partition(Ap, mesh)
    want = pr_dist(test_pr, mesh, desc=desc, Ash=Ash0, prepared=True)
    # the r4 value-SpMV default (hilo bf16 two-pass + pack2) carries a
    # measured ~2.3e-6 rel kernel error (tools/tpu_bilinear_test.py, CLAUDE
    # round-3 sweep); 4 PR iterations compound it slightly, so the route
    # gate is 1e-5 — still 100x inside the reference's 1e-3 bar
    np.testing.assert_allclose(got, want, atol=1e-5)
