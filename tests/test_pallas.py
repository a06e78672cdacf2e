"""Interpret-mode correctness tests for every Pallas TPU kernel.

VERDICT r1 weak-#3: the flagship kernels (gather_1d / gather_1d_small /
orpull / bilinear) shipped with no correctness tests, so a wrong-result bug
would reach hardware silently. These run the kernels through the Pallas
interpreter on CPU against numpy references, hitting the boundary cases the
sweep/pruning logic is most likely to miss: indices at table edges, tables of
exactly 128/129 rows, query counts that are not chunk multiples, sorted vs
random indices, int32 vs float32 payloads.

Reference test-shape analog: the per-op gtest tier (test/gspmspv.cu pattern).
"""
import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


# ---------------------------------------------------------------- gather
slow = pytest.mark.slow

GATHER_CASES = [
    # (table_n, num_queries, sorted, dtype)
    (128, 9000, False, np.float32),        # table exactly one lane row
    (129, 9000, False, np.float32),        # one row + 1 (partial row)
    (16384, 33000, False, np.float32),     # m not a 32K chunk multiple
    (16384, 32768, True, np.float32),      # exactly one chunk, sorted
    pytest.param(65536, 70000, True, np.int32, marks=slow),   # int, pruning
    pytest.param(65536, 70000, False, np.int32, marks=slow),  # full sweep
    (40000, 12, False, np.float32),        # tiny query count
]


@pytest.mark.parametrize("n,m,sorted_idx,dtype", GATHER_CASES)
def test_gather_1d(rng, n, m, sorted_idx, dtype):
    from graphblast_tpu.ops.pallas.gather import gather_1d

    x = (np.arange(n) * 3 + 1).astype(dtype)
    idx = rng.integers(0, n, m).astype(np.int32)
    if sorted_idx:
        idx.sort()
    # force the table edges into the query set
    idx[0] = 0
    idx[-1] = n - 1
    if sorted_idx:
        idx.sort()
    y = np.asarray(gather_1d(jnp.asarray(x), jnp.asarray(idx),
                             interpret=True))
    np.testing.assert_array_equal(y, x[idx])


@pytest.mark.parametrize("n,m", [(128, 5000), (4096, 5000), (16384, 100)])
def test_gather_1d_small(rng, n, m):
    from graphblast_tpu.ops.pallas.gather import gather_1d_small

    x = rng.standard_normal(n).astype(np.float32)
    idx = rng.integers(0, n, m).astype(np.int32)
    idx[:2] = [0, n - 1]
    y = np.asarray(gather_1d_small(jnp.asarray(x), jnp.asarray(idx),
                                   interpret=True))
    np.testing.assert_array_equal(y, x[idx])


# ---------------------------------------------------------------- orpull
@pytest.mark.parametrize("n,m", [
    (4096, 70000),    # n exactly a 4096 multiple: pad-word aliasing case
    (4095, 70000),    # one below
    (50, 257),        # tiny graph, m not a lane multiple
])
def test_orpull_bit_csum(rng, n, m):
    from graphblast_tpu.ops.pallas.orpull import orpull_bit_csum, pack_bitmap

    x = (rng.random(n) < 0.3).astype(np.float32)
    col = rng.integers(0, n, m).astype(np.int32)
    # out-of-range columns must read zero bits (the documented contract)
    col[:3] = [n - 1, 0, n - 1]
    csum = np.asarray(orpull_bit_csum(pack_bitmap(jnp.asarray(x)),
                                      jnp.asarray(col), interpret=True))
    ref = np.cumsum(x[col] != 0).astype(np.int64)
    np.testing.assert_array_equal(csum.astype(np.int64), ref)


def test_orpull_pad_sentinel_reads_zero(rng):
    """ADVICE r1: when n is a multiple of 4096 the pad sentinel used to
    alias the LAST VALID bitmap word; it must read a zero bit."""
    from graphblast_tpu.ops.pallas.orpull import orpull_bit_csum, pack_bitmap

    n = 4096
    x = np.ones(n, np.float32)          # every frontier bit set
    col = np.full(300, n, np.int32)     # every query out of range
    csum = np.asarray(orpull_bit_csum(pack_bitmap(jnp.asarray(x)),
                                      jnp.asarray(col), interpret=True))
    assert csum[-1] == 0


# -------------------------------------------------------------- bilinear
BILINEAR_CASES = [
    # (n_out, n_in, m, dense_rows)
    (500, 700, 3000, False),
    pytest.param(4096, 4096, 20000, False, marks=slow),  # exactly one window
    pytest.param(4097, 4100, 20000, False, marks=slow),  # one over a window
    (9000, 5000, 1, False),
    (100, 100, 0, False),
    pytest.param(2000, 2000, 30000, True, marks=slow),   # hub rows/cols
]


@pytest.mark.parametrize("pack", [1, 2, 4])
@pytest.mark.parametrize("n_out,n_in,m,skew", BILINEAR_CASES)
def test_spmv_bilinear(rng, n_out, n_in, m, skew, pack):
    from graphblast_tpu.ops.pallas.bilinear import build_plan, spmv_bilinear

    if skew:
        rows = (rng.zipf(1.5, m) % n_out).astype(np.int64)
        cols = (rng.zipf(1.5, m) % n_in).astype(np.int64)
    else:
        rows = rng.integers(0, n_out, m)
        cols = rng.integers(0, n_in, m)
    vals = rng.standard_normal(m).astype(np.float32)
    order = np.argsort(rows, kind="stable")
    rows, cols, vals = rows[order], cols[order], vals[order]
    ptr = np.zeros(n_out + 1, np.int64)
    np.add.at(ptr, rows + 1, 1)
    ptr = np.cumsum(ptr)

    plan = build_plan(ptr, cols, vals, n_out, n_in, pack=pack)
    x = rng.standard_normal(n_in).astype(np.float32)
    y = np.asarray(spmv_bilinear(plan, jnp.asarray(x), interpret=True))

    yref = np.zeros(n_out, np.float64)
    np.add.at(yref, rows, vals.astype(np.float64) * x[cols].astype(np.float64))
    den = max(np.abs(yref).max(), 1e-9)
    assert np.abs(y - yref).max() / den < 1e-5


@slow
def test_spmv_bilinear_variants(rng):
    """hilo bf16 two-pass scatter and unroll sweep agree with the golden at
    their documented error bars (hilo ~1e-4 rel; exact mechanics differ per
    backend but interpret mode runs the same graph)."""
    from graphblast_tpu.ops.pallas.bilinear import build_plan, spmv_bilinear

    n, m = 2000, 30000
    rows = np.sort(rng.integers(0, n, m))
    cols = rng.integers(0, n, m)
    vals = rng.standard_normal(m).astype(np.float32)
    ptr = np.zeros(n + 1, np.int64)
    np.add.at(ptr, rows + 1, 1)
    ptr = np.cumsum(ptr)
    x = rng.standard_normal(n).astype(np.float32)
    yref = np.zeros(n, np.float64)
    np.add.at(yref, rows, vals.astype(np.float64) * x[cols].astype(np.float64))
    den = max(np.abs(yref).max(), 1e-9)

    for pack in (1, 2):
        plan = build_plan(ptr, cols, vals, n, n, pack=pack)
        for matmul, sweep, tol in (("highest", "unroll", 1e-5),
                                   ("hilo", "fori", 1e-3)):
            y = np.asarray(spmv_bilinear(plan, jnp.asarray(x),
                                         interpret=True, matmul=matmul,
                                         sweep=sweep))
            err = np.abs(y - yref).max() / den
            assert err < tol, (pack, matmul, sweep, err)


@pytest.mark.parametrize("n_out,n_in,m,w", [
    (500, 700, 3000, None),
    pytest.param(9000, 6000, 25000, None, marks=slow),   # multiple panels
    pytest.param(8192, 65536, 20000, None, marks=slow),  # one (panel, window)
    (20000, 9000, 1, None),         # unvisited panels must read 0
    (100, 50, 0, None),
    pytest.param(9000, 70000, 30000, None, marks=slow),  # multiple x windows
    pytest.param(9000, 9000, 30000, (12, 12), marks=slow),  # forced small
    #                                 windows: many tiles per panel, window
    #                                 switches inside chunks
])
def test_spmv_bilinear_dma(rng, n_out, n_in, m, w):
    """Windowed-DMA f32 variant (any-scale value pulls) vs dense oracle."""
    from graphblast_tpu.ops.pallas.bilinear import (build_plan_f32dma,
                                                    spmv_bilinear_dma)

    rows = np.sort(rng.integers(0, n_out, m))
    cols = rng.integers(0, n_in, m)
    vals = rng.standard_normal(m).astype(np.float32)
    ptr = np.zeros(n_out + 1, np.int64)
    np.add.at(ptr, rows + 1, 1)
    ptr = np.cumsum(ptr)
    kw = dict(zip(("wr_bits", "wc_bits"), w)) if w else {}
    plan = build_plan_f32dma(ptr, cols, vals, n_out, n_in, **kw)
    x = rng.standard_normal(n_in).astype(np.float32)
    y = np.asarray(spmv_bilinear_dma(plan, jnp.asarray(x), interpret=True))
    yref = np.zeros(n_out, np.float64)
    np.add.at(yref, rows, vals.astype(np.float64) * x[cols].astype(np.float64))
    den = max(np.abs(yref).max(), 1e-9)
    assert np.abs(y - yref).max() / den < 1e-5


def test_pr_with_dma_plan(rng, monkeypatch):
    """Fused PR rides the windowed-DMA plan when the resident kernel is
    VMEM-gated (GRB_BILINEAR_VMEM forces the gate shut)."""
    from graphblast_tpu import Matrix
    from graphblast_tpu.algorithms import reference
    from graphblast_tpu.algorithms.pr import _pr_fused, prepare_pr_plan
    from graphblast_tpu.ops import gather_dispatch
    from graphblast_tpu.ops.pallas.bilinear import F32DmaPlan

    n, m = 300, 2500
    rows = rng.integers(0, n, m)
    cols = rng.integers(0, n, m)
    A = Matrix.from_coo(rows, cols, np.ones(m), n, n)
    monkeypatch.setenv("GRB_BILINEAR_VMEM", "1")
    monkeypatch.setattr(gather_dispatch, "_USE_PALLAS", True)
    plan = prepare_pr_plan(A, 0.85)
    assert isinstance(plan, F32DmaPlan)
    p, _, _ = _pr_fused(A, plan, alpha=0.85, eps=1e-10, max_niter=150)
    want = reference.pr_cpu(A, alpha=0.85, eps=1e-12, max_niter=200)
    np.testing.assert_allclose(np.asarray(p), want, atol=2e-5)


def test_spmv_bilinear_struconly(rng):
    """val=None plan: all-ones values (BFS pull counting mode)."""
    from graphblast_tpu.ops.pallas.bilinear import build_plan, spmv_bilinear

    n, m = 3000, 20000
    rows = np.sort(rng.integers(0, n, m))
    cols = rng.integers(0, n, m)
    ptr = np.zeros(n + 1, np.int64)
    np.add.at(ptr, rows + 1, 1)
    ptr = np.cumsum(ptr)
    plan = build_plan(ptr, cols, None, n, n)
    f = (rng.random(n) < 0.1).astype(np.float32)
    y = np.asarray(spmv_bilinear(plan, jnp.asarray(f), interpret=True))
    yref = np.zeros(n, np.float64)
    np.add.at(yref, rows, f[cols].astype(np.float64))
    np.testing.assert_allclose(y, yref, atol=1e-3)


@pytest.mark.parametrize("n_out,n_in,m,wp_bits", [
    (500, 700, 3000, None),
    pytest.param(4096, 131072, 20000, None, marks=slow),  # one (row, col)
    #                               window exactly
    (20000, 9000, 1, None),       # unvisited output panels must read 0
    (100, 50, 0, None),
    pytest.param(20000, 9000, 5000, 13, marks=slow),  # wide (8192-row)
    #                               panels: the scale-24 layout, forced small
    #                               (valid bit at 30, 13-bit row_loc,
    #                               (64,128) output blocks)
])
def test_bitmap_bilinear(rng, n_out, n_in, m, wp_bits):
    from graphblast_tpu.ops.pallas.bilinear import (build_plan_bitmap,
                                                    spmv_bilinear_bitmap)
    from graphblast_tpu.ops.pallas.orpull import pack_bitmap

    rows = np.sort(rng.integers(0, n_out, m))
    cols = rng.integers(0, n_in, m)
    ptr = np.zeros(n_out + 1, np.int64)
    np.add.at(ptr, rows + 1, 1)
    ptr = np.cumsum(ptr)
    plan = build_plan_bitmap(ptr, cols, n_out, n_in, wp_bits=wp_bits)
    f = (rng.random(n_in) < 0.2).astype(np.float32)
    yref = np.zeros(n_out, np.float64)
    np.add.at(yref, rows, f[cols])
    # aligned = lane-row-aligned run layout (r4 default); the window-sweep
    # fallback is exercised on the first (smallest) shape only — each
    # interpret run costs ~10 s and the sweeps share the plan layout
    sweeps = ("aligned", "unroll") if (n_out, m) == (500, 3000) \
        else ("aligned",)
    for sweep in sweeps:
        y = np.asarray(spmv_bilinear_bitmap(plan, pack_bitmap(jnp.asarray(f)),
                                            interpret=True, sweep=sweep))
        np.testing.assert_array_equal(y, yref, err_msg=sweep)


def test_bfs_with_bitmap_plan(rng):
    """BFS fused loop with the bitmap pull plan matches the golden."""
    import jax.numpy as jnp

    from graphblast_tpu import Matrix
    from graphblast_tpu.algorithms.bfs import _bfs_fused
    from graphblast_tpu.algorithms.reference import bfs_cpu
    from graphblast_tpu.ops.pallas.bilinear import plan_for_bitmap
    from graphblast_tpu.types import Direction, INDEX_DTYPE

    n, m = 3000, 25000
    rows = rng.integers(0, n, m)
    cols = rng.integers(0, n, m)
    A = Matrix.from_coo(rows, cols, np.ones(m), n, n)
    plan = plan_for_bitmap(A, transpose=True)
    assert plan is not None
    kw = dict(struconly=True, edge_cap=A.nnz_pad, switchpoint=0.01,
              mode=Direction.PUSHPULL, sort_push=True, max_niter=100)
    v, _ = _bfs_fused(A, jnp.asarray(0, INDEX_DTYPE), plan, **kw)
    np.testing.assert_array_equal(np.asarray(v), bfs_cpu(A, 0))


def test_bfs_with_bilinear_pull_plan(rng):
    """Integrated path: BFS fused loop with the bilinear pull plan threaded
    through mxv_dual must match plain BFS (interpret mode on CPU)."""
    import jax.numpy as jnp

    from graphblast_tpu import Matrix
    from graphblast_tpu.algorithms.bfs import _bfs_fused
    from graphblast_tpu.algorithms.reference import bfs_cpu
    from graphblast_tpu.ops.pallas.bilinear import plan_for
    from graphblast_tpu.types import Direction, INDEX_DTYPE

    n, m = 400, 3000
    rows = rng.integers(0, n, m)
    cols = rng.integers(0, n, m)
    A = Matrix.from_coo(rows, cols, np.ones(m), n, n)
    plan = plan_for(A, transpose=True, ones=True)
    assert plan is not None
    kw = dict(struconly=True, edge_cap=A.nnz_pad, switchpoint=0.01,
              mode=Direction.PUSHPULL, sort_push=True, max_niter=100)
    src = jnp.asarray(0, INDEX_DTYPE)
    v_plan, _ = _bfs_fused(A, src, plan, **kw)
    ref = bfs_cpu(A, 0)
    np.testing.assert_array_equal(np.asarray(v_plan), ref)


def test_pr_with_bilinear_plan(rng):
    """PR fused loop with a host-scaled bilinear plan matches the numpy
    reference (the plan carries the α/outdeg scaling)."""
    from graphblast_tpu import Matrix
    from graphblast_tpu.algorithms import reference
    from graphblast_tpu.algorithms.pr import _pr_fused, prepare_pr_plan
    from graphblast_tpu.ops import gather_dispatch

    n, m = 300, 2500
    rows = rng.integers(0, n, m)
    cols = rng.integers(0, n, m)
    A = Matrix.from_coo(rows, cols, np.ones(m), n, n)
    old = gather_dispatch._USE_PALLAS
    gather_dispatch._USE_PALLAS = True   # force the plan path on CPU
    try:
        plan = prepare_pr_plan(A, 0.85)
    finally:
        gather_dispatch._USE_PALLAS = old
    assert plan is not None
    p, _, _ = _pr_fused(A, plan, alpha=0.85, eps=1e-10, max_niter=150)
    want = reference.pr_cpu(A, alpha=0.85, eps=1e-12, max_niter=200)
    np.testing.assert_allclose(np.asarray(p), want, atol=2e-5)


def test_plan_for_cache(rng):
    """plan_for caches per orientation on the Matrix object and reuses the
    host stash (no device fetch)."""
    from graphblast_tpu import Matrix
    from graphblast_tpu.ops.pallas.bilinear import plan_for

    n, m = 500, 4000
    rows = rng.integers(0, n, m)
    cols = rng.integers(0, n, m)
    A = Matrix.from_coo(rows, cols, np.ones(m), n, n)
    p1 = plan_for(A, transpose=False)
    p2 = plan_for(A, transpose=False)
    assert p1 is p2
    pt = plan_for(A, transpose=True)
    assert pt is not None and pt.n_out == A.ncols


@pytest.mark.parametrize("full", [
    False,
    pytest.param(True, marks=slow),
])
def test_monoid_pull_kernel_goldens(full):
    """spmv_monoid (run-scan + one-hot MXU select) vs numpy ⊕-goldens for
    every supported semiring with FLT_MAX sentinels in x (the SSSP shape).
    Smoke tier: small n, library-default variants. Full (slow) tier adds
    the window-crossing size (n > 4096) and the sweep/scan variant matrix."""
    from graphblast_tpu.ops.pallas.monopull import (build_plan_monoid,
                                                    spmv_monoid)
    from graphblast_tpu.semiring import (MaximumMultipliesSemiring,
                                         MinimumPlusSemiring,
                                         MinimumSelectSecondSemiring)

    rng = np.random.default_rng(0)
    MAXF = np.float64(np.finfo(np.float32).max)
    sizes = (((300, 300, 2500), (4300, 4200, 4000)) if full
             else ((300, 300, 2500),))
    for n_out, n_in, m in sizes:
        rows = rng.integers(0, n_out, m)
        cols = rng.integers(0, n_in, m)
        key = rows.astype(np.int64) * n_in + cols
        _, keep = np.unique(key, return_index=True)
        rows, cols = rows[keep], cols[keep]
        vals = (rng.random(len(rows)) * 3 + 0.5).astype(np.float32)
        order = np.lexsort((cols, rows))
        rows, cols, vals = rows[order], cols[order], vals[order]
        ptr = np.zeros(n_out + 1, np.int64)
        np.add.at(ptr, rows + 1, 1)
        ptr = np.cumsum(ptr)

        x = np.where(rng.random(n_in) < 0.4, np.float32(MAXF),
                     (rng.random(n_in) * 5).astype(np.float32)
                     ).astype(np.float32)
        plan = build_plan_monoid(ptr, cols, vals, n_out, n_in)

        cases = [("min-plus", MinimumPlusSemiring,
                  lambda a, xx: np.minimum(a + xx, MAXF))]
        if n_out <= 4096:   # interpret mode is slow — the window-crossing
            #                 size proves tiling with one semiring
            cases += [("max-mul", MaximumMultipliesSemiring,
                       lambda a, xx: np.clip(a * xx, -MAXF, MAXF)),
                      ("min-second", MinimumSelectSecondSemiring,
                       lambda a, xx: xx + 0 * a)]
        for name, sr, gold in cases:
            ident = np.float64(np.float32(sr.identity(jnp.float32)))
            want = np.full(n_out, ident, np.float64)
            prod = gold(vals.astype(np.float64), x[cols].astype(np.float64))
            if name.startswith("min"):
                np.minimum.at(want, rows, prod)
            else:
                np.maximum.at(want, rows, prod)
            # HIGHEST matmul is exact-class; the hilo default (arithmetic
            # ⊗ only) carries a ~16-bit effective mantissa (~1e-5 rel).
            # The non-default variants run in the slow tier only — each
            # interpret run costs seconds and the variants share layout.
            variants = [(None, None, None, 1e-4)]     # library defaults
            if full and name == "min-plus":
                variants += [("unroll", "flat", "highest", 1e-5),
                             ("fori", "2d", "highest", 1e-5)]
            for sweep, scan, matmul, tol in variants:
                got = np.asarray(spmv_monoid(plan, jnp.asarray(x), sr,
                                             sweep=sweep, scan=scan,
                                             matmul=matmul))
                rel = (np.abs(got - want.astype(np.float32))
                       / (np.abs(want) + 1))
                assert rel.max() < tol, (name, sweep, scan, rel.max())


def test_monoid_pull_empty_and_identity_rows():
    """Rows with no stored edges keep the ⊕ identity; an empty matrix plan
    returns all-identity."""
    from graphblast_tpu.ops.pallas.monopull import (build_plan_monoid,
                                                    spmv_monoid)
    from graphblast_tpu.semiring import MinimumPlusSemiring

    MAXF = np.float32(np.finfo(np.float32).max)
    ptr = np.array([0, 2, 2, 3], np.int64)   # row 1 empty
    ind = np.array([0, 2, 1], np.int64)
    val = np.array([1.0, 2.0, 3.0], np.float32)
    plan = build_plan_monoid(ptr, ind, val, 3, 3)
    x = np.array([10.0, 20.0, 30.0], np.float32)
    got = np.asarray(spmv_monoid(plan, jnp.asarray(x), MinimumPlusSemiring))
    np.testing.assert_allclose(got, [11.0, MAXF, 23.0], rtol=1e-6)

    empty = build_plan_monoid(np.zeros(4, np.int64), np.zeros(0, np.int64),
                              None, 3, 3)
    got = np.asarray(spmv_monoid(empty, jnp.asarray(x), MinimumPlusSemiring))
    np.testing.assert_allclose(got, [MAXF] * 3)
