"""Op-level tier-1 tests vs dense NumPy semiring references.

Reference analog: test/g{vxm,spmspv,push,pull,reduce,ewiseadd,ewisemult,
assign}.cu — each op checked against a host ground truth on small fixtures
(SURVEY.md §4 tier 1)."""
import numpy as np
import jax.numpy as jnp
import pytest

import graphblast_tpu as gb
from graphblast_tpu import Descriptor, Direction, Storage, Vector


MAXF = float(np.finfo(np.float32).max)


def dense_semiring_mxv(Ad, x, add, mul, ident):
    """Dense reference: y[i] = ⊕_j A[i,j]⊗x[j] over STORED entries only."""
    n = Ad.shape[0]
    y = np.full(n, ident, dtype=np.float32)
    for i in range(n):
        for j in range(Ad.shape[1]):
            if Ad[i, j] != 0:
                y[i] = add(y[i], mul(np.float32(Ad[i, j]), np.float32(x[j])))
    return y


SEMIRING_CASES = [
    (gb.PlusMultipliesSemiring, lambda a, b: a + b, lambda a, b: a * b, 0.0),
    (gb.MinimumPlusSemiring, min, lambda a, b: a + b, MAXF),
    (gb.MaximumMultipliesSemiring, max, lambda a, b: a * b, 0.0),
    (gb.LogicalOrAndSemiring, lambda a, b: float(bool(a) or bool(b)),
     lambda a, b: float(bool(a) and bool(b)), 0.0),
    (gb.MinimumSelectSecondSemiring, min, lambda a, b: b, MAXF),
]


@pytest.mark.parametrize("sr,add,mul,ident", SEMIRING_CASES,
                         ids=[c[0].name for c in SEMIRING_CASES])
@pytest.mark.parametrize("direction", [Direction.PULLONLY, Direction.PUSHONLY])
def test_mxv_semirings(chesapeake, rng, sr, add, mul, ident, direction):
    A = chesapeake
    Ad = A.to_dense()
    x = (rng.rand(A.ncols) * 4).astype(np.float32)
    x[rng.rand(A.ncols) < 0.5] = ident  # mix in identity entries
    desc = Descriptor(mxv_mode=direction)
    if direction == Direction.PUSHONLY:
        u = Vector.dense_from(jnp.asarray(x)).to_sparse(ident)
    else:
        u = Vector.dense_from(jnp.asarray(x))
    y = gb.mxv(A, u, sr, desc=desc)
    expect = dense_semiring_mxv(Ad, x, add, mul, ident)
    # accumulation-order tolerance: the reference itself accepts 1e-3
    # (test/test.hpp:7-17); prefix-sum reassociation stays well inside it
    np.testing.assert_allclose(y.to_numpy(ident), expect, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("direction", [Direction.PULLONLY, Direction.PUSHONLY])
def test_vxm_is_transpose_mxv(test_cc, rng, direction):
    A = test_cc
    Ad = A.to_dense()
    x = rng.rand(A.nrows).astype(np.float32)
    desc = Descriptor(mxv_mode=direction)
    u = Vector.dense_from(jnp.asarray(x))
    if direction == Direction.PUSHONLY:
        u = u.to_sparse(0)
    y = gb.vxm(u, A, gb.PlusMultipliesSemiring, desc=desc)
    np.testing.assert_allclose(y.to_numpy(0), Ad.T @ x, rtol=1e-4)


def test_masked_mxv_scmp(chesapeake, rng):
    """BFS-style masked pull: masked-out rows get the identity
    (reference: spmv.hpp:96-212)."""
    A = chesapeake
    Ad = A.to_dense()
    x = (rng.rand(A.ncols) < 0.3).astype(np.float32)
    m = (rng.rand(A.nrows) < 0.5).astype(np.float32)
    u = Vector.dense_from(jnp.asarray(x))
    mask = Vector.dense_from(jnp.asarray(m))
    desc = Descriptor(mask_scmp=True, mxv_mode=Direction.PULLONLY)
    y = gb.mxv(A, u, gb.LogicalOrAndSemiring, mask=mask, desc=desc)
    expect = (Ad @ x > 0).astype(np.float32)
    expect[m != 0] = 0.0  # scmp: only mask==0 rows pass
    np.testing.assert_allclose(y.to_numpy(0), expect)


def test_masked_push(chesapeake, rng):
    A = chesapeake
    Ad = A.to_dense()
    m = (rng.rand(A.nrows) < 0.5).astype(np.float32)
    src = [0, 5, 9]
    u = Vector.sparse_from(A.ncols, src, [1.0, 1.0, 1.0])
    mask = Vector.dense_from(jnp.asarray(m))
    desc = Descriptor(mask_scmp=True, mxv_mode=Direction.PUSHONLY,
                      structure_only=True)
    y = gb.mxv(A, u, gb.LogicalOrAndSemiring, mask=mask, desc=desc)
    x = np.zeros(A.ncols, np.float32)
    x[src] = 1
    expect = (Ad @ x > 0).astype(np.float32)
    expect[m != 0] = 0.0
    np.testing.assert_allclose(y.to_numpy(0), expect)


def test_ewise_add_uses_add_op(rng):
    u = Vector.dense_from(jnp.asarray(rng.rand(16).astype(np.float32)))
    v = Vector.dense_from(jnp.asarray(rng.rand(16).astype(np.float32)))
    # MinimumPlus: eWiseAdd → min (relaxation, sssp.hpp:80-82)
    w = gb.eWiseAdd(u, v, gb.MinimumPlusSemiring)
    np.testing.assert_allclose(w.to_numpy(), np.minimum(u.to_numpy(), v.to_numpy()))
    # CustomLessPlus: eWiseAdd → less (productive detect, sssp.hpp:76-78)
    w2 = gb.eWiseAdd(u, v, gb.CustomLessPlusSemiring)
    np.testing.assert_allclose(w2.to_numpy(), (u.to_numpy() < v.to_numpy()).astype(np.float32))


def test_ewise_mult_uses_mul_op(rng):
    u = Vector.dense_from(jnp.asarray(rng.rand(16).astype(np.float32)))
    v = Vector.dense_from(jnp.asarray(rng.rand(16).astype(np.float32)))
    # PlusMinus: eWiseMult → minus (PR residual, pr.hpp:76-78)
    w = gb.eWiseMult(u, v, gb.PlusMinusSemiring)
    np.testing.assert_allclose(w.to_numpy(), u.to_numpy() - v.to_numpy(), rtol=1e-6)


def test_ewise_add_sparse_dense(rng):
    n = 20
    vd = rng.rand(n).astype(np.float32)
    u = Vector.sparse_from(n, [2, 7, 11], [5.0, 6.0, 7.0])
    v = Vector.dense_from(jnp.asarray(vd))
    w = gb.eWiseAdd(u, v, gb.MinimumPlusSemiring)
    expect = vd.copy()
    for i, val in zip([2, 7, 11], [5.0, 6.0, 7.0]):
        expect[i] = min(val, expect[i])
    np.testing.assert_allclose(w.to_numpy(), expect)


def test_assign_masked_dense(rng):
    n = 16
    w = Vector.full(n, 0.0)
    m = (rng.rand(n) < 0.5).astype(np.float32)
    mask = Vector.dense_from(jnp.asarray(m))
    out = gb.assign(w, 3.0, mask=mask)
    expect = np.where(m != 0, 3.0, 0.0).astype(np.float32)
    np.testing.assert_allclose(out.to_numpy(), expect)


def test_assign_sparse_prunes(rng):
    """SSSP frontier filter: masked assign FLT_MAX then prune
    (reference: assign.hpp:107-245)."""
    n = 12
    w = Vector.sparse_from(n, [1, 4, 8], [0.5, 0.7, 0.9])
    m = np.zeros(n, np.float32)
    m[4] = 1.0  # productive
    mask = Vector.dense_from(jnp.asarray(m))
    desc = Descriptor(mask_scmp=True)  # assign where ¬productive
    out = gb.assign(w, MAXF, mask=mask, desc=desc)
    ind, val = out.extract_tuples()
    assert list(ind) == [4]
    np.testing.assert_allclose(val, [0.7])


def test_reduce_variants(chesapeake, rng):
    x = rng.rand(39).astype(np.float32)
    u = Vector.dense_from(jnp.asarray(x))
    assert np.isclose(float(gb.reduce_vector(u, gb.PlusMonoid)), x.sum(), rtol=1e-6)
    us = Vector.sparse_from(39, [3, 5], [2.0, 7.0])
    assert float(gb.reduce_vector(us, gb.PlusMonoid)) == 9.0
    # struconly shortcut: count (reference: reduce.hpp:71-75)
    assert float(gb.reduce_vector(us, gb.PlusMonoid,
                                  desc=Descriptor(structure_only=True))) == 2.0
    # matrix row-reduce = degrees for pattern graph
    deg = gb.reduce_matrix_to_vector(chesapeake, gb.PlusMonoid)
    np.testing.assert_allclose(deg.to_numpy(), chesapeake.to_dense().sum(1))
    # matrix full reduce
    assert np.isclose(float(gb.reduce_matrix(chesapeake, gb.PlusMonoid)),
                      chesapeake.to_dense().sum())


def test_scatter_gather(rng):
    n = 10
    parent = Vector.ascending(n)
    idx = Vector.dense_from(jnp.asarray(rng.randint(0, n, n), jnp.int32))
    g = gb.extract_gather(parent, idx)
    np.testing.assert_array_equal(g.to_numpy(), np.arange(n)[idx.to_numpy()])
    u = Vector.dense_from(jnp.asarray(rng.rand(n).astype(np.float32)))
    w = Vector.full(n, 0.0)
    s = gb.assign_scatter(w, u, idx)
    expect = np.zeros(n, np.float32)
    expect[idx.to_numpy()] = u.to_numpy()  # dup indices: one writer wins
    got = s.to_numpy()
    # for dup indices any of the written values is acceptable; check non-dup
    uniq, counts = np.unique(idx.to_numpy(), return_counts=True)
    for i in uniq[counts == 1]:
        assert got[i] == u.to_numpy()[list(idx.to_numpy()).index(i)]


def test_transpose_zero_copy(test_cc):
    At = gb.transpose(test_cc)
    np.testing.assert_allclose(At.to_dense(), test_cc.to_dense().T)


def test_tril(chesapeake):
    L = gb.tril(chesapeake)
    Ld = L.to_dense()
    assert np.all(np.triu(Ld) == 0)
    np.testing.assert_allclose(Ld, np.tril(chesapeake.to_dense(), -1))


def test_storage_conversions(rng):
    x = rng.rand(25).astype(np.float32)
    x[rng.rand(25) < 0.6] = 0
    v = Vector.dense_from(jnp.asarray(x))
    s = v.to_sparse(0)
    assert int(s.snvals) == (x != 0).sum()
    back = s.to_dense(0)
    np.testing.assert_allclose(back.dense, x)


def test_apply_vxm_fused_accum(chesapeake, rng):
    """apply_vxm == vxm with the accumulator fused (reference:
    operations.hpp:830-865)."""
    A = chesapeake
    n = A.nrows
    x = Vector.dense_from(jnp.asarray(rng.random(n).astype(np.float32)))
    w = Vector.dense_from(jnp.asarray(rng.random(n).astype(np.float32)))
    got = gb.apply_vxm(x, A, gb.PlusMultipliesSemiring,
                       accum=gb.PlusMonoid, w=w)
    want = gb.vxm(x, A, gb.PlusMultipliesSemiring, accum=gb.PlusMonoid, w=w)
    np.testing.assert_allclose(got.to_numpy(), want.to_numpy(), rtol=1e-5)
    # and equals dense reference AT x + w
    Ad = A.to_dense()
    ref = Ad.T @ np.asarray(x.dense) + np.asarray(w.dense)
    np.testing.assert_allclose(got.to_numpy(), ref, rtol=1e-4)


def test_orpull_kernel_interpret(rng):
    """Fused or-pull bit prefix-sum kernel vs numpy (interpret mode)."""
    from graphblast_tpu.ops.pallas.orpull import orpull_bit_csum, pack_bitmap

    n = 1000
    x = (rng.random(n) < 0.3).astype(np.float32)
    col = rng.randint(0, n, size=5000).astype(np.int32)
    csum = orpull_bit_csum(pack_bitmap(jnp.asarray(x)), jnp.asarray(col),
                           interpret=True)
    want = np.cumsum(x[col] != 0).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(csum), want)


def test_mxm_dense_spmm(chesapeake, rng):
    """spmm vs dense reference for Plus and Minimum monoids (the reference
    stubs this — backend/cuda/spmm.hpp:16-40)."""
    A = chesapeake
    Ad = A.to_dense()
    B = rng.random((A.ncols, 8)).astype(np.float32)
    C = gb.mxm_dense(A, B, gb.PlusMultipliesSemiring)
    np.testing.assert_allclose(np.asarray(C), Ad @ B, rtol=1e-4)

    # min-plus over stored entries only
    C2 = np.asarray(gb.mxm_dense(A, B, gb.MinimumPlusSemiring))
    want = np.full_like(C2, MAXF)
    for i in range(A.nrows):
        for j in range(A.ncols):
            if Ad[i, j] != 0:
                want[i] = np.minimum(want[i], Ad[i, j] + B[j])
    np.testing.assert_allclose(C2, want, rtol=1e-4)


@pytest.mark.parametrize("sr_case", [
    (gb.PlusMultipliesSemiring, "plus"),
    (gb.MinimumPlusSemiring, "min"),
])
@pytest.mark.parametrize("graph", ["data/small/chesapeake.mtx",
                                   "data/small/test_cc.mtx"])
def test_spmv_pull_sorted_both_orientations(rng, sr_case, graph):
    """spmv_pull_sorted (the TPU value-SpMV kernel) vs dense reference —
    exercised directly since CPU runs route to plain spmv_pull. Covers the
    symmetric-aliased and asymmetric dual-representation cases."""
    from graphblast_tpu.ops.spmv import spmv_pull_sorted

    semiring, kind = sr_case
    A = gb.Matrix.from_mtx(graph)
    Ad = A.to_dense()
    n = A.nrows
    x = rng.random(n).astype(np.float32)

    def dense_ref(mat):
        if kind == "plus":
            return mat @ x
        out = np.full(n, MAXF, np.float32)
        for i in range(n):
            for j in range(n):
                if mat[i, j] != 0:
                    out[i] = min(out[i], mat[i, j] + x[j])
        return out

    # mxv orientation: out over CSR rows, gather at CSC col ids
    got = spmv_pull_sorted(A.row_ptr, A.csc_col_ind, A.csc_row_ind, A.csc_val,
                           jnp.asarray(x), semiring, n, A.nvals)
    np.testing.assert_allclose(np.asarray(got), dense_ref(Ad), rtol=1e-4)

    # vxm orientation: out over CSC cols, gather at CSR row ids
    got2 = spmv_pull_sorted(A.col_ptr, A.row_ind, A.col_ind, A.val,
                            jnp.asarray(x), semiring, n, A.nvals)
    np.testing.assert_allclose(np.asarray(got2), dense_ref(Ad.T), rtol=1e-4)


def test_spgemm_esc_vs_scipy(rng):
    """General unmasked sparse ESC SpGEMM vs scipy (reference analog:
    cusparse_spgemm2, spgemm.hpp:282-508 — tested there only via gspgemm.cu
    float plus-times; here semiring-generic)."""
    import scipy.sparse as sp

    from graphblast_tpu.matrix import Matrix
    from graphblast_tpu.ops.spgemm import spgemm_esc

    r = np.random.default_rng(7)
    AS = sp.random(200, 300, density=0.02, random_state=r, format="csr",
                   dtype=np.float32)
    BS = sp.random(300, 150, density=0.02, random_state=r, format="csr",
                   dtype=np.float32)
    Aco, Bco = AS.tocoo(), BS.tocoo()
    A = Matrix.from_coo(Aco.row, Aco.col, Aco.data, 200, 300)
    B = Matrix.from_coo(Bco.row, Bco.col, Bco.data, 300, 150)
    want = (AS @ BS).toarray()

    C = spgemm_esc(A, B, gb.PlusMultipliesSemiring)
    np.testing.assert_allclose(C.to_dense(), want, atol=1e-4)

    # Bᵀ orientation (TC's mxm idiom, tc.hpp:24)
    Bt = Matrix.from_coo(Bco.col, Bco.row, Bco.data, 150, 300)
    C2 = spgemm_esc(A, Bt, gb.PlusMultipliesSemiring, transpose_b=True)
    np.testing.assert_allclose(C2.to_dense(), want, atol=1e-4)

    # chunked static workspace (max_lanes below the exact expansion size)
    C3 = spgemm_esc(A, B, gb.PlusMultipliesSemiring, max_lanes=512)
    np.testing.assert_allclose(C3.to_dense(), want, atol=1e-4)


def test_spgemm_esc_minplus(rng):
    """Min-plus ESC: ⊕-combine must be min, over stored entries only."""
    import scipy.sparse as sp

    from graphblast_tpu.matrix import Matrix
    from graphblast_tpu.ops.spgemm import spgemm_esc

    r = np.random.default_rng(3)
    AS = sp.random(60, 50, density=0.1, random_state=r, format="csr",
                   dtype=np.float32)
    BS = sp.random(50, 40, density=0.1, random_state=r, format="csr",
                   dtype=np.float32)
    Aco, Bco = AS.tocoo(), BS.tocoo()
    A = Matrix.from_coo(Aco.row, Aco.col, Aco.data, 60, 50)
    B = Matrix.from_coo(Bco.row, Bco.col, Bco.data, 50, 40)
    want = np.full((60, 40), MAXF, np.float32)
    for i, k, a in zip(Aco.row, Aco.col, Aco.data):
        for j, b in zip(BS.getrow(k).tocoo().col, BS.getrow(k).tocoo().data):
            want[i, j] = min(want[i, j], a + b)
    got = np.full((60, 40), MAXF, np.float32)
    ci, cj, cv = spgemm_esc(A, B, gb.MinimumPlusSemiring).extract_tuples()
    got[ci, cj] = cv
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_mxm_unmasked_routes_large_to_esc(chesapeake):
    """gb.mxm without a mask must work past the dense-fallback limit."""
    from graphblast_tpu.ops.spgemm import spgemm

    A = chesapeake
    C = spgemm(A, A, gb.PlusMultipliesSemiring, dense_limit=1)  # force ESC
    want = A.to_scipy() @ A.to_scipy()
    np.testing.assert_allclose(C.to_dense(), want.toarray(), atol=1e-3)


def test_debug_and_dirinfo_observability(chesapeake, capsys):
    """desc.debug prints op banners (reference: ===Begin vxm=== banners,
    backend/cuda/operations.hpp:91-94); desc.dirinfo prints push/pull
    ratios in stepped algorithm mode (reference: vector.hpp:306-309)."""
    from graphblast_tpu.algorithms import bfs

    A = chesapeake
    d = gb.Descriptor(debug=True)
    u = gb.Vector.full(A.ncols, 1.0)
    gb.mxv(A, u, gb.PlusMultipliesSemiring, desc=d)
    out = capsys.readouterr().out
    assert "===Begin mxv===" in out and "mxvmode=" in out

    bfs(A, 0, desc=gb.Descriptor(dirinfo=True, structure_only=True),
        mode="stepped")
    out = capsys.readouterr().out
    assert "[dirinfo] frontier nnz/n" in out


def test_from_device_csr_matches_from_coo(rng):
    """Zero-copy device-CSR constructor: same dense image and a working CSC
    mirror (reference: sparse_matrix.hpp:418-435 raw-device build)."""
    import jax.numpy as jnp

    import graphblast_tpu as gb
    from graphblast_tpu.semiring import PlusMultipliesSemiring

    n, m = 300, 2000
    rows = np.sort(rng.randint(0, n, m))
    cols = rng.randint(0, n, m)
    vals = rng.randn(m).astype(np.float32)
    # dedup (i,j) so both constructions agree
    key = rows * n + cols
    _, keep = np.unique(key, return_index=True)
    rows, cols, vals = rows[keep], cols[keep], vals[keep]
    A = gb.Matrix.from_coo(rows, cols, vals, n, n)

    B = gb.Matrix.from_device_csr(A.row_ptr, A.col_ind, A.val, n, n,
                                  nvals=A.nvals)
    np.testing.assert_allclose(np.asarray(B.to_dense()),
                               np.asarray(A.to_dense()))
    np.testing.assert_array_equal(np.asarray(B.row_ind[:B.nvals]),
                                  np.asarray(A.row_ind[:A.nvals]))
    # CSC mirror drives a vxm pull correctly
    x = rng.standard_normal(n).astype(np.float32)
    ya = gb.vxm(gb.Vector.dense_from(x), A, PlusMultipliesSemiring).to_numpy()
    yb = gb.vxm(gb.Vector.dense_from(x), B, PlusMultipliesSemiring).to_numpy()
    np.testing.assert_allclose(yb, ya, atol=1e-4)


def test_ewise_mult_sparse_dense_keeps_sparsity(rng):
    """sparse ∘ dense eWiseMult returns a SPARSE vector at u's stored
    indices (reference: ewisemult.hpp:174-270; previously densified)."""
    import graphblast_tpu as gb
    from graphblast_tpu.semiring import Multiplies
    from graphblast_tpu.types import Storage
    from graphblast_tpu.vector import Vector

    n = 200
    ind = np.sort(rng.choice(n, 17, replace=False))
    val = rng.randn(17).astype(np.float32)
    u = Vector.sparse_from(n, ind, val)
    vd = rng.randn(n).astype(np.float32)
    v = Vector.dense_from(vd)

    got = gb.eWiseMult(u, v, Multiplies)
    assert got.storage == Storage.SPARSE
    assert int(got.snvals) == 17
    want = np.zeros(n, np.float32)
    want[ind] = val * vd[ind]
    np.testing.assert_allclose(got.to_numpy(), want, rtol=1e-6)

    # dense-path result identical
    got_dense = gb.eWiseMult(u.to_dense(0), v, Multiplies)
    np.testing.assert_allclose(np.asarray(got_dense.to_numpy()), want,
                               rtol=1e-6)


def test_apply_matrix_host_and_device(chesapeake):
    """apply_matrix: traced device path vs host-functor path (the reference's
    GrB_BACKEND=GrB_SEQUENTIAL toggle, apply.hpp:102-111) agree, and a
    stateful Python functor works on the cpu backend."""
    import jax.numpy as jnp

    from graphblast_tpu.descriptor import Descriptor
    from graphblast_tpu.operations import apply_matrix

    A = chesapeake
    dev = apply_matrix(A, lambda v: v * 2.0 + 1.0)
    host = apply_matrix(A, lambda v: v * 2.0 + 1.0,
                        Descriptor(backend="cpu"))
    m = A.nvals
    np.testing.assert_allclose(np.asarray(dev.val), np.asarray(host.val))
    np.testing.assert_allclose(np.asarray(dev.val)[:m],
                               np.asarray(A.val)[:m] * 2.0 + 1.0)
    # pad slots must stay inert (zero), not become fn(0)
    np.testing.assert_allclose(np.asarray(dev.val)[m:], 0.0)
    if A.csc_val is not None:
        np.testing.assert_allclose(np.asarray(dev.csc_val),
                                   np.asarray(host.csc_val))

    # stateful host functor — impossible to trace, the whole reason the
    # reference runs matrix apply on its sequential backend
    state = {"calls": 0}

    def stateful(x):
        state["calls"] += 1
        return x + state["calls"] % 2

    out = apply_matrix(A, stateful, Descriptor(backend="cpu"))
    assert state["calls"] >= A.nvals
    assert out.nvals == A.nvals


def test_apply_vector_cpu_backend(rng):
    from graphblast_tpu.descriptor import Descriptor
    from graphblast_tpu.operations import apply
    from graphblast_tpu.vector import Vector

    x = rng.standard_normal(17).astype(np.float32)
    u = Vector.dense_from(x)
    got = apply(u, lambda v: v * v, desc=Descriptor(backend="cpu"))
    np.testing.assert_allclose(np.asarray(got.dense), x * x, rtol=1e-6)


# ---------------------------------------------------------- sparse push
def test_push_sparse_output_matches_dense(chesapeake, rng):
    """spmspv_push_sparse's (y, sind, sval, nv) must equal the dense push +
    sparse_from_dense pair for every monoid class and mask combination —
    the sparse output is what keeps push O(frontier-edges) per iteration
    (VERDICT r4 next-#3; reference epilogue: spmspv_inner.hpp:300-317)."""
    import jax.numpy as jnp

    from graphblast_tpu.ops.spmspv import spmspv_push, spmspv_push_sparse
    from graphblast_tpu.vector import sparse_from_dense
    from graphblast_tpu.types import INDEX_DTYPE

    A = chesapeake
    n = A.nrows
    fsrc = [0, 3, 9, 17, 25]
    f_ind = jnp.full((n,), n, INDEX_DTYPE).at[:len(fsrc)].set(
        jnp.asarray(fsrc, INDEX_DTYPE))
    f_val = jnp.zeros((n,), jnp.float32).at[:len(fsrc)].set(
        jnp.asarray([1.5, 2.0, 0.5, 3.0, 1.0]))
    f_nv = jnp.asarray(len(fsrc), INDEX_DTYPE)
    mask = jnp.asarray((rng.rand(n) < 0.5).astype(np.float32))
    cap = int(A.nnz_pad)

    cases = [
        (gb.PlusMultipliesSemiring, False, None, False),
        (gb.PlusMultipliesSemiring, False, mask, False),
        (gb.MinimumPlusSemiring, False, mask, True),
        (gb.MaximumMultipliesSemiring, False, None, False),
        (gb.LogicalOrAndSemiring, True, mask, True),   # struconly BFS shape
        (gb.MinimumSelectSecondSemiring, False, None, False),
    ]
    for sr, struc, mk, scmp in cases:
        ident = float(np.asarray(sr.identity(jnp.float32)))
        kw = dict(mask_dense=mk, mask_scmp=scmp, structure_only=struc)
        y_d = spmspv_push(A.col_ptr, A.csc_row_ind, A.csc_val,
                          f_ind, None if struc else f_val, f_nv, sr, n, cap,
                          sort_push=True, **kw)
        si_d, sv_d, nv_d = sparse_from_dense(y_d, ident,
                                             with_values=not struc)
        y_s, si_s, sv_s, nv_s = spmspv_push_sparse(
            A.col_ptr, A.csc_row_ind, A.csc_val,
            f_ind, None if struc else f_val, f_nv, sr, n, cap,
            with_values=not struc, **kw)
        tag = (sr.name, struc, mk is not None, scmp)
        np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_d),
                                   rtol=1e-6, err_msg=str(tag))
        assert int(nv_s) == int(nv_d), tag
        k = int(nv_d)
        np.testing.assert_array_equal(np.asarray(si_s)[:k],
                                      np.asarray(si_d)[:k], err_msg=str(tag))
        assert (np.asarray(si_s)[k:] == n).all(), tag
        if not struc:
            np.testing.assert_allclose(np.asarray(sv_s)[:k],
                                       np.asarray(sv_d)[:k], rtol=1e-6,
                                       err_msg=str(tag))


def test_bfs_grid_pushpull_golden(rng):
    """High-diameter grid BFS: push/pushpull/pull all golden-exact, and the
    direction heuristic actually picks push on the tiny frontiers (the
    regime direction optimization exists for — vector.hpp:292-323)."""
    from graphblast_tpu.algorithms.reference import bfs_cpu
    from graphblast_tpu.io.rmat import grid_matrix

    A = grid_matrix(16)                 # n=256, diameter 30
    want = bfs_cpu(A, 0)
    for mode in (Direction.PUSHPULL, Direction.PUSHONLY, Direction.PULLONLY):
        v = gb.algorithms.bfs(A, 0, desc=Descriptor(mxv_mode=mode))
        np.testing.assert_array_equal(v.to_numpy(0), want, err_msg=str(mode))


def test_sssp_grid_modes(rng):
    """SSSP on the grid in pushpull mode (postprocess filter forces the
    dense push path) matches the golden."""
    from graphblast_tpu.algorithms.reference import sssp_cpu
    from graphblast_tpu.io.rmat import grid_matrix

    A = grid_matrix(12)
    want = sssp_cpu(A, 0)
    for mode in (Direction.PUSHPULL, Direction.PULLONLY):
        d = gb.algorithms.sssp(A, 0, desc=Descriptor(mxv_mode=mode))
        np.testing.assert_allclose(d.to_numpy(MAXF), want, rtol=1e-5,
                                   err_msg=str(mode))


def test_lazy_frontier_parity(rng, monkeypatch):
    """Opt-in lazy dual-frontier protocol (GRB_LAZY_FRONTIER=1): BFS and
    SSSP pushpull stay golden-exact with the SP-bounded sparse carry and
    stale-image flags. Uses grid sizes no eager-mode test traced, so the
    jit cache cannot serve a stale (non-lazy) executable."""
    from graphblast_tpu.algorithms.reference import bfs_cpu, sssp_cpu
    from graphblast_tpu.io.rmat import grid_matrix

    monkeypatch.setenv("GRB_LAZY_FRONTIER", "1")
    A = grid_matrix(17)                 # n=289 — distinct from eager tests
    want = bfs_cpu(A, 0)
    v = gb.algorithms.bfs(A, 0, desc=Descriptor(mxv_mode=Direction.PUSHPULL))
    np.testing.assert_array_equal(v.to_numpy(0), want)

    B = grid_matrix(13)                 # n=169
    wd = sssp_cpu(B, 0)
    d = gb.algorithms.sssp(B, 0, desc=Descriptor(mxv_mode=Direction.PUSHPULL))
    np.testing.assert_allclose(d.to_numpy(MAXF), wd, rtol=1e-5)
