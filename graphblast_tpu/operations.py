"""Public GraphBLAS operations — Vector/Matrix level, functional.

Mirrors the reference frontend free functions (graphblas/operations.hpp:22-886)
with a functional signature: results are returned, never mutated in place.
Argument order keeps (mask, accum, op, inputs, desc) recognizable; dimension
checks mirror dimension.hpp:13-114 and happen at trace time.

Storage dispatch happens here (the reference's backend operations.hpp case
analysis); fused device-resident loops should instead use ops.dispatch
(DualFrontier) directly — these wrappers are the host-driven "stepped" path
and the user-facing API.
"""
from __future__ import annotations

from typing import Optional, Union

import jax.numpy as jnp
import numpy as np

from .descriptor import DEFAULT, Descriptor
from .matrix import Matrix
from .semiring import BinaryOp, Monoid, Semiring, extract_add, extract_mul
from .types import Direction, Storage, INDEX_DTYPE, round_up
from .vector import Vector
from . import dimension as dim
from .ops import elementwise as ew
from .ops import segops
from .ops.dispatch import DualFrontier, mxv_dual
from .ops.spmv import spmv_pull, mask_pass
from .ops.spmspv import spmspv_push, frontier_degrees


def _check(cond, msg):
    if not cond:
        raise ValueError(msg)  # reference: Info error codes (types.hpp:28-42)


def _mask_dense(mask: Optional[Vector], ident=0):
    if mask is None:
        return None
    return mask.to_dense(ident).dense


def _edge_cap(A: Matrix, desc: Descriptor) -> int:
    cap = int(round_up(max(int(A.nnz_pad * desc.memusage), 128), 128))
    return min(cap, A.nnz_pad) if desc.memusage <= 1.0 else cap


def _apply_accum(old_dense, new_dense, accum):
    """accum semantics: w = accum(w_old, t) elementwise
    (reference: spmv.hpp:213-220 eWiseAdd into w)."""
    if accum is None or old_dense is None:
        return new_dense
    op = accum.op if isinstance(accum, Monoid) else accum
    return op(old_dense, new_dense).astype(new_dense.dtype)


def _debug_op(desc: Descriptor, name: str, **operands):
    """Op entry banner + operand/descriptor dump gated by desc.debug
    (reference: `===Begin vxm===` banners, backend/cuda/operations.hpp:91-94,
    plus printState's mask/scmp/repl/tran dump, backend/cuda/util.hpp:67-74)."""
    if not desc.debug:
        return
    print(f"===Begin {name}===")
    print(f"  scmp={desc.mask_scmp} replace={desc.output_replace} "
          f"tran0={desc.transpose_inp0} tran1={desc.transpose_inp1} "
          f"mxvmode={desc.mxv_mode.name} struconly={desc.structure_only}")
    for k, v in operands.items():
        if v is not None:
            print(f"  {k}: {v!r}")


# ---------------------------------------------------------------------------
# mxv / vxm (reference: operations.hpp:59-127 → backend 82-327)
# ---------------------------------------------------------------------------


def mxv(A: Matrix, u: Vector, semiring: Semiring,
        mask: Optional[Vector] = None, accum=None,
        desc: Descriptor = DEFAULT, w: Optional[Vector] = None) -> Vector:
    """w = A ⊕.⊗ u (reference: operations.hpp:97-127)."""
    return _matvec(A, u, semiring, mask, accum, desc, w, transpose=desc.transpose_inp0)


def vxm(u: Vector, A: Matrix, semiring: Semiring,
        mask: Optional[Vector] = None, accum=None,
        desc: Descriptor = DEFAULT, w: Optional[Vector] = None) -> Vector:
    """w = u ⊕.⊗ A ≡ Aᵀ ⊕.⊗ u (reference: operations.hpp:59-87, which toggles
    GrB_INP1 and calls mxv — operations.hpp:108)."""
    return _matvec(A, u, semiring, mask, accum, desc, w,
                   transpose=not desc.transpose_inp1)


def _matvec(A, u, semiring, mask, accum, desc, w, transpose: bool) -> Vector:
    _debug_op(desc, "vxm" if transpose else "mxv", A=A, u=u, mask=mask)
    n_out = A.ncols if transpose else A.nrows
    n_in = A.nrows if transpose else A.ncols
    op_name = "vxm" if transpose else "mxv"
    # systematic dim checks (reference: dimension.hpp:13-114 via CHECKs in
    # operations.hpp:97-127)
    if transpose:
        dim.check_row_size(A, u, op_name)
        dim.check_col_size(A, mask, op_name, "mask")
        dim.check_col_size(A, w, op_name, "w")
    else:
        dim.check_col_size(A, u, op_name)
        dim.check_row_size(A, mask, op_name, "mask")
        dim.check_row_size(A, w, op_name, "w")
    ident = semiring.identity(u.dtype)
    mask_d = _mask_dense(mask)

    mode = desc.mxv_mode
    if mode == Direction.PUSHPULL:
        # storage-based dispatch at the API level (the runtime density
        # heuristic lives in the fused DualFrontier path)
        mode = Direction.PUSHONLY if u.storage == Storage.SPARSE else Direction.PULLONLY

    if transpose:
        pull = (A.col_ptr, A.csc_row_ind, A.csc_val)
        push = (A.row_ptr, A.col_ind, A.val)
    else:
        pull = (A.row_ptr, A.col_ind, A.val)
        push = (A.col_ptr, A.csc_row_ind, A.csc_val)
    if push[0] is None:
        mode = Direction.PULLONLY
    if pull[0] is None:
        mode = Direction.PUSHONLY

    if mode == Direction.PUSHONLY:
        us = u.to_sparse(ident)
        y = spmspv_push(push[0], push[1], push[2], us.sind, us.sval, us.snvals,
                        semiring, n_out, _edge_cap(A, desc), mask_d,
                        desc.mask_scmp, desc.structure_only, desc.sort_push,
                        out_dtype=u.dtype)
        out_storage = Storage.SPARSE
    else:
        ud = u.to_dense(ident)
        y = spmv_pull(pull[0], pull[1], pull[2], ud.dense, semiring, n_out,
                      mask_d, desc.mask_scmp, desc.structure_only)
        out_storage = Storage.DENSE

    y = _apply_accum(w.to_dense(ident).dense if w is not None else None, y, accum)
    out = Vector(n_out, Storage.DENSE, dense=y)
    if out_storage == Storage.SPARSE:
        out = out.to_sparse(ident)
    return out


# ---------------------------------------------------------------------------
# mxm (reference: operations.hpp:22-49 → backend 18-78) — see ops/spgemm.py
# ---------------------------------------------------------------------------


def mxm(A: Matrix, B: Matrix, semiring: Semiring,
        mask: Optional[Matrix] = None, accum=None,
        desc: Descriptor = DEFAULT) -> Matrix:
    """C = A ⊕.⊗ B, sparse×sparse. Masked → masked SpGEMM (C inherits the
    mask's sparsity, reference spgemm.hpp:85-87); unmasked → general SpGEMM.
    desc.transpose_inp1 uses Bᵀ (TC's idiom, tc.hpp:24)."""
    from .ops import spgemm

    _debug_op(desc, "mxm", A=A, B=B, mask=mask)
    # inner-dim check (dimension.hpp checkDimRowCol; Bᵀ when INP1 toggled)
    b_inner = B.ncols if desc.transpose_inp1 else B.nrows
    if A.ncols != b_inner:
        raise dim.DimensionException(
            f"mxm: dimension mismatch — A is {A.shape}, "
            f"B{'ᵀ' if desc.transpose_inp1 else ''} inner dim {b_inner}")
    if mask is not None:
        dim.check_row_row(A, mask, "mxm")
        return spgemm.spgemm_masked(A, B, mask, semiring,
                                    transpose_b=desc.transpose_inp1)
    return spgemm.spgemm(A, B, semiring, transpose_b=desc.transpose_inp1)


def mxm_dense(A: Matrix, B, semiring: Semiring,
              desc: Descriptor = DEFAULT):
    """C = A ⊕.⊗ B with dense B (n, k) → dense (nrows, k) ndarray.

    The reference declares spmm and never implements it
    (backend/cuda/spmm.hpp:16-40); on TPU the dense RHS removes every lane
    gather from the op, so it is provided as a first-class extension."""
    import jax.numpy as jnp

    from .dense_matrix import DenseMatrix
    from .ops.spmm import spmm

    if isinstance(B, DenseMatrix):
        B = B.data
    B = jnp.asarray(B)
    _check(B.ndim == 2 and B.shape[0] == A.ncols,
           f"dim mismatch: B {B.shape} vs A.ncols={A.ncols}")
    if desc.transpose_inp0:
        return spmm(A.col_ptr, A.csc_row_ind, A.csc_val, B, semiring,
                    A.ncols, row_ind=A.csc_col_ind)
    return spmm(A.row_ptr, A.col_ind, A.val, B, semiring, A.nrows,
                row_ind=A.row_ind)


# ---------------------------------------------------------------------------
# eWiseMult / eWiseAdd (reference: operations.hpp:137-353)
# ---------------------------------------------------------------------------


def _binop_of(op, use_mul: bool) -> BinaryOp:
    if isinstance(op, Semiring):
        return extract_mul(op) if use_mul else extract_add(op).op
    if isinstance(op, Monoid):
        return op.op
    return op


def eWiseMult(u: Vector, v: Union[Vector, float, int], op,
              mask: Optional[Vector] = None, accum=None,
              desc: Descriptor = DEFAULT, w: Optional[Vector] = None) -> Vector:
    """w = u ⊗ v elementwise (reference: operations.hpp:137-267; semiring's
    MUL op extracted, backend ewisemult.hpp). Dense output; sparse inputs are
    densified with identity 0 (reference downgrades sparse∘sparse to dense,
    operations.hpp:331-410).

    Parity quirks preserved: (a) when `op` is a Semiring, entries where either
    input equals the ADD identity yield the identity (annihilator semantics of
    eWiseMultKernel, kernels/ewisemult.hpp:22-23 — this is what keeps LGC's
    PlusDivides from dividing by zero-degree); (b) mask scmp is IGNORED, the
    mask applies plainly (kernels/ewisemult.hpp:31 'TODO: add scmp' — LGC's
    toggle(GrB_MASK) around eWiseMult is a no-op in the reference)."""
    ann = op.identity(u.dtype) if isinstance(op, Semiring) else None
    if desc.mask_scmp:
        desc = desc.replace(mask_scmp=False)  # quirk (b)
    if (isinstance(v, Vector) and u.storage == Storage.SPARSE
            and v.storage == Storage.DENSE and mask is None and accum is None
            and w is None and ann is None):
        # sparse ∘ dense → SPARSE output at u's stored indices (reference:
        # ewisemult.hpp:174-270 — the output inherits u's sparsity; VERDICT
        # r1: this case previously densified, preserving semantics but
        # losing sparsity). One monotone gather of v at u.sind.
        dim.check_size_size(u, v, "eWiseMult")
        from .ops.gather_dispatch import take

        binop = _binop_of(op, use_mul=True)
        vi = take(v.dense, jnp.minimum(u.sind, u.n - 1), sorted=True)
        live = jnp.arange(u.cap, dtype=INDEX_DTYPE) < u.snvals
        sval = jnp.where(live, binop(u.sval, vi.astype(u.sval.dtype)),
                         jnp.zeros((), u.sval.dtype))
        return Vector(u.n, Storage.SPARSE, sind=u.sind, sval=sval,
                      snvals=u.snvals)
    return _ewise(u, v, _binop_of(op, use_mul=True), mask, accum, desc, w,
                  annihilator=ann)


def eWiseAdd(u: Vector, v: Union[Vector, float, int], op,
             mask: Optional[Vector] = None, accum=None,
             desc: Descriptor = DEFAULT, w: Optional[Vector] = None) -> Vector:
    """w = u ⊕ v elementwise (reference: operations.hpp:277-353; semiring's
    ADD monoid extracted). Output is always dense (backend ewiseadd.hpp
    'output always dense')."""
    return _ewise(u, v, _binop_of(op, use_mul=False), mask, accum, desc, w)


def _ewise(u, v, binop, mask, accum, desc, w, annihilator=None) -> Vector:
    _debug_op(desc, "eWise", u=u, v=v, mask=mask)
    ident = jnp.zeros((), u.dtype)
    mask_d = _mask_dense(mask)
    if mask is not None:
        dim.check_size_size(u, mask, "eWise", "u/mask")
    if isinstance(v, Vector):
        dim.check_size_size(u, v, "eWise")
        if u.storage == Storage.SPARSE and v.storage == Storage.DENSE:
            out = ew.ewise_add_sparse_dense(u.n, u.sind, u.sval, u.snvals,
                                            v.dense, binop)
            if mask_d is not None:
                out = jnp.where(mask_pass(mask_d, desc.mask_scmp), out, ident)
        else:
            ud = u.to_dense(0).dense
            vd = v.to_dense(0).dense
            out = ew.ewise_binary_dense(ud, vd, binop, 0, mask_d, desc.mask_scmp)
            if annihilator is not None and mask_d is None:
                # annihilator applies only in the UNMASKED kernel
                # (kernels/ewisemult.hpp:22-23 vs masked variant :50-53)
                ann = jnp.asarray(annihilator, ud.dtype)
                out = jnp.where((ud == ann) | (vd == ann), ann, out)
    else:
        ud = u.to_dense(0).dense
        out = ew.ewise_binary_dense(ud, v, binop, 0, mask_d, desc.mask_scmp)
        if annihilator is not None and mask_d is None:
            ann = jnp.asarray(annihilator, ud.dtype)
            out = jnp.where((ud == ann) | (jnp.asarray(v, ud.dtype) == ann),
                            ann, out)
    out = _apply_accum(w.to_dense(0).dense if w is not None else None, out, accum)
    return Vector(u.n, Storage.DENSE, dense=out)


# ---------------------------------------------------------------------------
# apply (reference: operations.hpp:560-610)
# ---------------------------------------------------------------------------


def apply(u: Vector, fn, mask: Optional[Vector] = None,
          desc: Descriptor = DEFAULT) -> Vector:
    """w = fn(u) elementwise. Runs on-device by default (the reference falls
    back to a host loop for stateful functors, backend/cuda/apply.hpp:34-42;
    with jax.random that hack is mostly unnecessary). desc.backend == "cpu"
    forces the host-functor path — the reference's GrB_BACKEND=GrB_SEQUENTIAL
    scoped toggle (algorithm/mis.hpp:131-133) — for arbitrary stateful Python
    callables that cannot be traced."""
    ud = u.to_dense(0).dense
    if desc.backend == "cpu":
        uh = np.asarray(ud)
        out_h = np.asarray([fn(x) for x in uh])
        out = jnp.asarray(out_h)
        mask_d = _mask_dense(mask)
        if mask_d is not None:
            from .ops.spmv import mask_pass

            out = jnp.where(mask_pass(mask_d, desc.mask_scmp), out, ud)
        return Vector(u.n, Storage.DENSE, dense=out)
    out = ew.apply_unary_dense(ud, fn, _mask_dense(mask), desc.mask_scmp)
    return Vector(u.n, Storage.DENSE, dense=out)


def apply_matrix(A: Matrix, fn, desc: Descriptor = DEFAULT) -> Matrix:
    """A' = fn(A) over stored values (reference: matrix apply with host
    functors, backend/cuda/apply.hpp:102-111 — the one op the reference
    always runs on its sequential backend because functors can be stateful).

    desc.backend == "cpu" applies `fn` as a scalar host functor over the
    numpy value arrays (exact reference semantics — a Python loop, so keep
    it to preprocessing-sized matrices); the default "tpu" path traces `fn`
    elementwise with jnp on-device."""
    if A.val is None:
        return A
    if desc.backend == "cpu":
        def host_apply(vals_host, dev_template):
            # stashes hold true-nnz arrays; the device arrays are padded to
            # nnz_pad — rebuild at padded length with zeroed pad slots
            vh = np.asarray(vals_host)[: A.nvals]
            new = np.asarray([fn(x) for x in vh], dtype=vh.dtype)
            out = np.zeros(dev_template.shape, dev_template.dtype)
            out[: len(new)] = new
            return jnp.asarray(out), new

        host_csr = getattr(A, "_host_csr", None)
        host_csc = getattr(A, "_host_csc", None)
        new_val, new_val_h = host_apply(
            host_csr[2] if host_csr is not None and host_csr[2] is not None
            else np.asarray(A.val), A.val)
        if A.csc_val is not None:
            # the CSC copy re-applies fn on its own ordering (elementwise fn
            # preserves value symmetry, so aliased structure stays valid)
            new_csc, new_csc_h = host_apply(
                host_csc[2] if host_csc is not None and host_csc[2] is not None
                else np.asarray(A.csc_val), A.csc_val)
        else:
            new_csc, new_csc_h = None, None
        out = Matrix(A.nrows, A.ncols, A.nvals, A.row_ptr, A.col_ind,
                     A.row_ind, new_val, A.col_ptr, A.csc_row_ind,
                     A.csc_col_ind, new_csc, format=A.format,
                     symmetric=A.symmetric)
        # re-stash the freshly computed HOST value arrays — dropping them
        # would push downstream plan builders onto the ~0.5 MB/s relay
        # D2H path (CLAUDE.md)
        if host_csr is not None:
            object.__setattr__(out, "_host_csr",
                               (host_csr[0], host_csr[1], new_val_h))
        if host_csc is not None and new_csc_h is not None:
            object.__setattr__(out, "_host_csc",
                               (host_csc[0], host_csc[1], new_csc_h))
        return out

    def dev_apply(v, r, c):
        # keep pad slots bit-identical (fn(0) may be nonzero and pads must
        # stay inert for downstream kernels)
        live = jnp.arange(v.shape[0]) < A.nvals
        return jnp.where(live, fn(v), v)

    return _scale_vals(A, dev_apply, breaks_symmetry=False)


# ---------------------------------------------------------------------------
# assign (reference: operations.hpp:509-530 → backend 822-860)
# ---------------------------------------------------------------------------


def assign(w: Vector, value, mask: Optional[Vector] = None,
           desc: Descriptor = DEFAULT) -> Vector:
    """Masked constant assign over all indices (GrB_ALL). Dense w keeps old
    values where the mask fails — unless desc.output_replace (GrB_REPLACE,
    types.hpp:60): then failed-mask entries are cleared to 0 ("no stored
    value" in the dense encoding). Sparse w sets-then-prunes (SSSP filter,
    assign.hpp:107-245)."""
    _debug_op(desc, "assign", w=w, mask=mask)
    dim.check_size_size(w, mask, "assign", "w/mask")
    mask_d = _mask_dense(mask)
    if w.storage == Storage.SPARSE:
        sind, sval, nv = ew.assign_constant_sparse(
            w.n, w.sind, w.sval, w.snvals, value, mask_d, desc.mask_scmp)
        return Vector(w.n, Storage.SPARSE, sind=sind, sval=sval, snvals=nv)
    base = jnp.zeros_like(w.dense) if desc.output_replace else w.dense
    out = ew.assign_constant_dense(base, value, mask_d, desc.mask_scmp)
    return Vector(w.n, Storage.DENSE, dense=out)


def assign_indexed(w: Vector, u: Vector, indices, desc: Descriptor = DEFAULT) -> Vector:
    """w[indices[i]] = u[i] for given host indices (reference: assignIndexed,
    operations.hpp:419-439)."""
    wd = w.to_dense(0).dense
    ud = u.to_dense(0).dense
    idx = jnp.asarray(np.asarray(indices), INDEX_DTYPE)
    return Vector(w.n, Storage.DENSE, dense=ew.scatter_indexed(wd, ud[: idx.shape[0]], idx))


# ---------------------------------------------------------------------------
# reduce (reference: operations.hpp:620-673)
# ---------------------------------------------------------------------------


def reduce_vector(u: Vector, monoid: Monoid, desc: Descriptor = DEFAULT):
    """vector → scalar (traced). struconly sparse shortcut: count
    (reference: reduce.hpp:71-75)."""
    _debug_op(desc, "reduce", u=u)
    if u.storage == Storage.SPARSE:
        return ew.reduce_sparse_vector(u.sval, u.snvals, monoid,
                                       desc.structure_only)
    return ew.reduce_dense_vector(u.dense, monoid)


def reduce_matrix_to_vector(A: Matrix, monoid: Monoid,
                            desc: Descriptor = DEFAULT) -> Vector:
    """matrix → vector row-reduce (reference: operations.hpp:620-641;
    LGC's degree computation)."""
    out = ew.reduce_matrix_rows(A.row_ptr, A.val, monoid, A.nrows)
    return Vector(A.nrows, Storage.DENSE, dense=out)


def reduce_matrix(A: Matrix, monoid: Monoid, desc: Descriptor = DEFAULT):
    """matrix → scalar (reference: operations.hpp:651-673; TC's final count)."""
    valid = jnp.arange(A.nnz_pad, dtype=INDEX_DTYPE) < A.nvals
    vals = jnp.where(valid, A.val, monoid.identity(A.val.dtype))
    return segops.reduce_all(vals, monoid)


# ---------------------------------------------------------------------------
# extension ops: scatter / assignScatter / extractGather
# (reference: operations.hpp:749-814 — CC's pointer-chasing primitives)
# ---------------------------------------------------------------------------


def scatter(w: Vector, indices: Vector, value, desc: Descriptor = DEFAULT) -> Vector:
    """w[indices[i]] = value (reference: operations.hpp:749-761)."""
    wd = w.to_dense(0).dense
    if indices.storage == Storage.SPARSE:
        idx = indices.sind
    else:
        idx = indices.dense.astype(INDEX_DTYPE)
    return Vector(w.n, Storage.DENSE, dense=ew.scatter_constant(wd, value, idx))


def assign_scatter(w: Vector, u: Vector, indices: Vector,
                   desc: Descriptor = DEFAULT) -> Vector:
    """w[indices[i]] = u[i] (reference: operations.hpp:771-790 → scatterIndexed,
    scatter.hpp:85-123). CC's hooking step: parent[parent_temp[i]] = mnp[i]."""
    dim.check_size_size(u, indices, "assignScatter", "u/indices")
    wd = w.to_dense(0).dense
    ud = u.to_dense(0).dense
    idx = indices.to_dense(0).dense.astype(INDEX_DTYPE)
    return Vector(w.n, Storage.DENSE, dense=ew.scatter_indexed(wd, ud, idx))


def extract_gather(u: Vector, indices: Vector, desc: Descriptor = DEFAULT) -> Vector:
    """w[i] = u[indices[i]] (reference: operations.hpp:800-814 → gatherIndexed,
    gather.hpp:11-49). CC's grandparent step."""
    ud = u.to_dense(0).dense
    idx = indices.to_dense(0).dense.astype(INDEX_DTYPE)
    return Vector(u.n, Storage.DENSE, dense=ew.gather_indexed(ud, idx))


# ---------------------------------------------------------------------------
# extract (reference: operations.hpp:355-410 — all three variants print
# "not implemented" and return GrB_NOT_IMPLEMENTED; implemented here)
# ---------------------------------------------------------------------------


def _host_indices(indices, bound: int, what: str):
    idx = np.asarray(indices, np.int64)
    if idx.size and (idx.min() < 0 or idx.max() >= bound):
        raise dim.DimensionException(
            f"{what}: index out of bounds (valid range [0, {bound}))")
    return idx


def extract(u: Vector, indices=None, mask: Optional[Vector] = None,
            accum=None, desc: Descriptor = DEFAULT,
            w: Optional[Vector] = None) -> Vector:
    """w = w ⊕? mask .* u[indices] — subvector extraction (reference:
    operations.hpp:355-371, a NOT_IMPLEMENTED stub there). indices is a
    host index list (None = GrB_ALL). With `accum` and `w`, masked lanes
    combine into w; without, masked-out lanes hold 0."""
    _debug_op(desc, "extract", u=u, mask=mask)
    ud = u.to_dense(0).dense
    if indices is None:
        out = ud
        n_out = u.n
    else:
        idx = _host_indices(indices, u.n, "extract")
        n_out = int(idx.size)
        out = jnp.take(ud, jnp.asarray(idx, dtype=INDEX_DTYPE))
    if mask is not None and mask.n != n_out:
        raise dim.DimensionException(
            f"extract: mask size {mask.n} != output size {n_out}")
    mask_d = _mask_dense(mask)
    if w is not None and w.n != n_out:
        raise dim.DimensionException(
            f"extract: w size {w.n} != output size {n_out}")
    base = (w.to_dense(0).dense if w is not None
            else jnp.zeros((n_out,), out.dtype))
    if accum is not None:
        out = _binop_of(accum, use_mul=False)(base, out)
    if mask_d is not None:
        from .ops.spmv import mask_pass

        out = jnp.where(mask_pass(mask_d, desc.mask_scmp), out, base)
    return Vector(n_out, Storage.DENSE, dense=out)


def extract_matrix(A: Matrix, row_indices=None, col_indices=None,
                   mask: Optional[Matrix] = None,
                   desc: Descriptor = DEFAULT) -> Matrix:
    """C = mask .* A[row_indices, col_indices] — submatrix extraction
    (reference: operations.hpp:373-391, a NOT_IMPLEMENTED stub there).
    Index lists are host arrays (None = GrB_ALL); duplicate indices
    replicate rows/cols (GraphBLAS extract semantics). A construction op:
    rebuilds via from_coo on the host stash, so the result carries fresh
    stashes/plans like any built Matrix."""
    host = getattr(A, "_host_csr", None)
    if host is not None:
        ptr = np.asarray(host[0])[: A.nrows + 1]
        ci = np.asarray(host[1])[: A.nvals]
        v = (np.asarray(host[2])[: A.nvals] if host[2] is not None
             else np.ones(A.nvals, np.float32))
    else:
        ptr = np.asarray(A.row_ptr)[: A.nrows + 1]
        ci = np.asarray(A.col_ind)[: A.nvals]
        v = np.asarray(A.val)[: A.nvals]
    ri = np.repeat(np.arange(A.nrows, dtype=np.int64),
                   np.diff(ptr.astype(np.int64)))

    if row_indices is None:
        row_sel, nrows_out = None, A.nrows
    else:
        row_sel = _host_indices(row_indices, A.nrows, "extract_matrix rows")
        nrows_out = int(row_sel.size)
    if col_indices is None:
        col_sel, ncols_out = None, A.ncols
    else:
        col_sel = _host_indices(col_indices, A.ncols, "extract_matrix cols")
        ncols_out = int(col_sel.size)

    # output (i', j') for every (selected occurrence of) A entry: duplicate
    # selections replicate entries, so expand A rows per selection slot
    if row_sel is None:
        out_r, keep_r, out_c_src, out_v_src = ri, None, ci, v
    else:
        # occurrence k of row_sel picks all of A row row_sel[k]
        deg = (ptr[row_sel + 1] - ptr[row_sel]).astype(np.int64)
        out_r = np.repeat(np.arange(nrows_out, dtype=np.int64), deg)
        take = np.concatenate(
            [np.arange(ptr[r], ptr[r + 1], dtype=np.int64)
             for r in row_sel]) if nrows_out else np.zeros(0, np.int64)
        out_c_src, out_v_src = ci[take], v[take]
    if col_sel is None:
        out_c, out_rr, out_vv = out_c_src, out_r, out_v_src
    else:
        # col occurrence map: a source col may appear at several output
        # positions — expand via sorted membership join
        order = np.argsort(col_sel, kind="stable")
        cs_sorted = col_sel[order]
        lo = np.searchsorted(cs_sorted, out_c_src, side="left")
        hi = np.searchsorted(cs_sorted, out_c_src, side="right")
        reps = hi - lo
        out_rr = np.repeat(out_r, reps)
        out_vv = np.repeat(out_v_src, reps)
        pos = (np.repeat(lo, reps)
               + (np.arange(reps.sum()) - np.repeat(
                   np.cumsum(reps) - reps, reps)))
        out_c = order[pos]
    if mask is not None:
        if (mask.nrows, mask.ncols) != (nrows_out, ncols_out):
            raise dim.DimensionException(
                f"extract_matrix: mask {mask.shape} != output "
                f"({nrows_out}, {ncols_out})")
        mhost = getattr(mask, "_host_csr", None)
        mptr = (np.asarray(mhost[0]) if mhost is not None
                else np.asarray(mask.row_ptr))[: mask.nrows + 1]
        mci = (np.asarray(mhost[1]) if mhost is not None
               else np.asarray(mask.col_ind))[: mask.nvals]
        mri = np.repeat(np.arange(mask.nrows, dtype=np.int64),
                        np.diff(mptr.astype(np.int64)))
        mkey = np.sort(mri * ncols_out + mci)
        inmask = _in_sorted(mkey, out_rr * ncols_out + out_c)
        out_rr, out_c, out_vv = out_rr[inmask], out_c[inmask], out_vv[inmask]
    return Matrix.from_coo(out_rr, out_c, out_vv, nrows_out, ncols_out,
                           dtype=out_vv.dtype, fmt=A.format)


def extract_col(A: Matrix, row_indices, col_index: int,
                mask: Optional[Vector] = None, accum=None,
                desc: Descriptor = DEFAULT,
                w: Optional[Vector] = None) -> Vector:
    """w = w ⊕? mask .* A[row_indices, col_index] — column extraction
    (reference: operations.hpp:393-410, a NOT_IMPLEMENTED stub there).
    Served from the CSC orientation's column segment."""
    if not (0 <= col_index < A.ncols):
        raise dim.DimensionException(
            f"extract_col: col {col_index} out of range [0, {A.ncols})")
    host = getattr(A, "_host_csc", None)
    if host is not None:
        cptr = np.asarray(host[0])[: A.ncols + 1]
        rix = np.asarray(host[1])[: A.nvals]
        cval = (np.asarray(host[2])[: A.nvals] if host[2] is not None
                else np.ones(A.nvals, np.float32))
    elif A.col_ptr is not None:
        cptr = np.asarray(A.col_ptr)[: A.ncols + 1]
        rix = np.asarray(A.csc_row_ind)[: A.nvals]
        cval = np.asarray(A.csc_val)[: A.nvals]
    else:
        raise ValueError("extract_col needs the CSC orientation "
                         "(GRB_SPARSE_MATRIX_FORMAT includes CSC)")
    s, e = int(cptr[col_index]), int(cptr[col_index + 1])
    col = np.zeros(A.nrows, cval.dtype)
    col[rix[s:e]] = cval[s:e]
    sel = (np.arange(A.nrows, dtype=np.int64) if row_indices is None
           else _host_indices(row_indices, A.nrows, "extract_col"))
    u = Vector.dense_from(jnp.asarray(col))
    return extract(u, sel, mask=mask, accum=accum, desc=desc, w=w)


# ---------------------------------------------------------------------------
# matrix assign + matrix eWiseAdd (reference: operations.hpp:300-318 and
# 440-552 — five more NOT_IMPLEMENTED stubs; implemented here as host
# construction ops, same altitude as build/extract)
# ---------------------------------------------------------------------------


def _host_coo_of(M: Matrix):
    host = getattr(M, "_host_csr", None)
    if host is not None:
        ptr = np.asarray(host[0])[: M.nrows + 1]
        ci = np.asarray(host[1])[: M.nvals]
        v = (np.asarray(host[2])[: M.nvals] if host[2] is not None
             else np.ones(M.nvals, np.float32))
    else:
        ptr = np.asarray(M.row_ptr)[: M.nrows + 1]
        ci = np.asarray(M.col_ind)[: M.nvals]
        v = np.asarray(M.val)[: M.nvals]
    ri = np.repeat(np.arange(M.nrows, dtype=np.int64),
                   np.diff(ptr.astype(np.int64)))
    return ri, ci.astype(np.int64), v


def _mask_keys(mask: Matrix):
    mr, mc, _ = _host_coo_of(mask)
    return np.sort(mr * mask.ncols + mc)


def _in_sorted(keys_sorted, q):
    p = np.searchsorted(keys_sorted, q)
    return ((p < keys_sorted.size)
            & (keys_sorted[np.minimum(p, max(keys_sorted.size - 1, 0))] == q)
            if keys_sorted.size else np.zeros(q.shape, bool))


def _dedupe_coo(keys, vals, combine=None):
    """Combine duplicate keys (returns sorted keys). from_coo stores raw
    COO — duplicate slots are legal stored entries — so construction ops
    normalize first. combine=None keeps the LAST occurrence (matching
    to_dense's write order); otherwise duplicates fold left-to-right with
    `combine` (log-pass pairwise merge — combine must be associative)."""
    order = np.argsort(keys, kind="stable")
    ks, vs = keys[order], np.asarray(vals)[order]
    while ks.size:
        head = np.r_[True, ks[1:] != ks[:-1]]
        if head.all():
            break
        idx = np.arange(ks.size)
        run = idx - np.maximum.accumulate(np.where(head, idx, -1))
        odd = (run & 1) == 1
        tgt = np.flatnonzero(odd) - 1
        vs = vs.copy()
        if combine is None:
            vs[tgt] = vs[tgt + 1]
        else:
            vs[tgt] = np.asarray(combine(vs[tgt], vs[tgt + 1]),
                                 dtype=vs.dtype)
        ks, vs = ks[~odd], vs[~odd]
    return ks, vs


def _sel_or_all(indices, bound: int, what: str):
    if indices is None:
        return np.arange(bound, dtype=np.int64)
    sel = _host_indices(indices, bound, what)
    if np.unique(sel).size != sel.size:
        raise ValueError(f"{what}: duplicate indices are undefined for "
                         "assign (GraphBLAS 4.3.7)")
    return sel


def _assign_entries(C: Matrix, tr, tc, tv, accum) -> Matrix:
    """Core subassign: target entries (tr, tc, tv) land in C — overwriting
    colliding C entries (no accum) or combining with them (accum); C
    entries elsewhere are kept (subassign-without-REPLACE semantics)."""
    cr, cc, cv = _host_coo_of(C)
    key_c, cv = _dedupe_coo(cr * C.ncols + cc, cv)           # last wins,
    key_ts, tv = _dedupe_coo(tr * C.ncols + tc, tv)          # like to_dense
    hit = _in_sorted(key_ts, key_c)
    if accum is not None and hit.any():
        binop = _binop_of(accum, use_mul=False)
        p = np.searchsorted(key_ts, key_c[hit])
        tv = tv.copy()
        tv[p] = np.asarray(binop(cv[hit].astype(tv.dtype), tv[p]),
                           dtype=tv.dtype)
    out_k = np.concatenate([key_c[~hit], key_ts])
    # result keeps C's dtype (finding: from_coo defaults to f32 and would
    # silently corrupt int matrices above 2^24)
    out_v = np.concatenate([cv[~hit], tv.astype(cv.dtype)])
    return Matrix.from_coo(out_k // C.ncols, out_k % C.ncols, out_v,
                           C.nrows, C.ncols, dtype=cv.dtype, fmt=C.format)


def assign_matrix(C: Matrix, A: Matrix, row_indices=None, col_indices=None,
                  mask: Optional[Matrix] = None, accum=None,
                  desc: Descriptor = DEFAULT) -> Matrix:
    """C[row_indices, col_indices] ⊕?= mask .* A (reference:
    operations.hpp:440-460, a NOT_IMPLEMENTED stub there). A is shaped
    (len(row_indices), len(col_indices)); mask shares A's shape."""
    ri_sel = _sel_or_all(row_indices, C.nrows, "assign_matrix rows")
    ci_sel = _sel_or_all(col_indices, C.ncols, "assign_matrix cols")
    if (A.nrows, A.ncols) != (ri_sel.size, ci_sel.size):
        raise dim.DimensionException(
            f"assign_matrix: A {A.shape} != selection "
            f"({ri_sel.size}, {ci_sel.size})")
    ar, ac, av = _host_coo_of(A)
    if mask is not None:
        if (mask.nrows, mask.ncols) != (A.nrows, A.ncols):
            raise dim.DimensionException(
                f"assign_matrix: mask {mask.shape} != A {A.shape}")
        keep = _in_sorted(_mask_keys(mask), ar * A.ncols + ac)
        ar, ac, av = ar[keep], ac[keep], av[keep]
    return _assign_entries(C, ri_sel[ar], ci_sel[ac], av, accum)


def assign_matrix_scalar(C: Matrix, value, row_indices=None,
                         col_indices=None, mask: Optional[Matrix] = None,
                         accum=None, desc: Descriptor = DEFAULT) -> Matrix:
    """C[row_indices, col_indices] ⊕?= mask .* value (reference:
    operations.hpp:535-552 stub). Materializes the len(ri)×len(ci) block —
    a host construction op, keep selections preprocessing-sized."""
    ri_sel = _sel_or_all(row_indices, C.nrows, "assign_matrix_scalar rows")
    ci_sel = _sel_or_all(col_indices, C.ncols, "assign_matrix_scalar cols")
    tr = np.repeat(np.arange(ri_sel.size, dtype=np.int64), ci_sel.size)
    tc = np.tile(np.arange(ci_sel.size, dtype=np.int64), ri_sel.size)
    if mask is not None:
        if (mask.nrows, mask.ncols) != (ri_sel.size, ci_sel.size):
            raise dim.DimensionException(
                f"assign_matrix_scalar: mask {mask.shape} != selection")
        keep = _in_sorted(_mask_keys(mask), tr * ci_sel.size + tc)
        tr, tc = tr[keep], tc[keep]
    tv = np.full(tr.size, value, np.dtype(C.dtype))
    return _assign_entries(C, ri_sel[tr], ci_sel[tc], tv, accum)


def assign_matrix_col(C: Matrix, u: Vector, row_indices, col_index: int,
                      mask: Optional[Vector] = None, accum=None,
                      desc: Descriptor = DEFAULT) -> Matrix:
    """C[row_indices, col_index] ⊕?= mask .* u (reference:
    operations.hpp:462-480 stub). Dense-vector semantics: every u lane is
    assigned (masked lanes only when a mask is given)."""
    if not (0 <= col_index < C.ncols):
        raise dim.DimensionException(
            f"assign_matrix_col: col {col_index} out of range")
    ri_sel = _sel_or_all(row_indices, C.nrows, "assign_matrix_col rows")
    uv = np.asarray(u.to_dense(0).dense)
    if uv.shape[0] != ri_sel.size:
        raise dim.DimensionException(
            f"assign_matrix_col: u size {uv.shape[0]} != {ri_sel.size}")
    keep = np.ones(ri_sel.size, bool)
    if mask is not None:
        if mask.n != ri_sel.size:
            raise dim.DimensionException("assign_matrix_col: mask size")
        keep = np.asarray(_mask_dense(mask)) != 0
        if desc.mask_scmp:
            keep = ~keep
    tr = ri_sel[keep]
    tv = uv[keep]
    tc = np.full(tr.size, col_index, np.int64)
    return _assign_entries(C, tr, tc, tv, accum)


def assign_matrix_row(C: Matrix, u: Vector, row_index: int, col_indices,
                      mask: Optional[Vector] = None, accum=None,
                      desc: Descriptor = DEFAULT) -> Matrix:
    """C[row_index, col_indices] ⊕?= mask .* u (reference:
    operations.hpp:482-500 stub)."""
    if not (0 <= row_index < C.nrows):
        raise dim.DimensionException(
            f"assign_matrix_row: row {row_index} out of range")
    ci_sel = _sel_or_all(col_indices, C.ncols, "assign_matrix_row cols")
    uv = np.asarray(u.to_dense(0).dense)
    if uv.shape[0] != ci_sel.size:
        raise dim.DimensionException(
            f"assign_matrix_row: u size {uv.shape[0]} != {ci_sel.size}")
    keep = np.ones(ci_sel.size, bool)
    if mask is not None:
        if mask.n != ci_sel.size:
            raise dim.DimensionException("assign_matrix_row: mask size")
        keep = np.asarray(_mask_dense(mask)) != 0
        if desc.mask_scmp:
            keep = ~keep
    tc = ci_sel[keep]
    tv = uv[keep]
    tr = np.full(tc.size, row_index, np.int64)
    return _assign_entries(C, tr, tc, tv, accum)


def eWiseAdd_matrix(A: Matrix, B: Matrix, op,
                    mask: Optional[Matrix] = None,
                    desc: Descriptor = DEFAULT) -> Matrix:
    """C = mask .* (A ⊕ B) over the UNION structure (reference:
    operations.hpp:300-318, a NOT_IMPLEMENTED stub there). `op` may be a
    BinaryOp, Monoid, or Semiring (its ⊕ is used, per the reference
    comment). Entries present in only one operand pass through."""
    dim.check_row_row(A, B, "eWiseAdd_matrix")
    if A.ncols != B.ncols:
        raise dim.DimensionException(
            f"eWiseAdd_matrix: A {A.shape} vs B {B.shape}")
    binop = _binop_of(op, use_mul=False)
    ar, ac, av = _host_coo_of(A)
    br, bc, bv = _host_coo_of(B)
    keys = np.concatenate([ar * A.ncols + ac, br * A.ncols + bc])
    out_dt = np.promote_types(np.dtype(A.dtype), np.dtype(B.dtype))
    vals = np.concatenate([av.astype(out_dt), bv.astype(out_dt)])
    # one dedupe pass folds within-operand duplicate slots AND the A∩B
    # intersection with the same ⊕ (stable sort keeps A's entry first for
    # non-commutative ops)
    uk, out_v = _dedupe_coo(keys, vals, combine=binop)
    out_r, out_c = uk // A.ncols, uk % A.ncols
    if mask is not None:
        if (mask.nrows, mask.ncols) != (A.nrows, A.ncols):
            raise dim.DimensionException("eWiseAdd_matrix: mask shape")
        keep = _in_sorted(_mask_keys(mask), uk)
        out_r, out_c, out_v = out_r[keep], out_c[keep], out_v[keep]
    return Matrix.from_coo(out_r, out_c, out_v, A.nrows, A.ncols,
                           dtype=out_dt, fmt=A.format)


# ---------------------------------------------------------------------------
# matrix scaling (reference: eWiseMult matrix∘scalar ewisemult.hpp:275-344 and
# matrix∘broadcast-vector eWiseMultRowInner/ColInner ewisemult.hpp:470-620 —
# the PR driver's A = alpha·A/outdegrees prep, example/gpr.cu:82-98)
# ---------------------------------------------------------------------------


def _scale_vals(A: Matrix, fn, breaks_symmetry: bool) -> Matrix:
    """fn(val, row_ids, col_ids) → new vals, applied to both CSR and CSC.

    CSC arrays are evaluated with their OWN index arrays (csc_row_ind carries
    the row id of each CSC-ordered entry) — even when they alias the CSR
    arrays via structural symmetry, because index-dependent scaling breaks
    value symmetry and the alias must be materialized."""
    new_val = fn(A.val, A.row_ind, A.col_ind) if A.val is not None else None
    if A.csc_val is not None:
        new_csc = fn(A.csc_val, A.csc_row_ind, A.csc_col_ind)
    else:
        new_csc = None
    return Matrix(A.nrows, A.ncols, A.nvals, A.row_ptr, A.col_ind, A.row_ind,
                  new_val, A.col_ptr, A.csc_row_ind, A.csc_col_ind, new_csc,
                  format=A.format,
                  symmetric=A.symmetric and not breaks_symmetry)


def eWiseMult_matrix_scalar(A: Matrix, op, value) -> Matrix:
    """A' = A ⊗ c elementwise over stored values."""
    binop = _binop_of(op, use_mul=True)
    return _scale_vals(A, lambda v, r, c: binop(v, jnp.asarray(value, v.dtype)),
                       breaks_symmetry=False)


def scale_matrix(A: Matrix, op, value, desc: Descriptor = DEFAULT) -> Matrix:
    """B = op(A, val) over stored values (reference: scale,
    operations.hpp:711-726 — a NOT_IMPLEMENTED stub there)."""
    return eWiseMult_matrix_scalar(A, op, value)


def scale_vector(u: Vector, op, value, desc: Descriptor = DEFAULT) -> Vector:
    """w = op(u, val) over stored values (reference: scale,
    operations.hpp:728-741 — a NOT_IMPLEMENTED stub there). Sparse input
    scales only the stored entries; dense input scales every lane (all
    lanes are stored in the dense encoding)."""
    binop = _binop_of(op, use_mul=True)
    if u.storage == Storage.SPARSE:
        return Vector(u.n, Storage.SPARSE, sind=u.sind,
                      sval=binop(u.sval, jnp.asarray(value, u.sval.dtype)),
                      snvals=u.snvals)
    return Vector(u.n, Storage.DENSE,
                  dense=binop(u.dense, jnp.asarray(value, u.dense.dtype)))


def scale_matrix_rows(A: Matrix, vec: Vector, op) -> Matrix:
    """A'[i,j] = op(A[i,j], vec[i]) (reference: eWiseMultRowInner)."""
    dim.check_row_size(A, vec, "scaleRows", "vec")
    binop = _binop_of(op, use_mul=True)
    vd = vec.to_dense(0).dense

    def fn(v, r, c):
        return binop(v, vd[jnp.minimum(r, vec.n - 1)]).astype(v.dtype)

    return _scale_vals(A, fn, breaks_symmetry=True)


def scale_matrix_cols(A: Matrix, vec: Vector, op) -> Matrix:
    """A'[i,j] = op(A[i,j], vec[j]) (reference: eWiseMultColInner)."""
    dim.check_col_size(A, vec, "scaleCols", "vec")
    binop = _binop_of(op, use_mul=True)
    vd = vec.to_dense(0).dense

    def fn(v, r, c):
        return binop(v, vd[jnp.minimum(c, vec.n - 1)]).astype(v.dtype)

    return _scale_vals(A, fn, breaks_symmetry=True)


# ---------------------------------------------------------------------------
# transpose / tril / trace / graphColor (reference: operations.hpp:682-886)
# ---------------------------------------------------------------------------


def transpose(A: Matrix) -> Matrix:
    """Aᵀ (reference: transpose.hpp:39-114 cusparseScsr2csc). With dual
    CSR+CSC storage this is a zero-copy container swap."""
    return Matrix(A.ncols, A.nrows, A.nvals,
                  row_ptr=A.col_ptr, col_ind=A.csc_row_ind,
                  row_ind=A.csc_col_ind, val=A.csc_val,
                  col_ptr=A.row_ptr, csc_row_ind=A.col_ind,
                  csc_col_ind=A.row_ind, csc_val=A.val,
                  format=A.format, symmetric=A.symmetric)


def tril(A: Matrix) -> Matrix:
    """Lower-triangular filter (reference: tri.hpp:10-53, host CSR walk; TC
    preprocessing). Host-side build-time op, like the reference."""
    r, c, v = A.extract_tuples()
    keep = c < r
    return Matrix.from_coo(r[keep], c[keep], v[keep], A.nrows, A.ncols,
                           dtype=A.dtype)


def apply_vxm(u: Vector, A: Matrix, semiring: Semiring,
              mask: Optional[Vector] = None, accum=None,
              desc: Descriptor = DEFAULT, w: Optional[Vector] = None) -> Vector:
    """Fused apply & vector-matrix product: wᵀ = wᵀ accum maskᵀ .* (uᵀ ⊕.⊗ A)
    (reference: operations.hpp:830-865 → backend/cuda/operations.hpp:1275-1404).

    The reference needs a dedicated fused entry point because its vxm cannot
    carry an accumulator through the masked push epilogue; here XLA fuses the
    accum into the same compiled program, so this is vxm's semantics with the
    accumulation guaranteed fused (used by LGC's residual update,
    lgc.hpp:121-127)."""
    return vxm(u, A, semiring, mask=mask, accum=accum, desc=desc, w=w)


def trace_mxm_transpose(A: Matrix, B: Matrix, semiring: Semiring,
                        desc: Descriptor = DEFAULT):
    """Tr(A ⊕.⊗ Bᵀ) = ⊕_i ⊕_k A[i,k] ⊗ B[i,k] over matching sparsity
    (reference: operations.hpp:700-711 → trace.hpp:13-49 warp dot + binary
    search). Re-derived as a sorted-intersection over CSR rows."""
    from .ops.spgemm import intersect_rows_reduce

    return intersect_rows_reduce(A, B, semiring)
