"""Elementwise / assign / reduce / gather / scatter array-level ops.

TPU re-expression of the reference's elementwise kernel zoo
(backend/cuda/{ewisemult,ewiseadd,assign,scatter,gather,reduce}.hpp and
kernels/*) as jnp one-liners XLA fuses into surrounding ops. Semantics parity:

  * eWiseMult applies the semiring's ⊗ (mul), eWiseAdd applies ⊕ (add) —
    the algorithms rely on this op extraction (e.g. sssp.hpp:76-82).
  * masks: nonzero passes, scmp complements; non-passing entries keep the
    OLD output value for assign (kernels/assign_dense.hpp:23-28) and get the
    identity for compute ops (ewisemult.hpp:109-169 masked variant).
  * sparse+dense eWiseAdd: dup dense, scatter-⊕ the sparse entries
    (ewiseadd.hpp:93-160).
  * sparse assign: set stored entries where mask passes, then PRUNE entries
    equal to the assigned value (assign.hpp:107-245 + updateFlagKernel) —
    this is SSSP's frontier filter.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..semiring import BinaryOp, Monoid, Semiring
from ..types import INDEX_DTYPE
from .segops import reduce_all, segment_reduce_csr
from .spmv import mask_pass


def _apply_mask_identity(out, mask_dense, scmp, ident):
    if mask_dense is None:
        return out
    return jnp.where(mask_pass(mask_dense, scmp), out, ident)


# ---------------------------------------------------------------------------
# eWiseMult / eWiseAdd (dense-dense core; storage dispatch lives in dispatch.py)
# ---------------------------------------------------------------------------


def ewise_binary_dense(u: jnp.ndarray, v, op: BinaryOp, ident,
                       mask_dense=None, mask_scmp: bool = False) -> jnp.ndarray:
    """w = op(u, v) elementwise; masked-out entries ← ident.

    v may be a scalar (reference's vector∘constant variants,
    ewisemult.hpp:275-344, ewiseadd.hpp:161-283)."""
    out = op(u, jnp.asarray(v, u.dtype))
    out = out.astype(u.dtype) if out.dtype != u.dtype else out
    return _apply_mask_identity(out, mask_dense, mask_scmp, jnp.asarray(ident, u.dtype))


def ewise_add_sparse_dense(n, sind, sval, snvals, v_dense, op: BinaryOp) -> jnp.ndarray:
    """w = v (dup), then w[ind] = op(sval, w[ind]) at stored entries
    (reference: ewiseadd.hpp:93-160 dup-then-scatter)."""
    cap = sind.shape[0]
    slot_valid = jnp.arange(cap, dtype=INDEX_DTYPE) < snvals
    tgt = jnp.where(slot_valid, sind, n)
    merged = op(sval.astype(v_dense.dtype), v_dense[jnp.minimum(tgt, n - 1)])
    return v_dense.at[tgt].set(merged.astype(v_dense.dtype), mode="drop")


# ---------------------------------------------------------------------------
# apply (unary map — reference: backend/cuda/apply.hpp runs host-side; here it
# is an ordinary fused device op, and RNG uses jax.random instead of the
# host-sequential rand() hack, mis.hpp:129-133)
# ---------------------------------------------------------------------------


def apply_unary_dense(u: jnp.ndarray, fn, mask_dense=None, mask_scmp=False,
                      keep_old: bool = True) -> jnp.ndarray:
    out = fn(u)
    if mask_dense is None:
        return out
    keep = u if keep_old else jnp.zeros_like(out)
    return jnp.where(mask_pass(mask_dense, mask_scmp), out, keep)


# ---------------------------------------------------------------------------
# assign (masked constant) — reference: assign.hpp:14-245
# ---------------------------------------------------------------------------


def assign_constant_dense(w: jnp.ndarray, value, mask_dense=None,
                          mask_scmp: bool = False) -> jnp.ndarray:
    """w[i] = value where mask passes; others keep w[i]
    (reference: assignDenseDenseMaskedKernel, kernels/assign_dense.hpp:10-40)."""
    val = jnp.asarray(value, w.dtype)
    if mask_dense is None:
        return jnp.full_like(w, val)
    return jnp.where(mask_pass(mask_dense, mask_scmp), val, w)


def assign_constant_sparse(n, sind, sval, snvals, value, mask_dense,
                           mask_scmp: bool = False):
    """Masked constant assign on a sparse vector, then prune == value entries
    (reference: assignSparse, assign.hpp:107-245: assignSparseKernel +
    updateFlagKernel + stream-compact). Returns new (sind, sval, snvals)."""
    cap = sind.shape[0]
    val = jnp.asarray(value, sval.dtype)
    slot_valid = jnp.arange(cap, dtype=INDEX_DTYPE) < snvals
    safe_ind = jnp.minimum(sind, n - 1)
    if mask_dense is not None:
        hit = mask_pass(mask_dense[safe_ind], mask_scmp) & slot_valid
        new_val = jnp.where(hit, val, sval)
    else:
        new_val = jnp.where(slot_valid, val, sval)
    # prune entries whose value == assigned constant (updateFlagKernel analog)
    keep = slot_valid & (new_val != val)
    pos = jnp.cumsum(keep.astype(INDEX_DTYPE)) - 1
    tgt = jnp.where(keep, pos, cap)
    out_ind = jnp.full((cap,), n, INDEX_DTYPE).at[tgt].set(sind, mode="drop")
    out_val = jnp.zeros((cap,), sval.dtype).at[tgt].set(new_val, mode="drop")
    return out_ind, out_val, jnp.sum(keep).astype(INDEX_DTYPE)


# ---------------------------------------------------------------------------
# scatter / gather (reference: scatter.hpp, gather.hpp — CC's primitives)
# ---------------------------------------------------------------------------


def scatter_indexed(w: jnp.ndarray, u: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """w[indices[i]] = u[i] (reference: scatterIndexedKernel, scatter.hpp:85-123
    — assignScatter's engine). Duplicate indices: last write wins in the
    reference (nondeterministic there; XLA scatter picks one deterministically)."""
    return w.at[indices].set(u.astype(w.dtype), mode="drop")


def gather_indexed(u: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """w[i] = u[indices[i]] (reference: gatherIndexedKernel, gather.hpp:11-49
    — extractGather's engine)."""
    return u[jnp.clip(indices, 0, u.shape[0] - 1)]


def scatter_constant(w: jnp.ndarray, value, indices: jnp.ndarray) -> jnp.ndarray:
    """w[indices[i]] = value (reference: scatterKernel, scatter.hpp:11-80)."""
    return w.at[indices].set(jnp.asarray(value, w.dtype), mode="drop")


# ---------------------------------------------------------------------------
# reduce (reference: reduce.hpp)
# ---------------------------------------------------------------------------


def reduce_dense_vector(u: jnp.ndarray, monoid: Monoid):
    """vector → scalar (reference: reduce.hpp:13-50 CUB DeviceReduce)."""
    return reduce_all(u, monoid)


def reduce_sparse_vector(sval: jnp.ndarray, snvals, monoid: Monoid,
                         structure_only: bool = False):
    """Sparse vector → scalar. struconly shortcut: result = nvals
    (reference: reduce.hpp:71-75)."""
    if structure_only:
        return snvals.astype(sval.dtype)
    cap = sval.shape[0]
    ident = monoid.identity(sval.dtype)
    slot_valid = jnp.arange(cap, dtype=INDEX_DTYPE) < snvals
    return reduce_all(jnp.where(slot_valid, sval, ident), monoid)


def reduce_matrix_rows(row_ptr, val, monoid: Monoid, nrows: int):
    """matrix → vector row-reduce (reference: reduce.hpp:109-145 CUB
    DeviceSegmentedReduce over csrRowPtr) — degree/weight-sum primitive."""
    return segment_reduce_csr(val, row_ptr, monoid, nrows)
