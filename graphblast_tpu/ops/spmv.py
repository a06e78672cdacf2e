"""Pull-direction SpMV: dense vector × CSR, semiring-generic, fused mask.

TPU re-derivation of the reference pull path (backend/cuda/spmv.hpp:20-240 and
kernels/spmv.hpp:10-59 spmvDenseMaskedOrKernel): instead of row-per-thread
scans with early exit, we run

    gather x at column indices → ⊗ edge values → segmented ⊕-reduce per row
    → fused mask select

entirely on the VPU with static shapes. The boolean/struconly + LogicalOrAnd
specialization skips the value multiply exactly like the reference's
template variants (spmv.hpp:84-96 semiring probe).

All inputs are raw arrays so the same function serves mxv pull (CSR), vxm pull
(CSC-as-CSR of Aᵀ), jit loops, and shard_map local shards.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..semiring import Semiring
from .segops import segment_reduce_csr


def _bitmap_gather(x_dense: jnp.ndarray, col_ind: jnp.ndarray) -> jnp.ndarray:
    """Boolean gather via 32-bit packing: pack (x != 0) into int32 words,
    gather words (table n/32 — far fewer Pallas table passes), test the bit.
    The TPU analog of the reference's struconly bitmap representation
    (spmspv_inner.hpp:133-134)."""
    from .gather_dispatch import take

    n = x_dense.shape[0]
    from ..types import round_up

    n32 = round_up(n, 32)
    bits = jnp.pad((x_dense != 0).astype(jnp.int32), (0, n32 - n))
    pow2 = (1 << jnp.arange(32, dtype=jnp.int32))
    words = jnp.sum(bits.reshape(-1, 32) * pow2, axis=1).astype(jnp.int32)
    wg = take(words, (col_ind >> 5).astype(jnp.int32))
    return (jax.lax.shift_right_logical(
        wg, (col_ind & 31).astype(jnp.int32)) & 1)


def mask_pass(mask_dense: jnp.ndarray, scmp: bool) -> jnp.ndarray:
    """Mask predicate: nonzero passes, scmp complements
    (reference: kernels/assign_dense.hpp:23-28)."""
    nz = mask_dense != 0
    return ~nz if scmp else nz


def spmv_pull(
    row_ptr: jnp.ndarray,
    col_ind: jnp.ndarray,
    val: Optional[jnp.ndarray],
    x_dense: jnp.ndarray,
    semiring: Semiring,
    nrows: int,
    mask_dense: Optional[jnp.ndarray] = None,
    mask_scmp: bool = False,
    structure_only: bool = False,
    swap_mul: bool = False,
) -> jnp.ndarray:
    """y[i] = ⊕_{j ∈ A(i,:)} A[i,j] ⊗ x[j]; masked-out rows get the identity.

    ⊗ operand order is mul(matrix_entry, x_entry); swap_mul flips it (see
    spmspv.py header for the convention note).

    Padding safety: padded edge slots live beyond row_ptr[nrows] and are never
    addressed by any segment, so no validity mask is needed (capacity padding
    is invisible to the reduction).
    """
    from .gather_dispatch import take

    out_dtype = x_dense.dtype
    ident = semiring.identity(out_dtype)

    if structure_only and semiring.name == "LogicalOrAnd":
        # struconly BFS pull: edge contributes iff frontier bit set
        # (reference: kernels/spmv.hpp:10-59 fused-or kernel). On TPU the
        # frontier is packed into a 32x-smaller bitmap; the fused Pallas
        # kernel streams col_ind once and emits the bit prefix-sum directly
        # (ops/pallas/orpull.py), leaving only the boundary fetch here.
        from .gather_dispatch import use_pallas

        if use_pallas():
            from .pallas.orpull import (orpull_available, orpull_bit_csum,
                                        pack_bitmap)

            if orpull_available(x_dense.shape[0]):
                csum = orpull_bit_csum(pack_bitmap(x_dense), col_ind)
                bnd = jnp.where(row_ptr > 0,
                                take(csum, jnp.maximum(row_ptr - 1, 0),
                                     sorted=True), 0)
                y = ((bnd[1:] - bnd[:-1]) > 0).astype(out_dtype)
                if mask_dense is not None:
                    y = jnp.where(mask_pass(mask_dense, mask_scmp), y, ident)
                return y
            edge_vals = _bitmap_gather(x_dense, col_ind).astype(out_dtype)
        else:
            edge_vals = take(x_dense, col_ind)
    else:
        xg = take(x_dense, col_ind)  # (nnz_pad,) gather — Pallas kernel on TPU
        a = val.astype(out_dtype)
        b = xg
        if swap_mul:
            a, b = b, a
        edge_vals = semiring.mul(a, b)  # unused-operand gathers are DCE'd

    y = segment_reduce_csr(edge_vals, row_ptr, semiring.add, nrows)
    y = y.astype(out_dtype) if y.dtype != out_dtype else y

    if mask_dense is not None:
        y = jnp.where(mask_pass(mask_dense, mask_scmp), y, ident)
    return y


def spmv_pull_sorted(
    out_ptr: jnp.ndarray,
    gather_ids: jnp.ndarray,
    sort_key_src: jnp.ndarray,
    val: Optional[jnp.ndarray],
    x_dense: jnp.ndarray,
    semiring: Semiring,
    n_out: int,
    nvals: int,
    mask_dense: Optional[jnp.ndarray] = None,
    mask_scmp: bool = False,
    swap_mul: bool = False,
) -> jnp.ndarray:
    """Value SpMV via transpose-order gather + one runtime key sort.

    TPU cost model (measured): a random gather is ~7.5 ns/query but a
    *monotone* gather is near-free (Pallas lane kernel with range pruning)
    and a key-value sort of the whole edge array costs less than a third of
    the random gather. So instead of gathering x at the pull order's column
    ids (random), gather x in the TRANSPOSE order — where the needed ids are
    the expanded major ids, i.e. already ascending — multiply there, and
    key-sort the products back to pull order (key = output row id with pad
    sentinel n_out). The per-output-segment reduce then reuses the CSR
    boundary layout. Replaces mgpu::SpmvCsrBinary (reference: spmv.hpp:188)
    with a sort-based pipeline that is also fully deterministic.

    Args mirror one orientation: for mxv over CSR output, pass
    (row_ptr, csc_col_ind, csc_row_ind, csc_val); for vxm over CSC output,
    pass (col_ptr, row_ind, col_ind, val).
    """
    out_dtype = x_dense.dtype
    ident = semiring.identity(out_dtype)
    from .gather_dispatch import take

    m = gather_ids.shape[0]
    n_in = x_dense.shape[0]
    xg = take(x_dense, jnp.clip(gather_ids, 0, n_in - 1), sorted=True)
    a = (val.astype(out_dtype) if val is not None
         else jnp.ones((m,), out_dtype))
    b = xg
    if swap_mul:
        a, b = b, a
    prod = semiring.mul(a, b)
    valid = jnp.arange(m, dtype=sort_key_src.dtype) < nvals
    key = jnp.where(valid, sort_key_src, n_out)
    # unstable: every GraphBLAS ⊕ monoid is commutative, so within-
    # segment order is irrelevant (and unstable sorts ~34% faster)
    k2, p2 = jax.lax.sort((key, jnp.where(valid, prod, ident)),
                          num_keys=1, is_stable=False)
    y = segment_reduce_csr(p2, out_ptr, semiring.add, n_out, edge_row_ids=k2)
    y = y.astype(out_dtype) if y.dtype != out_dtype else y
    if mask_dense is not None:
        y = jnp.where(mask_pass(mask_dense, mask_scmp), y, ident)
    return y


def spmv_pull_or_fused(
    row_ptr: jnp.ndarray,
    col_ind: jnp.ndarray,
    x_dense: jnp.ndarray,
    nrows: int,
    mask_dense: Optional[jnp.ndarray] = None,
    mask_scmp: bool = False,
) -> jnp.ndarray:
    """Specialized boolean BFS pull: y = (A ∨.∧ x) under mask, output 0/1.

    Mirrors spmvDenseMaskedOrKernel<UseScmp,...> (kernels/spmv.hpp:10-59); on
    TPU "early exit" is replaced by the or-counting fast path in
    segment_reduce_csr (prefix-sum of nonzero flags — one pass, no scan tree).
    """
    from ..semiring import LogicalOrAndSemiring

    return spmv_pull(row_ptr, col_ind, None, x_dense, LogicalOrAndSemiring,
                     nrows, mask_dense, mask_scmp, structure_only=True)
