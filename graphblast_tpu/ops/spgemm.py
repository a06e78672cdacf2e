"""SpGEMM: masked sparse×sparse matmul + general fallback + trace.

TPU re-derivation of:
  * spgemmMasked (reference: backend/cuda/spgemm.hpp:22-110 + warp kernel
    kernels/spgemm.hpp:17-79): for every stored (i,j) of the mask, compute the
    semiring dot of A's row i against B's column j. The reference assigns a
    warp per mask row and binary-searches each A entry into B's CSC column;
    here we expand (mask edge × A-row entry) pairs into one flat array and run
    a *vectorized* lower-bound binary search (fori_loop of log₂ steps over
    gathers), then segment-⊕ by mask edge. Work complexity matches the
    reference: Σ_{(i,j)∈M} deg_A(i)·log deg_B(j).
  * cusparse csrgemm2 (spgemm.hpp:282-508): unmasked SpGEMM. The reference
    defers to a vendor library; we provide a dense-blocked MXU fallback
    (matmul on 128-aligned tiles) suited to the small/medium matrices the
    examples use, and will grow a hash-based Pallas path for large inputs.
  * traceMxmTranspose (trace.hpp:13-49): Tr(A ⊕.⊗ Bᵀ) as a sorted-row
    intersection reduce.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..matrix import Matrix
from ..semiring import Semiring
from ..types import INDEX_DTYPE, round_up
from .segops import segment_reduce_csr, reduce_all


def _lower_bound(sorted_ref: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray,
                 keys: jnp.ndarray, steps: int = 31,
                 sorted_queries: bool = False) -> jnp.ndarray:
    """Vectorized lower_bound of keys within per-lane [lo, hi) windows of
    sorted_ref (the TPU analog of the reference's per-lane device binarySearch,
    kernels/util.hpp:7-40). When the (window, key) queries are pre-sorted
    (sort-join callers), every step's mid positions are monotone and the
    gathers ride the Pallas lane kernel; the loop is unrolled so each step's
    gather is a separate kernel launch rather than a serialized fori body."""
    from .gather_dispatch import take

    nmax = sorted_ref.shape[0]

    def body(_, state):
        lo_, hi_ = state
        mid = (lo_ + hi_) // 2
        km = take(sorted_ref, jnp.clip(mid, 0, nmax - 1),
                  sorted=sorted_queries)
        go_right = km < keys
        active = lo_ < hi_
        new_lo = jnp.where(active & go_right, mid + 1, lo_)
        new_hi = jnp.where(active & ~go_right, mid, hi_)
        return new_lo, new_hi

    if sorted_queries:
        state = (lo, hi)
        for _ in range(steps):
            state = body(None, state)
        return state[0]
    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo


def spgemm_masked(A: Matrix, B: Matrix, M: Matrix, semiring: Semiring,
                  transpose_b: bool = False,
                  expansion_cap: Optional[int] = None) -> Matrix:
    """C = (A ⊕.⊗ B or Bᵀ) .* structure(M): C duplicates M's sparsity
    (reference: spgemm.hpp:85-87 C.dup(mask)).

    Requires A's CSR and B's CSC (or B's CSR when transpose_b — TC's
    mxm(…, Aᵀ) idiom, tc.hpp:24). `expansion_cap` bounds the static
    (mask-edge × A-entry) workspace; by default it is computed on the host
    from M's concrete row structure."""
    n = A.nrows
    if transpose_b:
        b_ptr, b_ind, b_val = B.row_ptr, B.col_ind, B.val
    else:
        b_ptr, b_ind, b_val = B.col_ptr, B.csc_row_ind, B.csc_val
    if b_ptr is None:
        raise ValueError("spgemm_masked needs B CSC (or CSR with transpose_b)")

    mi = M.row_ind   # (m_cap,) padded with sentinel nrows
    mj = M.col_ind
    m_cap = M.nnz_pad
    out_dtype = A.dtype
    ident = semiring.identity(out_dtype)

    mi_safe = jnp.minimum(mi, n - 1)
    slot_valid = jnp.arange(m_cap, dtype=INDEX_DTYPE) < M.nvals
    deg = jnp.where(slot_valid, A.row_ptr[mi_safe + 1] - A.row_ptr[mi_safe], 0)
    offsets = jnp.cumsum(deg) - deg

    if expansion_cap is None:
        # host-side bound (concrete arrays outside jit, like the reference's
        # host-launched kernel sizing)
        total_host = int(np.asarray(deg).sum())
        expansion_cap = max(round_up(max(total_host, 1), 128), 128)

    # scatter + cummax forward-fill instead of searchsorted (binary search
    # serializes on TPU — see ops/spmspv.py expand_frontier note). All
    # expansion gathers are monotone (m_slot is non-decreasing) → Pallas.
    from .gather_dispatch import take

    e = jnp.arange(expansion_cap, dtype=INDEX_DTYPE)
    slot_ids = jnp.arange(m_cap, dtype=INDEX_DTYPE)
    mark_tgt = jnp.where(deg > 0, offsets, expansion_cap)
    marks = (jnp.zeros((expansion_cap,), INDEX_DTYPE)
             .at[mark_tgt].max(slot_ids, mode="drop"))
    m_slot = jax.lax.cummax(marks)
    t = e - take(offsets, m_slot, sorted=True)
    mi_exp = jnp.minimum(take(mi, m_slot, sorted=True), n - 1)
    a_idx = jnp.clip(take(A.row_ptr, mi_exp, sorted=True) + t,
                     0, A.nnz_pad - 1)
    k = take(A.col_ind, a_idx, sorted=True)
    a = take(A.val, a_idx, sorted=True).astype(out_dtype)
    valid = e < (offsets[-1] + deg[-1])
    # invalid lanes search an empty window (j sentinel = last ptr slot)
    j = jnp.where(valid, take(mj, m_slot, sorted=True), b_ptr.shape[0] - 2)
    j = jnp.minimum(j, b_ptr.shape[0] - 2)

    # --- B lookup as a SORT-JOIN (cost model: two unstable sorts beat 31
    # random-gather binary-search steps ~40x; reference does a per-lane
    # binary search per warp, kernels/spgemm.hpp:17-79) ---
    # 1) order the expansion by (j, k): every later access is then monotone
    ej, ek, eperm = jax.lax.sort((j, k, e), num_keys=2, is_stable=False)
    lo0 = take(b_ptr, ej, sorted=True)
    hi0 = take(b_ptr, ej + 1, sorted=True)
    # 2) binary search with sorted queries: per-step mid positions are
    # clustered, so the Pallas lane gather prunes to a few table rows
    lo = _lower_bound(b_ind, lo0, hi0, ek, sorted_queries=True)
    lo_safe = jnp.clip(lo, 0, b_ind.shape[0] - 1)
    found_s = (lo < hi0) & (take(b_ind, lo_safe, sorted=True) == ek)
    b_s = jnp.where(found_s, take(b_val, lo_safe, sorted=True).astype(out_dtype),
                    ident)
    # 3) route (b, found) back to expansion order by sorting on the carried
    # original slot id (eperm is a permutation of iota)
    _, b_back, found_back = jax.lax.sort(
        (eperm, b_s, found_s.astype(jnp.int32)), num_keys=1, is_stable=False)
    prod = jnp.where((found_back != 0) & valid, semiring.mul(a, b_back), ident)

    seg_ptr = jnp.concatenate([offsets, (offsets[-1] + deg[-1])[None]])
    c_val = segment_reduce_csr(prod, seg_ptr, semiring.add, m_cap)
    c_val = jnp.where(slot_valid, c_val, jnp.zeros((), out_dtype))

    return Matrix(M.nrows, M.ncols, M.nvals,
                  row_ptr=M.row_ptr, col_ind=M.col_ind, row_ind=M.row_ind,
                  val=c_val,
                  col_ptr=None, csc_row_ind=None, csc_col_ind=None,
                  csc_val=None, format=M.format, symmetric=False)


def spgemm(A: Matrix, B: Matrix, semiring: Semiring,
           transpose_b: bool = False,
           dense_limit: int = 4096 * 4096) -> Matrix:
    """Unmasked C = A ⊕.⊗ B via dense MXU tiles (vendor-library replacement;
    reference: cusparse_spgemm2, spgemm.hpp:282-508, float plus-times only —
    this version is semiring-generic for plus-times via jnp.dot and falls back
    to an explicit ⊕-reduction otherwise)."""
    eff_ncols = B.nrows if transpose_b else B.ncols
    if A.nrows * eff_ncols > dense_limit:
        raise NotImplementedError(
            "unmasked SpGEMM beyond dense fallback size; use spgemm_masked "
            "or tile the computation (vendor-lib path in the reference)")
    Ad = jnp.asarray(A.to_dense())
    Bd = jnp.asarray(B.to_dense())
    if transpose_b:
        Bd = Bd.T
    if semiring.name == "PlusMultiplies":
        Cd = jnp.dot(Ad, Bd, preferred_element_type=jnp.float32).astype(A.dtype)
    else:
        # ⊕-reduce over the contraction axis with generic ops (VPU path)
        prod = semiring.mul(Ad[:, :, None], Bd[None, :, :])
        ident = semiring.identity(prod.dtype)
        Cd = jax.lax.reduce(prod, ident, lambda x, y: semiring.add(x, y), (1,))
    return Matrix.from_dense(np.asarray(Cd))


def intersect_rows_reduce(A: Matrix, B: Matrix, semiring: Semiring):
    """Tr(A ⊕.⊗ Bᵀ) = ⊕ over matching (i,k): A[i,k] ⊗ B[i,k]
    (reference: trace.hpp:13-49 traceKernelTranspose — warp dot with binary
    search + atomicAdd; here: one lower_bound per stored A entry, then a full
    ⊕-reduce, deterministic)."""
    out_dtype = A.dtype
    ident = semiring.identity(out_dtype)
    i = A.row_ind   # padded sentinel = nrows
    k = A.col_ind
    valid = jnp.arange(A.nnz_pad, dtype=INDEX_DTYPE) < A.nvals
    i_safe = jnp.minimum(i, B.nrows - 1)
    lo = _lower_bound(B.col_ind, B.row_ptr[i_safe], B.row_ptr[i_safe + 1], k)
    lo_safe = jnp.clip(lo, 0, B.nnz_pad - 1)
    found = (lo < B.row_ptr[i_safe + 1]) & (B.col_ind[lo_safe] == k) & valid
    prod = jnp.where(found,
                     semiring.mul(A.val.astype(out_dtype),
                                  B.val[lo_safe].astype(out_dtype)),
                     ident)
    return reduce_all(prod, semiring.add)
