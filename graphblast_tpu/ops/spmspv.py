"""Push-direction SpMSpV: sparse frontier × CSC, semiring-generic.

TPU re-derivation of the merge-path push pipeline
(reference: backend/cuda/spmspv_inner.hpp:62-320 spmspvApspieMerge):

  reference (CUDA)                         this file (XLA/TPU)
  ------------------------------------     -----------------------------------
  indirectScanKernel + mgpu::Scan          degree gather + cumsum offsets
  IntervalExpand / IntervalGatherIndirect  searchsorted(offsets, iota) gather
  eWiseMultKernel                          vectorized semiring ⊗
  CUB DeviceRadixSort (endbit)             lax.sort key-value (int32 keys)
  mgpu::ReduceByKey                        segmented scan + tail scatter
  struconly bitmap scatter                 scatter-max of ones (deterministic)

TPUs have no atomics; the sort+segment formulation is deterministic, which
upgrades the reference's atomicCAS push (kernels/spmspv.hpp:59-84) to
bitwise-reproducible results (SURVEY.md §5 race-detection note).

Operand convention: ⊗ is applied as mul(matrix_entry, frontier_entry) for both
mxv and vxm (the only ops the reference exercises with non-commutative ⊗ are
mxv-oriented, e.g. MinimumSelectSecond in cc.hpp:80); pass swap_mul=True to
flip.

The frontier lives in padded (ind, val, nvals) arrays; the expanded edge
workspace has static capacity `edge_cap` (= memusage · nnz_pad, the analog of
the reference's workspace bound, spmspv_inner.hpp:51-59). Callers must ensure
the frontier's total degree fits edge_cap or route to pull (the dispatch layer
checks this — see dispatch.mxv_dual).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..semiring import Semiring
from ..types import INDEX_DTYPE
from .segops import segmented_scan
from .spmv import mask_pass


def frontier_degrees(ptr: jnp.ndarray, f_ind: jnp.ndarray, f_nvals) -> jnp.ndarray:
    """Row lengths of frontier vertices (reference: indirectScanKernel,
    spmspv_inner.hpp:111-119). Pad slots report degree 0."""
    from .gather_dispatch import take

    cap = f_ind.shape[0]
    n = ptr.shape[0] - 1
    fi = jnp.minimum(f_ind, n - 1)  # compacted frontier ids ascend → sorted gather
    slot_valid = jnp.arange(cap, dtype=INDEX_DTYPE) < f_nvals
    deg = take(ptr, fi + 1, sorted=True) - take(ptr, fi, sorted=True)
    return jnp.where(slot_valid, deg, 0)


def expand_frontier(
    ptr: jnp.ndarray,
    ind: jnp.ndarray,
    mat_val: Optional[jnp.ndarray],
    f_ind: jnp.ndarray,
    f_val: Optional[jnp.ndarray],
    f_nvals,
    edge_cap: int,
    structure_only: bool,
    semiring: Semiring,
    out_dtype,
    swap_mul: bool = False,
):
    """Expand frontier adjacency into flat (dst, ⊗-value, valid) arrays.

    Merge-path equivalent: edge slot e finds its source frontier slot by
    binary search over the cumsum'd degree offsets (IntervalExpand /
    IntervalGatherIndirect re-derived as vectorized gathers,
    reference: spmspv_inner.hpp:178-207).

    Returns (dst, mv, valid, total): destination ids, ⊗ products, lane
    validity, and the true expanded edge count (traced scalar).
    """
    n = ptr.shape[0] - 1
    deg = frontier_degrees(ptr, f_ind, f_nvals)
    offsets = jnp.cumsum(deg) - deg  # exclusive scan
    total = offsets[-1] + deg[-1]

    # Edge slot e -> source frontier slot, WITHOUT searchsorted: a binary
    # search is ~log(n) serialized gather passes on TPU (measured ~100ms for
    # 1M edges); instead scatter each nonempty slot's id at its start offset
    # and forward-fill with a cumulative max — two streaming passes.
    e = jnp.arange(edge_cap, dtype=INDEX_DTYPE)
    slot_ids = jnp.arange(f_ind.shape[0], dtype=INDEX_DTYPE)
    mark_tgt = jnp.where(deg > 0, offsets, edge_cap)  # empty slots: dropped
    marks = (jnp.zeros((edge_cap,), INDEX_DTYPE)
             .at[mark_tgt].max(slot_ids, mode="drop"))
    src_slot = jax.lax.cummax(marks)
    from .gather_dispatch import take

    fi = jnp.minimum(take(f_ind, src_slot, sorted=True), n - 1)
    within = e - take(offsets, src_slot, sorted=True)
    edge_idx = jnp.clip(take(ptr, fi, sorted=True) + within, 0, ind.shape[0] - 1)
    dst = take(ind, edge_idx, sorted=True)
    valid = e < total

    if structure_only:
        mv = jnp.ones((edge_cap,), out_dtype)
    else:
        a = take(mat_val, edge_idx, sorted=True).astype(out_dtype)
        b = (take(f_val, src_slot, sorted=True).astype(out_dtype) if f_val is not None
             else jnp.ones((edge_cap,), out_dtype))
        if swap_mul:
            a, b = b, a
        mv = semiring.mul(a, b)  # unused-operand gathers are DCE'd by XLA
    return dst, mv, valid, total


def spmspv_push(
    ptr: jnp.ndarray,
    ind: jnp.ndarray,
    mat_val: Optional[jnp.ndarray],
    f_ind: jnp.ndarray,
    f_val: Optional[jnp.ndarray],
    f_nvals,
    semiring: Semiring,
    n_out: int,
    edge_cap: int,
    mask_dense: Optional[jnp.ndarray] = None,
    mask_scmp: bool = False,
    structure_only: bool = False,
    sort_push: bool = True,
    swap_mul: bool = False,
    out_dtype=None,
) -> jnp.ndarray:
    """Dense-output push: y = ⊕-scatter of frontier-edge products.

    (ptr, ind, mat_val) describe the transpose-relative CSR: for vxm(u, A)
    pass A's CSR rows; for mxv(A, u) pass A's CSC (the reference dispatches
    identically, operations.hpp:82-209).

    Returns a dense (n_out,) array with the semiring identity in untouched
    slots; the dispatch layer re-sparsifies, matching the masked-filter +
    stream-compact epilogue (reference: spmspv.hpp:111-249).
    """
    if out_dtype is None:
        out_dtype = f_val.dtype if f_val is not None else jnp.float32
    ident = semiring.identity(out_dtype)
    dst, mv, valid, _ = expand_frontier(
        ptr, ind, mat_val, f_ind, f_val, f_nvals, edge_cap,
        structure_only, semiring, out_dtype, swap_mul)

    tgt = jnp.where(valid, dst, n_out).astype(INDEX_DTYPE)
    add_name = semiring.add.name

    if structure_only and add_name in ("LogicalOrMonoid", "MaximumMonoid"):
        # struconly bitmap push (reference: spmspv_inner.hpp:133-134, 292-299):
        # duplicate-insensitive ones — skips the ⊕-reduce entirely. Two
        # lowerings: random scatter-max, or single-key sort + sorted
        # all-identical set-scatter (GRB_PUSH_BITMAP_SORT=1; the duplicate
        # writes are identical so sorted-set is deterministic).
        import os as _os

        if _os.environ.get("GRB_PUSH_BITMAP_SORT", "0") == "1":
            keys = jax.lax.sort(tgt, is_stable=False)
            y = (jnp.full((n_out,), ident, out_dtype)
                 .at[keys].set(jnp.ones((), out_dtype), mode="drop",
                               indices_are_sorted=True))
        else:
            y = (jnp.full((n_out,), ident, out_dtype)
                 .at[tgt].max(jnp.ones((edge_cap,), out_dtype), mode="drop"))
    elif not sort_push and add_name in ("PlusMonoid", "MinimumMonoid",
                                        "MaximumMonoid", "LogicalOrMonoid"):
        # SIMPLE load-balance mode (reference: kernels/spmspv.hpp:92-184
        # atomic push) → XLA scatter with monoid combiner.
        base = jnp.full((n_out,), ident, out_dtype)
        if add_name == "PlusMonoid":
            y = base.at[tgt].add(jnp.where(valid, mv, jnp.zeros((), out_dtype)),
                                 mode="drop")
        elif add_name == "MinimumMonoid":
            y = base.at[tgt].min(jnp.where(valid, mv, ident), mode="drop")
        elif add_name == "MaximumMonoid":
            y = base.at[tgt].max(jnp.where(valid, mv, ident), mode="drop")
        else:  # LogicalOr
            y = base.at[tgt].max(jnp.where(valid, (mv != 0).astype(out_dtype),
                                           jnp.zeros((), out_dtype)), mode="drop")
    else:
        keys, seg_val, _ = _merge_reduce(tgt, mv, semiring, edge_cap, False)
        # the scatter broadcasts the segment result to EVERY lane so the
        # write indices stay globally sorted with all duplicates identical —
        # deterministic, and eligible for XLA's sorted-scatter lowering
        y = (jnp.full((n_out,), ident, out_dtype)
             .at[keys].set(seg_val, mode="drop", indices_are_sorted=True))

    if mask_dense is not None:
        y = jnp.where(mask_pass(mask_dense, mask_scmp), y, ident)
    return y


def _merge_reduce(tgt, mv, semiring, edge_cap: int, dup_insensitive: bool):
    """Sort expanded edges by destination and ⊕-reduce each segment.

    MERGE mode (reference: spmspv_inner.hpp:219-317), monoid-specialized:
      * duplicate-insensitive ⊕ (struconly Or/Max) → single-key sort, the
        segment value is the constant 1 — no value carry at all;
      * Min/Max → sort with the VALUE as a secondary key: the segment
        head (Min) / tail (Max) IS the reduction — no segmented scan
        (the endbit-spirit narrowing of r2's full sort+Hillis-Steele
        pipeline, VERDICT r2 next-#3);
      * generic ⊕ → key sort + segmented scan.

    Returns (keys, seg_val, heads): destination-sorted keys, the segment's
    ⊕-total broadcast to every lane of its segment, and segment-head flags.
    """
    from .gather_dispatch import take

    add_name = semiring.add.name
    if dup_insensitive:
        keys = jax.lax.sort(tgt, is_stable=False)
        heads = jnp.concatenate([jnp.ones((1,), jnp.bool_),
                                 keys[1:] != keys[:-1]])
        return keys, jnp.ones((edge_cap,), mv.dtype), heads
    if add_name in ("MinimumMonoid", "MaximumMonoid"):
        keys, vals = jax.lax.sort((tgt, mv), num_keys=2, is_stable=False)
        heads = jnp.concatenate([jnp.ones((1,), jnp.bool_),
                                 keys[1:] != keys[:-1]])
        pos = jnp.arange(edge_cap, dtype=INDEX_DTYPE)
        if add_name == "MinimumMonoid":
            # min value sits at the segment head — forward-fill it
            fill_pos = jax.lax.cummax(jnp.where(heads, pos, 0))
        else:
            # max value sits at the segment tail — backward-fill it
            tails = jnp.concatenate([keys[1:] != keys[:-1],
                                     jnp.ones((1,), jnp.bool_)])
            fill_pos = jnp.flip(edge_cap - 1 - jax.lax.cummax(
                jnp.where(jnp.flip(tails), pos, 0)))
        seg_val = take(vals, fill_pos, sorted=True)
    else:
        keys, vals = jax.lax.sort((tgt, mv), num_keys=1, is_stable=False)
        heads = jnp.concatenate([jnp.ones((1,), jnp.bool_),
                                 keys[1:] != keys[:-1]])
        scanned = segmented_scan(vals, heads, semiring.add)
        # inclusive scan holds the segment total at the TAIL —
        # backward-fill it across the segment
        pos = jnp.arange(edge_cap, dtype=INDEX_DTYPE)
        tails = jnp.concatenate([keys[1:] != keys[:-1],
                                 jnp.ones((1,), jnp.bool_)])
        fill_pos = jnp.flip(edge_cap - 1 - jax.lax.cummax(
            jnp.where(jnp.flip(tails), pos, 0)))
        seg_val = take(scanned, fill_pos, sorted=True)
    return keys, seg_val, heads


def spmspv_push_sparse(
    ptr: jnp.ndarray,
    ind: jnp.ndarray,
    mat_val: Optional[jnp.ndarray],
    f_ind: jnp.ndarray,
    f_val: Optional[jnp.ndarray],
    f_nvals,
    semiring: Semiring,
    n_out: int,
    edge_cap: int,
    mask_dense: Optional[jnp.ndarray] = None,
    mask_scmp: bool = False,
    structure_only: bool = False,
    swap_mul: bool = False,
    out_dtype=None,
    with_values: bool = True,
    postprocess_sparse=None,
    build_dense: bool = True,
    out_cap: Optional[int] = None,
    stale_dense=None,
):
    """MERGE push with SPARSE output: returns (y_dense, sind, sval, nv).

    Lazy dual-frontier protocol (dispatch.mxv_dual(lazy=True)): pass
    build_dense=False, out_cap=LAZY_SPARSE_CAP and the carried stale dense
    image. The sparse image then compacts into an out_cap-sized array (no
    O(n) fills at all), and the dense image is returned STALE unless the new
    frontier overflows out_cap — only then is it materialized from the
    workspace (the caller flags which image is valid via nv <= out_cap).

    `postprocess_sparse(keys, vals) -> vals` is the sparse analog of
    mxv_dual's dense postprocess: an elementwise filter applied to each
    segment's ⊕-total BEFORE the keep decision (entries mapped to the
    identity are dropped). Must satisfy f(ident) == ident — SSSP's
    unproductive filter (sssp.hpp:76-88) does.

    The destination sort already orders the expanded edges; the new frontier
    is exactly the segment heads that survive the mask — compacted INSIDE
    the edge_cap workspace (cumsum + one small scatter) instead of the
    full-n sort the dense path pays afterwards (vector.sparse_from_dense).
    This is what makes push O(frontier-edges) per iteration on TPU — the
    high-diameter regime direction optimization exists for
    (vector.hpp:292-323); the reference gets the same effect by
    stream-compacting the mgpu ReduceByKey output
    (spmspv_inner.hpp:300-317).

    sind is (n_out,)-padded with sentinel n_out, valid entries ascending at
    the front — the exact sparse_from_dense layout DualFrontier expects.
    """
    if out_dtype is None:
        out_dtype = f_val.dtype if f_val is not None else jnp.float32
    ident = semiring.identity(out_dtype)
    dst, mv, valid, _ = expand_frontier(
        ptr, ind, mat_val, f_ind, f_val, f_nvals, edge_cap,
        structure_only, semiring, out_dtype, swap_mul)
    tgt = jnp.where(valid, dst, n_out).astype(INDEX_DTYPE)
    dup_ok = structure_only and semiring.add.name in ("LogicalOrMonoid",
                                                      "MaximumMonoid")
    keys, seg_val, heads = _merge_reduce(tgt, mv, semiring, edge_cap, dup_ok)
    if postprocess_sparse is not None:
        seg_val = postprocess_sparse(jnp.minimum(keys, n_out - 1), seg_val)

    keep = heads & (keys < n_out) & (seg_val != ident)
    if mask_dense is not None:
        from .gather_dispatch import take

        mk = take(mask_dense, jnp.minimum(keys, n_out - 1), sorted=True)
        keep = keep & mask_pass(mk, mask_scmp)
    nv = jnp.sum(keep).astype(INDEX_DTYPE)
    # compact surviving heads to the front of an out_cap-sized pad array
    # (default n_out; the lazy protocol passes LAZY_SPARSE_CAP so the
    # compaction does no O(n) fill); dropped lanes (pad segments, masked
    # heads, non-head lanes, positions past out_cap) route to the sentinel
    # slot. One write per SEGMENT, not per lane. An overflowing compaction
    # (nv > out_cap) is silently truncated — the lazy caller marks the
    # sparse image invalid in exactly that case.
    cap_out = n_out if out_cap is None else min(out_cap, n_out)
    pos = jnp.cumsum(keep.astype(INDEX_DTYPE)) - 1
    spos = jnp.where(keep, pos, cap_out)
    sind = (jnp.full((cap_out,), n_out, INDEX_DTYPE)
            .at[spos].set(keys, mode="drop"))
    sval = ((jnp.full((cap_out,), ident, out_dtype)
             .at[spos].set(seg_val, mode="drop")) if with_values else None)
    if build_dense:
        wk = jnp.where(keep, keys, n_out)
        y = (jnp.full((n_out,), ident, out_dtype)
             .at[wk].set(seg_val, mode="drop"))
    elif stale_dense is not None:
        # lazy: materialize dense ONLY on overflow (the exact workspace
        # scatter the eager path does), else carry the stale image
        def _mat(_):
            wk = jnp.where(keep, keys, n_out)
            return (jnp.full((n_out,), ident, out_dtype)
                    .at[wk].set(seg_val, mode="drop"))
        y = jax.lax.cond(nv <= cap_out,
                         lambda _: stale_dense.astype(out_dtype), _mat, None)
    else:
        y = None
    return y, sind, sval, nv
