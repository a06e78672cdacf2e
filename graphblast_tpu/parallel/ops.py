"""Distributed matvec primitives — run INSIDE shard_map over Mesh axis 'x'.

The communication design (BASELINE.json north star; reference has no
distributed layer):

  pull  (dense frontier): all_gather the sharded vector over ICI, multiply
        the local column/row block — one collective, MXU/VPU-local compute.
  push  (sparse frontier): expand the LOCAL frontier block through the local
        row block (global destinations), then route partials to their owners:
        Plus monoid → psum_scatter (reduce_scatter rides ICI);
        generic ⊕   → all_to_all of P owner-blocks + local ⊕-tree.
  convergence scalars: psum.

Every function here takes LOCAL (per-shard) arrays; callers wrap with
jax.shard_map(..., mesh, in_specs=..., out_specs=...).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..semiring import Semiring
from ..types import INDEX_DTYPE
from ..ops.spmv import spmv_pull, mask_pass
from ..ops.spmspv import spmspv_push
from ..vector import sparse_from_dense


AXIS = "x"


def dist_vxm_pull(csc_ptr, csc_ind, csc_val, x_block, semiring: Semiring,
                  rows_per: int, mask_block=None, mask_scmp=False,
                  structure_only=False, axis: str = AXIS):
    """w_block = (u ⊗ A)|block : all_gather u, reduce local column block.

    csc_* is this device's COLUMN block (local cols, GLOBAL row ids)."""
    x_full = jax.lax.all_gather(x_block, axis, tiled=True)  # (n_pad,)
    return spmv_pull(csc_ptr, csc_ind, csc_val, x_full, semiring, rows_per,
                     mask_block, mask_scmp, structure_only)


def dist_mxv_pull(csr_ptr, csr_ind, csr_val, x_block, semiring: Semiring,
                  rows_per: int, mask_block=None, mask_scmp=False,
                  structure_only=False, axis: str = AXIS):
    """w_block = (A ⊗ u)|block over this device's ROW block."""
    x_full = jax.lax.all_gather(x_block, axis, tiled=True)
    return spmv_pull(csr_ptr, csr_ind, csr_val, x_full, semiring, rows_per,
                     mask_block, mask_scmp, structure_only)


def dist_value_pull_dma(value_plan, x_block, axis: str = AXIS):
    """Plus·× value pull over this device's column block via the
    windowed-DMA bilinear kernel (PR's local op — 3× the sorted pipeline
    at rmat18, r2 measurement; no VMEM residency limit). value_plan is
    the device's slice of ShardedMatrix.value_pull_plan."""
    from ..ops.pallas.bilinear import spmv_bilinear_dma

    x_full = jax.lax.all_gather(x_block, axis, tiled=True)
    return spmv_bilinear_dma(value_plan.local(), x_full)


def dist_or_pull_bitmap(pull_plan, x_block, mask_block=None,
                        mask_scmp=False, axis: str = AXIS):
    """Struconly or-pull over this device's column block via the Pallas
    bitmap kernel (~10-25× the XLA or-pull locally, r2 single-chip
    measurements): all_gather the frontier block, pack to a bitmap, count
    frontier in-neighbors per local row on the MXU, threshold. pull_plan
    is the device's slice of ShardedMatrix.pull_plan (StackedBitmapPlan —
    call inside shard_map)."""
    from ..ops.pallas.bilinear import spmv_bilinear_bitmap
    from ..ops.pallas.orpull import pack_bitmap

    x_full = jax.lax.all_gather(x_block, axis, tiled=True)
    cnt = spmv_bilinear_bitmap(pull_plan.local(), pack_bitmap(x_full))
    y = (cnt > 0).astype(x_block.dtype)
    if mask_block is not None:
        y = jnp.where(mask_pass(mask_block, mask_scmp), y,
                      jnp.zeros((), y.dtype))
    return y


def _combine_partials(partial, semiring: Semiring, P: int, rows_per: int,
                      axis: str):
    """Route a full-length (n_pad,) ⊕-partial to block owners and combine.

    Plus → psum_scatter (a reduce_scatter over ICI); generic monoid →
    all_to_all exchange of the P owner blocks + ⊕-reduce of the P incoming
    partials (log-tree on the VPU)."""
    if semiring.add.name == "PlusMonoid":
        return jax.lax.psum_scatter(partial, axis, scatter_dimension=0,
                                    tiled=True)
    blocks = partial.reshape(P, rows_per)
    incoming = jax.lax.all_to_all(blocks, axis, split_axis=0, concat_axis=0,
                                  tiled=False)
    # incoming: (P, rows_per) — partial for MY block from every device
    ident = semiring.identity(partial.dtype)
    return jax.lax.reduce(incoming, ident,
                          lambda a, b: semiring.add(a, b), (0,))


def dist_vxm_push(csr_ptr, csr_ind, csr_val, f_ind_local, f_val_local,
                  f_nvals_local, semiring: Semiring, P: int, rows_per: int,
                  edge_cap: int, mask_block=None, mask_scmp=False,
                  structure_only=False, axis: str = AXIS):
    """Push w = u ⊗ A from this device's LOCAL frontier block.

    f_ind_local are LOCAL row ids (0..rows_per); csr_* is the local row block
    with GLOBAL column ids. The expanded products scatter into an (n_pad,)
    partial which is then owner-routed (the distributed analog of the
    reference's sort+ReduceByKey, spmspv_inner.hpp:219-317 — the "sort" is
    the all_to_all)."""
    n_pad = P * rows_per
    partial = spmspv_push(csr_ptr, csr_ind, csr_val, f_ind_local, f_val_local,
                          f_nvals_local, semiring, n_pad, edge_cap,
                          structure_only=structure_only)
    w_block = _combine_partials(partial, semiring, P, rows_per, axis)
    if mask_block is not None:
        ident = semiring.identity(w_block.dtype)
        w_block = jnp.where(mask_pass(mask_block, mask_scmp), w_block, ident)
    return w_block


def owner_buckets(csr_ptr, csr_ind, csr_val, f_ind_local, f_val_local,
                  f_nvals_local, semiring: Semiring, P: int, rows_per: int,
                  edge_cap: int, structure_only: bool, out_dtype):
    """Expand the local frontier and group the (dst, value) pairs by owner
    device: returns (owner_sorted, dst_local_sorted, val_sorted,
    (bounds, counts)) where counts[k] is the LIVE pair count destined for
    device k — the quantity the communication accounting predicts
    (parallel/accounting.py sparse_push_live_pairs; tested in test_dist)."""
    from ..ops.spmspv import expand_frontier

    dst, mv, valid, _ = expand_frontier(
        csr_ptr, csr_ind, csr_val, f_ind_local, f_val_local, f_nvals_local,
        edge_cap, structure_only, semiring, out_dtype)
    owner = jnp.where(valid, dst // rows_per, P).astype(INDEX_DTYPE)
    dst_local = (dst - owner * rows_per).astype(INDEX_DTYPE)
    ow_s, dl_s, mv_s = jax.lax.sort((owner, dst_local, mv), num_keys=1,
                                    is_stable=False)
    # per-owner group boundaries on the sorted owners (P+1 tiny queries)
    bounds = jnp.searchsorted(ow_s, jnp.arange(P + 1, dtype=INDEX_DTYPE))
    counts = bounds[1:] - bounds[:-1]
    return ow_s, dl_s, mv_s, (bounds, counts)


def dist_vxm_push_sparse(csr_ptr, csr_ind, csr_val, f_ind_local, f_val_local,
                         f_nvals_local, semiring: Semiring, P: int,
                         rows_per: int, edge_cap: int, pair_cap: int,
                         mask_block=None, mask_scmp=False,
                         structure_only=False, axis: str = AXIS):
    """Push with SPARSE owner-bucketed exchange (SURVEY.md §2.8 blueprint;
    replaces the dense (n_pad,) partial of dist_vxm_push whose ICI volume is
    O(n) regardless of frontier size — VERDICT r1 missing-#3).

    Pipeline (all inside shard_map):
      1. expand the local frontier through the local CSR block → (global
         dst, ⊗-product) pairs;
      2. one unstable sort by owner block groups each destination device's
         pairs contiguously — the TPU analog of bucket scatter;
      3. slice P fixed-capacity (pair_cap) blocks and all_to_all them —
         exchange volume is P·pair_cap·8B, independent of n;
      4. sort+segment-⊕ the received pairs into the local block
         (deterministic, same machinery as the single-chip push).

    If any owner's bucket overflows pair_cap the result falls back to the
    dense-partial exchange via lax.cond (both paths compile; one executes —
    the memusage-style bound-with-fallback idiom, spmspv_inner.hpp:51-59).
    """
    from ..ops.segops import segmented_scan

    out_dtype = (f_val_local.dtype if f_val_local is not None
                 else jnp.float32)
    ident = semiring.identity(out_dtype)
    ow_s, dl_s, mv_s, bounds_counts = owner_buckets(
        csr_ptr, csr_ind, csr_val, f_ind_local, f_val_local, f_nvals_local,
        semiring, P, rows_per, edge_cap, structure_only, out_dtype)
    bounds, counts = bounds_counts
    # Sentinel-pad by pair_cap so dynamic_slice(s, pair_cap) never clamps:
    # a bucket starting within pair_cap of the buffer end would otherwise
    # shift the window left and route earlier buckets' pairs to the wrong
    # device (silent wrong results; ADVICE r2 high).
    dl_s = jnp.concatenate([dl_s, jnp.full((pair_cap,), rows_per,
                                           dl_s.dtype)])
    mv_s = jnp.concatenate([mv_s, jnp.full((pair_cap,), ident, mv_s.dtype)])
    overflow = jnp.any(counts > pair_cap)

    def sparse_path(_):
        def slice_k(k):
            s = bounds[k]
            idx_k = jax.lax.dynamic_slice(dl_s, (s,), (pair_cap,))
            val_k = jax.lax.dynamic_slice(mv_s, (s,), (pair_cap,))
            live = jnp.arange(pair_cap, dtype=INDEX_DTYPE) < counts[k]
            return (jnp.where(live, idx_k, rows_per),
                    jnp.where(live, val_k, ident))

        idx_out, val_out = jax.lax.map(slice_k,
                                       jnp.arange(P, dtype=INDEX_DTYPE))
        idx_in = jax.lax.all_to_all(idx_out, axis, 0, 0, tiled=False)
        val_in = jax.lax.all_to_all(val_out, axis, 0, 0, tiled=False)
        # combine the ≤ P·pair_cap received pairs deterministically
        tgt = jnp.where(idx_in.reshape(-1) < rows_per,
                        idx_in.reshape(-1), rows_per)
        k2, v2 = jax.lax.sort((tgt, val_in.reshape(-1)), num_keys=1,
                              is_stable=False)
        heads = jnp.concatenate([jnp.ones((1,), jnp.bool_),
                                 k2[1:] != k2[:-1]])
        scanned = segmented_scan(v2, heads, semiring.add)
        tails = jnp.concatenate([k2[1:] != k2[:-1],
                                 jnp.ones((1,), jnp.bool_)])
        w = (jnp.full((rows_per,), ident, out_dtype)
             .at[jnp.where(tails, k2, rows_per)].set(scanned, mode="drop"))
        return w

    def dense_path(_):
        n_pad = P * rows_per
        y = spmspv_push(csr_ptr, csr_ind, csr_val, f_ind_local, f_val_local,
                        f_nvals_local, semiring, n_pad, edge_cap,
                        structure_only=structure_only)
        return _combine_partials(y, semiring, P, rows_per, axis)

    # NOTE: collectives must execute on every device — overflow is a global
    # predicate (pmax) so all devices take the same branch
    overflow = jax.lax.pmax(overflow.astype(jnp.int32), axis) > 0
    w_block = jax.lax.cond(overflow, dense_path, sparse_path, None)
    if mask_block is not None:
        w_block = jnp.where(mask_pass(mask_block, mask_scmp), w_block, ident)
    return w_block


def dist_reduce(x_block, monoid, axis: str = AXIS):
    """vector → scalar across shards: local reduce + collective."""
    from ..ops.segops import reduce_all

    local = reduce_all(x_block, monoid)
    if monoid.name == "PlusMonoid":
        return jax.lax.psum(local, axis)
    if monoid.name == "MinimumMonoid":
        return jax.lax.pmin(local, axis)
    if monoid.name == "MaximumMonoid":
        return jax.lax.pmax(local, axis)
    # generic: gather all locals and fold
    alls = jax.lax.all_gather(local, axis)
    return jax.lax.reduce(alls, monoid.identity(x_block.dtype),
                          lambda a, b: monoid(a, b), (0,))


def local_frontier(x_block, identity):
    """Compact the local dense block into (local ids, values, count)."""
    return sparse_from_dense(x_block, identity)
