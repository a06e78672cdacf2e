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
