"""Ring-pipelined distributed pull: ppermute stages overlapping ICI with compute.

The all_gather pull (ops.dist_mxv_pull) materializes the whole (n_pad,)
vector on every device before any compute starts. The ring formulation
(the scaling-book / ring-attention schedule transplanted to SpMV,
SURVEY.md §5 long-context note) instead keeps one 1/P segment in flight:

    stage k (of P):  partial ⊕= A_block[:, seg(my−k)] ⊗ x_seg      (local)
                     x_seg  →  ppermute to right neighbor          (ICI)

XLA schedules the ppermute of stage k concurrently with stage k's block
multiply (the send does not depend on the partial), so per-stage wall time is
max(compute, transfer) instead of their sum, and peak vector memory is
O(n/P) instead of O(n).

Storage: each device's CSR row block is pre-split by column segment at
partition time — edge arrays (P_stages, cap) with segment-LOCAL column ids.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..matrix import Matrix
from ..types import INDEX_DTYPE, round_up
from ..io import mmio

P_ = jax.sharding.PartitionSpec
AXIS = "x"


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class RingShardedMatrix:
    """Row blocks split by column segment for ring-staged pulls.

    Leaves (leading axis = P devices, sharded P_("x", None, None)):
      ptr (P, P, rows_per+1)  CSR ptrs of (row block, col segment)
      ind (P, P, cap)         segment-LOCAL column ids (pad: rows_per)
      val (P, P, cap)
    Static: n, n_pad, P, rows_per, nvals.
    """

    n: int
    n_pad: int
    P: int
    rows_per: int
    nvals: int
    ptr: jnp.ndarray
    ind: jnp.ndarray
    val: jnp.ndarray

    def tree_flatten(self):
        return ((self.ptr, self.ind, self.val),
                (self.n, self.n_pad, self.P, self.rows_per, self.nvals))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*aux, *leaves)


def partition_ring(A: Matrix, mesh: jax.sharding.Mesh, axis: str = AXIS,
                   pad_edges_to: int = 256) -> RingShardedMatrix:
    P = mesh.shape[axis]
    n = A.nrows
    assert A.nrows == A.ncols
    rows_per = round_up(n, P * 8) // P
    n_pad = rows_per * P

    r, c, v = A.extract_tuples()
    blocks = [[None] * P for _ in range(P)]
    cap = 1
    for i in range(P):
        for j in range(P):
            sel = ((r >= i * rows_per) & (r < (i + 1) * rows_per)
                   & (c >= j * rows_per) & (c < (j + 1) * rows_per))
            ptr, ci, vv = mmio.coo_to_csr(r[sel] - i * rows_per,
                                          c[sel] - j * rows_per,
                                          v[sel], rows_per)
            blocks[i][j] = (ptr, ci, vv)
            cap = max(cap, len(ci))
    cap = max(round_up(cap, pad_edges_to), pad_edges_to)

    ptrs = np.zeros((P, P, rows_per + 1), np.int32)
    inds = np.full((P, P, cap), rows_per, np.int32)
    vals = np.zeros((P, P, cap), np.dtype(A.dtype))
    for i in range(P):
        for j in range(P):
            ptr, ci, vv = blocks[i][j]
            ptrs[i, j] = ptr
            inds[i, j, : len(ci)] = ci
            vals[i, j, : len(vv)] = vv

    sh = jax.sharding.NamedSharding(mesh, P_(axis, None, None))
    put = lambda x: jax.device_put(jnp.asarray(x), sh)
    return RingShardedMatrix(n=n, n_pad=n_pad, P=P, rows_per=rows_per,
                             nvals=A.nvals, ptr=put(ptrs), ind=put(inds),
                             val=put(vals))


def ring_mxv_pull(Ash: RingShardedMatrix, x_block, semiring,
                  structure_only=False, axis: str = AXIS):
    """Runs INSIDE shard_map: y_block = (A ⊗ x)|my rows via P ring stages."""
    from ..ops.spmv import spmv_pull

    P = Ash.P
    rows_per = Ash.rows_per
    my = jax.lax.axis_index(axis)
    ident = semiring.identity(x_block.dtype)
    perm = [(i, (i + 1) % P) for i in range(P)]

    def stage(k, carry):
        acc, xseg = carry
        owner = jax.lax.rem(my - k + P, P)
        ptr = jax.lax.dynamic_index_in_dim(Ash.ptr[0], owner, keepdims=False)
        ind = jax.lax.dynamic_index_in_dim(Ash.ind[0], owner, keepdims=False)
        val = jax.lax.dynamic_index_in_dim(Ash.val[0], owner, keepdims=False)
        part = spmv_pull(ptr, ind, val, xseg, semiring, rows_per,
                         structure_only=structure_only)
        acc = semiring.add(acc, part)
        xseg = jax.lax.ppermute(xseg, axis, perm)
        return acc, xseg

    acc0 = jnp.full((rows_per,), ident, x_block.dtype)
    acc, _ = jax.lax.fori_loop(0, P, stage, (acc0, x_block))
    return acc


def mxv_ring(A: Matrix, mesh: jax.sharding.Mesh, x: np.ndarray, semiring,
             Ash: Optional[RingShardedMatrix] = None,
             axis: str = AXIS) -> np.ndarray:
    """Host entry: y = A ⊕.⊗ x with the ring-staged pull."""
    if Ash is None:
        Ash = partition_ring(A, mesh, axis=axis)
    xp = np.zeros((Ash.n_pad,), np.dtype(x.dtype))
    xp[: len(x)] = x
    shx = jax.sharding.NamedSharding(mesh, P_(axis))
    xd = jax.device_put(jnp.asarray(xp), shx)
    fn = jax.jit(jax.shard_map(
        functools.partial(ring_mxv_pull, semiring=semiring),
        mesh=mesh, in_specs=(P_(axis, None, None), P_(axis)),
        out_specs=P_(axis), check_vma=False))
    y = fn(Ash, xd)
    return np.asarray(y)[: Ash.n]
