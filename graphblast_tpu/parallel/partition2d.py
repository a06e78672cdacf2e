"""2D edge partitioning over a (rows × cols) device mesh.

SURVEY.md §7 hard part (d): 1D row partitioning concentrates push-side
exchange volume on power-law hubs; a 2D block partition bounds every
device's communication to one mesh row + one mesh column (the SUMMA/
CombBLAS layout, re-expressed with JAX collectives):

  device (i, j) owns block A[i·rb:(i+1)·rb, j·cb:(j+1)·cb] as local CSR.
  pull y = A ⊕.⊗ x:
      x_j     = all_gather(x block) along mesh axis "y" (column segment)
      partial = local block SpMV (rows rb)
      y_i     = ⊕-psum(partial) along mesh axis "x"... (axes named so that
                "col" groups devices sharing a column block)

Vectors are sharded along the mesh's flattened (row-major) order so the same
1D (n_pad,) array serves both 1D and 2D layouts.
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


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Sharded2D:
    """2D block-partitioned square matrix.

    Leaves (leading axes = (R, C), sharded over mesh axes ("r", "c")):
      ptr (R, C, rows_blk+1) local CSR row pointers of block (i, j)
      ind (R, C, cap)        block-LOCAL column ids (pad: cols_blk sentinel)
      val (R, C, cap)
    Static: n, n_pad, R, C, rows_blk, cols_blk, nvals.
    """

    n: int
    n_pad: int
    R: int
    C: int
    rows_blk: int
    cols_blk: int
    nvals: int
    ptr: jnp.ndarray
    ind: jnp.ndarray
    val: jnp.ndarray

    def tree_flatten(self):
        return ((self.ptr, self.ind, self.val),
                (self.n, self.n_pad, self.R, self.C, self.rows_blk,
                 self.cols_blk, self.nvals))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*aux, *leaves)


def partition_2d(A: Matrix, mesh: jax.sharding.Mesh,
                 axes=("r", "c"), pad_edges_to: int = 1024) -> Sharded2D:
    """Host-side 2D block partition of A onto an (R, C) mesh."""
    R, C = mesh.shape[axes[0]], mesh.shape[axes[1]]
    n = A.nrows
    assert A.nrows == A.ncols, "2D partition assumes square adjacency"
    rows_blk = round_up(n, R * C * 8) // R
    cols_blk = round_up(n, R * C * 8) // C
    n_pad = rows_blk * R
    assert cols_blk * C == n_pad

    r, c, v = A.extract_tuples()
    blocks = []
    cap = 0
    for i in range(R):
        row_blocks = []
        for j in range(C):
            sel = ((r >= i * rows_blk) & (r < (i + 1) * rows_blk)
                   & (c >= j * cols_blk) & (c < (j + 1) * cols_blk))
            br = r[sel] - i * rows_blk
            bc = c[sel] - j * cols_blk
            bv = v[sel]
            ptr, ci, vv = mmio.coo_to_csr(br, bc, bv, rows_blk)
            row_blocks.append((ptr, ci, vv))
            cap = max(cap, len(ci))
        blocks.append(row_blocks)
    cap = max(round_up(max(cap, 1), pad_edges_to), pad_edges_to)

    ptrs = np.zeros((R, C, rows_blk + 1), np.int32)
    inds = np.full((R, C, cap), cols_blk, np.int32)   # sentinel: one past block
    vals = np.zeros((R, C, cap), np.dtype(A.dtype))
    for i in range(R):
        for j in range(C):
            ptr, ci, vv = blocks[i][j]
            ptrs[i, j] = ptr
            inds[i, j, : len(ci)] = ci
            vals[i, j, : len(vv)] = vv

    sh = jax.sharding.NamedSharding(mesh, P_(axes[0], axes[1], None))
    put = lambda x: jax.device_put(jnp.asarray(x), sh)
    return Sharded2D(n=n, n_pad=n_pad, R=R, C=C, rows_blk=rows_blk,
                     cols_blk=cols_blk, nvals=A.nvals,
                     ptr=put(ptrs), ind=put(inds), val=put(vals))


def _pull_block(Ash: Sharded2D, x_seg, semiring, structure_only=False):
    """Runs INSIDE shard_map on mesh axes ("r","c"). x_seg is this device's
    1/(R·C) segment of the flattened (n_pad,) vector.

    Steps: assemble x via a two-stage all_gather ("c" then "r" — the "c"
    stage rides one mesh row, the "r" stage one mesh column), slice my
    COLUMN block's segment, local block SpMV, ⊕-combine partials along "c",
    return my 1/(R·C) slice of the row-block result."""
    from ..ops.spmv import spmv_pull

    rb, cb = Ash.rows_blk, Ash.cols_blk
    x_full = jax.lax.all_gather(
        jax.lax.all_gather(x_seg, "c", tiled=True), "r", tiled=True)
    j = jax.lax.axis_index("c")
    x_col = jax.lax.dynamic_slice(x_full, (j * cb,), (cb,))   # my column seg
    part = spmv_pull(Ash.ptr[0, 0], Ash.ind[0, 0], Ash.val[0, 0], x_col,
                     semiring, rb, structure_only=structure_only)
    # ⊕-combine partials across the C devices of my mesh row
    add = semiring.add.name
    if add == "PlusMonoid":
        y = jax.lax.psum(part, "c")
    elif add == "MinimumMonoid":
        y = jax.lax.pmin(part, "c")
    elif add in ("MaximumMonoid", "LogicalOrMonoid"):
        y = jax.lax.pmax(part, "c")
    else:  # generic: all_gather + fold (rare semirings)
        parts = jax.lax.all_gather(part, "c")                  # (C, rb)
        y = jax.lax.reduce(parts, semiring.identity(part.dtype),
                           lambda a, b: semiring.add(a, b), (0,))
    # y (rb,) is replicated across my mesh row; emit my distinct slice
    seg = rb // jax.lax.axis_size("c")
    return jax.lax.dynamic_slice(y, (j * seg,), (seg,))


def mxv_2d(Ash: Sharded2D, mesh: jax.sharding.Mesh, x: np.ndarray,
           semiring, axes=("r", "c")) -> np.ndarray:
    """y = A ⊕.⊗ x over the 2D mesh (host entry point; x is (n,) host)."""
    xp = np.zeros((Ash.n_pad,), np.dtype(x.dtype))
    xp[: len(x)] = x
    shx = jax.sharding.NamedSharding(mesh, P_((axes[0], axes[1])))
    xd = jax.device_put(jnp.asarray(xp), shx)

    fn = jax.jit(jax.shard_map(
        functools.partial(_pull_block, semiring=semiring),
        mesh=mesh,
        in_specs=(P_(axes[0], axes[1], None), P_((axes[0], axes[1]))),
        out_specs=P_((axes[0], axes[1])), check_vma=False))
    y = fn(Ash, xd)
    return np.asarray(y)[: Ash.n]
