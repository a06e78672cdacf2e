"""DenseMatrix container: first-class dense (nrows, ncols) operand.

Reference surface: backend::DenseMatrix (backend/cuda/dense_matrix.hpp:17-80
— nnew/dup/clear/build/setElement/extractTuples/fill/fillAscending) behind
the Matrix tagged union (matrix.hpp:13-251). The reference uses it almost
exclusively as the RHS/output of its (stubbed) gemm/spmm; here it is a real
operand: `operations.mxm_dense` accepts it as B, and `gemm`/`gemv` below run
dense×dense / dense×vector contractions on the MXU — ops the reference
declares but never implements (gemm.hpp:16-29, gemv.hpp:14-26).

TPU-first design: one jnp leaf at the LOGICAL shape (XLA tiles/pads
internally; manual (8,128) padding would only complicate masking), frozen
pytree so it flows through jit/scan/shard_map like every other container.
Mutating ops (set_element, fill, clear) return new values — functional
updates, same convention as Vector/Matrix.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .semiring import BinaryOp, Semiring


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DenseMatrix:
    """Dense matrix: leaf `data` (nrows, ncols); static logical dims.

    nvals == nrows·ncols by definition (reference: dense_matrix.hpp:23
    `nvals_(nrows*ncols)`) — a dense container has no notion of stored-vs-
    implicit entries.
    """

    nrows: int
    ncols: int
    data: jnp.ndarray

    def tree_flatten(self):
        return ((self.data,), (self.nrows, self.ncols))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(aux[0], aux[1], leaves[0])

    # --- constructors (reference: nnew / build overloads) -----------------

    @staticmethod
    def zeros(nrows: int, ncols: int, dtype=jnp.float32) -> "DenseMatrix":
        return DenseMatrix(nrows, ncols, jnp.zeros((nrows, ncols), dtype))

    @staticmethod
    def from_dense(arr) -> "DenseMatrix":
        a = jnp.asarray(arr)
        if a.ndim != 2:
            raise ValueError(f"DenseMatrix.from_dense: need 2D, got {a.shape}")
        return DenseMatrix(int(a.shape[0]), int(a.shape[1]), a)

    @staticmethod
    def build(values, nrows: int, ncols: int) -> "DenseMatrix":
        """Row-major flat build (reference: build(values, nvals),
        dense_matrix.hpp:40-41)."""
        a = jnp.asarray(values).reshape(nrows, ncols)
        return DenseMatrix(nrows, ncols, a)

    @staticmethod
    def from_coo(rows, cols, vals, nrows: int, ncols: int,
                 dup: Optional[BinaryOp] = None,
                 dtype=jnp.float32) -> "DenseMatrix":
        """COO build with duplicate combination (reference: the templated
        build(row_indices, col_indices, values, nvals, dup)). Unspecified
        slots are 0. dup=None keeps the LAST duplicate, applied on the host
        (numpy assignment order — a jnp .set with colliding indices is
        unspecified on accelerator backends; build is a host-side
        constructor anyway)."""
        rows = np.asarray(rows, np.int64)
        cols = np.asarray(cols, np.int64)
        vals = np.asarray(vals, dtype)
        a = jnp.zeros((nrows, ncols), dtype)
        if dup is None:
            host = np.zeros((nrows, ncols), dtype)
            host[rows, cols] = vals
            a = jnp.asarray(host)
        elif dup.name == "plus":
            a = a.at[rows, cols].add(vals)
        else:
            # host combine (build is a host-side constructor anyway)
            acc = {}
            for r, c, v in zip(rows, cols, vals):
                k = (int(r), int(c))
                acc[k] = dup(acc[k], v) if k in acc else v
            if acc:
                rr, cc = zip(*acc.keys())
                a = a.at[np.array(rr), np.array(cc)].set(
                    np.array(list(acc.values()), dtype))
        return DenseMatrix(nrows, ncols, a)

    # --- C-API surface (dense_matrix.hpp:29-61) ---------------------------

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.nrows, self.ncols)

    @property
    def nvals(self) -> int:
        return self.nrows * self.ncols

    @property
    def dtype(self):
        return self.data.dtype

    def dup(self) -> "DenseMatrix":
        return DenseMatrix(self.nrows, self.ncols, self.data)

    def clear(self) -> "DenseMatrix":
        return DenseMatrix(self.nrows, self.ncols,
                           jnp.zeros_like(self.data))

    def set_element(self, val, i: int, j: int) -> "DenseMatrix":
        return DenseMatrix(self.nrows, self.ncols,
                           self.data.at[i, j].set(val))

    def extract_element(self, i: int, j: int):
        return self.data[i, j]

    def extract_tuples(self):
        """(row_ids, col_ids, values) of ALL slots, row-major (reference:
        extractTuples, dense_matrix.hpp:45-49)."""
        r = np.repeat(np.arange(self.nrows, dtype=np.int64), self.ncols)
        c = np.tile(np.arange(self.ncols, dtype=np.int64), self.nrows)
        return r, c, np.asarray(self.data).reshape(-1)

    def fill(self, value) -> "DenseMatrix":
        return DenseMatrix(self.nrows, self.ncols,
                           jnp.full((self.nrows, self.ncols), value,
                                    self.data.dtype))

    def fill_ascending(self, start=0) -> "DenseMatrix":
        """Row-major ascending fill (reference: fillAscending,
        dense_matrix.hpp:60-61)."""
        a = (jnp.arange(self.nvals, dtype=self.data.dtype)
             + jnp.asarray(start, self.data.dtype))
        return DenseMatrix(self.nrows, self.ncols,
                           a.reshape(self.nrows, self.ncols))

    def resize(self, nrows: int, ncols: int) -> "DenseMatrix":
        """Grow/shrink keeping the overlapping block (reference: resize)."""
        out = jnp.zeros((nrows, ncols), self.data.dtype)
        r, c = min(nrows, self.nrows), min(ncols, self.ncols)
        out = out.at[:r, :c].set(self.data[:r, :c])
        return DenseMatrix(nrows, ncols, out)

    def transpose(self) -> "DenseMatrix":
        return DenseMatrix(self.ncols, self.nrows, self.data.T)

    @property
    def T(self) -> "DenseMatrix":
        return self.transpose()

    def to_dense(self) -> np.ndarray:
        return np.asarray(self.data)

    def check(self) -> None:
        """Invariant validator (Matrix.check/Vector.check analog)."""
        if self.data.shape != (self.nrows, self.ncols):
            raise ValueError(
                f"DenseMatrix.check: data {self.data.shape} != logical "
                f"({self.nrows}, {self.ncols})")


# ---------------------------------------------------------------------------
# Dense contractions (reference: gemm.hpp / gemv.hpp — declared, unimplemented)
# ---------------------------------------------------------------------------


def _plus_times(semiring: Semiring) -> bool:
    return (semiring.add.name == "PlusMonoid"
            and semiring.mul.name == "multiplies")


def gemm(A: DenseMatrix, B: DenseMatrix, semiring: Semiring,
         out_dtype=None) -> DenseMatrix:
    """C = A ⊕.⊗ B, dense×dense.

    PlusTimes rides the MXU directly (one jnp.matmul — XLA tiles it); any
    other semiring contracts via a lax.scan over k with broadcast ⊗ and
    monoid ⊕ (K sequential (M,N) passes — completeness path, not a hot op).
    """
    if A.ncols != B.nrows:
        from . import dimension as dim

        raise dim.DimensionException(
            f"gemm: inner dim mismatch — A {A.shape} × B {B.shape}")
    out_dtype = out_dtype or jnp.promote_types(A.dtype, B.dtype)
    Ad = A.data.astype(out_dtype)
    Bd = B.data.astype(out_dtype)
    if _plus_times(semiring):
        C = jnp.matmul(Ad, Bd, precision=jax.lax.Precision.HIGHEST)
    else:
        ident = semiring.identity(out_dtype)
        init = jnp.full((A.nrows, B.ncols), ident, out_dtype)

        def step(acc, ab):
            a_col, b_row = ab              # (M,), (N,)
            p = semiring.mul(a_col[:, None], b_row[None, :])
            return semiring.add(acc, p), None

        C, _ = jax.lax.scan(step, init, (Ad.T, Bd))
    return DenseMatrix(A.nrows, B.ncols, C)


def gemv(A: DenseMatrix, x, semiring: Semiring, out_dtype=None) -> jnp.ndarray:
    """y = A ⊕.⊗ x, dense matrix × dense vector (reference: gemv.hpp stub)."""
    x = jnp.asarray(x)
    if A.ncols != x.shape[0]:
        from . import dimension as dim

        raise dim.DimensionException(
            f"gemv: dim mismatch — A {A.shape} × x {x.shape}")
    out_dtype = out_dtype or jnp.promote_types(A.dtype, x.dtype)
    Ad = A.data.astype(out_dtype)
    xd = x.astype(out_dtype)
    if _plus_times(semiring):
        return jnp.matmul(Ad, xd, precision=jax.lax.Precision.HIGHEST)
    p = semiring.mul(Ad, xd[None, :])      # (M, K) broadcast ⊗
    ident = semiring.identity(out_dtype)
    return jax.lax.reduce(p, ident, lambda a, b: semiring.add(a, b), (1,))
