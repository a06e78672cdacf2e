"""Matrix container: immutable dual CSR+CSC pytree.

TPU-native re-design of the reference matrix stack:
  * frontend shell  Matrix<T>            (reference: graphblas/matrix.hpp:13-251)
  * backend::SparseMatrix dual CSR+CSC   (backend/cuda/sparse_matrix.hpp:120-163)
  * backend::DenseMatrix                 (backend/cuda/dense_matrix.hpp)

Design shifts for TPU/XLA:
  * Static shapes: nnz is rounded up to a TILE multiple; padding edges carry a
    sentinel row id (= nrows) and are masked out with a statically-known edge
    count, so XLA compiles one program per (n, nnz_pad) shape, not per graph.
  * An *expanded* COO row-id array rides alongside CSR (and col-id alongside
    CSC): SpMV becomes gather + segmented reduce with zero runtime expansion —
    the moral equivalent of mgpu merge-path decomposition precomputed once at
    build time (reference: spmspv_inner.hpp:62-320 does this per call).
  * Symmetric structure aliasing: when the graph is structurally symmetric the
    CSC arrays alias CSR (reference: sparse_matrix.hpp:140-163 frees the CSC
    copy) — jnp arrays are immutable so aliasing is free and safe.
  * Matrices are registered pytrees: they flow through jit/shard_map/scan.
"""
from __future__ import annotations

import dataclasses
from functools import cached_property
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .types import INDEX_DTYPE, TILE, SparseFormat, Storage, round_up
from .io import mmio


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Matrix:
    """Sparse matrix in dual CSR+CSC with static padded nnz.

    Leaves (traced):
      row_ptr:  (nrows+1,) int32   CSR row pointers
      col_ind:  (nnz_pad,) int32   CSR column indices   (pad: 0)
      row_ind:  (nnz_pad,) int32   expanded COO row ids (pad: nrows sentinel)
      val:      (nnz_pad,) T       CSR values           (pad: 0)
      col_ptr / csc_row_ind / csc_col_ind / csc_val: CSC mirror (may alias CSR
        arrays when structurally symmetric)
    Static (aux):
      nrows, ncols, nvals (true nnz), dtype, format, symmetric
    """

    nrows: int
    ncols: int
    nvals: int
    row_ptr: jnp.ndarray
    col_ind: jnp.ndarray
    row_ind: jnp.ndarray
    val: jnp.ndarray
    col_ptr: Optional[jnp.ndarray]
    csc_row_ind: Optional[jnp.ndarray]
    csc_col_ind: Optional[jnp.ndarray]
    csc_val: Optional[jnp.ndarray]
    format: SparseFormat = SparseFormat.CSRCSC
    symmetric: bool = False

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        leaves = (self.row_ptr, self.col_ind, self.row_ind, self.val,
                  self.col_ptr, self.csc_row_ind, self.csc_col_ind, self.csc_val)
        aux = (self.nrows, self.ncols, self.nvals, self.format, self.symmetric)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        nrows, ncols, nvals, fmt, sym = aux
        return cls(nrows, ncols, nvals, *leaves, format=fmt, symmetric=sym)

    # -- properties -----------------------------------------------------------
    @property
    def nnz_pad(self) -> int:
        arr = self.col_ind if self.col_ind is not None else self.csc_row_ind
        return int(arr.shape[0])

    @property
    def dtype(self):
        return (self.val if self.val is not None else self.csc_val).dtype

    @property
    def shape(self):
        return (self.nrows, self.ncols)

    def has_csr(self) -> bool:
        return self.format in (SparseFormat.CSRCSC, SparseFormat.CSRONLY)

    def has_csc(self) -> bool:
        return self.format in (SparseFormat.CSRCSC, SparseFormat.CSCONLY)

    # -- constructors ---------------------------------------------------------
    @staticmethod
    def from_coo(rows, cols, vals, nrows: int, ncols: int,
                 dtype=jnp.float32,
                 fmt: SparseFormat = None,
                 pad_to: int = TILE) -> "Matrix":
        """Build from COO triplets (reference: Matrix::build, matrix.hpp:126 →
        sparse_matrix.hpp:291-351). Input is deduplicated/sorted by the caller
        (io.mmio.canonicalize_coo) or raw; we sort defensively."""
        if fmt is None:
            from .config import default_sparse_format

            fmt = default_sparse_format()  # GRB_SPARSE_MATRIX_FORMAT
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        vals = np.asarray(vals)
        nvals = len(rows)
        nnz_pad = max(round_up(max(nvals, 1), pad_to), pad_to)

        row_ptr_np, csr_cols, csr_vals = mmio.coo_to_csr(rows, cols, vals, nrows)
        csr_rows = np.repeat(np.arange(nrows, dtype=np.int64), np.diff(row_ptr_np))

        def pad_idx(a, fill):
            out = np.full(nnz_pad, fill, dtype=np.int32)
            out[:nvals] = a
            return out

        def pad_val(a):
            out = np.zeros(nnz_pad, dtype=np.dtype(dtype))
            out[:nvals] = a
            return out

        csr = dict(
            row_ptr=jnp.asarray(row_ptr_np, INDEX_DTYPE),
            col_ind=jnp.asarray(pad_idx(csr_cols, 0)),
            row_ind=jnp.asarray(pad_idx(csr_rows, nrows)),
            val=jnp.asarray(pad_val(csr_vals)),
        )

        # structural symmetry check: CSC == CSR arrays (sparse_matrix.hpp:140-163)
        col_ptr_np, csc_rows, csc_vals = mmio.coo_to_csr(cols, rows, vals, ncols)
        symmetric = (
            nrows == ncols
            and np.array_equal(row_ptr_np, col_ptr_np)
            and np.array_equal(csr_cols, csc_rows)
            and np.array_equal(csr_vals, csc_vals)
        )
        if symmetric:
            csc = dict(col_ptr=csr["row_ptr"], csc_row_ind=csr["col_ind"],
                       csc_col_ind=csr["row_ind"], csc_val=csr["val"])
        elif fmt == SparseFormat.CSRONLY:
            csc = dict(col_ptr=None, csc_row_ind=None, csc_col_ind=None, csc_val=None)
        else:
            csc_cols = np.repeat(np.arange(ncols, dtype=np.int64), np.diff(col_ptr_np))
            csc = dict(
                col_ptr=jnp.asarray(col_ptr_np, INDEX_DTYPE),
                csc_row_ind=jnp.asarray(pad_idx(csc_rows, 0)),
                csc_col_ind=jnp.asarray(pad_idx(csc_cols, ncols)),
                csc_val=jnp.asarray(pad_val(csc_vals)),
            )
        if fmt == SparseFormat.CSCONLY:
            csr = dict(row_ptr=None, col_ind=None, row_ind=None, val=None)
            fmt_out = fmt
        else:
            fmt_out = SparseFormat.CSRONLY if (csc["col_ptr"] is None) else SparseFormat.CSRCSC
            if fmt == SparseFormat.CSRONLY and not symmetric:
                fmt_out = SparseFormat.CSRONLY
        M = Matrix(nrows, ncols, nvals, **csr, **csc, format=fmt_out, symmetric=symmetric)
        # Host-side CSR/CSC stash (not pytree leaves — vanishes across jit):
        # SpMV plan builders (ops/pallas/bilinear.py) read these instead of
        # paying a device→host fetch, which on the tunneled TPU runs at
        # ~0.5 MB/s (~3 min for a rmat18 edge array).
        if fmt != SparseFormat.CSCONLY:
            object.__setattr__(M, "_host_csr",
                               (row_ptr_np, csr_cols.astype(np.int32), csr_vals))
        if csc["col_ptr"] is not None:
            object.__setattr__(M, "_host_csc",
                               (col_ptr_np, csc_rows.astype(np.int32), csc_vals))
        return M

    @staticmethod
    def from_mtx(path: str, directed: int = 0, dtype=jnp.float32,
                 use_cache: bool = True, **kw) -> "Matrix":
        """readMtx + build with npz sidecar caching (reference:
        util.hpp:364-430 readMtx + sparse_matrix.hpp:328-407 .bin cache)."""
        if use_cache:
            from .io.cache import read_mtx_cached

            rows, cols, vals, nrows, ncols = read_mtx_cached(path, directed)
        else:
            rows, cols, vals, nrows, ncols, _ = mmio.read_mtx(path, directed=directed)
        return Matrix.from_coo(rows, cols, vals, nrows, ncols, dtype=dtype, **kw)

    @staticmethod
    def from_device_csr(row_ptr, col_ind, val, nrows: int, ncols: int,
                        nvals: int = None, build_csc: bool = True,
                        pad_to: int = TILE) -> "Matrix":
        """Zero-copy build from DEVICE CSR arrays — no host round trip
        (reference: sparse_matrix.hpp:418-435, build from raw device
        pointers with csr_ownership_=false). Matters for graphs generated
        on-device (e.g. device-side RMAT at large scale): the expanded row
        ids come from a scatter+cummax pass and the CSC mirror from a
        device-side sort-transpose, so nothing but one nvals scalar crosses
        the device boundary.

        Note: such matrices carry no `_host_csr` stash, so bilinear plan
        builders fall back (plans need the host tiling pass)."""
        row_ptr = jnp.asarray(row_ptr, INDEX_DTYPE)
        if nvals is None:
            nvals = int(row_ptr[-1])          # the one scalar fetch
        nnz_pad = max(round_up(max(nvals, 1), pad_to), pad_to)

        def pad_dev(a, fill):
            a = a[:nnz_pad] if a.shape[0] >= nnz_pad else jnp.concatenate(
                [a, jnp.full((nnz_pad - a.shape[0],), fill, a.dtype)])
            slot = jnp.arange(nnz_pad) < nvals
            return jnp.where(slot, a, jnp.asarray(fill, a.dtype))

        col_ind = pad_dev(jnp.asarray(col_ind, INDEX_DTYPE), 0)
        val = pad_dev(jnp.asarray(val), 0)

        # expanded row ids: scatter each row id at its segment start, then
        # forward-fill with cummax (empty rows collapse correctly — the
        # max row id whose ptr ≤ e wins); pad slots get the nrows sentinel
        marks = (jnp.zeros((nnz_pad + 1,), INDEX_DTYPE)
                 .at[row_ptr[:-1]].max(jnp.arange(nrows, dtype=INDEX_DTYPE),
                                       mode="drop"))
        row_ind = jax.lax.cummax(marks[:nnz_pad])
        row_ind = jnp.where(jnp.arange(nnz_pad) < nvals, row_ind, nrows)

        csc = dict(col_ptr=None, csc_row_ind=None, csc_col_ind=None,
                   csc_val=None)
        fmt = SparseFormat.CSRONLY
        if build_csc:
            # device-side transpose: sort (col, row, val) by column, column
            # pointers from a vectorized searchsorted over the sorted keys
            key = jnp.where(jnp.arange(nnz_pad) < nvals, col_ind, ncols)
            cs, rs, vs = jax.lax.sort((key, row_ind, val), num_keys=1,
                                      is_stable=False)
            col_ptr = jnp.searchsorted(
                cs, jnp.arange(ncols + 1, dtype=INDEX_DTYPE)).astype(
                    INDEX_DTYPE)
            live = jnp.arange(nnz_pad) < nvals   # pads sorted to the tail
            csc = dict(col_ptr=col_ptr,
                       csc_row_ind=jnp.where(live, rs, 0),  # in-bounds pad
                       csc_col_ind=jnp.where(cs >= ncols, ncols, cs),
                       csc_val=jnp.where(live, vs, jnp.zeros((), vs.dtype)))
            fmt = SparseFormat.CSRCSC
        return Matrix(nrows, ncols, nvals, row_ptr=row_ptr, col_ind=col_ind,
                      row_ind=row_ind, val=val, **csc, format=fmt,
                      symmetric=False)

    @staticmethod
    def from_dense(dense, fmt: SparseFormat = SparseFormat.CSRCSC) -> "Matrix":
        dense = np.asarray(dense)
        rows, cols = np.nonzero(dense)
        return Matrix.from_coo(rows, cols, dense[rows, cols], *dense.shape,
                               dtype=dense.dtype, fmt=fmt)

    # -- reference API-shape methods (matrix.hpp:13-251) ----------------------
    def dup(self) -> "Matrix":
        """dup() (reference: matrix.hpp:96-105). Arrays are immutable so a
        duplicate is the same pytree — O(1), semantically a deep copy."""
        return dataclasses.replace(self)

    def clear(self) -> "Matrix":
        """clear() (reference: matrix.hpp:107-112): empty matrix of the same
        shape/dtype/capacity."""
        z_idx = jnp.zeros_like(self.col_ind) if self.col_ind is not None else None
        sent = (jnp.full_like(self.row_ind, self.nrows)
                if self.row_ind is not None else None)
        return Matrix(
            self.nrows, self.ncols, 0,
            row_ptr=jnp.zeros_like(self.row_ptr) if self.row_ptr is not None else None,
            col_ind=z_idx, row_ind=sent,
            val=jnp.zeros_like(self.val) if self.val is not None else None,
            col_ptr=jnp.zeros_like(self.col_ptr) if self.col_ptr is not None else None,
            csc_row_ind=jnp.zeros_like(self.csc_row_ind) if self.csc_row_ind is not None else None,
            csc_col_ind=(jnp.full_like(self.csc_col_ind, self.ncols)
                         if self.csc_col_ind is not None else None),
            csc_val=jnp.zeros_like(self.csc_val) if self.csc_val is not None else None,
            format=self.format, symmetric=False)

    def fill(self, value) -> "Matrix":
        """fill() (reference: matrix.hpp:232-238): set every STORED value."""
        return dataclasses.replace(
            self,
            val=jnp.full_like(self.val, value) if self.val is not None else None,
            csc_val=(jnp.full_like(self.csc_val, value)
                     if self.csc_val is not None else None))

    def set_storage(self, fmt: SparseFormat) -> "Matrix":
        """setStorage analog (reference: matrix.hpp:150-156): narrow to one
        representation (dropping the other's arrays) or keep both."""
        if fmt == self.format:
            return self
        if fmt == SparseFormat.CSRONLY:
            return dataclasses.replace(self, col_ptr=None, csc_row_ind=None,
                                       csc_col_ind=None, csc_val=None, format=fmt)
        if fmt == SparseFormat.CSCONLY:
            return dataclasses.replace(self, row_ptr=None, col_ind=None,
                                       row_ind=None, val=None, format=fmt)
        if self.symmetric and self.has_csr():
            return dataclasses.replace(
                self, col_ptr=self.row_ptr, csc_row_ind=self.col_ind,
                csc_col_ind=self.row_ind, csc_val=self.val, format=fmt)
        # widening a one-sided asymmetric matrix requires a host rebuild
        r, c, v = self.extract_tuples()
        return Matrix.from_coo(r, c, v, self.nrows, self.ncols,
                               dtype=self.dtype, fmt=fmt)

    # -- extraction (host side) ----------------------------------------------
    def extract_tuples(self):
        """(rows, cols, vals) of stored entries (reference: matrix.hpp:171-194).

        Prefers the host CSR stash: a device fetch over the tunneled TPU
        relay runs at ~0.5 MB/s (CLAUDE.md) — minutes for large edge
        arrays."""
        host = getattr(self, "_host_csr", None)
        if host is not None and (host[2] is not None or self.val is None):
            ptr = np.asarray(host[0])[: self.nrows + 1]
            r = np.repeat(np.arange(self.nrows, dtype=np.int64),
                          np.diff(ptr))[: self.nvals]
            c = np.asarray(host[1])[: self.nvals]
            v = (np.asarray(host[2])[: self.nvals] if host[2] is not None
                 else np.ones(self.nvals, self.dtype))
            return r, c, v
        r = np.asarray(self.row_ind)[: self.nvals]
        c = np.asarray(self.col_ind)[: self.nvals]
        v = np.asarray(self.val)[: self.nvals]
        return r, c, v

    def to_dense(self) -> np.ndarray:
        out = np.zeros((self.nrows, self.ncols), dtype=self.dtype)
        r, c, v = self.extract_tuples()
        out[r, c] = v
        return out

    def to_scipy(self):
        import scipy.sparse as sp

        r, c, v = self.extract_tuples()
        return sp.csr_matrix((v, (r, c)), shape=self.shape)

    # -- invariants (reference: sparse_matrix.hpp:521-551 check()) ------------
    def check(self):
        rp = np.asarray(self.row_ptr)
        assert rp[0] == 0 and rp[-1] == self.nvals, "row_ptr endpoints"
        assert np.all(np.diff(rp) >= 0), "row_ptr monotone"
        ci = np.asarray(self.col_ind)[: self.nvals]
        assert ci.min(initial=0) >= 0 and (ci.max(initial=0) < self.ncols or self.nvals == 0)
        ri = np.asarray(self.row_ind)
        assert np.all(ri[self.nvals:] == self.nrows), "pad sentinel"
        return True

    def __repr__(self):
        return (f"Matrix({self.nrows}x{self.ncols}, nvals={self.nvals}, "
                f"dtype={self.dtype}, fmt={self.format.name}, sym={self.symmetric})")
