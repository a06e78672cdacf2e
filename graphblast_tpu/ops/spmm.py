"""SpMM: sparse matrix × dense matrix.

The reference declares this and never implements it (backend/cuda/spmm.hpp:
16-40 prints "not implemented"); on TPU it is the natural citizen — the dense
right-hand side makes every edge fetch a contiguous 128-lane row read, and the
per-row reduction is a prefix-sum over a 2D array, so the whole op runs at
vector width with no lane gathers at all.

    C[i, :] = ⊕_{j ∈ A(i,:)} A[i,j] ⊗ B[j, :]

Supported ⊕: Plus (prefix-sum boundary reduce), Minimum/Maximum (segmented
flag scan). ⊗ is any elementwise binary op.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..semiring import Semiring
from .segops import segmented_scan


def spmm(row_ptr: jnp.ndarray, col_ind: jnp.ndarray, val, B: jnp.ndarray,
         semiring: Semiring, nrows: int,
         row_ind: jnp.ndarray = None) -> jnp.ndarray:
    """C = A ⊕.⊗ B with A in CSR arrays and dense B (n_cols, k)."""
    k = B.shape[1]
    out_dtype = B.dtype
    ident = semiring.identity(out_dtype)

    eb = jnp.take(B, jnp.clip(col_ind, 0, B.shape[0] - 1), axis=0)  # (nnz, k)
    a = (val.astype(out_dtype)[:, None] if val is not None
         else jnp.ones((col_ind.shape[0], 1), out_dtype))
    prod = semiring.mul(a, eb)

    ends = row_ptr[1:]
    starts = row_ptr[:-1]
    add = semiring.add.name
    if add == "PlusMonoid":
        csum = jnp.cumsum(prod, axis=0)
        bnd = jnp.where((row_ptr > 0)[:, None],
                        jnp.take(csum, jnp.maximum(row_ptr - 1, 0), axis=0),
                        jnp.zeros((), out_dtype))
        return bnd[1:] - bnd[:-1]

    if add in ("MinimumMonoid", "MaximumMonoid"):
        if row_ind is not None:
            heads = jnp.concatenate([jnp.ones((1,), jnp.bool_),
                                     row_ind[1:] != row_ind[:-1]])
        else:
            from .segops import segment_heads

            heads = segment_heads(row_ptr, prod.shape[0])
        scanned = segmented_scan(prod, heads[:, None] | jnp.zeros(
            (1, k), jnp.bool_), semiring.add)
        tail = jnp.clip(ends - 1, 0, prod.shape[0] - 1)
        out = jnp.take(scanned, tail, axis=0)
        return jnp.where((ends > starts)[:, None], out, ident)

    raise NotImplementedError(
        f"spmm: unsupported ⊕ monoid {semiring.add.name}")
