"""RMAT / Graph500 Kronecker graph generator.

The reference benchmarks on pre-generated rmat_n22..n24 matrix files
(run_bfs.sh:2-25); the TPU framework generates them directly (scale-25 RMAT is
the BASELINE.json north-star input). Vectorized NumPy edge generation: each of
the `scale` bits of (row, col) is drawn from the (a,b,c,d) quadrant
distribution — the standard Graph500 recipe.
"""
from __future__ import annotations

import numpy as np


def rmat_edges(scale: int, edge_factor: int = 16, seed: int = 0,
               a: float = 0.57, b: float = 0.19, c: float = 0.19):
    """Generate 2^scale-vertex RMAT COO edges (m = edge_factor · 2^scale).

    Returns (rows, cols) int64 arrays with vertex ids randomly permuted
    (Graph500 shuffle) — duplicates and self-loops retained; pass through
    io.mmio.canonicalize_coo for graph-building."""
    n = 1 << scale
    m = edge_factor * n
    rng = np.random.RandomState(seed)
    rows = np.zeros(m, dtype=np.int64)
    cols = np.zeros(m, dtype=np.int64)
    ab = a + b
    c_norm = c / (1.0 - ab)
    a_norm = a / ab
    for bit in range(scale):
        r_bit = rng.rand(m) > ab
        c_bit = np.where(
            r_bit,
            rng.rand(m) > c_norm,
            rng.rand(m) > a_norm,
        )
        rows |= r_bit.astype(np.int64) << bit
        cols |= c_bit.astype(np.int64) << bit
    # permute vertex ids to break degree-locality
    perm = rng.permutation(n)
    return perm[rows], perm[cols]


def rmat_matrix(scale: int, edge_factor: int = 16, seed: int = 0,
                undirected: bool = True, dtype=None, **kw):
    """Build a canonicalized Matrix from RMAT edges (weights = 1.0)."""
    import jax.numpy as jnp

    from ..matrix import Matrix
    from .mmio import canonicalize_coo

    dtype = dtype or jnp.float32
    rows, cols = rmat_edges(scale, edge_factor, seed)
    vals = np.ones(len(rows), dtype=np.float32)
    rows, cols, vals = canonicalize_coo(rows, cols, vals,
                                        undirected=undirected,
                                        remove_self_loops=True)
    n = 1 << scale
    return Matrix.from_coo(rows, cols, vals, n, n, dtype=dtype, **kw)
