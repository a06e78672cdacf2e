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


def grid_edges(side: int):
    """Undirected 2D 4-neighbor grid (road-network analog): n = side²,
    diameter 2·(side−1). The direction-optimization stressor the reference's
    push path exists for (vector.hpp:292-323 heuristic): every BFS frontier
    stays O(side) ≪ n, so pull (which sweeps ALL edges per level) does
    ~diameter·|E| work while push does O(|E|) total. Returns symmetric
    (rows, cols)."""
    v = np.arange(side * side, dtype=np.int64).reshape(side, side)
    right = np.stack([v[:, :-1].ravel(), v[:, 1:].ravel()])
    down = np.stack([v[:-1, :].ravel(), v[1:, :].ravel()])
    rows = np.concatenate([right[0], down[0], right[1], down[1]])
    cols = np.concatenate([right[1], down[1], right[0], down[0]])
    return rows, cols


def grid_matrix(side: int, dtype=None, **kw):
    """Canonicalized side×side grid Matrix (unit weights)."""
    import jax.numpy as jnp

    from ..matrix import Matrix
    from .mmio import canonicalize_coo

    dtype = dtype or jnp.float32
    rows, cols = grid_edges(side)
    vals = np.ones(len(rows), np.float32)
    rows, cols, vals = canonicalize_coo(rows, cols, vals, undirected=False,
                                        remove_self_loops=True)
    n = side * side
    return Matrix.from_coo(rows, cols, vals, n, n, dtype=dtype, **kw)


def rmat_matrix(scale: int, edge_factor: int = 16, seed: int = 0,
                undirected: bool = True, dtype=None,
                cache_dir: str = None, **kw):
    """Build a canonicalized Matrix from RMAT edges (weights = 1.0).

    Canonicalized COO is cached on disk at scale ≥ 20 (generation +
    symmetrize + dedup takes ~5 min at scale 22; the reload is ~20 s) —
    the .bin-cache idea (sparse_matrix.hpp:328-407) applied to generated
    inputs. Set GRB_RMAT_CACHE=0 to disable."""
    import os

    import jax.numpy as jnp

    from ..matrix import Matrix
    from .mmio import canonicalize_coo

    dtype = dtype or jnp.float32
    n = 1 << scale
    use_cache = (scale >= 20 and undirected
                 and os.environ.get("GRB_RMAT_CACHE", "1") not in ("0",))
    cpath = None
    if use_cache:
        d = cache_dir or os.environ.get("GRB_RMAT_CACHE_DIR", "/tmp")
        cpath = os.path.join(d, f".rmat{scale}_{edge_factor}_{seed}.npz")
        if os.path.exists(cpath):
            z = np.load(cpath)
            return Matrix.from_coo(z["rows"], z["cols"], z["vals"], n, n,
                                   dtype=dtype, **kw)

    rows, cols = rmat_edges(scale, edge_factor, seed)
    vals = np.ones(len(rows), dtype=np.float32)
    rows, cols, vals = canonicalize_coo(rows, cols, vals,
                                        undirected=undirected,
                                        remove_self_loops=True)
    if cpath is not None:
        try:
            np.savez(cpath, rows=rows.astype(np.int32),
                     cols=cols.astype(np.int32), vals=vals)
        except OSError:
            pass
    return Matrix.from_coo(rows, cols, vals, n, n, dtype=dtype, **kw)
