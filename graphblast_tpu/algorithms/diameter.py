"""Pseudo-diameter via BFS sweep over a source range
(reference: graphblas/algorithm/diameter.hpp:14-53)."""
from __future__ import annotations

import jax.numpy as jnp

from ..descriptor import Descriptor, BFS_TUNED
from ..matrix import Matrix
from .bfs import _bfs_fused
from .common import edge_cap_for


def diameter(A: Matrix, s_start: int, s_end: int,
             desc: Descriptor = BFS_TUNED):
    """max eccentricity (and its argmax source) over sources [s_start, s_end)
    — (reference returns (iter-2, source), i.e. max BFS level - 1)."""
    kw = dict(struconly=desc.structure_only, edge_cap=edge_cap_for(A, desc),
              switchpoint=desc.switchpoint, mode=desc.mxv_mode,
              sort_push=desc.sort_push, max_niter=desc.max_niter)
    best, best_s = 0, -1
    for s in range(s_start, s_end):
        v, _ = _bfs_fused(A, s, **kw)
        ecc = int(jnp.max(v)) - 1  # levels are 1-based
        if ecc > best:
            best, best_s = ecc, s
    return best, best_s
