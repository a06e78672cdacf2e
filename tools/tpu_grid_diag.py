#!/usr/bin/env python
"""Grid-BFS per-iteration cost by mode: PUSHONLY vs PUSHPULL vs PULLONLY.

Separates the sparse-output push's true per-iteration cost from the
PUSHPULL dispatch overhead (suspected: the pull branch's full-n
re-sparsification sort executing every iteration via a flattened cond).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from graphblast_tpu.algorithms.bfs import _bfs_fused
from graphblast_tpu.io.rmat import grid_matrix
from graphblast_tpu.ops.pallas.bilinear import plan_for_bitmap
from graphblast_tpu.types import Direction, INDEX_DTYPE

side = int(sys.argv[1]) if len(sys.argv) > 1 else 512
modes = sys.argv[2:] or ["pushonly", "pushpull", "pull"]

A = grid_matrix(side)
print(f"grid {side}: n={A.nrows} nnz={A.nvals}", flush=True)
src = jnp.asarray(0, INDEX_DTYPE)
base = dict(struconly=True,
            edge_cap=min(A.nnz_pad,
                         max(1024, int(A.nnz_pad * 0.5) // 1024 * 1024)),
            switchpoint=0.01, sort_push=True, max_niter=4 * side + 8)


def run(name, mode, plan, tiers):
    t0 = time.perf_counter()
    v, it = _bfs_fused(A, src, plan, mode=mode, tiers=tiers, **base)
    np.asarray(jnp.ravel(v)[0])
    iters = int(it)
    tc = time.perf_counter() - t0
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        v, _ = _bfs_fused(A, src, plan, mode=mode, tiers=tiers, **base)
    np.asarray(jnp.ravel(v)[0])
    per = (time.perf_counter() - t0) / reps
    print(f"{name:10s} {per * 1e3:9.2f} ms/run ({iters} iters, "
          f"{per / max(iters, 1) * 1e3:.3f} ms/iter; compile {tc:.0f}s)",
          flush=True)
    return np.asarray(v)


got = {}
for m in modes:
    if m == "pushonly":
        got[m] = run(m, Direction.PUSHONLY, None, (64,))
    elif m == "pushpull":
        got[m] = run(m, Direction.PUSHPULL, plan_for_bitmap(A, transpose=True),
                     (64,))
    else:
        got[m] = run(m, Direction.PULLONLY, plan_for_bitmap(A, transpose=True),
                     (64, 8))
ref = next(iter(got.values()))
for m, v in got.items():
    print(f"{m}: match first = {(v == ref).all()}", flush=True)
