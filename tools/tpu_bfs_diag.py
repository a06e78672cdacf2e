#!/usr/bin/env python
"""Decompose BFS per-iteration cost: PULLONLY vs PUSHONLY vs PUSHPULL,
with and without the bilinear pull plan."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from graphblast_tpu.io.rmat import rmat_matrix
from graphblast_tpu.algorithms.bfs import _bfs_fused
from graphblast_tpu.ops.pallas.bilinear import plan_for
from graphblast_tpu.types import Direction, INDEX_DTYPE

scale = int(sys.argv[1]) if len(sys.argv) > 1 else 18


def log(*a):
    print(*a, flush=True)


A = rmat_matrix(scale, 16, seed=42)
deg = np.diff(np.asarray(A.row_ptr))
src = int(np.argsort(deg)[::-1][0])
log(f"rmat{scale}: n={A.nrows} nnz={A.nvals} src={src}")
plan = plan_for(A, transpose=True, ones=True)

base = dict(struconly=True,
            edge_cap=min(A.nnz_pad, max(1024, int(A.nnz_pad * 0.5) // 1024 * 1024)),
            switchpoint=0.01, sort_push=True, max_niter=1000)


def bench(name, plan_arg, mode, runs=6):
    kw = dict(base, mode=mode)
    v, it = _bfs_fused(A, jnp.asarray(src, INDEX_DTYPE), plan_arg, **kw)
    np.asarray(jnp.ravel(v)[0])
    iters = int(it)
    t0 = time.perf_counter()
    for _ in range(runs):
        v, _ = _bfs_fused(A, jnp.asarray(src, INDEX_DTYPE), plan_arg, **kw)
    np.asarray(jnp.ravel(v)[0])
    per = (time.perf_counter() - t0) / runs
    log(f"{name}: {per*1e3:.2f} ms/run ({iters} iters, "
        f"{per/max(iters,1)*1e3:.2f} ms/iter)")


bench("pushpull+plan", plan, Direction.PUSHPULL)
bench("pullonly+plan", plan, Direction.PULLONLY)
bench("pushonly     ", None, Direction.PUSHONLY)
bench("pushpull-plan", None, Direction.PUSHPULL)
