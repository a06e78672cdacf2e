#!/usr/bin/env python
"""SSSP cost decomposition at rmat scale: fused modes + stepped CSV."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from graphblast_tpu.algorithms.sssp import _sssp_fused, sssp
from graphblast_tpu.descriptor import Descriptor
from graphblast_tpu.io.rmat import rmat_matrix
from graphblast_tpu.types import Direction, INDEX_DTYPE

scale = int(sys.argv[1]) if len(sys.argv) > 1 else 18


def log(*a):
    print(*a, flush=True)


A = rmat_matrix(scale, 16, seed=42)
deg = np.diff(np.asarray(A.row_ptr))
src = int(np.argsort(deg)[::-1][0])
log(f"rmat{scale}: n={A.nrows} nnz={A.nvals} src={src}")

cap = min(A.nnz_pad, max(1024, int(A.nnz_pad * 0.5) // 1024 * 1024))


def bench(name, mode, tiers, runs=4):
    kw = dict(edge_cap=cap, switchpoint=0.01, mode=mode, sort_push=True,
              tiers=tiers, max_niter=1000)
    v, it = _sssp_fused(A, jnp.asarray(src, INDEX_DTYPE), **kw)
    np.asarray(jnp.ravel(v)[0])
    iters = int(it)
    t0 = time.perf_counter()
    for _ in range(runs):
        v, _ = _sssp_fused(A, jnp.asarray(src, INDEX_DTYPE), **kw)
    np.asarray(jnp.ravel(v)[0])
    per = (time.perf_counter() - t0) / runs
    log(f"{name}: {per*1e3:.2f} ms/run ({iters} iters, "
        f"{per/max(iters,1)*1e3:.2f} ms/iter)")


bench("pushpull t(8)", Direction.PUSHPULL, (8,))
bench("pushonly t(8)", Direction.PUSHONLY, (8,))
bench("pushonly t(64,8)", Direction.PUSHONLY, (64, 8))

# stepped CSV: true per-iteration profile (sync per iter)
log("--- stepped CSV (iter, succ/n, unvisited, dir, ms) ---")
desc = Descriptor(max_niter=1000, timing=1, memusage=0.5, push_tiers=(8,))
t0 = time.perf_counter()
v = sssp(A, src, desc=desc, mode="stepped")
log(f"stepped total {time.perf_counter()-t0:.1f}s")
