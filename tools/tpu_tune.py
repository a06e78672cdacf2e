#!/usr/bin/env python
"""Direction/tier tuning at rmat18: BFS pullonly vs pushpull with the int8
bitmap kernel; SSSP tier variants."""
import sys, time, functools
import jax, jax.numpy as jnp, numpy as np
from graphblast_tpu.io.rmat import rmat_matrix
from graphblast_tpu.algorithms.bfs import _bfs_fused
from graphblast_tpu.algorithms.sssp import _sssp_fused
from graphblast_tpu.ops.pallas.bilinear import plan_for_bitmap
from graphblast_tpu.types import Direction, INDEX_DTYPE

def log(*a): print(*a, flush=True)

A = rmat_matrix(18, 16, seed=42)
deg = np.diff(np.asarray(A.row_ptr))
srcs = np.argsort(deg)[::-1][:8].astype(np.int32)
plan = plan_for_bitmap(A, transpose=True)
cap = min(A.nnz_pad, max(1024, int(A.nnz_pad * 0.5) // 1024 * 1024))

def bench_bfs(name, mode):
    kw = dict(struconly=True, edge_cap=cap, switchpoint=0.01, mode=mode,
              sort_push=True, max_niter=1000)
    @jax.jit
    def run_all(ss):
        def body(c, s):
            v, _ = _bfs_fused(A, s, plan, **kw)
            return c + v[0] * 1e-30, ()
        c, _ = jax.lax.scan(body, jnp.asarray(0.0, jnp.float32), ss)
        return c
    s_few = jnp.asarray(srcs[:2]); s_all = jnp.asarray(np.tile(srcs, 2)[:10])
    np.asarray(run_all(s_few)); np.asarray(run_all(s_all))
    ts = []
    for s in (s_few, s_all, s_few, s_all):
        t0 = time.perf_counter(); np.asarray(run_all(s))
        ts.append(time.perf_counter() - t0)
    per = ((ts[1]+ts[3])-(ts[0]+ts[2]))/16
    log(f"bfs {name}: {per*1e3:.2f} ms/run ({A.nvals/per/1e9:.3f} GTEPS)")

from graphblast_tpu.ops.pallas.monopull import plan_for_monoid

mono_plan = plan_for_monoid(A, transpose=True)


def bench_sssp(name, tiers, sw, mplan=None):
    kw = dict(edge_cap=cap, switchpoint=sw, mode=Direction.PUSHPULL,
              sort_push=True, tiers=tiers, max_niter=1000)
    v, it = _sssp_fused(A, jnp.asarray(int(srcs[0]), INDEX_DTYPE), mplan,
                        **kw)
    np.asarray(jnp.ravel(v)[0])
    t0 = time.perf_counter()
    for _ in range(4):
        v, _ = _sssp_fused(A, jnp.asarray(int(srcs[0]), INDEX_DTYPE), mplan,
                           **kw)
    np.asarray(jnp.ravel(v)[0])
    per = (time.perf_counter()-t0)/4
    log(f"sssp {name}: {per*1e3:.2f} ms/run (iters={int(it)})")

import os

bench_bfs("pushpull", Direction.PUSHPULL)
bench_bfs("pullonly", Direction.PULLONLY)
os.environ["GRB_PUSH_BITMAP_SORT"] = "1"
bench_bfs("pushpull bitmap-sort", Direction.PUSHPULL)
os.environ.pop("GRB_PUSH_BITMAP_SORT")
bench_sssp("t(64,8) sw.01 sorted-pull", (64, 8), 0.01, None)
bench_sssp("t(64,8) sw.01 monoid-pull", (64, 8), 0.01, mono_plan)
bench_sssp("t(8) sw.01 monoid-pull", (8,), 0.01, mono_plan)
bench_sssp("t(8) sw.004 monoid-pull", (8,), 0.004, mono_plan)
bench_sssp("t(64,8) sw.004 monoid-pull", (64, 8), 0.004, mono_plan)
bench_sssp("t(256,32,4) sw.01 monoid-pull", (256, 32, 4), 0.01, mono_plan)
bench_sssp("t(64,8) sw.02 monoid-pull", (64, 8), 0.02, mono_plan)
