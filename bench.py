#!/usr/bin/env python
"""Headline benchmark — prints ONE JSON line for the driver.

Primary metric: direction-optimized BFS GTEPS (traversed edges/s, Graph500
convention: graph edge count / end-to-end BFS time) on an RMAT graph, run on
the real TPU chip. Also measures sustained pull-SpMV bandwidth (the
speed-of-light reference for the kernel) and PageRank iterations/s;
vs_baseline is the BFS GTEPS ratio against a 1.0-GTEPS reference-class GPU
figure (the GraphBLAST paper's hardware era; its repo publishes no numbers —
BASELINE.md).

Usage: python bench.py [--scale N] [--edgefactor N] [--json-only]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=18)
    ap.add_argument("--edgefactor", type=int, default=16)
    ap.add_argument("--sources", type=int, default=8)
    ap.add_argument("--spmv-iters", type=int, default=20)
    ap.add_argument("--json-only", action="store_true")
    args = ap.parse_args()

    import jax

    # persistent compilation cache: the fused while-loop programs take
    # minutes to compile at scale 18; caching makes reruns start in seconds.
    # Off by default: the axon-tunneled backend has been observed to wedge
    # when executable serialization is enabled (set GRB_BENCH_CACHE=1 on
    # direct-attached TPUs).
    import os as _os
    if _os.environ.get("GRB_BENCH_CACHE", "0") == "1":
        cache_dir = _os.path.join(
            _os.path.dirname(_os.path.abspath(__file__)), ".jax_cache")
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
        except Exception:
            pass

    import jax.numpy as jnp

    from graphblast_tpu.algorithms.bfs import _bfs_fused
    from graphblast_tpu.algorithms.pr import _pr_fused, prepare_pr_matrix
    from graphblast_tpu.descriptor import BFS_TUNED
    from graphblast_tpu.io.rmat import rmat_matrix
    from graphblast_tpu.ops.spmv import spmv_pull
    from graphblast_tpu.semiring import PlusMultipliesSemiring
    from graphblast_tpu.types import Direction, INDEX_DTYPE

    def log(*a):
        if not args.json_only:
            print(*a, file=sys.stderr)

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform})")

    t0 = time.perf_counter()
    A = rmat_matrix(args.scale, args.edgefactor, seed=42)
    log(f"rmat{args.scale} built: n={A.nrows} nnz={A.nvals} "
        f"({time.perf_counter() - t0:.1f}s)")

    deg = np.diff(np.asarray(A.row_ptr))
    sources = np.argsort(deg)[::-1][: args.sources].astype(np.int32)

    # --- BFS GTEPS (fused, direction-optimized) ---
    desc = BFS_TUNED.replace(memusage=0.5)
    kw = dict(struconly=True,
              edge_cap=min(A.nnz_pad, max(1024, int(A.nnz_pad * 0.5) // 1024 * 1024)),
              switchpoint=0.01, mode=Direction.PUSHPULL, sort_push=True,
              max_niter=1000)
    # warmup / compile
    v, iters = _bfs_fused(A, jnp.asarray(int(sources[0]), INDEX_DTYPE), **kw)
    jax.block_until_ready(v)
    log(f"bfs compile done; iters={int(iters)} reached={int((np.asarray(v) != 0).sum())}")

    t0 = time.perf_counter()
    for s in sources:
        v, _ = _bfs_fused(A, jnp.asarray(int(s), INDEX_DTYPE), **kw)
    jax.block_until_ready(v)
    bfs_s = (time.perf_counter() - t0) / len(sources)
    bfs_gteps = A.nvals / bfs_s / 1e9
    log(f"BFS: {bfs_s * 1e3:.2f} ms/run → {bfs_gteps:.3f} GTEPS")

    # --- SSSP GTEPS (fused min-plus Bellman-Ford) ---
    from graphblast_tpu.algorithms.sssp import _sssp_fused

    sskw = dict(edge_cap=kw["edge_cap"], switchpoint=0.01,
                mode=Direction.PUSHPULL, sort_push=True, max_niter=1000)
    v, it_ss = _sssp_fused(A, jnp.asarray(int(sources[0]), INDEX_DTYPE), **sskw)
    jax.block_until_ready(v)
    t0 = time.perf_counter()
    for s in sources:
        v, _ = _sssp_fused(A, jnp.asarray(int(s), INDEX_DTYPE), **sskw)
    jax.block_until_ready(v)
    sssp_s = (time.perf_counter() - t0) / len(sources)
    sssp_gteps = A.nvals / sssp_s / 1e9
    log(f"SSSP: {sssp_s * 1e3:.2f} ms/run → {sssp_gteps:.3f} GTEPS")

    # --- pull SpMV sustained bandwidth (sort-based value kernel) ---
    from graphblast_tpu.ops.spmv import spmv_pull_sorted

    x = jnp.ones((A.ncols,), jnp.float32)

    @jax.jit
    def spmv(A, x):
        return spmv_pull_sorted(A.row_ptr, A.csc_col_ind, A.csc_row_ind,
                                A.csc_val, x, PlusMultipliesSemiring,
                                A.nrows, A.nvals)

    y = spmv(A, x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(args.spmv_iters):
        y = spmv(A, x)
    jax.block_until_ready(y)
    spmv_s = (time.perf_counter() - t0) / args.spmv_iters
    # bytes: col_ind + val reads + x gather + row_ptr + y write
    bytes_moved = A.nnz_pad * (4 + 4 + 4) + A.nrows * 8
    spmv_gbs = bytes_moved / spmv_s / 1e9
    spmv_gteps = A.nvals / spmv_s / 1e9
    log(f"SpMV: {spmv_s * 1e3:.2f} ms → {spmv_gbs:.1f} GB/s, {spmv_gteps:.2f} GTEPS")

    # --- PageRank iterations/s ---
    Ap = prepare_pr_matrix(A, 0.85)
    # warmup MUST use identical static args — a different (eps, max_niter)
    # pair is a different compiled program and would put compile time
    # inside the timed region
    p, it_pr, err = _pr_fused(Ap, alpha=0.85, eps=0.0, max_niter=50)
    jax.block_until_ready(p)
    t0 = time.perf_counter()
    p, it_pr, err = _pr_fused(Ap, alpha=0.85, eps=0.0, max_niter=50)
    jax.block_until_ready(p)
    pr_iters_s = 50 / (time.perf_counter() - t0)
    log(f"PR: {pr_iters_s:.1f} iters/s")

    result = {
        "metric": f"bfs_gteps_rmat{args.scale}",
        "value": round(bfs_gteps, 4),
        "unit": "GTEPS",
        "vs_baseline": round(bfs_gteps / 1.0, 4),
        "sssp_gteps": round(sssp_gteps, 4),
        "spmv_gbs": round(spmv_gbs, 1),
        "spmv_gteps": round(spmv_gteps, 3),
        "pr_iters_per_s": round(pr_iters_s, 2),
        "device": dev.device_kind,
        "n": A.nrows,
        "nnz": A.nvals,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
