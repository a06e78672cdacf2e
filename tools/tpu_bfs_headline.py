#!/usr/bin/env python
"""Probe the headline BFS stage shape on the real chip: compile time of ONE
single-source pull-only fused BFS at --scale, then per-run cost via the
pipelined-dispatch protocol (CLAUDE.md timing protocol b).

Run standalone (relay must be up):
    timeout 3000 python tools/tpu_bfs_headline.py --scale 18
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=18)
    ap.add_argument("--edgefactor", type=int, default=16)
    ap.add_argument("--sources", type=int, default=8)
    ap.add_argument("--mode", default="pull", choices=["pull", "pushpull"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from graphblast_tpu.algorithms.bfs import _bfs_fused
    from graphblast_tpu.io.rmat import rmat_matrix
    from graphblast_tpu.ops.pallas.bilinear import plan_for_bitmap
    from graphblast_tpu.types import Direction, INDEX_DTYPE

    t0 = time.perf_counter()
    A = rmat_matrix(args.scale, args.edgefactor, seed=42)
    print(f"[probe] rmat{args.scale} n={A.nrows} nnz={A.nvals} "
          f"built in {time.perf_counter()-t0:.1f}s", flush=True)
    ptr = np.asarray(A._host_csr[0])
    deg = np.diff(ptr[: A.nrows + 1])
    sources = np.argsort(deg)[::-1][: args.sources].astype(np.int32)

    plan = plan_for_bitmap(A, transpose=True)
    print(f"[probe] plan={'bitmap' if plan is not None else None}", flush=True)
    mode = Direction.PULLONLY if args.mode == "pull" else Direction.PUSHPULL
    kw = dict(struconly=True,
              edge_cap=min(A.nnz_pad,
                           max(1024, int(A.nnz_pad * 0.5) // 1024 * 1024)),
              switchpoint=0.01, mode=mode, sort_push=True, max_niter=1000)

    deg_dev = jnp.diff(A.row_ptr[: A.nrows + 1]).astype(jnp.int32)

    @jax.jit
    def single(s):
        v, it = _bfs_fused(A, s, plan, **kw)
        reached = jnp.sum((v != 0).astype(jnp.int32))
        redges = jnp.sum(jnp.where(v != 0, deg_dev, 0))
        return reached, redges, it

    t0 = time.perf_counter()
    r0, re0, it0 = single(jnp.asarray(int(sources[0]), INDEX_DTYPE))
    r0, re0, it0 = int(r0), int(re0), int(it0)
    t_compile = time.perf_counter() - t0
    print(f"[probe] compile+first run {t_compile:.1f}s  reached={r0} "
          f"reached_edges={re0} iters={it0}", flush=True)

    # pipelined protocol: dispatch K runs, fetch one scalar at the end
    for rep in range(3):
        t0 = time.perf_counter()
        outs = [single(jnp.asarray(int(s), INDEX_DTYPE))
                for s in sources]
        np.asarray(outs[-1][0])
        dt = time.perf_counter() - t0
        print(f"[probe] rep{rep}: {len(sources)} runs in {dt*1e3:.1f} ms "
              f"-> {dt/len(sources)*1e3:.2f} ms/run "
              f"-> {re0/(dt/len(sources))/1e9:.3f} GTEPS", flush=True)

    # per-dispatch (fetch every scalar) for comparison
    t0 = time.perf_counter()
    for s in sources:
        np.asarray(single(jnp.asarray(int(s), INDEX_DTYPE))[0])
    dt = time.perf_counter() - t0
    print(f"[probe] per-dispatch: {dt/len(sources)*1e3:.2f} ms/run", flush=True)


if __name__ == "__main__":
    main()
