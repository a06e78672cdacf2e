#!/usr/bin/env python
"""Pre-generate the canonicalized RMAT npz cache (pure numpy — no Matrix
build, no device transfer) so bench.py's large-scale stages never burn
their stage budget on host-side generation (scale 24 ≈ 44 min).

Usage: JAX_PLATFORM_NAME=cpu python tools/gen_rmat_cache.py 22 24
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

CACHE = os.environ.get(
    "GRB_RMAT_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".cache"))
os.makedirs(CACHE, exist_ok=True)

from graphblast_tpu.io.mmio import canonicalize_coo
from graphblast_tpu.io.rmat import rmat_edges

for arg in sys.argv[1:]:
    scale = int(arg)
    ef, seed = 16, 42
    cpath = os.path.join(CACHE, f".rmat{scale}_{ef}_{seed}.npz")
    if os.path.exists(cpath):
        print(f"[gen] {cpath} exists — skipped", flush=True)
        continue
    t0 = time.perf_counter()
    rows, cols = rmat_edges(scale, ef, seed)
    t1 = time.perf_counter()
    print(f"[gen] rmat{scale}: {len(rows):,} raw edges in {t1 - t0:.0f}s",
          flush=True)
    vals = np.ones(len(rows), dtype=np.float32)
    rows, cols, vals = canonicalize_coo(rows, cols, vals, undirected=True,
                                        remove_self_loops=True)
    t2 = time.perf_counter()
    print(f"[gen] canonicalized to {len(rows):,} edges in {t2 - t1:.0f}s",
          flush=True)
    np.savez(cpath + ".tmp.npz", rows=rows.astype(np.int32),
             cols=cols.astype(np.int32), vals=vals)
    os.replace(cpath + ".tmp.npz", cpath)
    print(f"[gen] wrote {cpath} "
          f"({os.path.getsize(cpath) / 1e9:.2f} GB, "
          f"{time.perf_counter() - t2:.0f}s)", flush=True)
