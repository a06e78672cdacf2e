#!/usr/bin/env python
"""Multi-GB MatrixMarket ingest exercise (VERDICT r2 next-#6).

The reference benches on SuiteSparse/gunrock .mtx suites
(/root/reference/run_bfs.sh:2-25, readMtx util.hpp:364-430); this
environment has no network egress, so the multi-GB file is produced by
writing a generated RMAT graph to .mtx on disk, then ingesting it back
through BOTH parsers:

  * native C++ radix pipeline (graphblast_tpu/native/graphio.cpp)
  * pure-NumPy reference parser (io/mmio.py, GRB_NATIVE=0 semantics)

and comparing the resulting canonical COO arrays exactly. Prints a
timing/parity report; exits non-zero on any mismatch.

Usage: python tools/mtx_ingest_check.py [--scale 20] [--edgefactor 16]
           [--out /tmp/rmatN.mtx] [--skip-python] [--keep]
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
    ap.add_argument("--scale", type=int, default=20)
    ap.add_argument("--edgefactor", type=int, default=16)
    ap.add_argument("--out", default=None)
    ap.add_argument("--skip-python", action="store_true",
                    help="native-only timing (python parse of >100M lines "
                         "takes tens of minutes)")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    from graphblast_tpu.io.rmat import rmat_edges
    from graphblast_tpu.io import mmio
    from graphblast_tpu import native

    n = 1 << args.scale
    path = args.out or f"/tmp/rmat{args.scale}_{args.edgefactor}.mtx"

    t0 = time.perf_counter()
    rows, cols = rmat_edges(args.scale, args.edgefactor, seed=42)
    t_gen = time.perf_counter() - t0
    print(f"[gen] rmat{args.scale} ef{args.edgefactor}: {len(rows):,} raw "
          f"edges in {t_gen:.1f}s")

    t0 = time.perf_counter()
    mmio.write_mtx(path, rows, cols, None, n, n, field="pattern")
    t_write = time.perf_counter() - t0
    sz = os.path.getsize(path)
    print(f"[write] {path}: {sz / 1e9:.2f} GB in {t_write:.1f}s "
          f"({sz / t_write / 1e6:.0f} MB/s)")
    del rows, cols

    t0 = time.perf_counter()
    nat = native.read_mtx_native(path, directed=1, remove_self_loops=True)
    t_nat = time.perf_counter() - t0
    if nat is None:
        print("[native] parser unavailable (no toolchain?)", file=sys.stderr)
        return 2
    nr, nc, nv, nnr, nnc = nat
    print(f"[native] parsed+canonicalized {len(nr):,} edges in {t_nat:.1f}s "
          f"({sz / t_nat / 1e6:.0f} MB/s)")

    rc = 0
    if not args.skip_python:
        os.environ["GRB_NATIVE"] = "0"
        import importlib

        importlib.reload(native)   # honor the disable flag
        t0 = time.perf_counter()
        pr, pc, pv, pnr, pnc, _ = mmio.read_mtx(path, directed=1)
        t_py = time.perf_counter() - t0
        print(f"[python] parsed+canonicalized {len(pr):,} edges in "
              f"{t_py:.1f}s (native speedup {t_py / t_nat:.1f}x)")
        ok = (len(pr) == len(nr) and (pnr, pnc) == (nnr, nnc)
              and np.array_equal(pr, nr) and np.array_equal(pc, nc)
              and np.allclose(pv, nv))
        print(f"[parity] native == python: {'OK' if ok else 'MISMATCH'}")
        if not ok:
            rc = 1
        os.environ.pop("GRB_NATIVE", None)
        importlib.reload(native)

    if not args.keep:
        os.remove(path)
    return rc


if __name__ == "__main__":
    sys.exit(main())
