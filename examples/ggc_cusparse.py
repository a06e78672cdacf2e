#!/usr/bin/env python
"""Independent-set graph-coloring driver (reference: example/ggc_cusparse.cu,
which calls graphColor() → cusparseScsrcolor, color.hpp:19-88).

There is no vendor coloring library on TPU; the re-derived equivalent is the
IS-coloring algorithm (the reference's own gcIS expresses csrcolor's
Luby/Jones-Plassmann IS scheme in pure GraphBLAS ops, gc.hpp:43-148), so this
driver is `ggc --gcalgo cusparse`, which routes to that implementation.
"""
import sys

from _driver import run_driver


def main():
    import numpy as np

    from graphblast_tpu.algorithms import gc, verify_gc

    def run(A, args, desc):
        return gc(A, seed=args.seed, max_colors=args.maxcolors, desc=desc,
                  algo="cusparse").dense

    def ver(A, got, want):
        ok = verify_gc(A, got)
        print(f"GC[{ {True: 'CORRECT', False: 'INCORRECT'}[ok] }]: "
              f"colors={int(np.max(got))}")
        return ok

    return run_driver("ggc_cusparse", "IS graph coloring (vendor-baseline "
                      "parity driver)", run, lambda A, args: True, ver)


if __name__ == "__main__":
    sys.exit(main())
