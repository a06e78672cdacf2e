#!/usr/bin/env python
"""Graph-coloring driver (reference: example/ggc.cu + ggc_cusparse.cu;
--gcalgo selects is|mis|jp|cusparse)."""
import sys

from _driver import run_driver


def main():
    import numpy as np

    from graphblast_tpu.algorithms import gc, verify_gc

    def run(A, args, desc):
        return gc(A, seed=args.seed, max_colors=args.maxcolors, desc=desc,
                  algo=args.gcalgo).dense

    def ver(A, got, want):
        ok = verify_gc(A, got)
        print(f"GC[{ {True:'CORRECT',False:'INCORRECT'}[ok] }]: "
              f"colors={int(np.max(got))}")
        return ok

    return run_driver("ggc", "graph coloring", run, lambda A, args: True, ver)


if __name__ == "__main__":
    sys.exit(main())
