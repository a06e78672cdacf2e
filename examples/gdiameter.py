#!/usr/bin/env python
"""Diameter driver (reference: example/gdiameter.cu)."""
import sys

from _driver import run_driver


def main():
    import numpy as np

    from graphblast_tpu.algorithms import diameter, reference

    def run(A, args, desc):
        d, s = diameter(A, args.source_start, args.source_end, desc=desc)
        return np.asarray([d, s])

    def cpu(A, args):
        eccs = [int(reference.bfs_cpu(A, s).max()) - 1
                for s in range(args.source_start, args.source_end)]
        return np.asarray([max(eccs)])

    def ver(A, got, want):
        ok = int(got[0]) == int(want[0])
        print(f"DIAMETER: {int(got[0])} (source {int(got[1])}) "
              f"{'CORRECT' if ok else 'INCORRECT'}")
        return ok

    return run_driver("gdiameter", "pseudo-diameter BFS sweep", run, cpu, ver)


if __name__ == "__main__":
    sys.exit(main())
