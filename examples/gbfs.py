#!/usr/bin/env python
"""BFS driver (reference: example/gbfs.cu)."""
import sys

from _driver import run_driver


def main():
    from graphblast_tpu.algorithms import bfs, reference
    from graphblast_tpu.utils import verify_list

    def run(A, args, desc):
        return bfs(A, args.source, desc=desc, mode=args.mode).dense

    def cpu(A, args):
        return reference.bfs_cpu(A, args.source)

    def ver(A, got, want):
        return verify_list(got, want, "BFS")

    return run_driver("gbfs", "direction-optimized BFS", run, cpu, ver)


if __name__ == "__main__":
    sys.exit(main())
