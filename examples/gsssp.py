#!/usr/bin/env python
"""SSSP driver (reference: example/gsssp.cu)."""
import sys

from _driver import run_driver


def main():
    from graphblast_tpu.algorithms import sssp, reference
    from graphblast_tpu.utils import verify_list_float

    def run(A, args, desc):
        return sssp(A, args.source, desc=desc, mode=args.mode).dense

    def cpu(A, args):
        return reference.sssp_cpu(A, args.source)

    def ver(A, got, want):
        return verify_list_float(got, want, "SSSP")

    return run_driver("gsssp", "Bellman-Ford SSSP", run, cpu, ver)


if __name__ == "__main__":
    sys.exit(main())
