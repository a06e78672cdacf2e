#!/usr/bin/env python
"""PageRank driver (reference: example/gpr.cu, incl. the alpha/outdegree
matrix prep at gpr.cu:82-98)."""
import sys

from _driver import run_driver


def main():
    from graphblast_tpu.algorithms import pr, reference
    from graphblast_tpu.utils import verify_list_float

    def run(A, args, desc):
        return pr(A, alpha=args.alpha, eps=args.eps, desc=desc,
                  mode=args.mode).dense

    def cpu(A, args):
        return reference.pr_cpu(A, alpha=args.alpha, eps=args.eps * 1e-3,
                                max_niter=args.max_niter)

    def ver(A, got, want):
        return verify_list_float(got, want, "PR", tol=1e-2)

    return run_driver("gpr", "PageRank", run, cpu, ver)


if __name__ == "__main__":
    sys.exit(main())
