#!/usr/bin/env python
"""Local-graph-clustering driver (reference: example/glgc.cu)."""
import sys

from _driver import run_driver


def main():
    from graphblast_tpu.algorithms import lgc, reference
    from graphblast_tpu.utils import verify_list_float

    def add_args(p):
        p.set_defaults(alpha=0.15)

    def run(A, args, desc):
        return lgc(A, args.source, alpha=args.alpha, eps=args.eps,
                   desc=desc).dense

    def cpu(A, args):
        return reference.lgc_cpu(A, args.source, alpha=args.alpha,
                                 eps=args.eps, max_niter=args.max_niter)

    def ver(A, got, want):
        return verify_list_float(got, want, "LGC")

    return run_driver("glgc", "local graph clustering (PPR push)", run, cpu,
                      ver, extra_args=add_args)


if __name__ == "__main__":
    sys.exit(main())
