#!/usr/bin/env python
"""Connected-components driver (reference: example/gcc.cu)."""
import sys

from _driver import run_driver


def main():
    from graphblast_tpu.algorithms import cc, verify_cc

    def run(A, args, desc):
        return cc(A, seed=args.seed, desc=desc, mode=args.mode).dense

    def ver(A, got, want):
        ok = verify_cc(A, got)
        print("CC:", "CORRECT" if ok else "INCORRECT")
        return ok

    # property verifier instead of exact golden (reference: gcc.cu verifyCc)
    return run_driver("gcc", "connected components (FastSV)", run,
                      lambda A, args: True, ver)


if __name__ == "__main__":
    sys.exit(main())
