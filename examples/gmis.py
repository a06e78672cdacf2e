#!/usr/bin/env python
"""Maximal-independent-set driver (reference: example/gmis.cu)."""
import sys

from _driver import run_driver


def main():
    from graphblast_tpu.algorithms import mis, verify_mis

    def run(A, args, desc):
        return mis(A, seed=args.seed, desc=desc, mode=args.mode).dense

    def ver(A, got, want):
        ok = verify_mis(A, got)
        print("MIS:", "CORRECT" if ok else "INCORRECT")
        return ok

    return run_driver("gmis", "maximal independent set (Luby)", run,
                      lambda A, args: True, ver)


if __name__ == "__main__":
    sys.exit(main())
