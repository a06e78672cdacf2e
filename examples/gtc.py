#!/usr/bin/env python
"""Triangle-counting driver (reference: example/gtc.cu, incl. the tril
preprocessing at gtc.cu:80-82)."""
import sys

from _driver import run_driver


def main():
    from graphblast_tpu.algorithms import tc, reference
    from graphblast_tpu import tril
    import numpy as np

    state = {}

    def run(A, args, desc):
        L = state.setdefault("L", tril(A))
        n = tc(L, desc=desc)
        state["ntris"] = n
        return np.asarray([n])

    def cpu(A, args):
        L = state.setdefault("L", tril(A))
        return np.asarray([reference.tc_cpu(L)])

    def ver(A, got, want):
        ok = int(got[0]) == int(want[0])
        print(f"TC: ntris={int(got[0])} golden={int(want[0])} "
              f"{'CORRECT' if ok else 'INCORRECT'}")
        return ok

    return run_driver("gtc", "triangle counting (masked SpGEMM)", run, cpu, ver)


if __name__ == "__main__":
    sys.exit(main())
