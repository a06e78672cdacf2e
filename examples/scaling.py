#!/usr/bin/env python
"""Multi-device scaling harness: edges/s at P = 1, 2, 4, 8 shards.

On a pod slice this measures real ICI scaling (BASELINE.md: >=70% linear
edges/s at v5p-16); without TPUs it runs on a virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8) to validate the
collective paths and report the harness's own overhead curve.

Usage: python examples/scaling.py [--scale 14] [--edgefactor 16] [--algo bfs]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

if "--tpu" not in sys.argv and os.environ.get("_GB_SCALING_REEXEC") != "1":
    # default to an 8-way virtual CPU mesh; --tpu uses the attached devices.
    # The environment must be set before the interpreter starts (this image's
    # sitecustomize pre-imports jax), so re-exec with it.
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["_GB_SCALING_REEXEC"] = "1"
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=13)
    ap.add_argument("--edgefactor", type=int, default=16)
    ap.add_argument("--algo", choices=["bfs", "pr", "sssp", "cc", "tc",
                                   "mis", "gc", "lgc"], default="bfs")
    ap.add_argument("--niter", type=int, default=3)
    ap.add_argument("--tpu", action="store_true", help="use real devices")
    args = ap.parse_args()

    import jax
    import numpy as np

    from graphblast_tpu.io.rmat import rmat_matrix
    from graphblast_tpu.parallel import (bfs_dist, cc_dist, gc_dist,
                                         lgc_dist, mis_dist, partition,
                                         pr_dist, sssp_dist, tc_dist)

    A = rmat_matrix(args.scale, args.edgefactor, seed=42)
    src = int(np.argmax(np.diff(np.asarray(A.row_ptr))))
    ndev = len(jax.devices())
    run = {"bfs": lambda m, Ash: bfs_dist(A, src, m, mode="pull", Ash=Ash),
           "pr": lambda m, Ash: pr_dist(A, m, Ash=Ash),
           "sssp": lambda m, Ash: sssp_dist(A, src, m, Ash=Ash),
           "cc": lambda m, Ash: cc_dist(A, m, Ash=Ash),
           "tc": lambda m, Ash: tc_dist(L, m, prep=tc_prep["p"]),
           "mis": lambda m, Ash: mis_dist(A, m, Ash=Ash),
           "gc": lambda m, Ash: gc_dist(A, m, Ash=Ash),
           "lgc": lambda m, Ash: lgc_dist(A, src, m, Ash=Ash)}[args.algo]
    if args.algo == "tc":
        from graphblast_tpu.operations import tril
        from graphblast_tpu.parallel import tc_prepare

        L = tril(A)
        tc_prep = {}

    print(f"algo={args.algo} n={A.nrows} nnz={A.nvals} devices={ndev}")
    print("P, ms/run, Medges/s, efficiency_vs_P1")
    base = None
    for P in (1, 2, 4, 8):
        if P > ndev:
            break
        mesh = jax.make_mesh((P,), ("x",), devices=jax.devices()[:P])
        if args.algo == "pr":
            from graphblast_tpu.algorithms.pr import prepare_pr_matrix

            Ash = partition(prepare_pr_matrix(A, 0.85), mesh)
        elif args.algo == "tc":
            Ash = partition(L, mesh)
            tc_prep["p"] = tc_prepare(L, mesh, Ash)
        else:
            Ash = partition(A, mesh)
        run(mesh, Ash)  # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.niter):
            out = run(mesh, Ash)
        dt = (time.perf_counter() - t0) / args.niter
        meps = A.nvals / dt / 1e6
        if base is None:
            base = meps
        print(f"{P}, {dt * 1e3:.1f}, {meps:.1f}, {meps / (base * P) * 100:.0f}%")


if __name__ == "__main__":
    sys.exit(main())
