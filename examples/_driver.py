"""Shared example-driver machinery (reference: example/gbfs.cu:22-124 flow):

    parseArgs → readMtx → build Matrix → CPU golden → warmup run →
    VERIFY vs golden → --niter benchmark loop → timing summary row

The summary row mirrors the reference's `cpu, warmup, tight` ms print
(gbfs.cu:110-115) plus edges/s."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("JAX_PLATFORM_NAME") == "cpu":
    # Skip axon TPU plugin initialization entirely: when the relay tunnel is
    # down, plugin init HANGS during backend discovery even though cpu would
    # be selected — jax_platforms=cpu avoids touching it (conftest.py idiom)
    jax.config.update("jax_platforms", "cpu")


def run_driver(name, description, run_fn, cpu_fn, verify_fn, extra_args=None):
    """run_fn(A, args, desc) -> result array; cpu_fn(A, args) -> golden;
    verify_fn(A, got, want) -> bool."""
    from graphblast_tpu.utils import cli

    parser = cli.build_parser(name, description)
    if extra_args:
        extra_args(parser)
    args = parser.parse_args()
    desc = cli.descriptor_from_args(args)

    t0 = time.perf_counter()
    A = cli.load_graph(args)
    build_ms = (time.perf_counter() - t0) * 1000
    print(f"{name}: {args.mtx} n={A.nrows} nnz={A.nvals} build={build_ms:.1f}ms")

    # CPU golden (reference: gbfs.cu:74-76 bfsCpu)
    want = None
    cpu_ms = 0.0
    if not args.skip_cpu_verify and cpu_fn is not None:
        t0 = time.perf_counter()
        want = cpu_fn(A, args)
        cpu_ms = (time.perf_counter() - t0) * 1000

    # warmup (compile) run — gbfs.cu:80-88
    t0 = time.perf_counter()
    got = run_fn(A, args, desc)
    jax.block_until_ready(got)
    warmup_ms = (time.perf_counter() - t0) * 1000

    ok = True
    if want is not None:
        ok = verify_fn(A, got, want)

    # benchmark loop — gbfs.cu:102-115 (optionally under a profiler trace,
    # the cudaProfilerStart/Stop analog — gbfs.cu:98,106)
    from graphblast_tpu.utils.profiling import trace

    with trace(getattr(args, "profile", None)):
        t0 = time.perf_counter()
        for _ in range(args.niter):
            got = run_fn(A, args, desc)
        jax.block_until_ready(got)
        tight_ms = (time.perf_counter() - t0) * 1000 / max(args.niter, 1)

    eps = A.nvals / (tight_ms * 1e-3) if tight_ms > 0 else float("inf")
    print(f"cpu, warmup, tight, GTEPS")
    print(f"{cpu_ms:.3f}, {warmup_ms:.3f}, {tight_ms:.3f}, {eps / 1e9:.4f}")
    return 0 if ok else 1
