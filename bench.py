#!/usr/bin/env python
"""Headline benchmark — prints the merged JSON line after EVERY stage.

Primary metric: direction-optimized BFS GTEPS (traversed edges/s, Graph500
convention: reached-component edge count / end-to-end BFS time) on an RMAT
graph, run on the real TPU chip. Secondary metrics (best-effort): SSSP GTEPS,
sustained pull-SpMV bandwidth, PageRank iterations/s, TC runtime, large-scale
BFS. vs_baseline is the BFS GTEPS ratio against a 1.0-GTEPS reference-class
GPU figure (the GraphBLAST paper's hardware era; its repo publishes no
numbers — BASELINE.md).

Timeout-proofing (VERDICT r2 next-#1 — r2 lost its number to a stage
timeout): the merged JSON line is (re)printed to stdout and mirrored to
BENCH_partial.json after every stage, so a timeout anywhere still leaves the
latest complete record as the LAST line on stdout; an on-TPU self-check
(kernels vs goldens) runs FIRST and its verdict ships in the JSON; heavier
stages run later under their own budgets, and the stage loop stops before
GRB_BENCH_TOTAL_TIMEOUT (default 5400 s) so the parent always finishes.

Process isolation: the tunneled TPU backend reliably serves a process's
FIRST large XLA compile and has been observed to wedge on subsequent ones,
so each stage runs in its own subprocess with a timeout
(GRB_BENCH_STAGE_TIMEOUT, default 900 s).

Usage: python bench.py [--scale N] [--edgefactor N]
                       [--stage selfcheck|bfs|bfs_pushpull|sssp|spmv|pr|tc]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

STAGE_TIMEOUT = float(os.environ.get("GRB_BENCH_STAGE_TIMEOUT", "900"))
TOTAL_TIMEOUT = float(os.environ.get("GRB_BENCH_TOTAL_TIMEOUT", "5400"))


def _host_degrees(A):
    """Row degrees without a device→host edge-array fetch (the relay moves
    ~0.5 MB/s; stashes are set by from_coo)."""
    host = getattr(A, "_host_csr", None)
    ptr = host[0] if host is not None else np.asarray(A.row_ptr)
    return np.diff(np.asarray(ptr)[: A.nrows + 1])


def _dispatch_overhead_s():
    """Fixed dispatch+block round-trip cost of this relay (~26 ms class),
    measured with a trivial jit so the big programs need only ONE compile
    (the r2 two-length marginal protocol doubled the compile bill and lost
    the round to it)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def tiny(x):
        return (x * 2 + 1)[0]

    x = jnp.arange(8, dtype=jnp.float32)
    np.asarray(tiny(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(tiny(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def run_stage(args, stage: str):
    """One metric in this process; prints a partial JSON dict."""
    import jax
    import jax.numpy as jnp

    from graphblast_tpu.io.rmat import rmat_matrix
    from graphblast_tpu.semiring import PlusMultipliesSemiring
    from graphblast_tpu.types import Direction, INDEX_DTYPE

    def log(*a):
        print(*a, file=sys.stderr, flush=True)

    dev = jax.devices()[0]

    if stage == "selfcheck":
        print(json.dumps(_selfcheck(args, log, dev)))
        return

    t0 = time.perf_counter()
    A = rmat_matrix(args.scale, args.edgefactor, seed=42)
    log(f"[{stage}] rmat{args.scale}: n={A.nrows} nnz={A.nvals} "
        f"({time.perf_counter() - t0:.1f}s) on {dev.device_kind}")
    deg = _host_degrees(A)
    sources = np.argsort(deg)[::-1][: args.sources].astype(np.int32)
    out = {"device": dev.device_kind, "n": A.nrows, "nnz": A.nvals}

    if stage in ("bfs", "bfs_pushpull"):
        from graphblast_tpu.algorithms.bfs import _bfs_fused
        from graphblast_tpu.ops.pallas.bilinear import plan_for_bitmap

        mode = (Direction.PULLONLY if stage == "bfs"
                else Direction.PUSHPULL)
        plan = plan_for_bitmap(A, transpose=True)
        log(f"[{stage}] pull kernel="
            f"{'bitmap-bilinear' if plan is not None else 'orpull'}")
        kw = dict(
            struconly=True,
            edge_cap=min(A.nnz_pad,
                         max(1024, int(A.nnz_pad * 0.5) // 1024 * 1024)),
            switchpoint=0.01, mode=mode, sort_push=True, max_niter=1000)

        # reached/reached_edges are reduced ON DEVICE to two scalars — a
        # full levels fetch is 8-67 MB over the ~0.5 MB/s relay (minutes of
        # the stage budget at scale 22/24)
        deg_dev = jnp.diff(A.row_ptr[: A.nrows + 1]).astype(jnp.int32)

        def _reach_stats(v):
            return (jnp.sum((v != 0).astype(jnp.int32)),
                    jnp.sum(jnp.where(v != 0, deg_dev, 0)))

        if A.nrows <= 2_000_000:
            # ONE compiled program serves correctness check + timing: scan
            # all sources (tiled ×2 to amortize the fixed dispatch cost) and
            # also return the first source's reach stats — a single compile
            # where r2's two-length marginal protocol needed two and lost
            # the round to the compile bill
            reps = max(2, 16 // max(len(sources), 1))
            s_all = np.tile(sources, reps).astype(np.int32)
            nruns = len(s_all) + 1   # the v0 run is computed each call too

            @jax.jit
            def run_all(srcs):
                v0, _ = _bfs_fused(A, srcs[0], plan, **kw)

                def body(c, s):
                    v, _ = _bfs_fused(A, s, plan, **kw)
                    return c + v[0] * 1e-30, ()
                c, _ = jax.lax.scan(body, jnp.asarray(0.0, jnp.float32),
                                    srcs)
                return (c,) + _reach_stats(v0)

            t0 = time.perf_counter()
            _, r0, re0 = run_all(jnp.asarray(s_all))
            reached, reached_edges = int(r0), int(re0)
            log(f"[{stage}] compiled+first run in "
                f"{time.perf_counter() - t0:.1f}s")

            def timed():
                t0 = time.perf_counter()
                np.asarray(run_all(jnp.asarray(s_all))[0])
                return time.perf_counter() - t0
        else:
            # scan-of-while-loops above ~2M vertices overloads the remote
            # compiler (observed broken pipe at scale 22) — per-dispatch
            # timing, overhead-corrected below
            single = jax.jit(
                lambda s: _reach_stats(_bfs_fused(A, s, plan, **kw)[0]))
            t0 = time.perf_counter()
            r0, re0 = single(jnp.asarray(int(sources[0]), INDEX_DTYPE))
            reached, reached_edges = int(r0), int(re0)
            log(f"[{stage}] compiled+first run in "
                f"{time.perf_counter() - t0:.1f}s")
            nruns = len(sources)

            def timed():
                t0 = time.perf_counter()
                for s in sources:
                    # fetching the reached scalar forces the full BFS
                    np.asarray(single(jnp.asarray(int(s), INDEX_DTYPE))[0])
                return time.perf_counter() - t0
        if reached < 2:
            raise RuntimeError(f"BFS reached only {reached} vertices — "
                               f"refusing to report a rate")
        log(f"[{stage}] reached={reached} reached_edges={reached_edges}")

        over = _dispatch_overhead_s()
        over_total = over * (1 if A.nrows <= 2_000_000 else len(sources))
        ts = [timed() for _ in range(3)]
        bfs_s = (min(ts) - over_total) / nruns
        log(f"[{stage}] {bfs_s * 1e3:.2f} ms/run "
            f"(batch {min(ts) * 1e3:.0f} ms − overhead "
            f"{over_total * 1e3:.0f} ms)")
        key = "bfs_gteps" if stage == "bfs" else "bfs_gteps_pushpull"
        out[key] = round(reached_edges / bfs_s / 1e9, 4)
        if stage == "bfs":
            out["bfs_gteps_total"] = round(A.nvals / bfs_s / 1e9, 4)
            out["bfs_mode"] = "pullonly"
        log(f"[{stage}] → {out[key]} GTEPS")

    elif stage == "sssp":
        from graphblast_tpu.algorithms.sssp import _sssp_fused
        from graphblast_tpu.ops.pallas.monopull import plan_for_monoid

        # MinimumPlus pull on the Pallas monoid kernel (None above the VMEM
        # residency limit → sorted-pipeline fallback inside mxv_dual)
        mplan = (plan_for_monoid(A, transpose=True)
                 if os.environ.get("GRB_MONOID_PULL", "1") == "1" else None)
        log(f"[sssp] pull kernel={'monoid' if mplan is not None else 'sorted'}")
        # two tiers: small push iterations were paying the 8M-tier sort
        # (measured 67.5 ms/run with (64,8) vs 101 ms with (8,))
        kw = dict(edge_cap=min(A.nnz_pad,
                               max(1024, int(A.nnz_pad * 0.5) // 1024 * 1024)),
                  switchpoint=0.01, mode=Direction.PUSHPULL, sort_push=True,
                  tiers=(64, 8), max_niter=1000)
        reps = max(2, 16 // max(len(sources), 1))
        s_all = np.tile(sources, reps).astype(np.int32)
        nruns = len(s_all) + 1   # the v0 run is computed each call too

        deg_dev = jnp.diff(A.row_ptr[: A.nrows + 1]).astype(jnp.int32)

        @jax.jit
        def run_all(srcs):
            v0, _ = _sssp_fused(A, srcs[0], mplan, **kw)

            def body(c, s):
                v, _ = _sssp_fused(A, s, mplan, **kw)
                return c + v[0] * 1e-30, ()
            c, _ = jax.lax.scan(body, jnp.asarray(0.0, jnp.float32), srcs)
            # unreachable sentinel is FLT_MAX (sssp.hpp:26 convention);
            # reach stats reduce on device — a full fetch is minutes of
            # relay time at big scales
            fin = v0 < jnp.finfo(jnp.float32).max
            return c, jnp.sum(jnp.where(fin, deg_dev, 0))

        t0 = time.perf_counter()
        _, re0 = run_all(jnp.asarray(s_all))
        reached_edges = int(re0)
        log(f"[sssp] compiled+first run in {time.perf_counter() - t0:.1f}s")

        over = _dispatch_overhead_s()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run_all(jnp.asarray(s_all))[0])
            ts.append(time.perf_counter() - t0)
        sssp_s = (min(ts) - over) / nruns
        # Graph500-style: edges of the reached component only
        out["sssp_gteps"] = round(reached_edges / sssp_s / 1e9, 4)
        out["sssp_gteps_total"] = round(A.nvals / sssp_s / 1e9, 4)
        log(f"[sssp] {sssp_s * 1e3:.2f} ms/run → {out['sssp_gteps']} GTEPS "
            f"(reached-component)")

    elif stage == "spmv":
        import functools

        from graphblast_tpu.ops.pallas.bilinear import plan_for, spmv_bilinear
        from graphblast_tpu.ops.spmv import spmv_pull_sorted

        x = jnp.ones((A.ncols,), jnp.float32)
        plan = plan_for(A, transpose=False)
        log(f"[spmv] kernel={'bilinear' if plan is not None else 'sorted'}")

        @functools.partial(jax.jit, static_argnums=(1,))
        def chain(x, reps):
            # marginal-cost protocol (CLAUDE.md): chain reps inside one jit
            # with a data dependence; per-dispatch relay overhead cancels in
            # the two-count difference below
            def body(c, _):
                if plan is not None:
                    y = spmv_bilinear(plan, c)
                else:
                    y = spmv_pull_sorted(A.row_ptr, A.csc_col_ind,
                                         A.csc_row_ind, A.csc_val, c,
                                         PlusMultipliesSemiring, A.nrows,
                                         A.nvals)
                return c + y * 1e-30, ()
            c, _ = jax.lax.scan(body, x, None, length=reps)
            return c[0]

        r1, r2 = 2, 2 + args.spmv_iters
        np.asarray(chain(x, r1))
        np.asarray(chain(x, r2))
        ts = []
        for r in (r1, r2, r1, r2):
            t0 = time.perf_counter()
            np.asarray(chain(x, r))
            ts.append(time.perf_counter() - t0)
        spmv_s = ((ts[1] + ts[3]) - (ts[0] + ts[2])) / (2 * (r2 - r1))
        bytes_moved = A.nnz_pad * (4 + 4 + 4) + A.nrows * 8
        out["spmv_gbs"] = round(bytes_moved / spmv_s / 1e9, 1)
        out["spmv_gteps"] = round(A.nvals / spmv_s / 1e9, 3)
        log(f"[spmv] {spmv_s * 1e3:.2f} ms → {out['spmv_gbs']} GB/s")

    elif stage == "tc":
        from graphblast_tpu.algorithms.tc import tc
        from graphblast_tpu.operations import tril

        # TC wants an undirected graph's lower triangle; RMAT here is
        # directed, which is fine for a rate metric (the masked-SpGEMM work
        # is Σ_{(i,j)∈L} deg(i), independent of the triangle total).
        L = tril(A)
        t0 = time.perf_counter()
        ntris = tc(L)   # warmup/compile
        log(f"[tc] compile+first run {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        ntris = tc(L)
        tc_s = time.perf_counter() - t0
        out["tc_ms"] = round(tc_s * 1e3, 1)
        out["tc_rate_meps"] = round(A.nvals / tc_s / 1e6, 1)
        out["tc_scale"] = args.scale
        log(f"[tc] ntris={ntris} {out['tc_ms']} ms "
            f"({out['tc_rate_meps']} M edges/s)")

    elif stage == "pr":
        from graphblast_tpu.algorithms.pr import (_pr_fused, prepare_pr_matrix,
                                                  prepare_pr_plan)

        plan = prepare_pr_plan(A, 0.85)
        Ap = A if plan is not None else prepare_pr_matrix(A, 0.85)
        log(f"[pr] kernel={'bilinear' if plan is not None else 'sorted'}")

        def run(iters):
            p, _, _ = _pr_fused(Ap, plan, alpha=0.85, eps=0.0,
                                max_niter=iters)
            return np.asarray(p)[0]  # real D2H fetch (relay acks lie)

        run(50)   # warmup/compile for both iteration counts
        run(10)
        ts = []
        for r in (10, 50, 10, 50):
            t0 = time.perf_counter()
            run(r)
            ts.append(time.perf_counter() - t0)
        per = ((ts[1] + ts[3]) - (ts[0] + ts[2])) / (2 * 40)
        out["pr_iters_per_s"] = round(1.0 / per, 2)
        log(f"[pr] {out['pr_iters_per_s']} iters/s")

    print(json.dumps(out))


def _selfcheck(args, log, dev):
    """On-TPU correctness gate (VERDICT r2 next-#1d): Pallas kernel outputs
    vs host goldens and fused algorithms vs CPU references, on the REAL
    chip (interpret-mode tests can't see Mosaic lowering bugs). Small scale
    keeps every compile small. Returns a dict for the merged JSON."""
    import jax
    import jax.numpy as jnp

    from graphblast_tpu.algorithms import reference
    from graphblast_tpu.algorithms.bfs import _bfs_fused
    from graphblast_tpu.algorithms.sssp import _sssp_fused
    from graphblast_tpu.io.rmat import rmat_matrix
    from graphblast_tpu.ops.pallas.bilinear import (plan_for, plan_for_bitmap,
                                                    spmv_bilinear,
                                                    spmv_bilinear_bitmap)
    from graphblast_tpu.ops.pallas.orpull import pack_bitmap
    from graphblast_tpu.types import Direction, INDEX_DTYPE

    scale = min(args.scale, 14)
    t0 = time.perf_counter()
    A = rmat_matrix(scale, args.edgefactor, seed=42)
    ptr, ind, val = A._host_csr
    n, m = A.nrows, A.nvals
    checks = {}

    # host CSR goldens (numpy, exact layout the kernels consume)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n).astype(np.float32)
    y_gold = np.zeros(n, np.float64)
    np.add.at(y_gold, np.repeat(np.arange(n), np.diff(ptr[: n + 1])),
              val[:m].astype(np.float64) * x[ind[:m]])

    # 1. f32 bilinear SpMV kernel — SOFT check: a failure here (e.g. the
    # r3 fori sweep failing to lower in Mosaic) must not kill the whole
    # selfcheck; the secondary-metric stages degrade on their own, and the
    # recorded FAIL string tells the story. The headline BFS path (bitmap
    # kernel + fused loops, checks 2-4) stays HARD-asserted.
    plan = plan_for(A, transpose=False)
    if plan is not None:
        try:
            y = np.asarray(jax.jit(spmv_bilinear, static_argnums=())(
                plan, jnp.asarray(x)))
            err = float(np.max(np.abs(y - y_gold) / (np.abs(y_gold) + 1.0)))
            checks["bilinear_err"] = round(err, 9)
            assert err < 1e-4, f"err {err}"
        except Exception as ex:
            checks["bilinear_err"] = f"FAIL: {type(ex).__name__}: {ex}"[:200]

    # 1b. windowed-DMA f32 kernel, forced at small scale — the dispatcher
    # only builds it above the VMEM residency limit, but its Mosaic
    # lowering (dynamic-offset HBM→VMEM window DMA) must be proven on the
    # chip before any scale-22+ value pull relies on it. Soft for the same
    # reason as 1.
    from graphblast_tpu.ops.pallas.bilinear import (build_plan_f32dma,
                                                    spmv_bilinear_dma)

    try:
        dplan = build_plan_f32dma(ptr, ind, val, n, n)
        yd = np.asarray(jax.jit(spmv_bilinear_dma)(dplan, jnp.asarray(x)))
        errd = float(np.max(np.abs(yd - y_gold) / (np.abs(y_gold) + 1.0)))
        checks["bilinear_dma_err"] = round(errd, 9)
        assert errd < 1e-4, f"err {errd}"
    except Exception as ex:
        checks["bilinear_dma_err"] = f"FAIL: {type(ex).__name__}: {ex}"[:200]

    # 2. bitmap or-pull kernel (the headline BFS pull): frontier neighbor
    # counts. The r3 pruned-fori sweep was never hardware-lowered; if it
    # fails here, fall back to the r2-proven unrolled sweep, PIN it for
    # every later stage via sweep_pick, and keep going — only a failure of
    # BOTH variants hard-fails the selfcheck.
    sweep_forced = None
    bplan = plan_for_bitmap(A, transpose=False)
    if bplan is not None:
        f = (rng.random(n) < 0.05).astype(np.float32)
        cnt_gold = np.zeros(n, np.int64)
        np.add.at(cnt_gold, np.repeat(np.arange(n), np.diff(ptr[: n + 1])),
                  f[ind[:m]].astype(np.int64))
        wbits = pack_bitmap(jnp.asarray(f))
        try:
            cnt = np.asarray(spmv_bilinear_bitmap(bplan, wbits))
            bad = int((cnt[:n] != cnt_gold).sum())
            assert bad == 0, f"{bad} mismatched counts"
            checks["bitmap_mismatch"] = bad
        except Exception as ex:
            checks["bitmap_default_sweep"] = (
                f"FAIL: {type(ex).__name__}: {ex}"[:200])
            cnt = np.asarray(spmv_bilinear_bitmap(bplan, wbits,
                                                  sweep="unroll"))
            bad = int((cnt[:n] != cnt_gold).sum())
            assert bad == 0, f"bitmap kernel (unroll): {bad} mismatches"
            checks["bitmap_mismatch"] = bad
            sweep_forced = "unroll"
            os.environ["GRB_BILINEAR_SWEEP"] = "unroll"  # this process

    # 3. fused BFS (bitmap pull + tiered push) vs CPU golden
    deg = np.diff(ptr[: n + 1])
    src = int(np.argmax(deg))
    tplan = plan_for_bitmap(A, transpose=True)
    kw = dict(struconly=True,
              edge_cap=min(A.nnz_pad,
                           max(1024, int(A.nnz_pad * 0.5) // 1024 * 1024)),
              switchpoint=0.01, sort_push=True, max_niter=1000)
    want = reference.bfs_cpu(A, src)
    for mode, name in ((Direction.PULLONLY, "pull"),
                       (Direction.PUSHPULL, "pushpull")):
        v, _ = _bfs_fused(A, jnp.asarray(src, INDEX_DTYPE), tplan,
                          mode=mode, **kw)
        bad = int((np.asarray(v) != want).sum())
        checks[f"bfs_{name}_mismatch"] = bad
        assert bad == 0, f"BFS {name}: {bad} wrong levels"

    # 4. fused SSSP vs CPU golden — tried FIRST on the r3 Pallas monoid
    # pull (never hardware-lowered while the relay was down); a lowering
    # failure there falls back to the sorted pipeline and pins the monoid
    # plan OFF for the timed sssp stage (mono_pick). The golden comparison
    # stays HARD either way.
    from graphblast_tpu.ops.pallas.monopull import plan_for_monoid

    mono_pick = None

    def _run_sssp(p):
        vs, _ = _sssp_fused(A, jnp.asarray(src, INDEX_DTYPE), p,
                            edge_cap=kw["edge_cap"], switchpoint=0.01,
                            mode=Direction.PUSHPULL, sort_push=True,
                            tiers=(64, 8), max_niter=1000)
        return np.asarray(vs)

    try:
        vs = _run_sssp(plan_for_monoid(A, transpose=True))
        checks["sssp_monoid"] = "ok"
    except Exception as ex:
        checks["sssp_monoid"] = f"FAIL: {type(ex).__name__}: {ex}"[:200]
        vs = _run_sssp(None)
        mono_pick = "off"
    want_d = reference.sssp_cpu(A, src)
    errs = np.abs(vs - want_d)
    finite = want_d < np.finfo(np.float32).max
    bad = int((errs[finite] > 1e-3 * np.maximum(want_d[finite], 1)).sum()
              + (vs[~finite] < np.finfo(np.float32).max).sum())
    checks["sssp_mismatch"] = bad
    assert bad == 0, f"SSSP: {bad} wrong distances"

    # 5. sparse masked-SpGEMM TC (min-side sort-join) vs CPU golden — the
    # tc/tc20 stages time this exact path but never check its count. SOFT:
    # a failure records the string; the tc stages carry their own crash
    # handling and the headline BFS is unaffected.
    try:
        from graphblast_tpu.algorithms.tc import tc as _tc, tc_cpu as _tc_cpu
        from graphblast_tpu.operations import tril as _tril

        os.environ["GRB_TC_DENSE_LIMIT"] = "1"   # force the sort-join path
        try:
            Lc = _tril(A)
            got_tc = int(_tc(Lc))
            want_tc = int(_tc_cpu(Lc))
            checks["tc_sparse_delta"] = got_tc - want_tc
            assert got_tc == want_tc, f"tc {got_tc} != golden {want_tc}"
        finally:
            os.environ.pop("GRB_TC_DENSE_LIMIT", None)
    except Exception as ex:
        checks["tc_sparse_delta"] = f"FAIL: {type(ex).__name__}: {ex}"[:200]

    # pick the window-sweep variant for the TIMED stages: the r3 pruned
    # fori sweep is expected faster but was never hardware-measured (the
    # relay was down); a cheap timed comparison here protects the headline
    # from an unmeasured-default regression. Only when the user didn't pin.
    pick = {}
    if mono_pick is not None:
        pick["mono_pick"] = mono_pick
    if sweep_forced is not None:
        pick["sweep_pick"] = sweep_forced
    elif bplan is not None and "GRB_BILINEAR_SWEEP" not in os.environ:
        f32b = (rng.random(n) < 0.3).astype(np.float32)
        wb = pack_bitmap(jnp.asarray(f32b))
        times = {}
        for sw in ("fori", "unroll"):
            np.asarray(spmv_bilinear_bitmap(bplan, wb, sweep=sw))  # compile
            t1 = time.perf_counter()
            for _ in range(5):
                out_w = spmv_bilinear_bitmap(bplan, wb, sweep=sw)
            np.asarray(out_w)
            times[sw] = time.perf_counter() - t1
        best = min(times, key=times.get)
        checks["sweep_times_ms"] = {k: round(v * 200, 2)
                                    for k, v in times.items()}
        pick["sweep_pick"] = best

    soft_fails = [k for k, v in checks.items()
                  if isinstance(v, str) and v.startswith("FAIL")]
    status = "ok" if not soft_fails else f"soft-fail:{','.join(soft_fails)}"
    log(f"[selfcheck] rmat{scale} kernels+algorithms verified on "
        f"{dev.device_kind} in {time.perf_counter() - t0:.1f}s "
        f"({status}): {checks}")
    return {"selfcheck": status, "selfcheck_scale": scale,
            "device": dev.device_kind, **pick,
            **{f"check_{k}": v for k, v in checks.items()}}


def _emit(merged, args):
    """(Re)build the single driver line and print it NOW — a later stage
    timing out must never cost the record (VERDICT r2 next-#1a)."""
    bfs = merged.get("bfs_gteps", 0.0)
    result = {
        "metric": f"bfs_gteps_rmat{args.scale}",
        "value": bfs,
        "unit": "GTEPS",
        "vs_baseline": bfs,
    }
    # every check_* key ships in the record (they're small scalars, or FAIL
    # strings when a soft kernel check tripped — the whole point of the
    # selfcheck is that its verdict reaches the driver line)
    for k in sorted(merged):
        if k.startswith("check_"):
            result[k] = merged[k]
    for k in ("selfcheck", "sweep_pick", "mono_pick",
              "bfs_gteps_total", "bfs_gteps_pushpull",
              "bfs_mode", "sssp_gteps", "sssp_gteps_total",
              "spmv_gbs", "spmv_gteps", "pr_iters_per_s",
              "tc_ms", "tc_rate_meps", "tc_scale",
              "tc_ms_rmat20", "tc_rate_meps_rmat20",
              "bfs_gteps_rmat22", "bfs_gteps_total_rmat22",
              "spmv_gbs_rmat22", "spmv_gteps_rmat22",
              "bfs_gteps_rmat24", "bfs_gteps_total_rmat24",
              "device", "n", "nnz", "stages_done", "stages_skipped"):
        if k in merged:
            result[k] = merged[k]
    line = json.dumps(result)
    print(line, flush=True)
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_partial.json"), "w") as fh:
            fh.write(line + "\n")
    except OSError:
        pass
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=18)
    ap.add_argument("--edgefactor", type=int, default=16)
    ap.add_argument("--sources", type=int, default=8)
    ap.add_argument("--spmv-iters", type=int, default=20)
    ap.add_argument("--stage", choices=["selfcheck", "bfs", "bfs_pushpull",
                                        "sssp", "spmv", "pr", "tc"])
    ap.add_argument("--json-only", action="store_true")
    args = ap.parse_args()

    if args.stage:
        return run_stage(args, args.stage)

    t_start = time.perf_counter()
    # Relay liveness probe (the axon tunnel has been observed DOWN for hours:
    # backend init then hangs, and without this every stage would burn its
    # full 900-s timeout against a dead relay). A trivial jit must answer
    # within GRB_BENCH_PROBE_TIMEOUT (default 300 s, covering relay startup);
    # on failure only the headline BFS stage is still attempted (in case the
    # relay returns mid-run) before emitting the record and exiting.
    probe_tmo = float(os.environ.get("GRB_BENCH_PROBE_TIMEOUT", "300"))
    try:
        subprocess.run(
            [sys.executable, "-c",
             "import jax, numpy as np, jax.numpy as jnp;"
             "print(np.asarray(jax.jit(lambda x: x * 2 + 1)"
             "(jnp.arange(8.0))[0]))"],
            capture_output=True, timeout=probe_tmo, check=True)
        device_up = True
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
        device_up = False
        print(f"[probe] TPU relay unreachable within {probe_tmo:.0f}s — "
              "attempting headline BFS only", file=sys.stderr, flush=True)
    # (stage key, real stage, scale, sources, timeout multiplier) — ordered
    # cheapest/most-valuable compile first so early results always land
    plan = [
        ("selfcheck", "selfcheck", args.scale, 1, 1.0),
        ("bfs", "bfs", args.scale, args.sources, 1.0),
        ("spmv", "spmv", args.scale, 1, 1.0),
        ("pr", "pr", args.scale, 1, 1.0),
        ("sssp", "sssp", args.scale, args.sources, 1.0),
        ("bfs_pushpull", "bfs_pushpull", args.scale, args.sources, 1.0),
        # tc keeps the 2x stage budget: the dense block-pair fallback's cold
        # compile measured ~10 min (CLAUDE.md), and the sort-join's remote
        # compile variance is unmeasured this round (relay down)
        ("tc", "tc", min(args.scale, 18), 1, 2.0),
        ("tc15", "tc", 15, 1, 2.0),   # fallback: records a TC number even
        #                               if the scale-18 stage times out
        ("tc20", "tc", 20, 1, 2.0),   # opportunistic: only after a FAST tc18
        #                               (min-side sort-join, VERDICT r2 #4)
        ("bfs22", "bfs", 22, 2, 2.0),
        ("spmv22", "spmv", 22, 1, 2.0),   # value SpMV above the VMEM limit:
        #                                   exercises the windowed-DMA plan
        ("bfs24", "bfs", 24, 1, 2.0),
    ]
    merged = {"stages_done": [], "stages_skipped": []}
    if not device_up:
        merged["device"] = "unreachable"
        merged["stages_skipped"] += [f"{p[0]}:relay_down" for p in plan
                                     if p[0] != "bfs"]
        plan = [p for p in plan if p[0] == "bfs"]
    for stage, real_stage, stage_scale, nsources, mult in plan:
        if stage in ("bfs22", "spmv22", "bfs24") and args.scale >= stage_scale:
            continue   # main scale already covers it
        if stage == "tc15" and ("tc_ms" in merged or args.scale <= 15):
            continue   # scale-18 TC landed (or was already the main run)
        if stage == "tc20" and not (merged.get("tc_scale") == 18
                                    and merged.get("tc_ms", 1e9) < 120_000):
            continue   # only chase scale 20 when 18 ran AND was fast
        tmo = STAGE_TIMEOUT * mult
        remaining = TOTAL_TIMEOUT - (time.perf_counter() - t_start)
        if remaining < 180:
            merged["stages_skipped"].append(f"{stage}:budget")
            continue
        tmo = min(tmo, remaining - 60)
        cmd = [sys.executable, "-u", os.path.abspath(__file__),
               "--stage", real_stage, "--scale", str(stage_scale),
               "--edgefactor", str(args.edgefactor),
               "--sources", str(nsources),
               "--spmv-iters", str(args.spmv_iters)]
        env = dict(os.environ)
        if merged.get("sweep_pick") and "GRB_BILINEAR_SWEEP" not in os.environ:
            env["GRB_BILINEAR_SWEEP"] = merged["sweep_pick"]
        if (merged.get("mono_pick") == "off"
                and "GRB_MONOID_PULL" not in os.environ):
            env["GRB_MONOID_PULL"] = "0"
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=tmo, env=env)
            if not args.json_only:
                sys.stderr.write(proc.stderr)
                sys.stderr.flush()
            line = (proc.stdout.strip().splitlines()[-1]
                    if proc.stdout.strip() else "")
            if proc.returncode != 0 or not line.startswith("{"):
                # a crashed stage (assert, OOM, backend error) must never
                # masquerade as a clean run in stages_done
                merged["stages_skipped"].append(f"{stage}:rc{proc.returncode}")
                print(f"[{stage}] stage exited rc={proc.returncode} with "
                      f"{'no JSON' if not line else 'bad output'} — skipped",
                      file=sys.stderr, flush=True)
                _emit(merged, args)
                continue
            vals = json.loads(line)
            if stage in ("tc", "tc15"):
                # tc may run on a capped scale — don't clobber n/nnz/device
                vals = {k: v for k, v in vals.items() if k.startswith("tc_")}
            elif stage == "tc20":
                vals = {f"{k}_rmat20": v for k, v in vals.items()
                        if k in ("tc_ms", "tc_rate_meps")}
            elif stage in ("bfs22", "bfs24"):
                sfx = stage[3:]
                vals = {f"{k}_rmat{sfx}": v for k, v in vals.items()
                        if k.startswith("bfs_gteps")}
            elif stage == "spmv22":
                vals = {f"{k}_rmat22": v for k, v in vals.items()
                        if k.startswith("spmv_")}
            elif stage == "bfs_pushpull":
                vals = {k: v for k, v in vals.items()
                        if k == "bfs_gteps_pushpull"}
            merged.update(vals)
            merged["stages_done"].append(stage)
        except subprocess.TimeoutExpired:
            merged["stages_skipped"].append(f"{stage}:timeout")
            print(f"[{stage}] stage timed out after {tmo:.0f}s — skipped",
                  file=sys.stderr, flush=True)
        except Exception as ex:
            merged["stages_skipped"].append(f"{stage}:{type(ex).__name__}")
            print(f"[{stage}] stage failed: {type(ex).__name__}: {ex}",
                  file=sys.stderr, flush=True)
        if stage == "selfcheck" and "selfcheck" not in merged:
            # the whole selfcheck died (crash/timeout): pin the r2-proven
            # unrolled sweep for every timed stage rather than trusting the
            # unmeasured fori default
            merged.setdefault("sweep_pick", "unroll")
            merged.setdefault("mono_pick", "off")
        _emit(merged, args)
    _emit(merged, args)


if __name__ == "__main__":
    main()
