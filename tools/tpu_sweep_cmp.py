#!/usr/bin/env python
"""One-compile-per-variant sweep comparison on the real chip.

The r3 variant tools compile 3 programs per variant (single + chain×2);
at the 2026-08-19 remote-compile latency (~600 s/program) that is an hour
per comparison. This tool compiles ONE dynamic-reps chain per variant
(lax.fori_loop with a traced trip count), times it at two rep counts
(marginal-cost protocol — dispatch overhead cancels), and golden-checks
the first iteration's output captured inside the same program.

Usage:
  python tools/tpu_sweep_cmp.py bitmap 18 bank unroll
  python tools/tpu_sweep_cmp.py value  18 bank:hilo:p2 unroll:hilo:p2
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from graphblast_tpu.io.rmat import rmat_matrix

kind = sys.argv[1]
scale = int(sys.argv[2])
variants = sys.argv[3:]
R1, R2 = 2, 12


def log(*a):
    print(*a, flush=True)


A = rmat_matrix(scale, 16, seed=42)
log(f"rmat{scale}: n={A.nrows} nnz={A.nvals}")
rng = np.random.default_rng(1)
n = A.nrows

if kind == "bitmap":
    from graphblast_tpu.ops.pallas.bilinear import (plan_for_bitmap,
                                                    spmv_bilinear_bitmap)
    from graphblast_tpu.ops.pallas.orpull import pack_bitmap

    t0 = time.perf_counter()
    plan = plan_for_bitmap(A, transpose=True)
    log(f"plan: m_pad={plan.m_pad} (pad {plan.m_pad / A.nvals - 1:+.1%}) "
        f"({time.perf_counter() - t0:.1f}s)")
    f_h = (rng.random(n) < 0.3).astype(np.float32)
    w0 = pack_bitmap(jnp.asarray(f_h))
    cptr = np.asarray(A._host_csc[0]).astype(np.int64)
    crow = np.asarray(A._host_csc[1])[: A.nvals]
    yref = np.zeros(A.ncols, np.int64)
    np.add.at(yref, np.repeat(np.arange(A.ncols), np.diff(cptr)),
              (f_h[crow] != 0).astype(np.int64))

    def make(sw):
        @jax.jit
        def chain(w, reps):
            def body(i, st):
                c, y1 = st
                y = spmv_bilinear_bitmap(plan, c, sweep=sw)
                y1 = jnp.where(i == 0, y, y1)
                # data-dependence perturbation: flip low bits of the first
                # len(c) words from the counts so XLA cannot hoist the loop
                return (c ^ (y[: c.shape[0]].astype(jnp.int32) & 1), y1)
            return jax.lax.fori_loop(
                0, reps, body,
                (w, jnp.zeros((plan.n_out,), jnp.int32)))
        return chain

    def check(y1):
        return int((np.asarray(y1) != yref).sum())

elif kind == "value":
    from graphblast_tpu.ops.pallas.bilinear import plan_for, spmv_bilinear

    t0 = time.perf_counter()
    plan = plan_for(A, transpose=False)
    log(f"plan built ({time.perf_counter() - t0:.1f}s)")
    x_h = rng.standard_normal(n).astype(np.float32)
    ptr, ind, val = (np.asarray(a) for a in A._host_csr)
    m = A.nvals
    yref = np.zeros(n, np.float64)
    np.add.at(yref, np.repeat(np.arange(n), np.diff(ptr[: n + 1])),
              val[:m].astype(np.float64) * x_h[ind[:m]])
    w0 = jnp.asarray(x_h)

    def make(variant):
        parts = variant.split(":")
        sw = parts[0]
        mm = parts[1] if len(parts) > 1 else "hilo"

        @jax.jit
        def chain(x, reps):
            def body(i, st):
                c, y1 = st
                y = spmv_bilinear(plan, c, matmul=mm, sweep=sw)
                y1 = jnp.where(i == 0, y, y1)
                return (c + y * 1e-30, y1)
            return jax.lax.fori_loop(
                0, reps, body, (x, jnp.zeros((plan.n_out,), jnp.float32)))
        return chain

    def check(y1):
        y = np.asarray(y1).astype(np.float64)
        return float(np.max(np.abs(y - yref) / (np.abs(yref) + 1.0)))
else:
    raise SystemExit(f"unknown kind {kind}")

bytes_eff = A.nnz_pad * 12 + n * 8
for variant in variants:
    chain = make(variant)
    t0 = time.perf_counter()
    c, y1 = chain(w0, R1)
    np.asarray(jnp.ravel(c)[0])
    t_c = time.perf_counter() - t0
    verdict = check(y1)
    ts = []
    for r in (R1, R2, R1, R2):
        t0 = time.perf_counter()
        np.asarray(jnp.ravel(chain(w0, r)[0])[0])
        ts.append(time.perf_counter() - t0)
    per = ((ts[1] + ts[3]) - (ts[0] + ts[2])) / (2 * (R2 - R1))
    log(f"[{variant:18s}] golden={verdict} {per * 1e3:.2f} ms/iter "
        f"{A.nvals / per / 1e9:.2f} Gedge/s {bytes_eff / per / 1e9:.1f} GB/s"
        f" (compile+first {t_c:.0f}s)")
