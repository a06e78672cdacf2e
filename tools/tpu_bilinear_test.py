#!/usr/bin/env python
"""On-TPU validation + timing of the bilinear SpMV vs the sorted pipeline.

Timing protocol (CLAUDE.md): chain reps inside ONE jit via lax.scan with a
data-dependent carry, fetch one scalar, diff two rep counts.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from graphblast_tpu.io.rmat import rmat_matrix
from graphblast_tpu.ops.pallas.bilinear import build_plan, spmv_bilinear
from graphblast_tpu.ops.spmv import spmv_pull_sorted
from graphblast_tpu.semiring import PlusMultipliesSemiring

scale = int(sys.argv[1]) if len(sys.argv) > 1 else 18


def log(*a):
    print(*a, flush=True)


t0 = time.perf_counter()
A = rmat_matrix(scale, 16, seed=42)
log(f"rmat{scale}: n={A.nrows} nnz={A.nvals} ({time.perf_counter()-t0:.1f}s)")

t0 = time.perf_counter()
import os
cache = f"/tmp/bil_host_{scale}.npz"
if os.path.exists(cache):
    z = np.load(cache)
    ptr_np, ind_np, val_np = z["ptr"], z["ind"], z["val"]
else:
    ptr_np = np.asarray(A.row_ptr)   # D2H over the tunnel is slow (~170s)
    ind_np = np.asarray(A.col_ind)
    val_np = np.asarray(A.val)
    np.savez(cache, ptr=ptr_np, ind=ind_np, val=val_np)
plan = build_plan(ptr_np, ind_np, val_np, A.nrows, A.ncols)
log(f"plan: m_pad={plan.m_pad} (pad {plan.m_pad/A.nvals-1:+.1%}) "
    f"({time.perf_counter()-t0:.1f}s)")

rng = np.random.default_rng(1)
x_h = rng.standard_normal(A.ncols).astype(np.float32)
x = jnp.asarray(x_h)

# float64 host reference
m = A.nvals
rows_h = np.repeat(np.arange(A.nrows), np.diff(ptr_np.astype(np.int64)))
y64 = np.zeros(A.nrows, np.float64)
np.add.at(y64, rows_h, val_np[:m].astype(np.float64) * x_h[ind_np[:m]].astype(np.float64))
den = np.abs(y64).max()

# variant sweep (r3: chi-sorted fori pruning × hilo bf16 scatter × 2-edge
# column packing); select combos on the command line to bound the compile
# bill, e.g.
#   python tools/tpu_bilinear_test.py 18 fori:hilo:p2 unroll:highest sorted
combos = [a for a in sys.argv[2:]] or [
    "unroll:highest", "fori:highest", "fori:hilo", "fori:hilo:p2", "sorted"]

plans = {1: plan}


def plan_packed(k: int = 2):
    if k not in plans:
        t0 = time.perf_counter()
        plans[k] = build_plan(ptr_np, ind_np, val_np, A.nrows, A.ncols,
                              pack=k)
        log(f"pack={k} plan: m_pad={plans[k].m_pad} cols "
            f"(grouping {plans[k].m_pad * k / plan.m_pad:.2f}x edge slots vs "
            f"unpacked) ({time.perf_counter()-t0:.1f}s)")
    return plans[k]


def chain_for(sweep_mode, mm, p):
    @functools.partial(jax.jit, static_argnums=(1,))
    def chain(x, reps):
        def body(c, _):
            y = spmv_bilinear(p, c, matmul=mm, sweep=sweep_mode)
            return c + y * 1e-30, ()
        c, _ = jax.lax.scan(body, x, None, length=reps)
        return c[0]
    return chain


@functools.partial(jax.jit, static_argnums=(1,))
def chain_old(x, reps):
    def body(c, _):
        y = spmv_pull_sorted(A.row_ptr, A.csc_col_ind, A.csc_row_ind,
                             A.csc_val, c, PlusMultipliesSemiring,
                             A.nrows, A.nvals)
        return c + y * 1e-30, ()
    c, _ = jax.lax.scan(body, x, None, length=reps)
    return c[0]


def marginal(fn, r1, r2):
    np.asarray(fn(x, r1))   # warm (compile) both rep variants
    np.asarray(fn(x, r2))
    ts = []
    for r in (r1, r2, r1, r2):
        t0 = time.perf_counter()
        np.asarray(fn(x, r))
        ts.append(time.perf_counter() - t0)
    per = ((ts[1] + ts[3]) - (ts[0] + ts[2])) / (2 * (r2 - r1))
    return per


bytes_moved = A.nnz_pad * 12 + A.nrows * 8
for combo in combos:
    t0 = time.perf_counter()
    if combo == "sorted":
        y = np.asarray(spmv_pull_sorted(
            A.row_ptr, A.csc_col_ind, A.csc_row_ind, A.csc_val, x,
            PlusMultipliesSemiring, A.nrows, A.nvals))
        err = np.abs(y - y64).max() / den
        per = marginal(chain_old, 2, 6)
    else:
        parts = combo.split(":")
        sweep_mode = parts[0]
        mm = parts[1] if len(parts) > 1 else "highest"
        p = plan
        for tok in parts[2:]:          # pN selects a pack=N plan
            if tok.startswith("p") and tok[1:].isdigit():
                p = plan_packed(int(tok[1:]))
        y = np.asarray(spmv_bilinear(p, x, matmul=mm, sweep=sweep_mode))
        err = np.abs(y - y64).max() / den
        per = marginal(chain_for(sweep_mode, mm, p), 2, 12)
    log(f"{combo:16s} err={err:.2e}  {per*1e3:6.2f} ms/iter  "
        f"{bytes_moved/per/1e9:6.1f} GB/s  "
        f"(compile+run {time.perf_counter()-t0:.0f}s)")
