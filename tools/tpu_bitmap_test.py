#!/usr/bin/env python
"""On-TPU compile + timing check of the int8 bitmap bilinear kernel."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from graphblast_tpu.io.rmat import rmat_matrix
from graphblast_tpu.ops.pallas.bilinear import plan_for_bitmap, spmv_bilinear_bitmap
from graphblast_tpu.ops.pallas.orpull import pack_bitmap

scale = int(sys.argv[1]) if len(sys.argv) > 1 else 18


def log(*a):
    print(*a, flush=True)


A = rmat_matrix(scale, 16, seed=42)
log(f"rmat{scale}: n={A.nrows} nnz={A.nvals}")
t0 = time.perf_counter()
plan = plan_for_bitmap(A, transpose=True)
log(f"plan: m_pad={plan.m_pad} (pad {plan.m_pad/A.nvals-1:+.1%}) "
    f"({time.perf_counter()-t0:.1f}s)")

rng = np.random.default_rng(1)
f_h = (rng.random(A.nrows) < 0.3).astype(np.float32)
words = pack_bitmap(jnp.asarray(f_h))

# golden: in-neighbor counts over CSC (vxm orientation)
cptr = np.asarray(A.col_ptr).astype(np.int64)
crow = np.asarray(A.csc_row_ind)[: A.nvals]
colid = np.repeat(np.arange(A.ncols), np.diff(cptr))
yref = np.zeros(A.ncols, np.int64)
np.add.at(yref, colid, (f_h[crow] != 0).astype(np.int64))

import functools

# r3 sweep variants: pruned fori [smin,smax] vs full unrolled 32 rows
sweeps = sys.argv[2:] or ["fori", "unroll"]
for sw in sweeps:
    t0 = time.perf_counter()
    y = np.asarray(spmv_bilinear_bitmap(plan, words, sweep=sw))
    ok = np.array_equal(y, yref)
    t_c = time.perf_counter() - t0

    @functools.partial(jax.jit, static_argnums=(1,))
    def chain(w, reps, sw=sw):
        def body(c, _):
            y = spmv_bilinear_bitmap(plan, c, sweep=sw)
            return c ^ (y[:w.shape[0]].astype(jnp.int32) & 1), ()
        c, _ = jax.lax.scan(body, w, None, length=reps)
        return c[0]

    np.asarray(chain(words, 2))
    np.asarray(chain(words, 12))
    ts = []
    for r in (2, 12, 2, 12):
        t0 = time.perf_counter()
        np.asarray(chain(words, r))
        ts.append(time.perf_counter() - t0)
    per = ((ts[1] + ts[3]) - (ts[0] + ts[2])) / 20
    log(f"bitmap pull[{sw:6s}]: correct={ok} {per*1e3:.2f} ms/iter "
        f"({A.nvals/per/1e9:.2f} Gedges/s; compile {t_c:.0f}s)")
