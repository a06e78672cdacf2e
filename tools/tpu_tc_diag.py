#!/usr/bin/env python
"""Where do the TC masked-count milliseconds go at rmat18?

Splits: host plan build | H2D plan ship | per-chunk dispatch (pipelined)
| final D2H. Informs whether spgemm_masked_count needs a reusable plan
(build once per matrix, like BilinearPlan) vs a faster chunk kernel.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from graphblast_tpu.io.rmat import rmat_matrix
from graphblast_tpu.operations import tril
from graphblast_tpu.ops.spgemm import (_mask_chunk_plan, _masked_count_chunk)
from graphblast_tpu.types import INDEX_DTYPE

scale = int(sys.argv[1]) if len(sys.argv) > 1 else 18


def log(*a):
    print(*a, flush=True)


t0 = time.perf_counter()
A = rmat_matrix(scale, 16, seed=42)
L = tril(A)
log(f"rmat{scale} tril: n={L.nrows} nnz={L.nvals} "
    f"({time.perf_counter()-t0:.1f}s)")

# ---- host plan build (numpy only up to the jnp.asarray staging) ----
t0 = time.perf_counter()
plan = _mask_chunk_plan(L, L, L, True, 1 << 23)
(chunks, acap, expand_e, mi_all, mj_all, perm, bexp,
 b_j, b_k, b_v, a_i_tab, a_k_tab) = plan
t_build = time.perf_counter() - t0
n_a = sum(1 for *_x, is_b in chunks if not is_b)
log(f"plan: {len(chunks)} chunks ({n_a} A-side), acap={acap}, "
    f"expand_cap={expand_e.shape[0]}, mi_all={mi_all.shape[0]:,} "
    f"build+stage {t_build:.2f}s")

# force the staged arrays onto the device and time that separately
t0 = time.perf_counter()
for arr in (mi_all, mj_all, b_j, b_k, a_i_tab, a_k_tab, bexp[0] if bexp
            else None):
    if arr is not None:
        arr.block_until_ready()
np.asarray(jnp.ravel(mi_all)[0])   # real D2H: defeat optimistic acks
t_ship = time.perf_counter() - t0
tot_mb = sum(a.size * 4 for a in (mi_all, mj_all) ) / 1e6
log(f"H2D ship (mi/mj {tot_mb:.0f} MB + tables): {t_ship:.2f}s")

# ---- chunk dispatches, pipelined, one D2H ----
def run_all():
    parts = []
    for s, tt, is_b in chunks:
        if is_b:
            parts.append(_masked_count_chunk(
                mj_all, mi_all, jnp.asarray(s, INDEX_DTYPE),
                jnp.asarray(tt - s, INDEX_DTYPE),
                bexp[0], bexp[1], a_i_tab, a_k_tab, expand_e, acap))
        else:
            parts.append(_masked_count_chunk(
                mi_all, mj_all, jnp.asarray(s, INDEX_DTYPE),
                jnp.asarray(tt - s, INDEX_DTYPE),
                L.row_ptr, L.col_ind, b_j, b_k, expand_e, acap))
    return int(np.asarray(jnp.stack(parts), dtype=np.int64).sum())

t0 = time.perf_counter()
total = run_all()   # compile (2 shapes) + run
log(f"chunks compile+first run: {time.perf_counter()-t0:.1f}s "
    f"count={total}")

for rep in range(3):
    t0 = time.perf_counter()
    total = run_all()
    log(f"chunks warm run {rep}: {time.perf_counter()-t0:.2f}s "
        f"count={total}")

# single-chunk marginal: dispatch the SAME A-side chunk k times
s, tt, _ = chunks[0]
args = (mi_all, mj_all, jnp.asarray(s, INDEX_DTYPE),
        jnp.asarray(tt - s, INDEX_DTYPE), L.row_ptr, L.col_ind,
        b_j, b_k, expand_e)
for k in (2, 8):
    t0 = time.perf_counter()
    outs = [_masked_count_chunk(*args, acap) for _ in range(k)]
    np.asarray(outs[-1])
    log(f"{k}x one chunk: {time.perf_counter()-t0:.2f}s "
        f"({(time.perf_counter()-t0)/k*1e3:.0f} ms/chunk)")
