"""Pallas TPU vectorized gather — the framework's most important kernel.

XLA lowers large 1D gathers on TPU to a ~7.5 ns/query scalar loop (measured,
TPU v5 lite: 13 ms for 1.8M queries — the entire SpMV budget). Mosaic does
expose a fast per-sublane *lane* gather (`tpu.dynamic_gather` via
jnp.take_along_axis(table (R,128), idx (R,128), axis=1)), limited to 128-entry
tables per sublane row. This kernel lifts it to arbitrary tables:

  x (n,) viewed as (S,128); idx decomposed hi = idx//128 (table row),
  lo = idx%128 (lane). For each table row s in a per-chunk [smin, smax] range:
      cand = lane_gather(broadcast(x2d[s]), lo)
      acc  = where(hi == s, cand, acc)

Measured cost model (TPU v5 lite, 1.8M queries, 65K-entry table):
  * unsorted idx: sweeps ~S rows per 32K-query chunk → 6.9 ms (2× XLA)
  * sorted/clustered idx: per-chunk pruning → 0.12 ms (~100× XLA)
  * tiny tables (S ≤ 128, e.g. 32x bit-packed BFS frontiers): full sweep,
    no prefetch — `gather_1d_small` below
The framework therefore ARRANGES for monotone indices wherever possible
(compacted frontiers, CSR boundary fetches, transpose-order value gathers —
see ops/spmv.py spmv_pull_sorted) and routes through gather_dispatch.take,
which picks XLA vs Pallas from this model.

The x table must fit in VMEM for the pruning variant (n ≤ ~2M f32 under the
8MB budget); bigger tables fall back to XLA until a windowed-DMA variant
lands.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...types import round_up

LANE = 128
# sublane rows of indices processed per grid step (256·128 = 32K indices)
CHUNK_SUB = 256


def _gather_kernel(smin_ref, smax_ref, x_ref, hi_ref, lo_ref, out_ref):
    """One grid step: gather CHUNK_SUB×128 elements from the VMEM table."""
    c = pl.program_id(0)
    hi = hi_ref[:]
    lo = lo_ref[:]
    ident = jnp.zeros((), out_ref.dtype)
    acc0 = jnp.full(hi.shape, ident, out_ref.dtype)

    def body(s, acc):
        row = x_ref[pl.ds(s, 1), :]                       # (1, 128) dynamic
        table = jnp.broadcast_to(row, hi.shape)
        cand = jnp.take_along_axis(table, lo, axis=1)     # lane gather
        return jnp.where(hi == s, cand, acc)

    acc = jax.lax.fori_loop(smin_ref[c], smax_ref[c] + 1, body, acc0)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_1d(x: jnp.ndarray, idx: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """y[i] = x[idx[i]] for idx in [0, n). Drop-in for x[idx] on TPU.

    Requirements handled internally: x padded to (S,128) table; idx padded to
    a CHUNK_SUB·128 multiple; per-chunk [smin, smax] table-row ranges computed
    with cheap elementwise XLA ops so sorted index regions prune passes."""
    n = x.shape[0]
    m = idx.shape[0]
    S = round_up(max(n, 1), LANE) // LANE
    x2d = jnp.pad(x, (0, S * LANE - n)).reshape(S, LANE)

    chunk = CHUNK_SUB * LANE
    m_pad = round_up(max(m, 1), chunk)
    idx_p = jnp.pad(idx, (0, m_pad - m))  # pads gather x[0]: harmless
    hi = (idx_p // LANE).astype(jnp.int32).reshape(-1, LANE)
    lo = (idx_p % LANE).astype(jnp.int32).reshape(-1, LANE)

    n_chunks = m_pad // chunk
    hi_c = hi.reshape(n_chunks, CHUNK_SUB, LANE)
    smin = jnp.min(hi_c, axis=(1, 2))
    smax = jnp.max(hi_c, axis=(1, 2))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x table resident in VMEM
            pl.BlockSpec((CHUNK_SUB, LANE), lambda c, smin, smax: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_SUB, LANE), lambda c, smin, smax: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CHUNK_SUB, LANE), lambda c, smin, smax: (c, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad // LANE, LANE), x.dtype),
        interpret=interpret,
    )(smin, smax, x2d, hi, lo)
    return out.reshape(-1)[:m]


def gather_available(n: int, vmem_budget_bytes: int = 8 * 1024 * 1024) -> bool:
    """Whether the table fits the kernel's VMEM budget."""
    return n * 4 <= vmem_budget_bytes


def _gather_small_kernel(S, x_ref, idx_ref, out_ref):
    """Full-sweep variant for tiny tables (S ≤ ~128 rows): no scalar
    prefetch, hi/lo split computed in-kernel — skips the XLA-side div/mod
    materialization and the per-chunk min/max reduction, which for small
    tables cost more than the sweep itself (bitmap-packed BFS pull)."""
    idx = idx_ref[:]
    hi = idx // LANE
    lo = idx % LANE
    acc0 = jnp.zeros(hi.shape, out_ref.dtype)

    def body(s, acc):
        row = x_ref[pl.ds(s, 1), :]
        table = jnp.broadcast_to(row, hi.shape)
        cand = jnp.take_along_axis(table, lo, axis=1)
        return jnp.where(hi == s, cand, acc)

    out_ref[:] = jax.lax.fori_loop(0, S, body, acc0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_1d_small(x: jnp.ndarray, idx: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """y[i] = x[idx[i]] for tables of ≤ ~128 sublane rows (full sweep)."""
    n = x.shape[0]
    m = idx.shape[0]
    S = round_up(max(n, 1), LANE) // LANE
    x2d = jnp.pad(x, (0, S * LANE - n)).reshape(S, LANE)

    chunk = CHUNK_SUB * LANE
    m_pad = round_up(max(m, 1), chunk)
    idx_p = jnp.pad(idx, (0, m_pad - m)).astype(jnp.int32).reshape(-1, LANE)

    out = pl.pallas_call(
        functools.partial(_gather_small_kernel, S),
        grid=(m_pad // chunk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_SUB, LANE), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CHUNK_SUB, LANE), lambda c: (c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad // LANE, LANE), x.dtype),
        interpret=interpret,
    )(x2d, idx_p)
    return out.reshape(-1)[:m]
