"""Tiled one-hot bilinear SpMV — the Plus-semiring bandwidth kernel.

Replaces the sort-based value pull (ops/spmv.py spmv_pull_sorted — monotone
gather + full-edge lax.sort, ~10 ms of sort per SpMV at rmat18) with a single
Pallas kernel and zero runtime sorting. The mgpu::SpmvCsrBinary analog
(reference: backend/cuda/spmv.hpp:188), re-derived for a machine with no
hardware gather/scatter:

  * Build time (host, once per matrix orientation): edges are bucketed into
    4096×4096 (row-window × col-window) tiles and each tile's edge list is
    padded to a SUB-edge multiple. Per edge we store ONE packed int32
    (row_loc << 12 | col_loc) plus the f32 value; per sub-block two scalar
    offsets locate the x window and the y window.
  * Kernel, per 1024-edge sub-block laid out (8, 128):
      - gather x: sweep the 32-row VMEM x-window with the Mosaic lane gather
        (jnp.take_along_axis axis=1), select on the window-row id — measured
        7.5 ps per (row × query), so a 32-row window costs ~0.24 ns/edge;
      - multiply by the edge value (VPU);
      - scatter: one-hot bilinear on the MXU —
          M(32,128) = A(32, 1024) @ B(1024, 128),
        A[a, q] = (row_hi[q]==a)·product[q],  B[q, i] = (row_lo[q]==i)
        — 4096 MACs/edge, ~0.1-0.2 ns/edge at measured f32 MXU rates;
      - accumulate M into the VMEM-resident y at a dynamic sublane offset
        (verified supported by tools/tpu_micro.py dynds).

  Replaces sort (1.3 ns/edge) + boundary gathers + ~10 elementwise passes
  with ~0.5 ns/edge total. Deterministic (fixed tile order). Requires
  x and y resident in VMEM: n ≤ ~1.5M per side (scale-20 class); larger
  graphs fall back to the sorted pipeline until the windowed-DMA variant
  lands.

Also serves boolean BFS pull at any density: run with x = frontier (0/1
floats) and val = 1.0; y is then the frontier-neighbor count per vertex and
(y > 0) is the or-pull result (reference: kernels/spmv.hpp:10-59).
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...types import round_up

LANE = 128
W_BITS = 12                 # 4096-wide row/col windows
W = 1 << W_BITS
W_ROWS = W // LANE          # 32 table rows per window
SUB = 1024                  # edges per sub-block (8 sublane rows)
SUB_ROWS = SUB // LANE
CHUNK_SUBS = 16             # sub-blocks per grid step (16K edges)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BilinearPlan:
    """Static tiling of one matrix orientation for spmv_bilinear.

    Leaves: loc (m_pad,) int32 packed (row_loc<<12 | col_loc); val (m_pad,)
    f32 (0 on pad slots); c_off/r_off (nsb,) int32 window starts in table-row
    units. Static: logical dims + padded table dims.
    """

    n_out: int
    n_in: int
    n_out_pad: int           # round_up(n_out, W)
    n_in_pad: int
    m_pad: int               # total padded edges (SUB·CHUNK_SUBS multiple)
    loc: jnp.ndarray
    val: jnp.ndarray
    c_off: jnp.ndarray
    r_off: jnp.ndarray
    smin: jnp.ndarray        # (nsb,) per-sub-block x-window sweep bounds:
    smax: jnp.ndarray        # edges are chi-sorted within each tile, so the
    #                          sweep visits only [smin, smax] of the 32 rows
    unit_vals: bool = False  # True iff built with all-ones values — only
    #                          such plans may serve LogicalOrAnd via count>0
    loc2: Optional[tuple] = None   # pack=K plans: tuple of K-1 extra edge
    val2: Optional[tuple] = None   # streams; edges of one one-hot column
    #                                share (tile, output lane) → ONE Bt
    #                                one-hot serves K edges (the per-column
    #                                iota-compare builds dominate the kernel,
    #                                so cost/edge drops ~1/K on that term)

    def tree_flatten(self):
        return ((self.loc, self.val, self.c_off, self.r_off,
                 self.smin, self.smax, self.loc2, self.val2),
                (self.n_out, self.n_in, self.n_out_pad, self.n_in_pad,
                 self.m_pad, self.unit_vals))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        *dims, unit = aux
        return cls(*dims, *leaves[:6], unit_vals=unit,
                   loc2=leaves[6], val2=leaves[7])


def build_plan(ptr, ind, val, n_out: int, n_in: int,
               pack: int = 1) -> BilinearPlan:
    """Host-side tiling pass (numpy; analog of the reference's build-time
    coo2csr/csc preprocessing, util.hpp:501-572 — run once, reused every
    SpMV). `ptr`/`ind`/`val` describe the PULL orientation: y[i] =
    Σ_{e ∈ seg i} val[e] · x[ind[e]]; val=None means all-ones (struconly).

    pack=K ≥ 2 groups edges sharing (tile, output lane) K per one-hot
    column: the MXU scatter runs K edges per column (A accumulates all K
    products, the shared Bt one-hot routes them to the same lane) — 1/K the
    per-column iota-compare/select and matmul cost. Ungrouped edges pad
    their column's remaining slots with zero-value edges."""
    ptr_np = np.asarray(ptr, dtype=np.int64)
    m = int(ptr_np[-1])
    n_out_pad = max(round_up(n_out, W), W)
    n_in_pad = max(round_up(n_in, W), W)

    if m == 0:
        chunk = SUB * CHUNK_SUBS
        nsb = CHUNK_SUBS
        z = jnp.zeros((chunk,), jnp.int32)
        zf = jnp.zeros((chunk,), jnp.float32)
        return BilinearPlan(
            n_out, n_in, n_out_pad, n_in_pad, chunk,
            z, zf,
            jnp.zeros((nsb,), jnp.int32), jnp.zeros((nsb,), jnp.int32),
            jnp.zeros((nsb,), jnp.int32), jnp.zeros((nsb,), jnp.int32),
            unit_vals=val is None,
            loc2=(z,) * (pack - 1) if pack >= 2 else None,
            val2=(zf,) * (pack - 1) if pack >= 2 else None)

    rows = np.repeat(np.arange(n_out, dtype=np.int64), np.diff(ptr_np))
    cols = np.asarray(ind, dtype=np.int64)[:m]
    vals = (np.asarray(val, dtype=np.float32)[:m] if val is not None
            else np.ones(m, np.float32))

    n_cb = n_in_pad >> W_BITS
    tile = (rows >> W_BITS) * n_cb + (cols >> W_BITS)
    if pack >= 2:
        return _build_plan_packed(rows, cols, vals, tile, n_cb, n_out, n_in,
                                  n_out_pad, n_in_pad, val is None, pack)
    # secondary sort key: x-window row chi = (col within window) // LANE —
    # each sub-block then spans a narrow [smin, smax] sweep range instead
    # of all W_ROWS (the gather.py per-chunk pruning idea applied here)
    chi_all = ((cols & (W - 1)) >> 7).astype(np.int32)
    order = np.lexsort((chi_all, tile))
    t_sorted = tile[order]

    head = np.r_[True, t_sorted[1:] != t_sorted[:-1]]
    starts = np.flatnonzero(head)
    counts = np.diff(np.r_[starts, m])
    padded = ((counts + SUB - 1) // SUB) * SUB
    out_starts = np.r_[0, np.cumsum(padded)]
    total = int(out_starts[-1])
    chunk = SUB * CHUNK_SUBS
    m_pad = max(round_up(total, chunk), chunk)

    within = np.arange(m, dtype=np.int64) - np.repeat(starts, counts)
    pos = np.repeat(out_starts[:-1], counts) + within

    r_loc = (rows[order] & (W - 1)).astype(np.int32)
    c_loc = (cols[order] & (W - 1)).astype(np.int32)
    loc = np.zeros(m_pad, np.int32)
    loc[pos] = (r_loc << W_BITS) | c_loc
    vstream = np.zeros(m_pad, np.float32)
    vstream[pos] = vals[order]

    # per-sub-block window offsets (table-row units); dummy tail sub-blocks
    # point at window 0 and carry zero values
    nsb = m_pad // SUB
    sb_tile = np.zeros(nsb, np.int64)
    sb_tile[:total // SUB] = np.repeat(t_sorted[starts], padded // SUB)
    c_off = ((sb_tile % n_cb) * W_ROWS).astype(np.int32)
    r_off = ((sb_tile // n_cb) * W_ROWS).astype(np.int32)

    # per-sub-block sweep bounds over REAL entries (pad slots carry value 0,
    # so sweeping past them is harmless but never required); dummy blocks
    # sweep exactly one row
    chi_min = np.full(m_pad, W_ROWS, np.int32)
    chi_min[pos] = chi_all[order]
    chi_max = np.full(m_pad, -1, np.int32)
    chi_max[pos] = chi_all[order]
    smin = np.minimum(chi_min.reshape(nsb, SUB).min(1), W_ROWS - 1)
    smax = np.maximum(chi_max.reshape(nsb, SUB).max(1), 0)
    smax = np.maximum(smax, smin)

    return BilinearPlan(n_out, n_in, n_out_pad, n_in_pad, m_pad,
                        jnp.asarray(loc), jnp.asarray(vstream),
                        jnp.asarray(c_off), jnp.asarray(r_off),
                        jnp.asarray(smin), jnp.asarray(smax),
                        unit_vals=val is None)


def _build_plan_packed(rows, cols, vals, tile, n_cb, n_out, n_in,
                       n_out_pad, n_in_pad, unit_vals,
                       pack: int = 2) -> BilinearPlan:
    """pack=K layout: one one-hot column per GROUP of K edges sharing
    (tile, output lane rows&127). m_pad counts COLUMNS, not edges."""
    m = rows.shape[0]
    chi_all = ((cols & (W - 1)) >> 7).astype(np.int32)
    rlo_all = (rows & (LANE - 1)).astype(np.int32)
    order = np.lexsort((chi_all, rlo_all, tile))
    t_o = tile[order]
    r_o = rlo_all[order]

    grp_head = np.r_[True, (t_o[1:] != t_o[:-1]) | (r_o[1:] != r_o[:-1])]
    g_starts = np.flatnonzero(grp_head)
    g_counts = np.diff(np.r_[g_starts, m])
    gid = np.cumsum(grp_head) - 1
    within_g = np.arange(m, dtype=np.int64) - np.repeat(g_starts, g_counts)
    pair_slot = within_g // pack
    side = (within_g % pack).astype(np.int64)

    g_cols = (g_counts + pack - 1) // pack
    g_tile = t_o[g_starts]
    tile_head = np.r_[True, g_tile[1:] != g_tile[:-1]]
    tid = np.cumsum(tile_head) - 1
    n_tiles = int(tid[-1]) + 1
    tile_cols = np.bincount(tid, weights=g_cols).astype(np.int64)
    padded = ((tile_cols + SUB - 1) // SUB) * SUB
    out_starts = np.r_[0, np.cumsum(padded)]
    total = int(out_starts[-1])
    chunk = SUB * CHUNK_SUBS
    m_pad = max(round_up(total, chunk), chunk)

    # column offset of each group within its tile
    excl = np.cumsum(g_cols) - g_cols
    tile_excl = excl[np.flatnonzero(tile_head)]
    g_col_off = excl - tile_excl[tid]
    edge_col = (out_starts[tid[gid]] + g_col_off[gid] + pair_slot)

    r_loc = (rows[order] & (W - 1)).astype(np.int32)
    c_loc = (cols[order] & (W - 1)).astype(np.int32)
    lv = (r_loc << W_BITS) | c_loc
    vv = vals[order]
    locs = [np.zeros(m_pad, np.int32) for _ in range(pack)]
    vls = [np.zeros(m_pad, np.float32) for _ in range(pack)]
    for k in range(pack):
        sel = side == k
        locs[k][edge_col[sel]] = lv[sel]
        vls[k][edge_col[sel]] = vv[sel]

    nsb = m_pad // SUB
    sb_tile = np.zeros(nsb, np.int64)
    sb_tile[: total // SUB] = np.repeat(g_tile[tile_head], padded // SUB)
    c_off = ((sb_tile % n_cb) * W_ROWS).astype(np.int32)
    r_off = ((sb_tile // n_cb) * W_ROWS).astype(np.int32)

    # sweep bounds over REAL edges of BOTH column slots
    chi_o = chi_all[order]
    chi_min = np.full(m_pad, W_ROWS, np.int32)
    np.minimum.at(chi_min, edge_col, chi_o)
    chi_max = np.full(m_pad, -1, np.int32)
    np.maximum.at(chi_max, edge_col, chi_o)
    smin = np.minimum(chi_min.reshape(nsb, SUB).min(1), W_ROWS - 1)
    smax = np.maximum(chi_max.reshape(nsb, SUB).max(1), 0)
    smax = np.maximum(smax, smin)

    return BilinearPlan(n_out, n_in, n_out_pad, n_in_pad, m_pad,
                        jnp.asarray(locs[0]), jnp.asarray(vls[0]),
                        jnp.asarray(c_off), jnp.asarray(r_off),
                        jnp.asarray(smin), jnp.asarray(smax),
                        unit_vals=unit_vals,
                        loc2=tuple(jnp.asarray(a) for a in locs[1:]),
                        val2=tuple(jnp.asarray(a) for a in vls[1:]))


def _bank_sweep(row_fn, pairs, smin, smax, scratch_refs, n_rows: int,
                bank: int = 8):
    """Range-pruned window sweep at bank granularity: statically-unrolled
    8-row banks, each guarded by a scalar pl.when on the sub-block's
    [smin, smax] chi range. The idea sat between the two r2/r3 variants
    ('unroll' pays all n_rows passes; dynamic-bound 'fori' measured ~12x
    slower), but hardware-measured 2026-08-19 (tools/tpu_sweep_cmp.py,
    bitmap kernel, rmat18) it LOSES: 1.70 ms/iter vs unroll's 1.04, and
    the ~64 pl.when regions per chunk body blew the remote Mosaic compile
    to 1410 s vs 11 s. Predicated regions apparently break the pipelining
    that makes the straight-line unroll fast. Kept as an opt-in variant
    (GRB_*_SWEEP=bank) so the measurement is reproducible; 'unroll' stays
    the default everywhere.

    pairs: [(chi, clo), ...] query streams; scratch_refs: matching VMEM
    refs carrying the gather accumulator across pl.when regions (pl.when
    bodies cannot return values). Returns the gathered arrays."""
    for ref in scratch_refs:
        ref[:] = jnp.zeros(ref.shape, ref.dtype)
    for b0 in range(0, n_rows, bank):
        @pl.when((smax >= b0) & (smin < b0 + bank))
        def _(b0=b0):
            accs = [ref[:] for ref in scratch_refs]
            for s in range(b0, b0 + bank):
                row = row_fn(s)
                for i, (chi, clo) in enumerate(pairs):
                    cand = jnp.take_along_axis(
                        jnp.broadcast_to(row, clo.shape), clo, axis=1)
                    accs[i] = jnp.where(chi == s, cand, accs[i])
            for ref, acc in zip(scratch_refs, accs):
                ref[:] = acc
    return [ref[:] for ref in scratch_refs]


def _kernel(c_off_ref, r_off_ref, smin_ref, smax_ref,
            x_ref, loc_ref, val_ref, y_ref, xg_ref, *,
            matmul: str = "highest", sweep: str = "fori",
            csubs: int = CHUNK_SUBS):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        y_ref[:] = jnp.zeros(y_ref.shape, y_ref.dtype)

    for sb in range(csubs):
        base = c * csubs + sb
        c0 = c_off_ref[base]
        r0 = r_off_ref[base]
        lv = loc_ref[sb * SUB_ROWS:(sb + 1) * SUB_ROWS, :]
        vv = val_ref[sb * SUB_ROWS:(sb + 1) * SUB_ROWS, :]

        cl = lv & (W - 1)
        chi = cl >> 7
        clo = cl & (LANE - 1)

        def _sweep_step(s, xg):
            row = x_ref[pl.ds(c0 + s, 1), :]
            cand = jnp.take_along_axis(
                jnp.broadcast_to(row, clo.shape), clo, axis=1)
            return jnp.where(chi == s, cand, xg)

        if sweep == "fori":
            # edges are chi-sorted within each tile (build_plan lexsort), so
            # [smin, smax] typically covers a fraction of the W_ROWS window
            # (the gather.py per-chunk range-pruning idea applied here)
            xg = jax.lax.fori_loop(smin_ref[base], smax_ref[base] + 1,
                                   _sweep_step,
                                   jnp.zeros(clo.shape, y_ref.dtype))
        elif sweep == "bank":
            xg, = _bank_sweep(lambda s: x_ref[pl.ds(c0 + s, 1), :],
                              [(chi, clo)], smin_ref[base], smax_ref[base],
                              [xg_ref], W_ROWS)
        else:
            # full python-unrolled sweep (r2 behavior): no loop-counter
            # overhead, always W_ROWS passes
            xg = jnp.zeros(clo.shape, y_ref.dtype)
            for s in range(W_ROWS):
                xg = _sweep_step(s, xg)
        p = xg * vv

        rl = lv >> W_BITS
        # flatten the (SUB_ROWS,128) sub-block to one 1024-lane row (row-major
        # lane collapse — the only reshape Mosaic's layout inference accepts)
        rhi = (rl >> 7).reshape(1, SUB)
        rlo = (rl & (LANE - 1)).reshape(1, SUB)
        pf = p.reshape(1, SUB)

        # M(32,128) = A(32,SUB) *T Bt(128,SUB): one-hot bilinear, both
        # one-hots built with q along lanes (no cross-lane relayouts)
        ia = jax.lax.broadcasted_iota(jnp.int32, (W_ROWS, SUB), 0)
        ib = jax.lax.broadcasted_iota(jnp.int32, (LANE, SUB), 0)
        A = jnp.where(jnp.broadcast_to(rhi, (W_ROWS, SUB)) == ia,
                      jnp.broadcast_to(pf, (W_ROWS, SUB)), 0.0)
        hot_b = jnp.broadcast_to(rlo, (LANE, SUB)) == ib
        if matmul == "hilo":
            # two DEFAULT-precision bf16 passes on a hi/lo split of the
            # product stream: ~16-bit effective mantissa (rel err ~1e-5,
            # well inside the reference's 1e-3 bar, test.hpp:7-17) at the
            # full bf16 MXU rate - vs HIGHEST's multi-pass decomposition
            Bt = hot_b.astype(jnp.bfloat16)   # 0/1: exact in bf16
            A_hi = A.astype(jnp.bfloat16)
            A_lo = (A - A_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            M = jax.lax.dot_general(A_hi, Bt, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            M = M + jax.lax.dot_general(A_lo, Bt, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
        else:
            Bt = hot_b.astype(y_ref.dtype)
            # HIGHEST: TPU DEFAULT truncates f32 operands to one bf16 pass
            # (measured 1.2e-3 rel err vs 5e-5 for true f32 accumulation).
            # Per-operand precision (Bt is exact in bf16) is not lowered by
            # Mosaic ("Per-operand dot precision unsupported").
            M = jax.lax.dot_general(A, Bt, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.HIGHEST)
        y_ref[pl.ds(r0, W_ROWS), :] += M


def _kernel_packed(c_off_ref, r_off_ref, smin_ref, smax_ref, x_ref,
                   *rest, npack: int = 2,
                   matmul: str = "highest", sweep: str = "fori",
                   csubs: int = CHUNK_SUBS):
    """pack=K variant of _kernel: each lane-column carries K edges that
    share the output lane (build_plan pack=K), so one A accumulates all K
    products and the (128, SUB) Bt one-hot is shared — 1/K the per-column
    iota-compare and MXU passes per edge. Gather/VPU work per edge is
    unchanged. rest = K (loc, val) ref pairs, y_ref, K sweep scratch refs."""
    locs = [rest[2 * k] for k in range(npack)]
    vls = [rest[2 * k + 1] for k in range(npack)]
    y_ref = rest[2 * npack]
    xg_refs = list(rest[2 * npack + 1: 3 * npack + 1])
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        y_ref[:] = jnp.zeros(y_ref.shape, y_ref.dtype)

    for sb in range(csubs):
        base = c * csubs + sb
        c0 = c_off_ref[base]
        r0 = r_off_ref[base]
        lvs = [ref[sb * SUB_ROWS:(sb + 1) * SUB_ROWS, :] for ref in locs]
        vvs = [ref[sb * SUB_ROWS:(sb + 1) * SUB_ROWS, :] for ref in vls]
        chis = [(lv & (W - 1)) >> 7 for lv in lvs]
        clos = [lv & (LANE - 1) for lv in lvs]

        def _sweep_step(s, carry):
            row = x_ref[pl.ds(c0 + s, 1), :]
            return tuple(
                jnp.where(chis[k] == s,
                          jnp.take_along_axis(
                              jnp.broadcast_to(row, clos[k].shape),
                              clos[k], axis=1),
                          carry[k])
                for k in range(npack))

        zero = jnp.zeros(clos[0].shape, y_ref.dtype)
        if sweep == "fori":
            xgs = jax.lax.fori_loop(smin_ref[base], smax_ref[base] + 1,
                                    _sweep_step, (zero,) * npack)
        elif sweep == "bank":
            xgs = _bank_sweep(
                lambda s: x_ref[pl.ds(c0 + s, 1), :],
                list(zip(chis, clos)),
                smin_ref[base], smax_ref[base], xg_refs, W_ROWS)
        else:
            xgs = (zero,) * npack
            for s in range(W_ROWS):
                xgs = _sweep_step(s, xgs)
        pfs = [(xgs[k] * vvs[k]).reshape(1, SUB) for k in range(npack)]

        rhis = [(lv >> (W_BITS + 7)).reshape(1, SUB) for lv in lvs]
        rlo = ((lvs[0] >> W_BITS) & (LANE - 1)).reshape(1, SUB)  # shared lane

        ia = jax.lax.broadcasted_iota(jnp.int32, (W_ROWS, SUB), 0)
        ib = jax.lax.broadcasted_iota(jnp.int32, (LANE, SUB), 0)
        A = jnp.where(jnp.broadcast_to(rhis[0], (W_ROWS, SUB)) == ia,
                      jnp.broadcast_to(pfs[0], (W_ROWS, SUB)), 0.0)
        for k in range(1, npack):
            A = A + jnp.where(
                jnp.broadcast_to(rhis[k], (W_ROWS, SUB)) == ia,
                jnp.broadcast_to(pfs[k], (W_ROWS, SUB)), 0.0)
        hot_b = jnp.broadcast_to(rlo, (LANE, SUB)) == ib
        if matmul == "hilo":
            Bt = hot_b.astype(jnp.bfloat16)
            A_hi = A.astype(jnp.bfloat16)
            A_lo = (A - A_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            M = jax.lax.dot_general(A_hi, Bt, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            M = M + jax.lax.dot_general(A_lo, Bt, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
        else:
            Bt = hot_b.astype(y_ref.dtype)
            M = jax.lax.dot_general(A, Bt, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.HIGHEST)
        y_ref[pl.ds(r0, W_ROWS), :] += M


def spmv_bilinear(plan: BilinearPlan, x: jnp.ndarray,
                  interpret: Optional[bool] = None,
                  matmul: Optional[str] = None,
                  sweep: Optional[str] = None) -> jnp.ndarray:
    """y[0:n_out] = Σ products routed by the plan; Plus monoid only.

    interpret defaults to True off-TPU so the same call sites work (slowly)
    under the CPU test backend. matmul ∈ {highest, hilo} and sweep ∈
    {fori, unroll} select the scatter-precision / window-sweep variants
    (env GRB_BILINEAR_MATMUL / GRB_BILINEAR_SWEEP). Hardware-measured
    rmat18 (TPU v5 lite, 2026-08-19, tools/tpu_bilinear_test.py):
    unroll:hilo:pack2 1.20 ms (77.6 GB/s, rel err 2.3e-6) beats
    unroll:highest 4.74 ms (19.7 GB/s, 2.5e-7) — hilo's two bf16 passes
    run ~3x faster than HIGHEST's multi-pass f32 decomposition and stay
    ~500x inside the reference's 1e-3 bar, so hilo is the default; the
    chi-pruned 'fori' sweep measured 3.7x SLOWER than 'unroll' at scale 18
    (17.4 ms) and stays opt-in. An F32DmaPlan (built by plan_for above the
    VMEM-residency limit) routes to the windowed-DMA kernel
    transparently."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if matmul is None:
        matmul = os.environ.get("GRB_BILINEAR_MATMUL", "hilo").lower()
    if isinstance(plan, F32DmaPlan):
        return _spmv_bilinear_dma(
            plan, x, interpret, matmul,
            (sweep or os.environ.get("GRB_BILINEAR_SWEEP", "fori")).lower())
    if sweep is None:
        sweep = os.environ.get("GRB_BILINEAR_SWEEP", "unroll").lower()
    return _spmv_bilinear(plan, x, interpret, matmul, sweep)


@functools.partial(jax.jit, static_argnames=("interpret", "matmul", "sweep"))
def _spmv_bilinear(plan: BilinearPlan, x: jnp.ndarray,
                   interpret: bool = False, matmul: str = "highest",
                   sweep: str = "fori") -> jnp.ndarray:
    n_in_pad, n_out_pad = plan.n_in_pad, plan.n_out_pad
    x_p = jnp.pad(x.astype(jnp.float32), (0, n_in_pad - x.shape[0]))
    x2d = x_p.reshape(n_in_pad // LANE, LANE)

    # interpret mode: 2 sub-blocks per grid step — the emulated body is
    # traced into the outer jit, so the 8x smaller body cuts the CPU test
    # tier's compile bill ~6x (measured on the monoid twin, 2026-08-19)
    csubs = 2 if interpret else CHUNK_SUBS
    chunk_rows = csubs * SUB_ROWS
    n_chunks = plan.m_pad // (csubs * SUB)
    npack = 1 + (len(plan.loc2) if plan.loc2 is not None else 0)

    stream = pl.BlockSpec((chunk_rows, LANE), lambda c, *_: (c, 0),
                          memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]  # x table
        + [stream] * (2 * npack),
        out_specs=pl.BlockSpec((n_out_pad // LANE, LANE),
                               lambda c, *_: (0, 0),
                               memory_space=pltpu.VMEM),
        # gather accumulators for the bank sweep (pl.when regions cannot
        # return values); dead weight (8x128 f32 each) for other sweeps
        scratch_shapes=[pltpu.VMEM((SUB_ROWS, LANE), jnp.float32)] * npack,
    )
    operands = (plan.loc.reshape(-1, LANE), plan.val.reshape(-1, LANE))
    if npack > 1:
        kern = functools.partial(_kernel_packed, npack=npack,
                                 matmul=matmul, sweep=sweep, csubs=csubs)
        for l2, v2 in zip(plan.loc2, plan.val2):
            operands += (l2.reshape(-1, LANE), v2.reshape(-1, LANE))
    else:
        kern = functools.partial(_kernel, matmul=matmul, sweep=sweep,
                                 csubs=csubs)
    y2d = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out_pad // LANE, LANE), jnp.float32),
        interpret=interpret,
    )(plan.c_off, plan.r_off, plan.smin, plan.smax, x2d, *operands)
    return y2d.reshape(-1)[:plan.n_out]


def bilinear_available(n_out: int, n_in: int,
                       vmem_budget: Optional[int] = None) -> bool:
    """x and y tables must both sit in VMEM alongside the edge buffers.

    The 12 MB default is conservative; v5e VMEM is nominally 128 MB —
    GRB_BILINEAR_VMEM (bytes) raises/lowers the gate (raising it stretches
    the resident kernel to scale ~23; lowering it forces the windowed-DMA
    plan for testing)."""
    if vmem_budget is None:
        vmem_budget = int(os.environ.get("GRB_BILINEAR_VMEM",
                                         str(12 * 1024 * 1024)))
    need = (round_up(n_out, W) + round_up(n_in, W)) * 4
    return need <= vmem_budget


# ---------------------------------------------------------------------------
# Bitmap-window variant: struconly pulls at ANY scale
# ---------------------------------------------------------------------------
#
# The f32 kernel above needs x and y resident in VMEM (n ≤ ~1.5M). For
# boolean traversals the frontier packs 32x into int32 words, so a 32-row
# window covers 131072 columns and the whole bitmap fits VMEM even at
# scale 25 (n/8 bytes ≈ 4 MB). y is emitted per 4096-row panel through the
# output BlockSpec (prefetched panel index), so it never has to fit VMEM
# either. Tiles are (4096 rows × 131072 cols): 32x fewer than the f32
# kernel's, which also keeps the per-tile padding tolerable at scale 22+.

WB_BITS = 17                 # 131072-column windows (32 word-rows)
WB = 1 << WB_BITS
SUBB = 2048                  # edges per bitmap sub-block (16 sublane rows):
SUBB_ROWS = SUBB // LANE     # tiles are 32x larger than the f32 kernel's,
CHUNKB_SUBS = 8              # so the bigger granularity stays low-padding


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BitmapPlan:
    """Static tiling for spmv_bilinear_bitmap. loc packs
    (valid<<30 | row_loc<<17 | col_loc); c_blk/rp per sub-block/chunk."""

    n_out: int
    n_in: int
    n_out_pad: int           # round_up(n_out, 1<<wp_bits)  (row panels)
    n_wrows: int             # bitmap word-rows incl. zero padding
    m_pad: int
    loc: jnp.ndarray
    c_blk: jnp.ndarray       # (n_chunks, 128) word-row offset of each sub-block's
    #                          window — lives in HBM and is DMA'd into SMEM
    #                          per chunk (a scalar-prefetch array would blow
    #                          the 1 MB SMEM budget at scale 24: nsb ≈ 260K)
    rp: jnp.ndarray          # (n_chunks,) row-panel index per chunk
    visited: jnp.ndarray     # (n_out_pad//128,) 1.0 iff the row's panel has
    #                          edges — panels the grid never visits hold
    #                          undefined output memory and must be zeroed
    swrow: jnp.ndarray       # (n_chunks, 128) absolute window word-row per
    #                          128-lane edge row (runs are lane-row aligned);
    #                          DMA'd into SMEM per chunk for the 'aligned'
    #                          sweep

    dma_cblk: bool = False   # True → c_blk is (n_chunks,128) rows DMA'd
    #                          from HBM per chunk; False → flat (nsb,)
    #                          scalar-prefetch (fits SMEM below ~scale 23)
    wp_bits: int = 12        # output row-panel width: 4096 rows (12) for
    #                          most plans, 8192 (13) above ~scale 23 — halves
    #                          the tile count, so the per-tile SUBB padding
    #                          that doubles the scale-24 edge stream shrinks
    #                          (docs/scale_audit.md round-3 note). 13 bits of
    #                          row_loc + valid<<30 caps the int32 pack.

    def tree_flatten(self):
        return ((self.loc, self.c_blk, self.rp, self.visited, self.swrow),
                (self.n_out, self.n_in, self.n_out_pad, self.n_wrows,
                 self.m_pad, self.dma_cblk, self.wp_bits))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        *dims, dma, wpb = aux
        return cls(*dims, *leaves, dma_cblk=dma, wp_bits=wpb)


def build_plan_bitmap(ptr, ind, n_out: int, n_in: int,
                      wp_bits: Optional[int] = None,
                      dma_cblk: Optional[bool] = None) -> BitmapPlan:
    """Host tiling pass for the bitmap kernel (struconly: values ignored).

    wp_bits overrides the output-panel width (testing hook; default picks
    13 for huge row counts, else 12). dma_cblk forces the offset-feed mode
    (stacked per-shard plans need one mode across shards)."""
    ptr_np = np.asarray(ptr, dtype=np.int64)
    m = int(ptr_np[-1])
    if wp_bits is None:
        wp_bits = 13 if n_out > (1 << 23) else 12
    Wp = 1 << wp_bits
    n_out_pad = max(round_up(n_out, Wp), Wp)
    n_cb = max(round_up(n_in, WB), WB) >> WB_BITS
    n_wrows = n_cb * (WB // 32 // LANE)          # 32 word-rows per window
    chunk = SUBB * CHUNKB_SUBS

    if m == 0:
        nch = 1
        return BitmapPlan(
            n_out, n_in, n_out_pad, n_wrows, chunk,
            jnp.zeros((chunk,), jnp.int32),
            jnp.zeros((chunk // SUBB,), jnp.int32),
            jnp.zeros((nch,), jnp.int32),
            jnp.zeros((n_out_pad // LANE,), jnp.float32),
            jnp.zeros((nch, LANE), jnp.int32), dma_cblk=False,
            wp_bits=wp_bits)

    rows = np.repeat(np.arange(n_out, dtype=np.int64), np.diff(ptr_np))
    cols = np.asarray(ind, dtype=np.int64)[:m]

    rp_e = rows >> wp_bits
    tile = rp_e * n_cb + (cols >> WB_BITS)
    # secondary sort key: the word-row of the column within its window —
    # each sub-block then sweeps only [smin, smax] of the 32 rows (the f32
    # kernel's chi pruning applied to the bitmap path; at rmat18 a
    # 2048-edge sub-block of a ~59K-edge tile spans ~2 of 32 rows)
    chi_all = ((cols & (WB - 1)) >> 12).astype(np.int32)
    order = np.lexsort((chi_all, tile))
    t_sorted = tile[order]
    chi_sorted = chi_all[order]

    # run-level 128-lane padding: every (tile, chi) run starts on a lane-row
    # boundary, so each 128-lane row of the edge stream reads exactly ONE
    # window word-row — the 'aligned' sweep then replaces the 32-pass
    # window sweep with SUBB_ROWS row copies + one take_along_axis. Cost:
    # ≤ 127 pad slots per run; bitmap tiles are 131072 columns wide (~128
    # tiles at rmat18), so runs are long and the overhead is small.
    runkey = t_sorted * 32 + chi_sorted
    run_head = np.r_[True, runkey[1:] != runkey[:-1]]
    run_starts = np.flatnonzero(run_head)
    run_counts = np.diff(np.r_[run_starts, m])
    run_pad = ((run_counts + LANE - 1) // LANE) * LANE
    rt_head = np.r_[True, t_sorted[run_starts][1:]
                    != t_sorted[run_starts][:-1]]
    rt_group = np.cumsum(rt_head) - 1            # run → tile ordinal

    head = np.r_[True, t_sorted[1:] != t_sorted[:-1]]
    starts = np.flatnonzero(head)
    counts = np.diff(np.r_[starts, m])
    tile_tot = np.bincount(rt_group, weights=run_pad).astype(np.int64)
    padded = ((tile_tot + SUBB - 1) // SUBB) * SUBB

    # additionally pad each ROW PANEL's stream to a chunk multiple so every
    # chunk maps to exactly one output panel
    tile_rp = t_sorted[starts] // n_cb
    rp_head = np.r_[True, tile_rp[1:] != tile_rp[:-1]]
    rp_group = np.cumsum(rp_head) - 1
    rp_tot = np.bincount(rp_group, weights=padded).astype(np.int64)
    rp_tot_pad = ((rp_tot + chunk - 1) // chunk) * chunk
    rp_base = np.r_[0, np.cumsum(rp_tot_pad)]
    # tile start offsets inside the padded stream
    within_panel = np.concatenate(
        [np.r_[0, np.cumsum(padded[rp_group == g])[:-1]]
         for g in range(len(rp_tot))]) if len(rp_tot) else np.zeros(0)
    tile_out = rp_base[rp_group] + within_panel
    total = int(rp_base[-1])
    m_pad = max(total, chunk)

    # run start offsets inside each tile's padded stream (vectorized
    # grouped exclusive cumsum — a per-tile python loop is O(tiles·runs),
    # fatal at scale 24's ~260K tiles), then per-edge slots
    ex = np.cumsum(run_pad) - run_pad
    tile_first = np.repeat(ex[np.flatnonzero(rt_head)],
                           np.bincount(rt_group))
    run_within_tile = ex - tile_first
    run_out = (tile_out[rt_group] + run_within_tile).astype(np.int64)
    within_run = np.arange(m, dtype=np.int64) - np.repeat(run_starts,
                                                          run_counts)
    pos = np.repeat(run_out, run_counts) + within_run

    r_loc = (rows[order] & (Wp - 1)).astype(np.int32)
    c_loc = (cols[order] & (WB - 1)).astype(np.int32)
    loc = np.zeros(m_pad, np.int32)
    loc[pos] = (1 << 30) | (r_loc << WB_BITS) | c_loc

    # per-lane-row absolute window word-row (the 'aligned' sweep feed),
    # shaped (n_chunks, 128): one 512 B row DMA'd into SMEM per chunk
    nlr_run = (run_pad // LANE).astype(np.int64)
    lrow_pos = (np.repeat(run_out // LANE, nlr_run)
                + np.concatenate([np.arange(k) for k in nlr_run])
                if len(nlr_run) else np.zeros(0, np.int64))
    abs_row = ((t_sorted[run_starts] % n_cb) * (WB // 32 // LANE)
               + chi_sorted[run_starts]).astype(np.int32)
    swrow = np.zeros(m_pad // LANE, np.int32)
    swrow[lrow_pos.astype(np.int64)] = np.repeat(abs_row, nlr_run)

    # per-sub-block window offsets + sweep bounds, packed into one int32
    # per sub-block — (word_row_offset << 10) | (smin << 5) | smax — so
    # BOTH the scalar-prefetch and the DMA'd-row paths carry the pruning
    # bounds with zero extra operands (offsets ≤ n_wrows ≈ 2^13 at scale
    # 25; smin/smax ∈ [0, 32))
    nsb = m_pad // SUBB
    sb_cb = np.zeros(nsb, np.int64)
    sb_fill = np.repeat(t_sorted[starts] % n_cb, padded // SUBB)
    # place per-tile runs at their (possibly panel-padded) positions
    sb_pos = np.repeat(tile_out // SUBB, padded // SUBB) + \
        np.concatenate([np.arange(k) for k in padded // SUBB]) \
        if len(padded) else np.zeros(0, np.int64)
    sb_cb[sb_pos.astype(np.int64)] = sb_fill

    chi_min = np.full(m_pad, 32, np.int32)
    chi_min[pos] = chi_all[order]
    chi_max = np.full(m_pad, -1, np.int32)
    chi_max[pos] = chi_all[order]
    smin = np.minimum(chi_min.reshape(nsb, SUBB).min(1), 31)
    smax = np.maximum(chi_max.reshape(nsb, SUBB).max(1), 0)
    smax = np.maximum(smax, smin)
    c_blk_flat = ((sb_cb * (WB // 32 // LANE)) << 10 | (smin << 5)
                  | smax).astype(np.int32)

    n_chunks = m_pad // chunk
    # SMEM budget call: a flat scalar-prefetch c_blk costs nsb·4 B of SMEM
    # (1 MB total budget; blew up at scale 24 where nsb ≈ 260K). Big plans
    # switch to one 128-lane row per chunk, DMA'd from HBM in-kernel (HBM
    # slices must be lane-tiling-aligned, so .at[c] fetches a whole row).
    if dma_cblk is None:
        dma_cblk = nsb > 120_000
    if dma_cblk:
        c_blk = np.zeros((n_chunks, LANE), np.int32)
        c_blk[:, :CHUNKB_SUBS] = c_blk_flat.reshape(n_chunks, CHUNKB_SUBS)
    else:
        c_blk = c_blk_flat
    rp_c = np.zeros(n_chunks, np.int64)
    ch_of_rp = rp_tot_pad // chunk
    rp_ids = np.repeat(tile_rp[rp_head], ch_of_rp)
    rp_c[: len(rp_ids)] = rp_ids
    pmask = np.zeros(n_out_pad >> wp_bits, np.float32)
    pmask[np.unique(tile_rp)] = 1.0
    visited = np.repeat(pmask, Wp // LANE)
    return BitmapPlan(n_out, n_in, n_out_pad, n_wrows, m_pad,
                      jnp.asarray(loc), jnp.asarray(c_blk),
                      jnp.asarray(rp_c, jnp.int32).reshape(-1),
                      jnp.asarray(visited),
                      jnp.asarray(swrow.reshape(n_chunks, LANE)),
                      dma_cblk=dma_cblk, wp_bits=wp_bits)


def pad_bitmap_plan(plan: BitmapPlan, m_pad_target: int) -> BitmapPlan:
    """Grow a plan's edge stream to m_pad_target (a chunk multiple) so
    same-shape plans can be STACKED across shards and fed through
    shard_map as sharded pytree leaves. Pad chunks carry valid=0 edges,
    window 0, sweep [0, 0], and — critically — the LAST real chunk's
    row-panel id, so the `first`-chunk zeroing never re-fires on panel 0
    and the pads contribute nothing."""
    if plan.m_pad == m_pad_target:
        return plan
    chunk = SUBB * CHUNKB_SUBS
    assert m_pad_target % chunk == 0 and m_pad_target > plan.m_pad
    extra = m_pad_target - plan.m_pad
    loc = jnp.concatenate([plan.loc, jnp.zeros((extra,), jnp.int32)])
    n_extra_chunks = extra // chunk
    rp = jnp.concatenate([plan.rp,
                          jnp.full((n_extra_chunks,), plan.rp[-1],
                                   plan.rp.dtype)])
    if plan.dma_cblk:
        c_blk = jnp.concatenate(
            [plan.c_blk, jnp.zeros((n_extra_chunks, LANE), jnp.int32)])
    else:
        c_blk = jnp.concatenate(
            [plan.c_blk, jnp.zeros((extra // SUBB,), jnp.int32)])
    swrow = jnp.concatenate(
        [plan.swrow, jnp.zeros((n_extra_chunks, LANE), jnp.int32)])
    return BitmapPlan(plan.n_out, plan.n_in, plan.n_out_pad, plan.n_wrows,
                      m_pad_target, loc, c_blk, rp, plan.visited, swrow,
                      dma_cblk=plan.dma_cblk, wp_bits=plan.wp_bits)


def _kernel_bitmap_dma(rp_ref, cblk_hbm, w_ref, loc_ref, swrow_hbm, y_ref,
                       cb_smem, sem, wg_ref, sw_smem, sem_sw, *,
                       wp_rows: int = W_ROWS, sweep: str = "fori",
                       interp: bool = False):
    c = pl.program_id(0)
    # this chunk's 8 window offsets: tiny HBM→SMEM DMA (the full per-sub-
    # block array is ~1 MB of int32 at scale 24 — over the SMEM budget as
    # a scalar-prefetch operand)
    copy = pltpu.make_async_copy(cblk_hbm.at[c], cb_smem, sem)
    copy.start()
    # interpret mode reads the ANY-space operand directly — the emulated
    # HBM→SMEM scalar DMA segfaulted flakily under the full test suite
    sw_of = lambda i: swrow_hbm[c, i]
    if sweep == "aligned" and not interp:
        sw_cp = pltpu.make_async_copy(swrow_hbm.at[c], sw_smem, sem_sw)
        sw_cp.start()
        sw_of = lambda i: sw_smem[i]

    first = jnp.logical_or(c == 0, rp_ref[c] != rp_ref[jnp.maximum(c - 1, 0)])

    @pl.when(first)
    def _():
        y_ref[:] = jnp.zeros(y_ref.shape, y_ref.dtype)

    copy.wait()
    if sweep == "aligned" and not interp:
        sw_cp.wait()
    _bitmap_chunk_body(lambda sb: cb_smem[sb], c, w_ref, loc_ref, y_ref,
                       wg_ref, sw_of, wp_rows, sweep)


def _kernel_bitmap_prefetch(cblk_ref, rp_ref, w_ref, loc_ref, swrow_hbm,
                            y_ref, wg_ref, sw_smem, sem_sw, *,
                            wp_rows: int = W_ROWS, sweep: str = "fori",
                            interp: bool = False):
    c = pl.program_id(0)
    sw_of = lambda i: swrow_hbm[c, i]
    if sweep == "aligned" and not interp:
        # per-lane-row window rows for this chunk: one 512 B HBM→SMEM DMA
        sw_cp = pltpu.make_async_copy(swrow_hbm.at[c], sw_smem, sem_sw)
        sw_cp.start()
        sw_of = lambda i: sw_smem[i]
    first = jnp.logical_or(c == 0, rp_ref[c] != rp_ref[jnp.maximum(c - 1, 0)])

    @pl.when(first)
    def _():
        y_ref[:] = jnp.zeros(y_ref.shape, y_ref.dtype)

    if sweep == "aligned" and not interp:
        sw_cp.wait()
    _bitmap_chunk_body(lambda sb: cblk_ref[c * CHUNKB_SUBS + sb], c, w_ref,
                       loc_ref, y_ref, wg_ref, sw_of, wp_rows, sweep)


def _bitmap_chunk_body(c0_of, c, w_ref, loc_ref, y_ref, wg_ref, sw_of,
                       wp_rows, sweep: str = "fori"):
    for sb in range(CHUNKB_SUBS):
        packed = c0_of(sb)           # (offset << 10) | (smin << 5) | smax
        c0 = packed >> 10
        lv = loc_ref[sb * SUBB_ROWS:(sb + 1) * SUBB_ROWS, :]

        cl = lv & (WB - 1)
        whi = cl >> 12               # word-row within the 32-row window
        wlo = (cl >> 5) & (LANE - 1)
        bitpos = cl & 31

        def _sweep_step(s, wg):
            row = w_ref[pl.ds(c0 + s, 1), :]
            cand = jnp.take_along_axis(
                jnp.broadcast_to(row, wlo.shape), wlo, axis=1)
            return jnp.where(whi == s, cand, wg)

        if sweep == "fori":
            # edges are chi-sorted within each tile (build lexsort):
            # [smin, smax] typically spans a fraction of the 32 rows
            wg = jax.lax.fori_loop((packed >> 5) & 31, (packed & 31) + 1,
                                   _sweep_step,
                                   jnp.zeros(cl.shape, jnp.int32))
        elif sweep == "bank":
            wg, = _bank_sweep(lambda s: w_ref[pl.ds(c0 + s, 1), :],
                              [(whi, wlo)], (packed >> 5) & 31, packed & 31,
                              [wg_ref], 32)
        elif sweep == "aligned":
            # runs are lane-row aligned (build_plan_bitmap run padding):
            # copy each query row's single window row into scratch, then
            # gather all SUBB queries with ONE take_along_axis — replaces
            # the 32-pass sweep with SUBB_ROWS row copies + one shuffle
            for s in range(SUBB_ROWS):
                wg_ref[pl.ds(s, 1), :] = w_ref[
                    pl.ds(sw_of(sb * SUBB_ROWS + s), 1), :]
            wg = jnp.take_along_axis(wg_ref[:], wlo, axis=1)
        else:
            wg = jnp.zeros(cl.shape, jnp.int32)
            for s in range(32):
                wg = _sweep_step(s, wg)
        bit = jax.lax.shift_right_logical(wg, bitpos) & 1
        valid = jax.lax.shift_right_logical(lv, 30) & 1
        # 0/1 products: int8 one-hots with int32 accumulation are exact
        # and run the MXU at its int8 rate. Build masks/selects in int32
        # ((8,128)-tiled) and cast to int8 only at the matmul operands —
        # Mosaic rejects i1 relayouts straight into the (32,128) int8 tiling
        p = bit & valid

        rl = (lv >> WB_BITS) & (wp_rows * LANE - 1)
        rhi = (rl >> 7).reshape(1, SUBB)
        rlo = (rl & (LANE - 1)).reshape(1, SUBB)
        pf = p.reshape(1, SUBB)

        ia = jax.lax.broadcasted_iota(jnp.int32, (wp_rows, SUBB), 0)
        A = jnp.where(jnp.broadcast_to(rhi, (wp_rows, SUBB)) == ia,
                      jnp.broadcast_to(pf, (wp_rows, SUBB)), 0)
        ib = jax.lax.broadcasted_iota(jnp.int32, (LANE, SUBB), 0)
        Bt = jnp.where(jnp.broadcast_to(rlo, (LANE, SUBB)) == ib, 1, 0)
        M = jax.lax.dot_general(A.astype(jnp.int8), Bt.astype(jnp.int8),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
        y_ref[:] += M


def spmv_bilinear_bitmap(plan: BitmapPlan, words: jnp.ndarray,
                         interpret: Optional[bool] = None,
                         sweep: Optional[str] = None) -> jnp.ndarray:
    """y[i] = count of plan edges (i,j) whose bit j is set in `words`
    (the packed frontier bitmap, ops/pallas/orpull.pack_bitmap). (y > 0) is
    the struconly or-pull result at any graph scale."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if sweep is None:
        # per-kernel knob only: r3's bench pinned a shared knob from a
        # bitmap timing and accidentally forced the VALUE kernel onto the
        # 3.7x-slower fori sweep (77.6 -> 5.3 GB/s) — never couple them.
        # Default 'aligned' (hardware-measured 2026-08-19, rmat18:
        # 0.86 ms/iter vs 1.01 unroll / 1.70 bank; run padding +10.4% vs
        # +7.9% — the lane-row-aligned runs turn the 32-pass window sweep
        # into 16 row copies + one take_along_axis).
        sweep = os.environ.get("GRB_BITMAP_SWEEP", "aligned").lower()
    return _spmv_bilinear_bitmap(plan, words, interpret, sweep)


@functools.partial(jax.jit, static_argnames=("interpret", "sweep"))
def _spmv_bilinear_bitmap(plan: BitmapPlan, words: jnp.ndarray,
                          interpret: bool = False,
                          sweep: str = "fori") -> jnp.ndarray:
    nw = words.shape[0]
    w2d = jnp.pad(words, (0, plan.n_wrows * LANE - nw)).reshape(
        plan.n_wrows, LANE)

    chunk_rows = CHUNKB_SUBS * SUBB_ROWS
    n_chunks = plan.m_pad // (CHUNKB_SUBS * SUBB)
    wp_rows = (1 << plan.wp_bits) // LANE

    if plan.dma_cblk:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),   # c_blk stays in HBM
                pl.BlockSpec(memory_space=pltpu.VMEM),  # bitmap table
                pl.BlockSpec((chunk_rows, LANE), lambda c, rp: (c, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),   # swrow stays in HBM
            ],
            out_specs=pl.BlockSpec((wp_rows, LANE),
                                   lambda c, rp: (rp[c], 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SMEM((LANE,), jnp.int32),
                            pltpu.SemaphoreType.DMA(()),
                            pltpu.VMEM((SUBB_ROWS, LANE), jnp.int32),
                            pltpu.SMEM((LANE,), jnp.int32),
                            pltpu.SemaphoreType.DMA(())],
        )
        y2d = pl.pallas_call(
            functools.partial(_kernel_bitmap_dma, wp_rows=wp_rows,
                              sweep=sweep, interp=interpret),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((plan.n_out_pad // LANE, LANE),
                                           jnp.int32),
            interpret=interpret,
        )(plan.rp, plan.c_blk, w2d, plan.loc.reshape(-1, LANE), plan.swrow)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # bitmap table
                pl.BlockSpec((chunk_rows, LANE), lambda c, cb, rp: (c, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),   # swrow stays in HBM
            ],
            out_specs=pl.BlockSpec((wp_rows, LANE),
                                   lambda c, cb, rp: (rp[c], 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((SUBB_ROWS, LANE), jnp.int32),
                            pltpu.SMEM((LANE,), jnp.int32),
                            pltpu.SemaphoreType.DMA(())],
        )
        y2d = pl.pallas_call(
            functools.partial(_kernel_bitmap_prefetch, wp_rows=wp_rows,
                              sweep=sweep, interp=interpret),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((plan.n_out_pad // LANE, LANE),
                                           jnp.int32),
            interpret=interpret,
        )(plan.c_blk, plan.rp, w2d, plan.loc.reshape(-1, LANE), plan.swrow)
    # unvisited panels hold garbage (where, not multiply)
    y2d = jnp.where(plan.visited[:, None] > 0, y2d, 0)
    return y2d.reshape(-1)[:plan.n_out]


def plan_for(A, transpose: bool = False,
             host_val: Optional[np.ndarray] = None,
             ones: bool = False) -> Optional["BilinearPlan"]:
    """Cached plan for one pull orientation of Matrix `A`.

    transpose=False → mxv pull (y = A·x, CSR); True → vxm pull (y = Aᵀ·x,
    CSC). Above the VMEM residency limit the windowed-DMA F32DmaPlan is
    built instead (spmv_bilinear routes on the plan type), so value pulls
    stay on the bilinear path at ANY scale; returns None only when the
    needed orientation has no host-side stash (matrices rebuilt inside
    jit) or GRB_BILINEAR_DMA=0. `host_val` overrides the stored values
    (e.g. PR's α/outdegree scaling) — such plans are NOT cached.
    `ones=True` forces unit values (struconly traversals: y then counts
    frontier neighbors regardless of edge weights)."""
    n_out, n_in = (A.ncols, A.nrows) if transpose else (A.nrows, A.ncols)
    resident = bilinear_available(n_out, n_in)
    if not resident and os.environ.get("GRB_BILINEAR_DMA", "1") != "1":
        return None
    host = getattr(A, "_host_csc" if transpose else "_host_csr", None)
    if host is None:
        return None
    # pack=2 default: pairing edges that share (tile, output lane) cut the
    # one-hot MXU columns 1.71x at rmat18 and measured 1.63x end-to-end
    # (1.96 → 1.20 ms with hilo, tools/tpu_bilinear_test.py 2026-08-19)
    pack = int(os.environ.get("GRB_BILINEAR_PACK", "2"))
    cache = getattr(A, "_bilinear_plans", None)
    key = (("csc" if transpose else "csr") + ("/ones" if ones else "")
           + (f"/pack{pack}" if pack != 1 else "")
           + ("" if resident else "/dma"))
    if host_val is None and cache is not None and key in cache:
        return cache[key]
    ptr, ind, val = host
    if ones:
        val = None
    use_val = val if host_val is None else host_val
    if resident:
        plan = build_plan(ptr, ind, use_val, n_out, n_in, pack=pack)
    else:
        plan = build_plan_f32dma(ptr, ind, use_val, n_out, n_in)
    if host_val is None:
        if cache is None:
            cache = {}
            object.__setattr__(A, "_bilinear_plans", cache)
        cache[key] = plan
    return plan


def plan_for_bitmap(A, transpose: bool = False) -> Optional["BitmapPlan"]:
    """Cached BitmapPlan for struconly pulls — no VMEM size gate (the packed
    bitmap is n/8 bytes; y streams out per row panel)."""
    n_out, n_in = (A.ncols, A.nrows) if transpose else (A.nrows, A.ncols)
    host = getattr(A, "_host_csc" if transpose else "_host_csr", None)
    if host is None:
        return None
    cache = getattr(A, "_bilinear_plans", None)
    key = ("csc" if transpose else "csr") + "/bitmap"
    if cache is not None and key in cache:
        return cache[key]
    ptr, ind, _ = host
    plan = build_plan_bitmap(ptr, ind, n_out, n_in)
    if cache is None:
        cache = {}
        object.__setattr__(A, "_bilinear_plans", cache)
    cache[key] = plan
    return plan


# ---------------------------------------------------------------------------
# Windowed-DMA f32 variant: VALUE pulls at ANY scale
# ---------------------------------------------------------------------------
#
# The resident f32 kernel needs x AND y in VMEM (n ≤ ~1.5M); above that,
# value SpMV/PR fell back to the sorted pipeline (~1.3 ns/edge). This
# variant removes both residency requirements, combining the bitmap
# kernel's structure with f32 values:
#   * y streams out per 8192-row panel through the output BlockSpec
#     (tiles are panel-grouped and panel-chunk-padded at build time);
#   * each tile's 65536-col x window (512 f32 table rows, 256 KB) is
#     DMA'd HBM→VMEM once per TILE (same-window sub-blocks skip the
#     fetch — an SMEM-carried prev-window id gates the copy);
#   * per-sub-block metadata (x-window row, sweep smin/smax) rides one
#     128-lane int32 row per chunk, DMA'd into SMEM (same SMEM-budget
#     rationale as BitmapPlan.c_blk).
#
# Cost model (rmat22, measured padding 2026-08-17): 8192×65536 tiles pad
# the 128.3M-edge stream 1.13× (4096² tiles pad 8.4× — unusable); total
# x-window traffic = (#panels)·(x bytes) = 512 × 16.8 MB ≈ 8.6 GB ≈ 11 ms
# at HBM speed, vs the sorted pipeline's ~167 ms/iteration.

WD_R_BITS = 13               # 8192-row output panels (64 y table rows)
WD_C_BITS = 16               # 65536-col x windows (512 x table rows)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class F32DmaPlan:
    """Static tiling for spmv_bilinear_dma. loc packs
    (row_loc<<wc_bits | col_loc) — 13+16=29 bits; pad slots carry val 0.
    meta (n_chunks,128): per-chunk lanes [0:16)=x-window row starts,
    [16:32)=smin, [32:48)=smax."""

    n_out: int
    n_in: int
    n_out_pad: int           # round_up(n_out, 2^wr_bits) — row panels
    n_xrows: int             # x table rows incl. window padding
    m_pad: int
    loc: jnp.ndarray
    val: jnp.ndarray
    meta: jnp.ndarray
    rp: jnp.ndarray          # (n_chunks,) row-panel index per chunk
    visited: jnp.ndarray     # (n_out_pad//128,) 1.0 iff panel has edges
    unit_vals: bool = False
    wr_bits: int = WD_R_BITS
    wc_bits: int = WD_C_BITS

    def tree_flatten(self):
        return ((self.loc, self.val, self.meta, self.rp, self.visited),
                (self.n_out, self.n_in, self.n_out_pad, self.n_xrows,
                 self.m_pad, self.unit_vals, self.wr_bits, self.wc_bits))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        *dims, unit, wr, wc = aux
        return cls(*dims, *leaves, unit_vals=unit, wr_bits=wr, wc_bits=wc)


def build_plan_f32dma(ptr, ind, val, n_out: int, n_in: int,
                      wr_bits: int = WD_R_BITS,
                      wc_bits: int = WD_C_BITS) -> F32DmaPlan:
    """Host tiling for the windowed-DMA f32 kernel (any n_out/n_in)."""
    assert wr_bits + wc_bits <= 31, "loc must pack into non-negative int32"
    Wr, Wc = 1 << wr_bits, 1 << wc_bits
    wc_rows = Wc // LANE
    ptr_np = np.asarray(ptr, dtype=np.int64)
    m = int(ptr_np[-1])
    n_out_pad = max(round_up(n_out, Wr), Wr)
    n_cb = max(round_up(n_in, Wc), Wc) >> wc_bits
    n_xrows = n_cb * wc_rows
    chunk = SUB * CHUNK_SUBS

    if m == 0:
        nch = 1
        meta = np.zeros((nch, LANE), np.int32)
        return F32DmaPlan(
            n_out, n_in, n_out_pad, n_xrows, chunk,
            jnp.zeros((chunk,), jnp.int32), jnp.zeros((chunk,), jnp.float32),
            jnp.asarray(meta), jnp.zeros((nch,), jnp.int32),
            jnp.zeros((n_out_pad // LANE,), jnp.float32),
            unit_vals=val is None, wr_bits=wr_bits, wc_bits=wc_bits)

    rows = np.repeat(np.arange(n_out, dtype=np.int64), np.diff(ptr_np))
    cols = np.asarray(ind, dtype=np.int64)[:m]
    vals = (np.asarray(val, dtype=np.float32)[:m] if val is not None
            else np.ones(m, np.float32))

    rp_e = rows >> wr_bits
    tile = rp_e * n_cb + (cols >> wc_bits)
    chi_all = ((cols & (Wc - 1)) >> 7).astype(np.int32)
    order = np.lexsort((chi_all, tile))
    t_sorted = tile[order]

    head = np.r_[True, t_sorted[1:] != t_sorted[:-1]]
    starts = np.flatnonzero(head)
    counts = np.diff(np.r_[starts, m])
    padded = ((counts + SUB - 1) // SUB) * SUB

    # pad each ROW PANEL's stream to a chunk multiple so every chunk maps
    # to exactly one output panel (bitmap builder's layout)
    tile_rp = t_sorted[starts] // n_cb
    rp_head = np.r_[True, tile_rp[1:] != tile_rp[:-1]]
    rp_group = np.cumsum(rp_head) - 1
    rp_tot = np.bincount(rp_group, weights=padded).astype(np.int64)
    rp_tot_pad = ((rp_tot + chunk - 1) // chunk) * chunk
    rp_base = np.r_[0, np.cumsum(rp_tot_pad)]
    within_panel = np.concatenate(
        [np.r_[0, np.cumsum(padded[rp_group == g])[:-1]]
         for g in range(len(rp_tot))]) if len(rp_tot) else np.zeros(0)
    tile_out = rp_base[rp_group] + within_panel
    total = int(rp_base[-1])
    m_pad = max(total, chunk)

    within = np.arange(m, dtype=np.int64) - np.repeat(starts, counts)
    pos = np.repeat(tile_out.astype(np.int64), counts) + within

    r_loc = (rows[order] & (Wr - 1)).astype(np.int32)
    c_loc = (cols[order] & (Wc - 1)).astype(np.int32)
    loc = np.zeros(m_pad, np.int32)
    loc[pos] = (r_loc << wc_bits) | c_loc
    vstream = np.zeros(m_pad, np.float32)
    vstream[pos] = vals[order]

    # per-sub-block x-window starts + sweep bounds → per-chunk meta rows.
    # Dummy tail sub-blocks inherit the PREVIOUS window id (backfilled
    # below) so they never trigger a pointless window DMA.
    nsb = m_pad // SUB
    sb_cb = np.full(nsb, -1, np.int64)
    sb_pos = (np.repeat(tile_out // SUB, padded // SUB)
              + np.concatenate([np.arange(k) for k in padded // SUB]))
    sb_cb[sb_pos.astype(np.int64)] = np.repeat(t_sorted[starts] % n_cb,
                                               padded // SUB)
    empty = sb_cb < 0
    if empty.any():
        idx = np.arange(nsb)
        fill = np.maximum.accumulate(np.where(~empty, idx, -1))
        sb_cb = np.where(fill >= 0, sb_cb[np.maximum(fill, 0)], 0)
    c0 = (sb_cb * wc_rows).astype(np.int32)

    chi_min = np.full(m_pad, wc_rows, np.int32)
    chi_min[pos] = chi_all[order]
    chi_max = np.full(m_pad, -1, np.int32)
    chi_max[pos] = chi_all[order]
    smin = np.minimum(chi_min.reshape(nsb, SUB).min(1), wc_rows - 1)
    smax = np.maximum(chi_max.reshape(nsb, SUB).max(1), 0)
    smax = np.maximum(smax, smin)

    n_chunks = m_pad // chunk
    meta = np.zeros((n_chunks, LANE), np.int32)
    meta[:, 0:CHUNK_SUBS] = c0.reshape(n_chunks, CHUNK_SUBS)
    meta[:, CHUNK_SUBS:2 * CHUNK_SUBS] = smin.reshape(n_chunks, CHUNK_SUBS)
    meta[:, 2 * CHUNK_SUBS:3 * CHUNK_SUBS] = smax.reshape(n_chunks,
                                                          CHUNK_SUBS)

    rp_c = np.zeros(n_chunks, np.int64)
    ch_of_rp = rp_tot_pad // chunk
    rp_ids = np.repeat(tile_rp[rp_head], ch_of_rp)
    rp_c[: len(rp_ids)] = rp_ids
    pmask = np.zeros(n_out_pad >> wr_bits, np.float32)
    pmask[np.unique(tile_rp)] = 1.0
    visited = np.repeat(pmask, Wr // LANE)
    return F32DmaPlan(n_out, n_in, n_out_pad, n_xrows, m_pad,
                      jnp.asarray(loc), jnp.asarray(vstream),
                      jnp.asarray(meta), jnp.asarray(rp_c, jnp.int32),
                      jnp.asarray(visited), unit_vals=val is None,
                      wr_bits=wr_bits, wc_bits=wc_bits)


def pad_f32dma_plan(plan: F32DmaPlan, m_pad_target: int) -> F32DmaPlan:
    """Grow a windowed-DMA plan's edge stream to m_pad_target so per-shard
    plans stack (pad_bitmap_plan's contract): pad chunks carry val 0
    (inert products), window 0 with sweep [0, 0], and the LAST real
    chunk's panel id so the first-chunk zeroing never re-fires."""
    if plan.m_pad == m_pad_target:
        return plan
    chunk = SUB * CHUNK_SUBS
    assert m_pad_target % chunk == 0 and m_pad_target > plan.m_pad
    extra = m_pad_target - plan.m_pad
    n_extra = extra // chunk
    loc = jnp.concatenate([plan.loc, jnp.zeros((extra,), jnp.int32)])
    val = jnp.concatenate([plan.val, jnp.zeros((extra,), jnp.float32)])
    meta = jnp.concatenate([plan.meta,
                            jnp.zeros((n_extra, LANE), jnp.int32)])
    rp = jnp.concatenate([plan.rp, jnp.full((n_extra,), plan.rp[-1],
                                            plan.rp.dtype)])
    return F32DmaPlan(plan.n_out, plan.n_in, plan.n_out_pad, plan.n_xrows,
                      m_pad_target, loc, val, meta, rp, plan.visited,
                      unit_vals=plan.unit_vals, wr_bits=plan.wr_bits,
                      wc_bits=plan.wc_bits)


def _kernel_f32_dma(rp_ref, meta_hbm, x_hbm, loc_ref, val_ref, y_ref,
                    meta_smem, prev_smem, xw, sem_m, sem_x, xg_ref, *,
                    wr_bits: int, wc_bits: int, matmul: str = "highest",
                    sweep: str = "fori"):
    c = pl.program_id(0)
    wr_rows = (1 << wr_bits) // LANE
    wc_rows = (1 << wc_bits) // LANE
    Wc = 1 << wc_bits

    mcp = pltpu.make_async_copy(meta_hbm.at[c], meta_smem, sem_m)
    mcp.start()

    @pl.when(c == 0)
    def _():
        prev_smem[0] = -1      # no window resident yet

    first = jnp.logical_or(c == 0, rp_ref[c] != rp_ref[jnp.maximum(c - 1, 0)])

    @pl.when(first)
    def _():
        y_ref[:] = jnp.zeros(y_ref.shape, y_ref.dtype)

    mcp.wait()

    for sb in range(CHUNK_SUBS):
        c0 = meta_smem[sb]

        # fetch the 256 KB x window only when it CHANGED — consecutive
        # sub-blocks of one tile share it (tiles hold ~4 sub-blocks at
        # rmat22, so this cuts window traffic ~4x); the synchronous wait
        # costs one DMA latency per tile, amortized over its sub-blocks
        @pl.when(c0 != prev_smem[0])
        def _():
            cp = pltpu.make_async_copy(x_hbm.at[pl.ds(c0, wc_rows)], xw,
                                       sem_x)
            cp.start()
            cp.wait()
            prev_smem[0] = c0

        lv = loc_ref[sb * SUB_ROWS:(sb + 1) * SUB_ROWS, :]
        vv = val_ref[sb * SUB_ROWS:(sb + 1) * SUB_ROWS, :]
        cl = lv & (Wc - 1)
        chi = cl >> 7
        clo = cl & (LANE - 1)

        def _sweep_step(s, xg):
            row = xw[pl.ds(s, 1), :]
            cand = jnp.take_along_axis(
                jnp.broadcast_to(row, clo.shape), clo, axis=1)
            return jnp.where(chi == s, cand, xg)

        if sweep == "bank":
            xg, = _bank_sweep(lambda s: xw[pl.ds(s, 1), :], [(chi, clo)],
                              meta_smem[CHUNK_SUBS + sb],
                              meta_smem[2 * CHUNK_SUBS + sb],
                              [xg_ref], (1 << wc_bits) // LANE)
        else:
            xg = jax.lax.fori_loop(meta_smem[CHUNK_SUBS + sb],
                                   meta_smem[2 * CHUNK_SUBS + sb] + 1,
                                   _sweep_step,
                                   jnp.zeros(clo.shape, y_ref.dtype))
        p = xg * vv

        rl = lv >> wc_bits
        rhi = (rl >> 7).reshape(1, SUB)
        rlo = (rl & (LANE - 1)).reshape(1, SUB)
        pf = p.reshape(1, SUB)
        ia = jax.lax.broadcasted_iota(jnp.int32, (wr_rows, SUB), 0)
        ib = jax.lax.broadcasted_iota(jnp.int32, (LANE, SUB), 0)
        A = jnp.where(jnp.broadcast_to(rhi, (wr_rows, SUB)) == ia,
                      jnp.broadcast_to(pf, (wr_rows, SUB)), 0.0)
        hot_b = jnp.broadcast_to(rlo, (LANE, SUB)) == ib
        if matmul == "hilo":
            Bt = hot_b.astype(jnp.bfloat16)
            A_hi = A.astype(jnp.bfloat16)
            A_lo = (A - A_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            M = jax.lax.dot_general(A_hi, Bt, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            M = M + jax.lax.dot_general(A_lo, Bt, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
        else:
            Bt = hot_b.astype(y_ref.dtype)
            M = jax.lax.dot_general(A, Bt, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.HIGHEST)
        y_ref[:] += M


def spmv_bilinear_dma(plan: F32DmaPlan, x: jnp.ndarray,
                      interpret: Optional[bool] = None,
                      matmul: Optional[str] = None,
                      sweep: Optional[str] = None) -> jnp.ndarray:
    """Plus-monoid value SpMV at any scale (x windows DMA'd per tile,
    y streamed per panel)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if matmul is None:
        matmul = os.environ.get("GRB_BILINEAR_MATMUL", "hilo").lower()
    if sweep is None:
        sweep = os.environ.get("GRB_BILINEAR_SWEEP", "fori").lower()
    return _spmv_bilinear_dma(plan, x, interpret, matmul, sweep)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "matmul", "sweep"))
def _spmv_bilinear_dma(plan: F32DmaPlan, x: jnp.ndarray,
                       interpret: bool = False,
                       matmul: str = "highest",
                       sweep: str = "fori") -> jnp.ndarray:
    x_p = jnp.pad(x.astype(jnp.float32),
                  (0, plan.n_xrows * LANE - x.shape[0]))
    x2d = x_p.reshape(plan.n_xrows, LANE)

    chunk_rows = CHUNK_SUBS * SUB_ROWS
    n_chunks = plan.m_pad // (CHUNK_SUBS * SUB)
    wr_rows = (1 << plan.wr_bits) // LANE
    wc_rows = (1 << plan.wc_bits) // LANE

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # meta stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),   # x table stays in HBM
            pl.BlockSpec((chunk_rows, LANE), lambda c, rp: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk_rows, LANE), lambda c, rp: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wr_rows, LANE), lambda c, rp: (rp[c], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((LANE,), jnp.int32),
                        pltpu.SMEM((1,), jnp.int32),
                        pltpu.VMEM((wc_rows, LANE), jnp.float32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.VMEM((SUB_ROWS, LANE), jnp.float32)],
    )
    y2d = pl.pallas_call(
        functools.partial(_kernel_f32_dma, wr_bits=plan.wr_bits,
                          wc_bits=plan.wc_bits, matmul=matmul, sweep=sweep),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.n_out_pad // LANE, LANE),
                                       jnp.float32),
        interpret=interpret,
    )(plan.rp, plan.meta, x2d, plan.loc.reshape(-1, LANE),
      plan.val.reshape(-1, LANE))
    y2d = jnp.where(plan.visited[:, None] > 0, y2d, 0)
    return y2d.reshape(-1)[:plan.n_out]
