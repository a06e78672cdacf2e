"""Tiled one-hot MONOID pull — min/max-⊕ SpMV on the bilinear machinery.

The bilinear kernel (bilinear.py) rides the MXU because Plus-⊕ IS a matmul
sum. Min/Max-⊕ semirings (SSSP's MinimumPlus, CC's MinimumSelectSecond,
MIS/GC's MaximumMultiplies) cannot sum duplicates, so they previously fell
back to the sorted pipeline (ops/spmv.py spmv_pull_sorted — monotone gather
+ full-edge segmented ⊕, ~1.3 ns/edge with ~10 streaming passes). This
kernel keeps the bilinear tiling and turns the MXU matmul from an
accumulator into a SELECTOR:

  * Build time: edges bucketed into 4096×4096 tiles as in build_plan, but
    lexsorted (tile, row, chi) so every output row's edges are CONTIGUOUS
    lanes within each 1024-edge sub-block.
  * Kernel, per sub-block:
      - gather x via the same 32-row VMEM window sweep;
      - ⊗ products on the VPU (plus / multiplies / second / first);
      - per-row ⊕ via a 10-step Hillis-Steele run-scan over the 1024 lanes
        (pltpu.roll + row-id equality masks) — each row's total lands on
        its run's TAIL lane;
      - one-hot MXU matmul with ONLY tail lanes live: at most one live lane
        per output row makes the sum a SELECT. A second stacked one-hot row
        block counts presence, so "no edges" (sum = 0) is distinguished
        from a genuine 0 — one (64, SUB) @ (SUB, 128) pass serves both;
      - ⊕-accumulate the selected window into VMEM-resident y under the
        presence mask.

Work per edge ≈ the bilinear value kernel (sweep + 4096 MAC select) + ~20
lane-local roll/compare ops — far under the sorted pipeline's sort-free but
pass-heavy formulation. Deterministic: fixed tile order, ⊕ is associative
and the scan is order-fixed.

Reference analog: the masked/semiring-generic SpMV dispatch
(backend/cuda/spmv.hpp:96-177) — the reference's CUDA kernel templates over
the semiring functors; this is the TPU expression of the same genericity.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...types import round_up
from .bilinear import (CHUNK_SUBS, LANE, SUB, SUB_ROWS, W, W_BITS, W_ROWS,
                       bilinear_available)

PAD_LOC = W << W_BITS          # pad-lane marker: row id W (=4096) can never
#                                match a real in-window row (0..4095) and its
#                                one-hot row W>>7 = 32 falls outside the
#                                (32, SUB) iota — pad lanes form their own
#                                run and select into nothing.

# ⊕ monoids and ⊗ ops the kernel specializes over (trace-time strings —
# the semiring catalog maps onto these in spmv_monoid)
MONO_ADD = {"min": jnp.minimum, "max": jnp.maximum}
_BF16_MAX = 3.3895313892515355e38   # largest finite bfloat16
_SAT_THRESH = 3.3e38                # |select| past this = saturated sentinel
MONO_MUL = {
    "plus": lambda a, x: a + x,
    "mul": lambda a, x: a * x,
    "second": lambda a, x: x,
    "first": lambda a, x: a,
}


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class MonoidPlan:
    """Static (tile, row, chi)-sorted tiling for spmv_monoid — same leaf
    layout as BilinearPlan, different edge order (rows contiguous)."""

    n_out: int
    n_in: int
    n_out_pad: int
    n_in_pad: int
    m_pad: int
    loc: jnp.ndarray         # (m_pad,) int32 (row_loc<<12 | col_loc); pad
    #                          slots carry PAD_LOC
    val: jnp.ndarray         # (m_pad,) f32 edge values (0 on pad slots)
    c_off: jnp.ndarray       # (nsb,) x-window starts (table-row units)
    r_off: jnp.ndarray       # (nsb,) y-window starts
    smin: jnp.ndarray        # (nsb,) sweep bounds (chi range of real edges)
    smax: jnp.ndarray

    def tree_flatten(self):
        return ((self.loc, self.val, self.c_off, self.r_off,
                 self.smin, self.smax),
                (self.n_out, self.n_in, self.n_out_pad, self.n_in_pad,
                 self.m_pad))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*aux, *leaves)


def build_plan_monoid(ptr, ind, val, n_out: int, n_in: int) -> MonoidPlan:
    """Host-side tiling (numpy, once per orientation). (ptr, ind, val) is
    the PULL orientation: y[i] = ⊕_{e ∈ seg i} val[e] ⊗ x[ind[e]];
    val=None means all-ones."""
    ptr_np = np.asarray(ptr, dtype=np.int64)
    m = int(ptr_np[-1])
    n_out_pad = max(round_up(n_out, W), W)
    n_in_pad = max(round_up(n_in, W), W)
    chunk = SUB * CHUNK_SUBS

    if m == 0:
        nsb = CHUNK_SUBS
        return MonoidPlan(
            n_out, n_in, n_out_pad, n_in_pad, chunk,
            jnp.full((chunk,), PAD_LOC, jnp.int32),
            jnp.zeros((chunk,), jnp.float32),
            jnp.zeros((nsb,), jnp.int32), jnp.zeros((nsb,), jnp.int32),
            jnp.zeros((nsb,), jnp.int32), jnp.zeros((nsb,), jnp.int32))

    rows = np.repeat(np.arange(n_out, dtype=np.int64), np.diff(ptr_np))
    cols = np.asarray(ind, dtype=np.int64)[:m]
    vals = (np.asarray(val, dtype=np.float32)[:m] if val is not None
            else np.ones(m, np.float32))

    n_cb = n_in_pad >> W_BITS
    tile = (rows >> W_BITS) * n_cb + (cols >> W_BITS)
    r_loc_all = (rows & (W - 1)).astype(np.int32)
    chi_all = ((cols & (W - 1)) >> 7).astype(np.int32)
    # rows contiguous within each tile (the run-scan invariant); chi as the
    # innermost key keeps the sweep range narrow within each run
    order = np.lexsort((chi_all, r_loc_all, tile))
    t_sorted = tile[order]

    head = np.r_[True, t_sorted[1:] != t_sorted[:-1]]
    starts = np.flatnonzero(head)
    counts = np.diff(np.r_[starts, m])
    padded = ((counts + SUB - 1) // SUB) * SUB
    out_starts = np.r_[0, np.cumsum(padded)]
    total = int(out_starts[-1])
    m_pad = max(round_up(total, chunk), chunk)

    within = np.arange(m, dtype=np.int64) - np.repeat(starts, counts)
    pos = np.repeat(out_starts[:-1], counts) + within

    r_loc = r_loc_all[order]
    c_loc = (cols[order] & (W - 1)).astype(np.int32)
    loc = np.full(m_pad, PAD_LOC, np.int32)
    loc[pos] = (r_loc << W_BITS) | c_loc
    vstream = np.zeros(m_pad, np.float32)
    vstream[pos] = vals[order]

    nsb = m_pad // SUB
    sb_tile = np.zeros(nsb, np.int64)
    sb_tile[: total // SUB] = np.repeat(t_sorted[starts], padded // SUB)
    c_off = ((sb_tile % n_cb) * W_ROWS).astype(np.int32)
    r_off = ((sb_tile // n_cb) * W_ROWS).astype(np.int32)

    chi_min = np.full(m_pad, W_ROWS, np.int32)
    chi_min[pos] = chi_all[order]
    chi_max = np.full(m_pad, -1, np.int32)
    chi_max[pos] = chi_all[order]
    smin = np.minimum(chi_min.reshape(nsb, SUB).min(1), W_ROWS - 1)
    smax = np.maximum(chi_max.reshape(nsb, SUB).max(1), 0)
    smax = np.maximum(smax, smin)

    return MonoidPlan(n_out, n_in, n_out_pad, n_in_pad, m_pad,
                      jnp.asarray(loc), jnp.asarray(vstream),
                      jnp.asarray(c_off), jnp.asarray(r_off),
                      jnp.asarray(smin), jnp.asarray(smax))


def _mono_kernel(c_off_ref, r_off_ref, smin_ref, smax_ref,
                 x_ref, loc_ref, val_ref, y_ref, xg_ref, *,
                 add: str, mul: str, ident: float, sweep: str,
                 matmul: str = "highest", scan: str = "flat",
                 csubs: int = CHUNK_SUBS):
    op = MONO_ADD[add]
    times = MONO_MUL[mul]
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        y_ref[:] = jnp.full(y_ref.shape, ident, y_ref.dtype)

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
            xg = jax.lax.fori_loop(smin_ref[base], smax_ref[base] + 1,
                                   _sweep_step,
                                   jnp.zeros(clo.shape, y_ref.dtype))
        elif sweep == "bank":
            from .bilinear import _bank_sweep

            xg, = _bank_sweep(lambda s: x_ref[pl.ds(c0 + s, 1), :],
                              [(chi, clo)], smin_ref[base], smax_ref[base],
                              [xg_ref], W_ROWS)
        else:
            xg = jnp.zeros(clo.shape, y_ref.dtype)
            for s in range(W_ROWS):
                xg = _sweep_step(s, xg)

        # ⊗ then saturate at ±FLT_MAX: an overflowed product (e.g.
        # FLT_MAX + w, or a·FLT_MAX against an unvisited sentinel) becomes
        # inf, and the HIGHEST-precision matmul's bf16 decomposition turns
        # inf into NaN. Saturation is the sentinel semantics anyway; the
        # extra toward-identity clamp is free (a value past the identity
        # can never beat it under ⊕).
        # hilo clamps to the bf16-representable range instead of FLT_MAX:
        # casting f32 max to bf16 rounds to inf and poisons the A_lo
        # residual; saturated selects are mapped back to the identity after
        # the matmul (the sentinel semantics either way)
        satf = (_BF16_MAX if matmul == "hilo"
                else float(np.finfo(np.float32).max))
        p = jnp.clip(times(vv, xg), -satf, satf)
        p = jnp.minimum(p, satf if ident > _SAT_THRESH else ident) \
            if add == "min" else jnp.maximum(p, max(-satf, ident))

        # run-scan: rows are contiguous (build lexsort), so each row is ONE
        # run; its ⊕-total lands on the run's tail lane. Pad lanes carry
        # row id W — their own run.
        if scan == "flat":
            # r3 formulation: Hillis-Steele over the flattened 1024 lanes —
            # 10 steps of large cross-vreg lane rotations
            rl = (lv >> W_BITS).reshape(1, SUB)
            pf = p.reshape(1, SUB)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, SUB), 1)
            k = 1
            while k < SUB:
                ps = pltpu.roll(pf, shift=k, axis=1)
                rs = pltpu.roll(rl, shift=k, axis=1)
                ok = (lane >= k) & (rs == rl)
                pf = jnp.where(ok, op(pf, ps), pf)
                k *= 2
            # tail detect via a positive roll (shift SUB-1 ≡ -1 mod SUB;
            # Mosaic rolls are rotations)
            nxt = pltpu.roll(rl, shift=SUB - 1, axis=1)
            tail = (lane == SUB - 1) | (nxt != rl)
        else:
            # '2d': segmented scan on the NATIVE (SUB_ROWS, 128) layout —
            # 7 intra-row steps (single-vreg lane rotations) + a 3-step
            # carry scan over the 8 row tails; replaces the flat variant's
            # 10 large rotations (each touching all 8 vregs)
            rl2 = lv >> W_BITS
            p2 = p
            lane = jax.lax.broadcasted_iota(jnp.int32, (SUB_ROWS, LANE), 1)
            rowi = jax.lax.broadcasted_iota(jnp.int32, (SUB_ROWS, LANE), 0)
            k = 1
            while k < LANE:
                ps = pltpu.roll(p2, shift=k, axis=1)
                rs = pltpu.roll(rl2, shift=k, axis=1)
                ok = (lane >= k) & (rs == rl2)
                p2 = jnp.where(ok, op(p2, ps), p2)
                k *= 2
            # carry scan over row tails — full-width (SUB_ROWS, 128)
            # arrays (lane-broadcast of the lane-127 column) so every op
            # stays in the native vreg layout; a run crossing sublane rows
            # continues at the next row's lane 0, and row ids ascend, so
            # equality with the previous row's tail id selects exactly the
            # leading fragment
            lane_last = jnp.broadcast_to(
                jax.lax.broadcasted_iota(jnp.int32, rl2.shape, 1)
                == LANE - 1, rl2.shape)
            # lane-127 value broadcast to all lanes via a 7-step max-style
            # fill: roll+select doubling (avoids (8,1) slicing layouts)
            lastv = jnp.where(lane_last, p2, jnp.zeros_like(p2))
            lastr = jnp.where(lane_last, rl2, jnp.full_like(rl2, -1))
            k = 1
            while k < LANE:
                lastv = jnp.where(lastr >= 0, lastv,
                                  pltpu.roll(lastv, shift=LANE - k, axis=1))
                lastr = jnp.where(lastr >= 0, lastr,
                                  pltpu.roll(lastr, shift=LANE - k, axis=1))
                k *= 2
            k = 1
            while k < SUB_ROWS:
                pv = pltpu.roll(lastv, shift=k, axis=0)
                pr = pltpu.roll(lastr, shift=k, axis=0)
                ok = (rowi >= k) & (pr == lastr)
                lastv = jnp.where(ok, op(lastv, pv), lastv)
                k *= 2
            carryv = pltpu.roll(lastv, shift=1, axis=0)
            carryr = pltpu.roll(lastr, shift=1, axis=0)
            okc = (rowi >= 1) & (carryr == rl2)
            p2 = jnp.where(okc, op(p2, carryv), p2)
            # tails: the next flattened lane (lane+1, or next row's lane 0)
            # belongs to a different run; the very last lane is a tail.
            # int32 mask from the start — i1 shape casts don't lower.
            nin = pltpu.roll(rl2, shift=LANE - 1, axis=1)
            fnr = pltpu.roll(nin, shift=SUB_ROWS - 1, axis=0)
            rl_next = jnp.where(lane == LANE - 1, fnr, nin)
            tail_i = jnp.where(
                (rl2 != rl_next) | ((rowi == SUB_ROWS - 1)
                                    & (lane == LANE - 1)),
                jnp.ones_like(rl2), jnp.zeros_like(rl2))
            rl = rl2.reshape(1, SUB)
            pf = p2.reshape(1, SUB)
            tail = tail_i.reshape(1, SUB) != 0

        # one-hot select on the MXU: only tail lanes live → ≤1 live lane
        # per (rhi, rlo) → the sum IS the run total. Rows [32, 64) of the
        # stacked one-hot count presence (same hot pattern, value 1.0) so
        # absent rows don't clobber y with 0 — one (64, SUB) @ ᵀ(128, SUB)
        # pass serves value and presence together.
        rhi = jax.lax.shift_right_logical(rl, 7)
        rlo = rl & (LANE - 1)
        ia2 = jax.lax.broadcasted_iota(jnp.int32, (2 * W_ROWS, SUB), 0)
        ib = jax.lax.broadcasted_iota(jnp.int32, (LANE, SUB), 0)
        hot2 = (jnp.broadcast_to(rhi, (2 * W_ROWS, SUB)) == (ia2 & (W_ROWS - 1))) \
            & jnp.broadcast_to(tail, (2 * W_ROWS, SUB))
        A2 = jnp.where(hot2,
                       jnp.where(ia2 < W_ROWS,
                                 jnp.broadcast_to(pf, (2 * W_ROWS, SUB)),
                                 1.0),
                       0.0)
        hot_b = jnp.broadcast_to(rlo, (LANE, SUB)) == ib
        if matmul == "hilo":
            # two DEFAULT-precision bf16 passes on a hi/lo split (~16-bit
            # effective mantissa, rel err ~1.5e-5 — well inside the
            # reference's 1e-3 bar) vs HIGHEST's ~6-pass decomposition.
            # Bt and the presence 1.0s are exact in bf16.
            Bt = hot_b.astype(jnp.bfloat16)
            A2_hi = A2.astype(jnp.bfloat16)
            A2_lo = (A2 - A2_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            M2 = jax.lax.dot_general(A2_hi, Bt, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            M2 = M2 + jax.lax.dot_general(A2_lo, Bt,
                                          (((1,), (1,)), ((), ())),
                                          preferred_element_type=jnp.float32)
        else:
            Bt = hot_b.astype(y_ref.dtype)
            M2 = jax.lax.dot_general(A2, Bt, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32,
                                     precision=jax.lax.Precision.HIGHEST)
        M = M2[:W_ROWS]
        P = M2[W_ROWS:]
        if matmul == "hilo":
            # map bf16-saturated selects back to SIGNED ±FLT_MAX. For min
            # monoids +saturated IS the unreached sentinel (FLT_MAX
            # convention, sssp.hpp:26) and ident == +FLT_MAX, so behavior is
            # unchanged; for max monoids a +saturated product is a genuine
            # +huge value — mapping it to ident (= lowest) discarded it and
            # broke MaximumMultiplies (round-4 red test).
            fmax = float(np.finfo(np.float32).max)
            M = jnp.where(M >= _SAT_THRESH, jnp.asarray(fmax, M.dtype),
                          jnp.where(M <= -_SAT_THRESH,
                                    jnp.asarray(-fmax, M.dtype), M))

        cur = y_ref[pl.ds(r0, W_ROWS), :]
        y_ref[pl.ds(r0, W_ROWS), :] = jnp.where(P > 0, op(cur, M), cur)


@functools.partial(jax.jit,
                   static_argnames=("add", "mul", "ident", "interpret",
                                    "sweep", "matmul", "scan"))
def _spmv_monoid(plan: MonoidPlan, x: jnp.ndarray, add: str, mul: str,
                 ident: float, interpret: bool, sweep: str,
                 matmul: str = "highest",
                 scan: str = "flat") -> jnp.ndarray:
    n_in_pad, n_out_pad = plan.n_in_pad, plan.n_out_pad
    # pad slots of x carry the identity so window gathers of padding can
    # never beat a real candidate
    x_p = jnp.full((n_in_pad,), ident, jnp.float32).at[: x.shape[0]].set(
        x.astype(jnp.float32))
    x2d = x_p.reshape(n_in_pad // LANE, LANE)

    # interpret mode: 2 sub-blocks per grid step instead of 16 — the
    # emulated kernel body is traced into the outer jit graph, so an 8x
    # smaller body cuts the CPU test tier's compile bill (the grid just
    # gets 8x longer; m_pad is a 16·SUB multiple either way)
    csubs = 2 if interpret else CHUNK_SUBS
    chunk_rows = csubs * SUB_ROWS
    n_chunks = plan.m_pad // (csubs * SUB)
    stream = pl.BlockSpec((chunk_rows, LANE), lambda c, *_: (c, 0),
                          memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [stream] * 2,
        out_specs=pl.BlockSpec((n_out_pad // LANE, LANE),
                               lambda c, *_: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((SUB_ROWS, LANE), jnp.float32)],
    )
    y2d = pl.pallas_call(
        functools.partial(_mono_kernel, add=add, mul=mul, ident=ident,
                          sweep=sweep, matmul=matmul, scan=scan,
                          csubs=csubs),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out_pad // LANE, LANE),
                                       jnp.float32),
        interpret=interpret,
    )(plan.c_off, plan.r_off, plan.smin, plan.smax,
      x2d, plan.loc.reshape(-1, LANE), plan.val.reshape(-1, LANE))
    return y2d.reshape(-1)[: plan.n_out]


# semiring name → (add, mul) kernel specialization
SEMIRING_MAP = {
    "MinimumPlus": ("min", "plus"),
    "MinimumMultiplies": ("min", "mul"),
    "MinimumSelectSecond": ("min", "second"),
    "MaximumMultiplies": ("max", "mul"),
}


def monoid_supported(semiring) -> bool:
    return semiring.name in SEMIRING_MAP


# host-side identity values (semiring.identity builds a jnp constant, which
# is a tracer when the caller is itself being traced — the kernel needs a
# static python float)
_IDENT_NP = {"zero": 0.0, "one": 1.0, "false": 0.0,
             "max": float(np.finfo(np.float32).max),
             "lowest": float(np.finfo(np.float32).min)}


def spmv_monoid(plan: MonoidPlan, x: jnp.ndarray, semiring,
                interpret: Optional[bool] = None,
                sweep: Optional[str] = None,
                matmul: Optional[str] = None,
                scan: Optional[str] = None) -> jnp.ndarray:
    """y[i] = ⊕_{e ∈ row i} val[e] ⊗ x[ind[e]] for the min/max-⊕ semirings
    in SEMIRING_MAP; rows with no stored edges keep the ⊕ identity (the
    spmv_pull contract, ops/spmv.py)."""
    import os

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if sweep is None:
        sweep = os.environ.get(
            "GRB_MONOID_SWEEP",
            os.environ.get("GRB_BILINEAR_SWEEP", "unroll")).lower()
    add, mul = SEMIRING_MAP[semiring.name]
    if matmul is None:
        env = os.environ.get("GRB_MONOID_MATMUL")
        # select-type ⊗ (second/first) passes raw ids through the matmul —
        # CC's parent ids are exact in f32 below 2^24 but hilo's ~16-bit
        # effective mantissa would corrupt ids ≥ 2^16, so selects stay on
        # HIGHEST; arithmetic ⊗ (SSSP/MIS distances/weights) rides the
        # ~3x-faster hilo two-pass (rel err ~1e-5 vs the 1e-3 bar)
        matmul = (env.lower() if env
                  else ("highest" if mul in ("second", "first")
                        else "hilo"))
    if scan is None:
        scan = os.environ.get("GRB_MONOID_SCAN", "2d").lower()
    ident = _IDENT_NP[semiring.add.identity_kind]
    return _spmv_monoid(plan, x, add, mul, ident, interpret, sweep, matmul,
                        scan)


def plan_for_monoid(A, transpose: bool = False) -> Optional[MonoidPlan]:
    """Cached MonoidPlan for one pull orientation of Matrix `A` (same stash
    + cache protocol as bilinear.plan_for; VMEM-resident x/y only — larger
    graphs keep the sorted pipeline until a DMA variant lands)."""
    n_out, n_in = (A.ncols, A.nrows) if transpose else (A.nrows, A.ncols)
    if not bilinear_available(n_out, n_in):
        return None
    host = getattr(A, "_host_csc" if transpose else "_host_csr", None)
    if host is None:
        return None
    cache = getattr(A, "_bilinear_plans", None)
    key = ("csc" if transpose else "csr") + "/monoid"
    if cache is not None and key in cache:
        return cache[key]
    ptr, ind, val = host
    plan = build_plan_monoid(ptr, ind, val, n_out, n_in)
    if cache is None:
        cache = {}
        object.__setattr__(A, "_bilinear_plans", cache)
    cache[key] = plan
    return plan
