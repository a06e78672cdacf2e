"""Direction-optimized mxv/vxm dispatch — the framework's "brains".

TPU re-design of the reference backend dispatcher
(backend/cuda/operations.hpp:82-327 vxm/mxv) and the direction heuristic
(backend/cuda/vector.hpp:292-323 Vector::convert):

  * The reference decides push vs pull on the HOST each iteration (a D→H sync
    per decision). Here the decision is *traced*: both branches compile into
    one program and `lax.cond` selects at runtime on-device, so fused
    algorithm loops run entirely device-resident (SURVEY.md §7 hard part (e)).
  * A `DualFrontier` keeps the dense image, the compacted sparse image, the
    stored-entry count, and the previous density ratio live simultaneously —
    the static-shape answer to the reference's storage tagged-union
    (vector.hpp:76-84).
  * Push additionally requires the frontier's expanded edge count to fit the
    static workspace (edge_cap = memusage · nnz_pad); otherwise we fall back
    to pull — the memusage-bound behavior of spmspv_inner.hpp:51-59.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..matrix import Matrix
from ..semiring import Semiring
from ..types import INDEX_DTYPE
from ..vector import dense_from_sparse, sparse_from_dense
from .spmspv import frontier_degrees, spmspv_push, spmspv_push_sparse
from .spmv import spmv_pull, spmv_pull_sorted


# static bound on the sparse image a LAZY push iteration may leave behind:
# lazy consumers (the BFS label assign, SSSP relax, the degree-total check)
# touch only sind[:LAZY_SPARSE_CAP], so their per-iteration cost is
# O(frontier), not O(n). Push outputs larger than this materialize the dense
# image instead (sparse_ok=False) — exactly the regime where pull wins anyway.
LAZY_SPARSE_CAP = 8192


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DualFrontier:
    """Frontier with both storage images + traced direction preference.

    Leaves: dense (n,), sind (n,), sval (n,), snvals (), ratio (),
    use_sparse (), dense_ok (), sparse_ok ().
    Static: n. The semiring identity (= "missing entry" encoding in the dense
    image) is supplied by the algorithm at each construction site.

    dense_ok/sparse_ok are validity flags for the LAZY dual-frontier protocol
    (mxv_dual(lazy=True)): a steady-state push iteration leaves the dense
    image STALE (dense_ok=False) and a pull iteration leaves the sparse image
    stale — each direction's steady state does zero O(n) image maintenance,
    and the missing image is materialized once at a direction switch. The
    non-lazy protocol (default, used by the one-shot operations API and the
    distributed layer) keeps both images valid every step, where the flags
    are constant True. Invariant: sparse_ok implies snvals ≤ LAZY_SPARSE_CAP;
    at least one flag is always True.
    """

    n: int
    dense: jnp.ndarray
    sind: jnp.ndarray
    sval: jnp.ndarray
    snvals: jnp.ndarray
    ratio: jnp.ndarray       # previous nnz/n (hysteresis state, vector.hpp:23)
    use_sparse: jnp.ndarray  # traced bool: push preferred
    dense_ok: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.asarray(True))
    sparse_ok: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.asarray(True))

    def tree_flatten(self):
        return ((self.dense, self.sind, self.sval, self.snvals,
                 self.ratio, self.use_sparse, self.dense_ok,
                 self.sparse_ok), (self.n,))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(aux[0], *leaves)

    @staticmethod
    def from_dense(dense: jnp.ndarray, identity, prefer_sparse: bool = False) -> "DualFrontier":
        n = dense.shape[0]
        sind, sval, nv = sparse_from_dense(dense, identity)
        ratio = nv.astype(jnp.float32) / n
        return DualFrontier(n, dense, sind, sval, nv, ratio,
                            jnp.asarray(prefer_sparse))

    @staticmethod
    def from_sparse(n: int, sind, sval, snvals, identity, dtype=None) -> "DualFrontier":
        dense = dense_from_sparse(n, sind, sval, snvals, identity)
        ratio = snvals.astype(jnp.float32) / n
        return DualFrontier(n, dense, sind, sval, snvals, ratio,
                            jnp.asarray(True))


def update_direction(nv, n: int, prev_ratio, prev_sparse, switchpoint: float,
                     mode) -> tuple:
    """The convert() heuristic with hysteresis (reference: vector.hpp:292-323):
    sparse→dense when density > switchpoint and rising; dense→sparse when
    density ≤ switchpoint and falling. Returns (use_sparse, ratio)."""
    from ..types import Direction

    ratio = nv.astype(jnp.float32) / n
    if mode == Direction.PUSHONLY:
        return jnp.asarray(True), ratio
    if mode == Direction.PULLONLY:
        return jnp.asarray(False), ratio
    rising = ratio >= prev_ratio
    use_sparse = jnp.where(
        ratio > switchpoint,
        jnp.where(rising, False, prev_sparse),
        jnp.where(~rising, True, prev_sparse),
    )
    return use_sparse, ratio


def _frontier_degree_total(push_ptr, f, identity):
    """Σ deg(frontier) from the DENSE frontier image: diff the pointer array
    and mask by non-identity lanes — two elementwise passes + a reduce
    (~0.06 ms at n=262K). The former sparse-side formulation gathered ptr at
    every slot of the n-padded sind array (2 × n-query gathers ≈ 1 ms at
    n=262K, tools/tpu_pushcost.py 2026-08-20) — it was the push loop's
    hidden per-iteration floor and made pull win even on a diameter-1022
    grid. f.dense and push_ptr rows share the input-vertex space in both
    mxv and vxm orientations."""
    nn = f.dense.shape[0]   # ptr arrays may be padded past nrows+1
    deg_dense = push_ptr[1: nn + 1] - push_ptr[:nn]
    ident = jnp.asarray(identity, f.dense.dtype)
    return jnp.sum(jnp.where(f.dense != ident,
                             deg_dense.astype(INDEX_DTYPE), 0))


def mxv_dual(
    A: Matrix,
    f: DualFrontier,
    semiring: Semiring,
    identity,
    *,
    transpose: bool = False,           # True → vxm orientation (u ⊗ A)
    mask_dense: Optional[jnp.ndarray] = None,
    mask_scmp: bool = False,
    structure_only: bool = False,
    edge_cap: Optional[int] = None,
    sort_push: bool = True,
    switchpoint: float = 0.01,
    mode=None,
    postprocess=None,
    postprocess_sparse=None,
    tier_divisors: tuple = (64, 8),
    pull_plan=None,
    lazy: bool = False,
):
    """One direction-optimized y = A ⊗ f (or fᵀ ⊗ A when transpose).

    Single traced program: lax.cond(push, pull). Output is a fresh
    DualFrontier whose direction preference has been updated by the density
    heuristic — i.e. this fuses the reference's vxm + convert() pair
    (operations.hpp:108-199) into one jitted step.

    `lazy=True` (fused BFS/SSSP loops) switches to the lazy dual-frontier
    protocol: each direction maintains ONLY its own image per iteration
    (flags on DualFrontier mark the other stale) and the missing image is
    rebuilt once at a direction switch. This removes every O(n) pass from
    the steady-state push iteration — measured 0.71 ms/iter of full-n
    bookkeeping on a 262K-vertex grid (tools/tpu_grid_diag.py 2026-08-20),
    which made pull beat push even at diameter 1022. Requires a square
    operand (input and output images share one shape). Consumers must honor
    dense_ok/sparse_ok.

    `postprocess(dense) -> dense` is fused between the matvec and the
    re-sparsification — the analog of the reference's fused applyVxm
    (operations.hpp:1275-1404); SSSP's unproductive-vertex filter uses it.
    `postprocess_sparse(keys, vals) -> vals` is its sparse twin for the
    sparse-output push path (must agree with postprocess and map the
    identity to itself); without it a postprocess forces the push branch
    onto the dense path's full-n re-sparsification.

    Returns (DualFrontier, used_push: traced bool) — used_push feeds the
    per-iteration `push|pull` CSV column (reference: bfs.hpp:54-60).
    """
    from ..types import Direction

    mode = mode if mode is not None else Direction.PUSHPULL
    n_out = A.ncols if transpose else A.nrows

    # orientation: pull iterates output segments; push expands input adjacency
    if transpose:  # vxm: pull over CSC (columns of A = rows of Aᵀ), push over CSR
        pull_ptr, pull_ind, pull_val = A.col_ptr, A.csc_row_ind, A.csc_val
        push_ptr, push_ind, push_val = A.row_ptr, A.col_ind, A.val
    else:          # mxv: pull over CSR, push over CSC
        pull_ptr, pull_ind, pull_val = A.row_ptr, A.col_ind, A.val
        push_ptr, push_ind, push_val = A.col_ptr, A.csc_row_ind, A.csc_val

    can_pull = pull_ptr is not None
    can_push = push_ptr is not None
    if not can_push:   # CSRONLY forces one direction (operations.hpp:131-140)
        mode = Direction.PULLONLY
    if not can_pull:
        mode = Direction.PUSHONLY

    if edge_cap is None:
        edge_cap = A.nnz_pad

    from ..types import round_up

    # value pulls route through the sort-based kernel when the transpose
    # arrays exist (monotone gather + key sort beats a random gather on TPU;
    # struconly stays on the 32x-packed bitmap path) — see spmv_pull_sorted
    if transpose:
        alt = (A.row_ind, A.col_ind, A.val)
    else:
        alt = (A.csc_row_ind, A.csc_col_ind, A.csc_val)

    # lazy protocol: slice bound for sparse-side consumers (invariant:
    # sparse_ok implies snvals ≤ SP) and on-demand image rebuilds
    SP = min(LAZY_SPARSE_CAP, f.sind.shape[0])

    def _materialize_dense(_):
        # push→pull switch: scatter the (≤ SP)-bounded sparse image
        tgt = jnp.where(jnp.arange(SP, dtype=INDEX_DTYPE) < f.snvals,
                        f.sind[:SP], f.dense.shape[0])
        vals = (f.sval[:SP].astype(f.dense.dtype) if f.sval is not None
                else jnp.ones((SP,), f.dense.dtype))
        base = jnp.full(f.dense.shape, jnp.asarray(identity, f.dense.dtype))
        return base.at[tgt].set(vals, mode="drop")

    def do_pull(_):
        fd = (jax.lax.cond(f.dense_ok, lambda _: f.dense,
                           _materialize_dense, None)
              if lazy else f.dense)
        return do_pull_fd(fd)

    def do_pull_fd(fd):
        from .gather_dispatch import use_pallas

        if pull_plan is not None:
            # tiled one-hot bilinear kernel (ops/pallas/bilinear.py): no
            # sort, no boundary gather. Serves Plus·× value pulls directly
            # and or-and struconly pulls as neighbor counts (count > 0 ==
            # the fused-or result, kernels/spmv.hpp:10-59). Min/Max-⊕
            # semirings ride the monoid variant (ops/pallas/monopull.py:
            # run-scan + one-hot MXU select) when a MonoidPlan was passed.
            from .pallas.bilinear import (BitmapPlan, spmv_bilinear,
                                          spmv_bilinear_bitmap)
            from .pallas.monopull import (MonoidPlan, monoid_supported,
                                          spmv_monoid)
            from .spmv import mask_pass

            ident = semiring.identity(fd.dtype)
            if isinstance(pull_plan, MonoidPlan):
                # f32-only: the plan stream is f32, and exactness of e.g.
                # int32 MIS weights cannot survive the f32 value path
                y = (spmv_monoid(pull_plan, fd, semiring)
                     if (not structure_only and monoid_supported(semiring)
                         and fd.dtype == jnp.float32) else None)
            elif structure_only and semiring.name == "LogicalOrAnd":
                # count>0 ≡ the fused-or result only when edge values are
                # all ones — a value plan with cancelling weights could sum
                # to zero for a reached vertex (ADVICE r2)
                assert (isinstance(pull_plan, BitmapPlan)
                        or pull_plan.unit_vals), (
                    "LogicalOrAnd pull needs a bitmap or ones=True plan")
                if isinstance(pull_plan, BitmapPlan):
                    from .pallas.orpull import pack_bitmap

                    cnt = spmv_bilinear_bitmap(pull_plan,
                                               pack_bitmap(fd))
                else:
                    cnt = spmv_bilinear(pull_plan, fd)
                y = (cnt > 0).astype(fd.dtype)
            elif not structure_only and semiring.name == "PlusMultiplies":
                y = spmv_bilinear(pull_plan, fd).astype(fd.dtype)
            else:
                y = None
            if y is not None:
                if mask_dense is not None:
                    y = jnp.where(mask_pass(mask_dense, mask_scmp), y, ident)
                return y
        if not structure_only and alt[0] is not None and use_pallas():
            # orientation: gather ids are the expanded major ids of the
            # *other* representation (ascending), keys are its minor ids
            if transpose:   # vxm: gather x at CSR row ids, key = col ids
                return spmv_pull_sorted(pull_ptr, A.row_ind, A.col_ind, A.val,
                                        fd, semiring, n_out, A.nvals,
                                        mask_dense, mask_scmp)
            else:           # mxv: gather x at CSC col ids, key = row ids
                return spmv_pull_sorted(pull_ptr, A.csc_col_ind, A.csc_row_ind,
                                        A.csc_val, fd, semiring, n_out,
                                        A.nvals, mask_dense, mask_scmp)
        return spmv_pull(pull_ptr, pull_ind, pull_val, fd, semiring,
                         n_out, mask_dense, mask_scmp, structure_only)

    with_vals = not structure_only

    if lazy and f.dense.shape[0] != n_out:
        raise ValueError("lazy mxv_dual requires a square operand (the "
                         "stale-image carry shares one vertex space)")

    def finish_dense(y):
        # dense-only producers re-sparsify with the full-n sort (the
        # reference's streamCompact epilogue, vector.hpp:367-425). Lazy
        # callers skip the sort entirely: the sparse image is carried stale
        # and rebuilt only if a later iteration switches to push.
        if postprocess is not None:
            y = postprocess(y)
        if lazy:
            ident = jnp.asarray(identity, y.dtype)
            nv = jnp.sum(y != ident).astype(INDEX_DTYPE)
            return (y, f.sind, f.sval, nv,
                    jnp.asarray(True), jnp.asarray(False))
        sind, sval, nv = sparse_from_dense(y, identity,
                                           with_values=with_vals)
        return y, sind, sval, nv, jnp.asarray(True), jnp.asarray(True)

    def _resolve_sparse_in(_):
        # pull→push switch (lazy): rebuild the compacted image by the full-n
        # sort once, instead of paying it in every pull iteration
        if not lazy:
            return f.sind, f.sval, f.snvals

        def _sparsify(_):
            si, sv, nv2 = sparse_from_dense(f.dense, identity,
                                            with_values=f.sval is not None)
            # the lazy carry is SP-sized; a frontier that does not fit was
            # already routed to pull by the use_push_now gate
            k = f.sind.shape[0]
            return si[:k], (sv[:k] if sv is not None else None), nv2
        return jax.lax.cond(f.sparse_ok,
                            lambda _: (f.sind, f.sval, f.snvals),
                            _sparsify, None)

    def make_push(fin, cap, slice_frontier=False):
        # intermediate tiers slice the compacted frontier to the tier's
        # capacity: every expansion stage (marks scatter, degree gather,
        # cummax) then scales with the tier, not with n. Safe because those
        # tiers' predicate requires snvals <= cap (valid entries sort to the
        # front). The final tier keeps the full frontier.
        f_sind, f_sval, f_snvals = fin
        fcap = min(f_sind.shape[0], cap) if slice_frontier else f_sind.shape[0]
        fs = f_sind[:fcap]
        fv = f_sval[:fcap] if f_sval is not None else None

        def do_push(_):
            if sort_push and (postprocess is None
                              or postprocess_sparse is not None):
                # sparse-output MERGE push: the new frontier compacts inside
                # the cap-sized workspace — no full-n sort. This is what
                # keeps push O(frontier-edges) on high-diameter graphs.
                y, sind, sval, nv = spmspv_push_sparse(
                    push_ptr, push_ind, push_val, fs, fv, f_snvals,
                    semiring, n_out, cap, mask_dense, mask_scmp,
                    structure_only, with_values=with_vals,
                    postprocess_sparse=postprocess_sparse,
                    build_dense=not lazy,
                    out_cap=SP if lazy else None,
                    stale_dense=f.dense if lazy else None)
                if not lazy:
                    return (y, sind, sval, nv,
                            jnp.asarray(True), jnp.asarray(True))
                # lazy: the dense image came back stale unless the new
                # frontier overflowed SP (pull's regime — the heuristic
                # flips next step); flags say which image is live
                small = nv <= SP
                return y, sind, sval, nv, ~small, small
            y = spmspv_push(push_ptr, push_ind, push_val, fs, fv,
                            f_snvals, semiring, n_out, cap,
                            mask_dense, mask_scmp, structure_only,
                            sort_push)
            return finish_dense(y)
        return do_push

    # workspace tiers: static shapes mean every push pays its full edge_cap
    # regardless of frontier size, so small-frontier iterations route to
    # 64x / 8x smaller workspaces (cond ladder; XLA compiles all branches but
    # executes one — every stage of a push scales linearly with its cap)
    tiers = []
    for div in tier_divisors:
        c = min(edge_cap, max(round_up(edge_cap // div, 1024), 1024))
        if c < edge_cap and c not in tiers:
            tiers.append(c)
    tiers.append(edge_cap)

    def push_tiered_fn(fin, deg_total):
        f_snvals = fin[2]

        def build(idx):
            cap = tiers[idx]
            if idx == len(tiers) - 1:
                return make_push(fin, cap)
            fits = (deg_total <= cap) & (f_snvals <= cap)
            return lambda _: jax.lax.cond(fits, make_push(fin, cap, True),
                                          build(idx + 1), None)
        return build(0)

    def push_branch(deg_total):
        def run(_):
            fin = _resolve_sparse_in(None)
            return push_tiered_fn(fin, deg_total)(None)
        return run

    def _deg_total():
        if not lazy:
            return _frontier_degree_total(push_ptr, f, identity)

        def _sparse_deg(_):
            # sparse_ok guarantees snvals ≤ SP — an SP-bounded gather
            return jnp.sum(frontier_degrees(push_ptr, f.sind[:SP], f.snvals))
        return jax.lax.cond(
            f.dense_ok,
            lambda _: _frontier_degree_total(push_ptr, f, identity),
            _sparse_deg, None)

    if mode == Direction.PULLONLY:
        # the compacted image is only ever consumed by a push iteration:
        # pull-only loops skip the per-iteration sort entirely (the count
        # is a cheap reduction) and carry the stale sind/sval through the
        # while_loop unchanged (XLA keeps them alias-carried, no copy) —
        # measured ~0.5 ms/iter saved at rmat18
        y = do_pull(None)
        if postprocess is not None:
            y = postprocess(y)
        ident = jnp.asarray(identity, y.dtype)
        nv = jnp.sum(y != ident).astype(INDEX_DTYPE)
        sind, sval = f.sind, f.sval
        use_push_now = jnp.asarray(False)
        dense_ok, sparse_ok = jnp.asarray(True), jnp.asarray(not lazy)
    elif mode == Direction.PUSHONLY:
        deg_total = _deg_total()
        (y, sind, sval, nv,
         dense_ok, sparse_ok) = push_branch(deg_total)(None)
        use_push_now = jnp.asarray(True)
    else:
        # push feasibility: expanded edges must fit the static workspace
        deg_total = _deg_total()
        use_push_now = f.use_sparse & (deg_total <= edge_cap)
        if lazy:
            # a pull-produced frontier can only switch to push if it fits
            # the SP-sized lazy carry (bigger frontiers are pull's regime)
            use_push_now &= f.sparse_ok | (f.snvals <= SP)
        y, sind, sval, nv, dense_ok, sparse_ok = jax.lax.cond(
            use_push_now, push_branch(deg_total),
            lambda _: finish_dense(do_pull(None)), None)
    use_sparse, ratio = update_direction(nv, n_out, f.ratio, use_push_now,
                                         switchpoint, mode)
    return DualFrontier(n_out, y, sind, sval, nv, ratio, use_sparse,
                        dense_ok, sparse_ok), use_push_now
