"""SSSP — Bellman-Ford with frontier filtering
(reference: graphblas/algorithm/sssp.hpp:15-103).

Per iteration:
    f2 = vxm(MinimumPlus, f1, A)                 # relax candidates
    m  = f2 < v                                  # productive detect
                                                 #   (eWiseAdd CustomLessPlus)
    v  = min(v, f2)                              # relax (eWiseAdd MinimumPlus)
    f2 = FLT_MAX where ¬m                        # filter unproductive
                                                 #   (scmp-masked assign+prune)
    converged when f1 empty or no productive vertices

The filter is fused into the matvec epilogue via mxv_dual's postprocess (the
reference's applyVxm fusion idea, operations.hpp:1275-1404), so each iteration
is a single traced step; the productive count equals the filtered frontier's
nvals, collapsing the reference's two convergence scalars into one.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..descriptor import Descriptor, DEFAULT
from ..matrix import Matrix
from ..semiring import MinimumPlusSemiring
from ..types import INDEX_DTYPE
from ..vector import Vector
from ..ops.dispatch import DualFrontier, mxv_dual
from .common import (TightTimer, dense_result, edge_cap_for,
                     print_dirinfo, print_iter_row)

MAXF = float(jnp.finfo(jnp.float32).max)


def _initial_frontier(n: int, source, lazy: bool = False) -> DualFrontier:
    from ..ops.dispatch import LAZY_SPARSE_CAP

    source = jnp.asarray(source, INDEX_DTYPE)
    dense = jnp.full((n,), MAXF, jnp.float32).at[source].set(0.0)
    # lazy loops carry an SP-sized sparse image (mxv_dual lazy protocol);
    # PUSHONLY keeps the full-n carry — see bfs._initial_frontier
    cap = min(LAZY_SPARSE_CAP, n) if lazy else n
    sind = jnp.full((cap,), n, INDEX_DTYPE).at[0].set(source)
    sval = jnp.full((cap,), MAXF, jnp.float32).at[0].set(0.0)
    return DualFrontier(n, dense, sind, sval, jnp.asarray(1, INDEX_DTYPE),
                        jnp.asarray(1.0 / n, jnp.float32), jnp.asarray(True))


def _sssp_step(A: Matrix, v, f: DualFrontier, plan=None, *, edge_cap,
               switchpoint, mode, tiers=(64, 8), sort_push):
    def filter_unproductive(y):
        # eWiseAdd(m, CustomLessPlus, f2, v) + scmp-masked assign FLT_MAX
        # (sssp.hpp:76-88) fused into one where
        return jnp.where(y < v, y, MAXF)

    def filter_sparse(keys, vals):
        # sparse twin for the sparse-output push: gather v at the sorted
        # candidate keys (monotone — rides the lane-gather) and drop
        # non-improving relaxations to the MAXF identity
        from ..ops.gather_dispatch import take

        return jnp.where(vals < take(v, keys, sorted=True), vals, MAXF)

    from .bfs import _lazy_frontier

    lazy = _lazy_frontier(mode)
    f2, used_push = mxv_dual(
        A, f, MinimumPlusSemiring, identity=jnp.asarray(MAXF, jnp.float32),
        transpose=True, edge_cap=edge_cap, sort_push=sort_push,
        switchpoint=switchpoint, mode=mode, tier_divisors=tiers,
        postprocess=filter_unproductive, postprocess_sparse=filter_sparse,
        pull_plan=plan, lazy=lazy)
    # relax: v = min(v, f2) (eWiseAdd MinimumPlus, sssp.hpp:80-82);
    # filtered entries are FLT_MAX and cannot lower v. Lazy protocol: after
    # a push iteration only the sparse image is live — relax via an
    # SP-bounded scatter-min (exact: min is order-insensitive)
    if lazy:
        def _relax_dense(_):
            return jnp.minimum(v, f2.dense)

        def _relax_sparse(_):
            sp = f2.sind.shape[0]
            tgt = jnp.where(jnp.arange(sp, dtype=INDEX_DTYPE) < f2.snvals,
                            f2.sind, v.shape[0])
            return v.at[tgt].min(f2.sval, mode="drop")
        v = jax.lax.cond(f2.dense_ok, _relax_dense, _relax_sparse, None)
    else:
        v = jnp.minimum(v, f2.dense)
    succ = f2.snvals  # productive count == filtered frontier size
    return v, f2, succ, used_push


@functools.partial(jax.jit, static_argnames=(
    "edge_cap", "switchpoint", "mode", "sort_push", "tiers", "max_niter"))
def _sssp_fused(A: Matrix, source, plan=None, *, edge_cap, switchpoint,
                mode, sort_push, tiers=(64, 8), max_niter):
    n = A.nrows
    v0 = jnp.full((n,), MAXF, jnp.float32).at[
        jnp.asarray(source, INDEX_DTYPE)].set(0.0)
    from .bfs import _lazy_frontier

    f0 = _initial_frontier(n, source, lazy=_lazy_frontier(mode))

    def cond(state):
        it, v, f, succ = state
        return (succ > 0) & (it <= max_niter)

    def body(state):
        it, v, f, _ = state
        v, f2, succ, _ = _sssp_step(A, v, f, plan, edge_cap=edge_cap,
                                    switchpoint=switchpoint, mode=mode,
                                    sort_push=sort_push, tiers=tiers)
        return it + 1, v, f2, succ

    it, v, f, succ = jax.lax.while_loop(
        cond, body, (jnp.asarray(1, INDEX_DTYPE), v0, f0,
                     jnp.asarray(1, INDEX_DTYPE)))
    return v, it - 1


_sssp_step_jit = jax.jit(_sssp_step, static_argnames=(
    "edge_cap", "switchpoint", "mode", "sort_push", "tiers"))


def sssp(A: Matrix, source: int, desc: Descriptor = DEFAULT,
         mode: str = "fused") -> Vector:
    """Distances from source; unreachable = FLT_MAX (reference: sssp.hpp:26,
    matching SimpleReferenceSssp conventions)."""
    kw = dict(edge_cap=edge_cap_for(A, desc), switchpoint=desc.switchpoint,
              mode=desc.mxv_mode, sort_push=desc.sort_push,
              tiers=desc.push_tiers)
    n = A.nrows
    # MinimumPlus pull rides the Pallas monoid kernel when A's CSC stash
    # exists and x/y fit VMEM (ops/pallas/monopull.py); None falls back to
    # the sorted pipeline inside mxv_dual. TPU-only by default — interpret
    # emulation costs seconds/iter on CPU (the GRB_DIST_PALLAS_FORCE
    # pattern); GRB_MONOID_PULL_FORCE=1 for the bounded parity test.
    import os

    from ..ops.pallas.monopull import plan_for_monoid

    use_plan = (jax.default_backend() == "tpu"
                or os.environ.get("GRB_MONOID_PULL_FORCE", "0") == "1")
    plan = plan_for_monoid(A, transpose=True) if use_plan else None
    if mode == "fused":
        v, _ = _sssp_fused(A, source, plan, max_niter=desc.max_niter, **kw)
        return dense_result(n, v)

    timer = TightTimer()
    v = jnp.full((n,), MAXF, jnp.float32).at[source].set(0.0)
    from .bfs import _lazy_frontier

    f = _initial_frontier(n, source, lazy=_lazy_frontier(desc.mxv_mode))
    prev_push = None
    for it in range(1, desc.max_niter + 1):
        timer.start()
        v, f, succ_t, used_push = _sssp_step_jit(A, v, f, plan, **kw)
        ms = timer.stop(v, f.dense)
        succ = int(succ_t)
        print_dirinfo(succ, n, bool(used_push), prev_push, desc.dirinfo)
        prev_push = bool(used_push)
        # unvisited = still at the FLT_MAX sentinel (the reference's CSV
        # column, bfs.hpp:54-60 shape); stepped mode syncs anyway
        unvisited = int(jnp.sum(v >= MAXF)) if desc.timing else n
        print_iter_row(it, succ, n, unvisited, bool(used_push), ms,
                       desc.timing)
        if succ == 0:
            break
    return dense_result(n, v)


def sssp_cpu(A: Matrix, source: int):
    from .reference import sssp_cpu as _impl

    return _impl(A, source)
