"""Direction-optimized BFS (reference: graphblas/algorithm/bfs.hpp:14-89).

Per iteration (the reference recipe, re-fused for TPU):
    assign(v, mask=f1, iter)                        # label newly-found
    f2 = vxm(¬v-masked, LogicalOrAnd, f1, A)        # expand frontier
    succ = reduce(+, f2)                            # convergence scalar

`mode="fused"` traces the whole loop as one lax.while_loop — zero host syncs
until convergence (the reference pays one D→H per iteration, reduce.hpp:43).
`mode="stepped"` mirrors the reference driver: one jitted step per iteration
with per-iteration CSV timing (`iter, succ/n, unvisited, push|pull, ms`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..descriptor import Descriptor, BFS_TUNED
from ..matrix import Matrix
from ..semiring import LogicalOrAndSemiring
from ..types import Direction, INDEX_DTYPE
from ..vector import Vector
from ..ops.dispatch import DualFrontier, LAZY_SPARSE_CAP, mxv_dual
from .common import (TightTimer, dense_result, edge_cap_for,
                     print_dirinfo, print_iter_row)


def _initial_frontier(n: int, source, dtype=jnp.float32,
                      with_values: bool = False,
                      lazy: bool = False) -> DualFrontier:
    source = jnp.asarray(source, INDEX_DTYPE)
    dense = jnp.zeros((n,), dtype).at[source].set(1)
    # lazy loops carry an SP-sized sparse image (mxv_dual lazy protocol —
    # push iterations then do zero O(n) work); PUSHONLY keeps the full-n
    # carry because its frontiers may exceed the lazy bound
    cap = min(LAZY_SPARSE_CAP, n) if lazy else n
    sind = jnp.full((cap,), n, INDEX_DTYPE).at[0].set(source)
    sval = (jnp.zeros((cap,), dtype).at[0].set(1) if with_values else None)
    return DualFrontier(n, dense, sind, sval, jnp.asarray(1, INDEX_DTYPE),
                        jnp.asarray(1.0 / n, jnp.float32), jnp.asarray(True))


def _lazy_frontier(mode) -> bool:
    """Opt-in: the lazy dual-frontier protocol (GRB_LAZY_FRONTIER=1).

    Measured on-chip 2026-08-20 (tools/tpu_grid_diag.py, 512² grid): lazy
    push = 1.60 ms/iter vs eager 0.78 — the extra lax.cond levels cost more
    on this backend than the O(n) image maintenance they remove, and the
    per-iteration cost still scales ~1.5 ns/vertex at 2048² (suspected
    conditional flattening re-running the full-n sparsify). Kept opt-in for
    future backends where conditionals are cheap; default stays eager."""
    import os

    return (os.environ.get("GRB_LAZY_FRONTIER", "0") == "1"
            and mode != Direction.PUSHONLY)


def _bfs_step(A: Matrix, v, f: DualFrontier, it, *, struconly, edge_cap,
              switchpoint, mode, sort_push, tiers=(64, 8), plan=None):
    """One BFS iteration: label + masked expand. Shared by both modes."""
    lazy = _lazy_frontier(mode)
    itv = jnp.asarray(it, v.dtype).astype(v.dtype)
    # assign(v, mask=f1, iter, GrB_ALL) — bfs.hpp:64-65. Lazy protocol:
    # after a push iteration only the sparse image is live — assign via an
    # SP-bounded scatter instead of a full-n where
    if lazy:
        def _assign_dense(_):
            return jnp.where(f.dense != 0, itv, v)

        def _assign_sparse(_):
            sp = f.sind.shape[0]
            tgt = jnp.where(jnp.arange(sp, dtype=INDEX_DTYPE) < f.snvals,
                            f.sind, v.shape[0])
            return v.at[tgt].set(itv, mode="drop")
        v = jax.lax.cond(f.dense_ok, _assign_dense, _assign_sparse, None)
    else:
        v = jnp.where(f.dense != 0, itv, v)
    # scmp-masked vxm — bfs.hpp:67-70 (mask = visited v, complemented)
    f2, used_push = mxv_dual(
        A, f, LogicalOrAndSemiring, identity=jnp.zeros((), v.dtype),
        transpose=True, mask_dense=v, mask_scmp=True,
        structure_only=struconly, edge_cap=edge_cap, sort_push=sort_push,
        switchpoint=switchpoint, mode=mode, tier_divisors=tiers,
        pull_plan=plan, lazy=lazy)
    succ = f2.snvals  # struconly reduce == nvals (reduce.hpp:71-75)
    return v, f2, succ, used_push


@functools.partial(jax.jit, static_argnames=(
    "struconly", "edge_cap", "switchpoint", "mode", "sort_push", "tiers",
    "max_niter"))
def _bfs_fused(A: Matrix, source, plan=None, *, struconly, edge_cap,
               switchpoint, mode, sort_push, tiers=(64, 8), max_niter):
    n = A.nrows
    v0 = jnp.zeros((n,), jnp.float32)
    f0 = _initial_frontier(n, source, with_values=not struconly,
                           lazy=_lazy_frontier(mode))

    def cond(state):
        it, v, f, succ = state
        return (succ > 0) & (it <= max_niter)

    def body(state):
        it, v, f, _ = state
        v, f2, succ, _ = _bfs_step(A, v, f, it, struconly=struconly,
                                   edge_cap=edge_cap, switchpoint=switchpoint,
                                   mode=mode, sort_push=sort_push,
                                   tiers=tiers, plan=plan)
        return it + 1, v, f2, succ

    it, v, f, succ = jax.lax.while_loop(
        cond, body, (jnp.asarray(1, INDEX_DTYPE), v0, f0,
                     jnp.asarray(1, INDEX_DTYPE)))
    return v, it - 1


def bfs_pull_plan(A: Matrix, desc: Descriptor = BFS_TUNED):
    """Bilinear plan for BFS's vxm pull (unit values — the dispatch's
    count>0 path is only valid when traversal ignores edge weights, i.e.
    struconly). None off-TPU or when the CSC host stash is missing."""
    from ..ops.gather_dispatch import use_pallas

    if not use_pallas() or not desc.structure_only:
        return None
    from ..ops.pallas.bilinear import plan_for_bitmap

    return plan_for_bitmap(A, transpose=True)


_bfs_step_jit = jax.jit(_bfs_step, static_argnames=(
    "struconly", "edge_cap", "switchpoint", "mode", "sort_push", "tiers"))


def bfs(A: Matrix, source: int, desc: Descriptor = BFS_TUNED,
        mode: str = "fused") -> Vector:
    """BFS levels: source = 1, unreached = 0 (reference: bfs.hpp:14-89,
    levels convention per SimpleReferenceBfs test_bfs.hpp:19-22)."""
    kw = dict(struconly=desc.structure_only, edge_cap=edge_cap_for(A, desc),
              switchpoint=desc.switchpoint, mode=desc.mxv_mode,
              sort_push=desc.sort_push, tiers=desc.push_tiers)
    n = A.nrows
    plan = bfs_pull_plan(A, desc)
    if mode == "fused":
        v, _ = _bfs_fused(A, source, plan, max_niter=desc.max_niter, **kw)
        return dense_result(n, v)

    # stepped: host loop, CSV parity with the reference driver
    timer = TightTimer()
    v = jnp.zeros((n,), jnp.float32)
    f = _initial_frontier(n, source, with_values=not desc.structure_only,
                          lazy=_lazy_frontier(desc.mxv_mode))
    unvisited = n
    succ = 1
    prev_push = None
    for it in range(1, desc.max_niter + 1):
        timer.start()
        v, f, succ_t, used_push = _bfs_step_jit(A, v, f, it, **kw)
        ms = timer.stop(v, f.dense)
        succ = int(succ_t)
        unvisited -= succ
        print_dirinfo(succ, n, bool(used_push), prev_push, desc.dirinfo)
        prev_push = bool(used_push)
        print_iter_row(it, succ, n, unvisited, bool(used_push), ms,
                       desc.timing)
        if succ == 0:
            break
    return dense_result(n, v)


def bfs_cpu(A: Matrix, source: int):
    """Golden CPU reference passthrough (reference: bfs.hpp:92-113 bfsCpu)."""
    from .reference import bfs_cpu as _impl

    return _impl(A, source)
