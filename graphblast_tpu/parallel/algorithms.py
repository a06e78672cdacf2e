"""Distributed algorithms over a 1D device mesh: BFS, SSSP, PageRank.

Three execution shapes:
  * fused-pull: the whole convergence loop (lax.while_loop + collectives)
    inside one shard_map — zero host round-trips, all_gather rides ICI.
  * stepped push/pull: host loop choosing direction per iteration from the
    global frontier density (the reference's host-side convert() heuristic,
    vector.hpp:292-323, lifted to the cluster level); push iterations route
    partials with psum_scatter/all_to_all.
  * helpers return sharded arrays; trim to n on the host.

The reference has no distributed layer (SURVEY.md §2.8) — this is the
framework's scale-out axis, testable on a CPU mesh via
XLA_FLAGS=--xla_force_host_platform_device_count=N.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..descriptor import Descriptor, BFS_TUNED, DEFAULT
from ..matrix import Matrix
from ..semiring import (LogicalOrAndSemiring, MinimumPlusSemiring,
                        PlusMultipliesSemiring)
from ..types import INDEX_DTYPE, round_up
from .partition import ShardedMatrix, partition, shard_vector
from . import ops as dops

P_ = jax.sharding.PartitionSpec

MAXF = float(jnp.finfo(jnp.float32).max)


def _mat_spec():
    # pytree-prefix spec: broadcast over all 6 (P, ...) leaves of ShardedMatrix
    return P_("x", None)


def _shard_edge_cap(Ash: ShardedMatrix, desc: Descriptor) -> int:
    cap = int(Ash.csr_ind.shape[1] * min(desc.memusage, 1.0))
    return max(round_up(max(cap, 128), 128), 128)


# ---------------------------------------------------------------------------
# BFS
# ---------------------------------------------------------------------------


def _bfs_pull_loop(Ash: ShardedMatrix, source, max_niter: int,
                   struconly: bool):
    """Runs INSIDE shard_map: device-resident distributed BFS, pull only."""
    rows_per = Ash.rows_per
    my = jax.lax.axis_index("x")
    gids = my * rows_per + jnp.arange(rows_per, dtype=INDEX_DTYPE)
    v0 = jnp.zeros((rows_per,), jnp.float32)
    f0 = (gids == source).astype(jnp.float32)

    def cond(st):
        it, v, f, succ = st
        return (succ > 0) & (it <= max_niter)

    def body(st):
        it, v, f, _ = st
        v = jnp.where(f != 0, it.astype(v.dtype), v)
        f2 = dops.dist_vxm_pull(
            Ash.csc_ptr[0], Ash.csc_ind[0], Ash.csc_val[0], f,
            LogicalOrAndSemiring, rows_per, mask_block=v, mask_scmp=True,
            structure_only=struconly)
        succ = jax.lax.psum(jnp.sum(f2 != 0).astype(INDEX_DTYPE), "x")
        return it + 1, v, f2, succ

    it, v, f, succ = jax.lax.while_loop(
        cond, body, (jnp.asarray(1, INDEX_DTYPE), v0, f0,
                     jnp.asarray(1, INDEX_DTYPE)))
    return v


def make_bfs_dist(mesh: jax.sharding.Mesh, Ash: ShardedMatrix,
                  desc: Descriptor = BFS_TUNED):
    """Compile a fused distributed pull-BFS: fn(source) -> sharded levels."""
    fn = jax.shard_map(
        functools.partial(_bfs_pull_loop, max_niter=desc.max_niter,
                          struconly=desc.structure_only),
        mesh=mesh, in_specs=(_mat_spec(), P_()), out_specs=P_("x"),
        check_vma=False)
    return jax.jit(functools.partial(fn, Ash))


def _bfs_step_push(Ash: ShardedMatrix, v, f, it, edge_cap: int,
                   struconly: bool):
    """One push iteration inside shard_map (stepped driver)."""
    rows_per = Ash.rows_per
    v = jnp.where(f != 0, it.astype(v.dtype), v)
    f_ind, f_val, f_nv = dops.local_frontier(f, 0.0)
    f2 = dops.dist_vxm_push(
        Ash.csr_ptr[0], Ash.csr_ind[0], Ash.csr_val[0],
        f_ind, f_val, f_nv, LogicalOrAndSemiring, Ash.P, rows_per,
        edge_cap, mask_block=v, mask_scmp=True, structure_only=struconly)
    succ = jax.lax.psum(jnp.sum(f2 != 0).astype(INDEX_DTYPE), "x")
    return v, f2, succ


def _bfs_step_pull(Ash: ShardedMatrix, v, f, it, struconly: bool):
    rows_per = Ash.rows_per
    v = jnp.where(f != 0, it.astype(v.dtype), v)
    f2 = dops.dist_vxm_pull(
        Ash.csc_ptr[0], Ash.csc_ind[0], Ash.csc_val[0], f,
        LogicalOrAndSemiring, rows_per, mask_block=v, mask_scmp=True,
        structure_only=struconly)
    succ = jax.lax.psum(jnp.sum(f2 != 0).astype(INDEX_DTYPE), "x")
    return v, f2, succ


def bfs_dist(A: Matrix, source: int, mesh: jax.sharding.Mesh,
             desc: Descriptor = BFS_TUNED, mode: str = "auto",
             Ash: Optional[ShardedMatrix] = None) -> np.ndarray:
    """Distributed BFS levels. mode: 'pull' = fused device-resident loop;
    'auto' = stepped push/pull with the cluster-level direction heuristic."""
    if Ash is None:
        Ash = partition(A, mesh)
    n, n_pad, rows_per = Ash.n, Ash.n_pad, Ash.rows_per

    if mode == "pull":
        run = make_bfs_dist(mesh, Ash, desc)
        v = run(jnp.asarray(source, INDEX_DTYPE))
        return np.asarray(v)[:n]

    # stepped auto: host chooses direction each iteration
    vspec = P_("x")
    push_fn = jax.jit(jax.shard_map(
        functools.partial(_bfs_step_push, edge_cap=_shard_edge_cap(Ash, desc),
                          struconly=desc.structure_only),
        mesh=mesh, in_specs=(_mat_spec(), vspec, vspec, P_()),
        out_specs=(vspec, vspec, P_()), check_vma=False))
    pull_fn = jax.jit(jax.shard_map(
        functools.partial(_bfs_step_pull, struconly=desc.structure_only),
        mesh=mesh, in_specs=(_mat_spec(), vspec, vspec, P_()),
        out_specs=(vspec, vspec, P_()), check_vma=False))

    sh = jax.sharding.NamedSharding(mesh, vspec)
    v = jax.device_put(jnp.zeros((n_pad,), jnp.float32), sh)
    f = jax.device_put(
        jnp.zeros((n_pad,), jnp.float32).at[source].set(1.0), sh)
    succ = 1
    for it in range(1, desc.max_niter + 1):
        density = succ / n
        use_push = (desc.mxv_mode.name != "PULLONLY"
                    and density <= desc.switchpoint)
        step = push_fn if use_push else pull_fn
        v, f, succ_t = step(Ash, v, f, jnp.asarray(it, INDEX_DTYPE))
        succ = int(succ_t)
        if desc.timing >= 1:
            print(f"{it}, {succ}/{n}, -, {'push' if use_push else 'pull'}, -")
        if succ == 0:
            break
    return np.asarray(v)[:n]


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------


def _pr_loop(Ash: ShardedMatrix, alpha: float, eps: float, max_niter: int,
             n_true: int):
    rows_per = Ash.rows_per
    p0 = jnp.full((rows_per,), 1.0 / n_true, jnp.float32)
    # padding rows have no edges; keep their p at 0 contribution via mask
    my = jax.lax.axis_index("x")
    gids = my * rows_per + jnp.arange(rows_per, dtype=INDEX_DTYPE)
    real = gids < n_true
    p0 = jnp.where(real, p0, 0.0)

    def cond(st):
        it, p, err = st
        return (err > eps) & (it <= max_niter)

    def body(st):
        it, p, _ = st
        p_swap = dops.dist_vxm_pull(
            Ash.csc_ptr[0], Ash.csc_ind[0], Ash.csc_val[0], p,
            PlusMultipliesSemiring, rows_per)
        p_new = jnp.where(real, p_swap + (1.0 - alpha) / n_true, 0.0)
        r = p_new - p
        err = jnp.sqrt(jax.lax.psum(jnp.sum(r * r), "x"))
        return it + 1, p_new, err

    _, p, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(1, INDEX_DTYPE), p0,
                     jnp.asarray(1.0, jnp.float32)))
    return p


def pr_dist(A: Matrix, mesh: jax.sharding.Mesh, alpha: float = 0.85,
            eps: float = 1e-6, desc: Descriptor = DEFAULT,
            Ash: Optional[ShardedMatrix] = None, prepared: bool = False) -> np.ndarray:
    """Distributed PageRank (fused device-resident loop)."""
    if Ash is None:
        if not prepared:
            from ..algorithms.pr import prepare_pr_matrix

            A = prepare_pr_matrix(A, alpha)
        Ash = partition(A, mesh)
    fn = jax.shard_map(
        functools.partial(_pr_loop, alpha=alpha, eps=eps,
                          max_niter=desc.max_niter, n_true=Ash.n),
        mesh=mesh, in_specs=(_mat_spec(),), out_specs=P_("x"),
        check_vma=False)
    p = jax.jit(fn)(Ash)
    return np.asarray(p)[: Ash.n]


# ---------------------------------------------------------------------------
# SSSP
# ---------------------------------------------------------------------------


def _sssp_loop(Ash: ShardedMatrix, source, max_niter: int):
    rows_per = Ash.rows_per
    my = jax.lax.axis_index("x")
    gids = my * rows_per + jnp.arange(rows_per, dtype=INDEX_DTYPE)
    v0 = jnp.where(gids == source, 0.0, MAXF).astype(jnp.float32)
    f0 = v0

    def cond(st):
        it, v, f, succ = st
        return (succ > 0) & (it <= max_niter)

    def body(st):
        it, v, f, _ = st
        y = dops.dist_vxm_pull(
            Ash.csc_ptr[0], Ash.csc_ind[0], Ash.csc_val[0], f,
            MinimumPlusSemiring, rows_per)
        f2 = jnp.where(y < v, y, MAXF)
        v = jnp.minimum(v, y)
        succ = jax.lax.psum(jnp.sum(f2 != MAXF).astype(INDEX_DTYPE), "x")
        return it + 1, v, f2, succ

    _, v, _, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(1, INDEX_DTYPE), v0, f0,
                     jnp.asarray(1, INDEX_DTYPE)))
    return v


def sssp_dist(A: Matrix, source: int, mesh: jax.sharding.Mesh,
              desc: Descriptor = DEFAULT,
              Ash: Optional[ShardedMatrix] = None) -> np.ndarray:
    """Distributed Bellman-Ford (fused pull loop)."""
    if Ash is None:
        Ash = partition(A, mesh)
    fn = jax.shard_map(
        functools.partial(_sssp_loop, max_niter=desc.max_niter),
        mesh=mesh, in_specs=(_mat_spec(), P_()), out_specs=P_("x"),
        check_vma=False)
    v = jax.jit(fn)(Ash, jnp.asarray(source, INDEX_DTYPE))
    return np.asarray(v)[: Ash.n]


# ---------------------------------------------------------------------------
# Connected components (FastSV) — distributed
# ---------------------------------------------------------------------------

IMAX = int(np.iinfo(np.int32).max)


def _cc_loop(Ash: ShardedMatrix, max_niter: int):
    """Distributed FastSV inside shard_map (single-chip: algorithms/cc.py,
    reference: cc.hpp:17-136). Pointer-chasing gathers use an all_gathered
    parent vector; the min-hooking scatter is combined across devices with a
    cross-device elementwise pmin — both deterministic."""
    from ..semiring import MinimumSelectSecondSemiring

    rows_per = Ash.rows_per
    n_pad = Ash.n_pad
    my = jax.lax.axis_index("x")
    base = (my * rows_per).astype(INDEX_DTYPE)
    gids = base + jnp.arange(rows_per, dtype=INDEX_DTYPE)
    parent0 = gids.astype(jnp.int32)

    def cond(st):
        it, parent, mnp, gp, gp_t, succ = st
        return (succ > 0) & (it <= max_niter)

    def body(st):
        it, parent, mnp, gp, gp_t, _ = st
        parent_temp = parent

        # 1) stochastic hooking: mnp_t[i] = min_{j∈A(i,:)} gp[j] — mxv pull
        # over MY CSR row block (matches the single-chip CSR orientation on
        # directed inputs)
        mnp_t = dops.dist_mxv_pull(
            Ash.csr_ptr[0], Ash.csr_ind[0],
            Ash.csr_val[0].astype(jnp.int32), gp,
            MinimumSelectSecondSemiring, rows_per)
        mnp = jnp.minimum(mnp, mnp_t)
        # min-hook parent[parent_temp] ← mnp across ALL devices: local
        # global-index scatter-min, then elementwise cross-device min
        contrib = (jnp.full((n_pad,), IMAX, jnp.int32)
                   .at[parent_temp].min(mnp, mode="drop"))
        contrib = jax.lax.pmin(contrib, "x")
        mine = jax.lax.dynamic_slice(contrib, (base,), (rows_per,))
        parent = jnp.minimum(parent, mine)

        # 2) aggressive hooking + 3) shortcutting
        parent = jnp.minimum(parent, mnp)
        parent = jnp.minimum(parent, parent_temp)

        # 4) grandparent gp[u] = parent[parent[u]] (global gather)
        parent_full = jax.lax.all_gather(parent, "x", tiled=True)
        gp = parent_full[jnp.clip(parent, 0, n_pad - 1)]

        # 5) termination + 6) unproductive filter
        diff = gp_t != gp
        succ = jax.lax.psum(jnp.sum(diff).astype(INDEX_DTYPE), "x")
        gp_t_new = gp
        gp = jnp.where(diff, gp, IMAX)
        return it + 1, parent, mnp, gp, gp_t_new, succ

    st = (jnp.asarray(1, INDEX_DTYPE), parent0, parent0, parent0, parent0,
          jnp.asarray(1, INDEX_DTYPE))
    _, parent, *_ = jax.lax.while_loop(cond, body, st)
    return parent


def cc_dist(A: Matrix, mesh: jax.sharding.Mesh, desc: Descriptor = DEFAULT,
            Ash: Optional[ShardedMatrix] = None) -> np.ndarray:
    """Distributed connected components (fused FastSV loop)."""
    if Ash is None:
        Ash = partition(A, mesh)
    fn = jax.shard_map(
        functools.partial(_cc_loop, max_niter=desc.max_niter),
        mesh=mesh, in_specs=(_mat_spec(),), out_specs=P_("x"),
        check_vma=False)
    parent = jax.jit(fn)(Ash)
    return np.asarray(parent)[: Ash.n]
