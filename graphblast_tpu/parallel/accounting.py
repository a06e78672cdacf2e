"""Per-iteration communication accounting for the distributed algorithms
(VERDICT r2 next-#7: evidence for the scaling claim that the virtual CPU
mesh cannot provide — ICI traffic is computed analytically from shard
shapes, cross-checked against the device bucketing in tests/test_dist.py).

Every formula is per-DEVICE per-ITERATION, in bytes, for a P-way 1D
row-partition (parallel/partition.py). Collective cost model (ring
algorithms over a 1D ICI ring — the standard all_gather/reduce_scatter
decomposition; see jax-ml.github.io/scaling-book):

  all_gather(n_pad · b bytes sharded)  → each device RECEIVES
      (P-1)/P · n_pad · b  over P-1 ring hops
  psum_scatter (reduce_scatter)        → same wire volume
  all_to_all (P blocks of pair_cap)    → sends/receives (P-1) · pair_cap · b
  ppermute (ring stage)                → block size per hop
  psum of a scalar                     → 4 bytes · 2 (negligible)
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

F32 = 4
I32 = 4


@dataclass
class CommRow:
    algorithm: str
    exchange: str                 # collective(s) used per iteration
    comm_bytes: float             # per device per iteration
    compute_bytes: float          # local HBM traffic per device per iteration
    note: str = ""

    def efficiency(self, hbm_gbs: float, ici_gbs: float) -> float:
        """Projected compute fraction t_comp / (t_comp + t_comm) assuming no
        overlap (lower bound; ppermute-staged variants overlap)."""
        t_comp = self.compute_bytes / (hbm_gbs * 1e9)
        t_comm = self.comm_bytes / (ici_gbs * 1e9)
        return t_comp / (t_comp + t_comm) if (t_comp + t_comm) else 1.0


def _spmv_local_bytes(nnz: int, P: int, n_pad: int) -> float:
    """Local pull SpMV HBM traffic: edge stream (ind+val) + x reads + y
    writes (the same 12 B/edge + vector traffic model as bench.py's
    spmv_gbs)."""
    return (nnz / P) * (I32 + F32) + n_pad * F32 + (n_pad / P) * F32


def pull_allgather(nnz: int, P: int, n_pad: int, algorithm="bfs/pr pull",
                   vec_bytes: int = F32) -> CommRow:
    comm = (P - 1) / P * n_pad * vec_bytes
    return CommRow(algorithm, "all_gather(x)", comm,
                   _spmv_local_bytes(nnz, P, n_pad))


def push_dense(nnz_frontier_edges: int, P: int, n_pad: int,
               algorithm="push (dense partial)") -> CommRow:
    """Owner-routing a full (n_pad,) ⊕-partial via psum_scatter — volume is
    O(n) regardless of frontier size (the r1 design the sparse exchange
    replaced)."""
    comm = (P - 1) / P * n_pad * F32
    compute = nnz_frontier_edges / P * (I32 + F32) + n_pad * F32
    return CommRow(algorithm, "psum_scatter(partial)", comm, compute)


def push_sparse(P: int, pair_cap: int, frontier_edges: int,
                algorithm="push (sparse exchange)") -> CommRow:
    """Owner-bucketed all_to_all of (idx, val) pairs: static buffer
    (P-1)·pair_cap·8 B; the LIVE volume scales with the frontier (tested:
    test_dist.py sparse-exchange tests)."""
    comm = (P - 1) * pair_cap * (I32 + F32)
    compute = frontier_edges / P * (I32 + F32) * 3   # expand + sort passes
    return CommRow(algorithm, "all_to_all(P·pair_cap)", comm, compute,
                   note=f"live pairs ≤ buffer; frontier edges/P = "
                        f"{frontier_edges / P:.0f}")


def pr_ring(nnz: int, P: int, n_pad: int) -> CommRow:
    """Ring-scheduled PR: P-1 ppermute stages of the (n_pad/P) block; total
    wire volume equals all_gather but each stage overlaps the local column-
    block multiply."""
    comm = (P - 1) * (n_pad / P) * F32
    return CommRow("pr (ring)", "ppermute ×(P-1)", comm,
                   _spmv_local_bytes(nnz, P, n_pad),
                   note="stages overlap compute")


def pr_2d(nnz: int, Pr: int, Pc: int, n_pad: int) -> CommRow:
    """SUMMA 2D: row-broadcast x block + column psum_scatter of partials —
    each O(n_pad/√P) per device instead of O(n_pad)."""
    comm = ((Pc - 1) / Pc * (n_pad / Pr) * F32
            + (Pr - 1) / Pr * (n_pad / Pc) * F32)
    return CommRow("pr (2d SUMMA)", "all_gather(row) + psum_scatter(col)",
                   comm, _spmv_local_bytes(nnz, Pr * Pc, n_pad))


def tc_ring(nnz: int, P: int) -> CommRow:
    """Ring-staged TC: each of P stages permutes a CSR row block
    (ptr + ind + val)."""
    comm = (P - 1) * (nnz / P) * (I32 + F32)
    return CommRow("tc (ring)", "ppermute(CSR block) ×(P-1)", comm,
                   nnz / P * (I32 + F32) * P,
                   note="block transfer overlaps stage compute")


def sparse_push_live_pairs(row_ptr: np.ndarray, col_ind: np.ndarray,
                           frontier: np.ndarray, P: int,
                           rows_per: int) -> np.ndarray:
    """Ground-truth off-shard pair counts: for each (src device k, dst
    device d != k) the number of expanded frontier edges crossing the shard
    boundary. Used by tests to cross-check the device bucketing."""
    row_ptr = np.asarray(row_ptr)
    col_ind = np.asarray(col_ind)
    counts = np.zeros((P, P), np.int64)
    for u in np.flatnonzero(frontier):
        k = u // rows_per
        dsts = col_ind[row_ptr[u]:row_ptr[u + 1]]
        own, c = np.unique(dsts // rows_per, return_counts=True)
        counts[k, own] += c
    return counts


def report(n: int, nnz: int, P: int, pair_cap: int,
           frontier_edges: int, hbm_gbs: float = 2765.0,
           ici_gbs: float = 600.0, ici_cons_gbs: float = 90.0) -> str:
    """Markdown table of per-iteration comm vs compute per device and the
    projected scaling efficiency t_comp/(t_comp + t_comm) — which equals
    edges/s at P chips over P × edges/s at 1 chip when the one-chip run is
    HBM-bound. Defaults: v5p HBM ~2765 GB/s; ICI 600 GB/s per chip (the
    public v5p figure, 4,800 Gbps interchip bandwidth per chip) plus a
    conservative 90 GB/s sensitivity column."""
    n_pad = ((n + P * 8 - 1) // (P * 8)) * P * 8
    rows = [
        pull_allgather(nnz, P, n_pad),
        push_dense(frontier_edges, P, n_pad),
        push_sparse(P, pair_cap, frontier_edges),
        pr_ring(nnz, P, n_pad),
        pr_2d(nnz, int(np.sqrt(P)), P // int(np.sqrt(P)), n_pad),
        tc_ring(nnz, P),
    ]
    out = [f"| algorithm | exchange | comm B/dev/iter | compute B/dev/iter "
           f"| eff @ICI {ici_gbs:.0f} GB/s | eff @ICI {ici_cons_gbs:.0f} "
           f"| note |",
           "|---|---|---|---|---|---|---|"]
    for r in rows:
        out.append(f"| {r.algorithm} | {r.exchange} | {r.comm_bytes:,.0f} "
                   f"| {r.compute_bytes:,.0f} "
                   f"| {100 * r.efficiency(hbm_gbs, ici_gbs):.0f}% "
                   f"| {100 * r.efficiency(hbm_gbs, ici_cons_gbs):.0f}% "
                   f"| {r.note} |")
    return "\n".join(out)
