"""Pure-NumPy golden reference algorithms + property verifiers.

Mirror of the reference's CPU ground-truth suite
(graphblas/algorithm/test_{bfs,sssp,pr,cc,tc,mis,gc,lgc}.hpp — SURVEY.md §4
tier 2): exact-output references for deterministic algorithms, property
verifiers for the randomized ones (CC label consistency, MIS independence +
maximality, GC proper coloring). All operate on host CSR arrays.
"""
from __future__ import annotations

import heapq

import numpy as np

MAXF = float(np.finfo(np.float32).max)


def _csr(A):
    """Accept a Matrix or a (row_ptr, col_ind, val, n) tuple."""
    if isinstance(A, tuple):
        return A
    rp = np.asarray(A.row_ptr)
    ci = np.asarray(A.col_ind)[: A.nvals]
    v = np.asarray(A.val)[: A.nvals]
    return rp, ci, v, A.nrows


def bfs_cpu(A, source: int, max_depth: int = 10**9) -> np.ndarray:
    """Levels: source = 1, neighbors = level+1, unreached = 0
    (reference: test_bfs.hpp:12-60 SimpleReferenceBfs)."""
    rp, ci, _, n = _csr(A)
    path = np.zeros(n, dtype=np.float32)
    path[source] = 1
    q = [source]
    while q:
        nq = []
        for u in q:
            d = path[u] + 1
            if d > max_depth:
                return path
            for e in range(rp[u], rp[u + 1]):
                w = ci[e]
                if path[w] == 0:
                    path[w] = d
                    nq.append(w)
        q = nq
    return path


def sssp_cpu(A, source: int) -> np.ndarray:
    """Dijkstra distances; unreachable = FLT_MAX
    (reference: test_sssp.hpp:14-70 SimpleReferenceSssp)."""
    rp, ci, val, n = _csr(A)
    dist = np.full(n, MAXF, dtype=np.float32)
    dist[source] = 0.0
    pq = [(0.0, source)]
    done = np.zeros(n, dtype=bool)
    while pq:
        d, u = heapq.heappop(pq)
        if done[u]:
            continue
        done[u] = True
        for e in range(rp[u], rp[u + 1]):
            w = ci[e]
            nd = np.float32(d) + np.float32(val[e])
            if nd < dist[w]:
                dist[w] = nd
                heapq.heappush(pq, (float(nd), w))
    return dist


def pr_cpu(A, alpha: float = 0.85, eps: float = 1e-6,
           max_niter: int = 100) -> np.ndarray:
    """PageRank on the RAW adjacency (degree-normalizes internally like
    SimpleReferencePr, test_pr.hpp:14-80): p ← α·Aᵀ(p/outdeg) + (1-α)/n,
    converging on squared-L2 residual < eps."""
    rp, ci, _, n = _csr(A)
    outdeg = np.maximum(np.diff(rp), 1).astype(np.float32)
    p = np.full(n, 1.0 / n, dtype=np.float32)
    for _ in range(max_niter):
        nxt = np.full(n, (1.0 - alpha) / n, dtype=np.float32)
        contrib = alpha * p / outdeg
        for u in range(n):
            for e in range(rp[u], rp[u + 1]):
                nxt[ci[e]] += contrib[u]
        resid = float(((p - nxt) ** 2).sum())
        p = nxt
        if resid < eps:
            break
    return p


def cc_cpu(A) -> np.ndarray:
    """Connected-component labels = min vertex id per component
    (reference: test_cc.hpp SimpleReferenceCc)."""
    rp, ci, _, n = _csr(A)
    label = np.arange(n)
    changed = True
    while changed:
        changed = False
        for u in range(n):
            for e in range(rp[u], rp[u + 1]):
                w = ci[e]
                m = min(label[u], label[w])
                if label[u] != m or label[w] != m:
                    label[u] = label[w] = m
                    changed = True
    return label


def verify_cc(A, labels) -> bool:
    """Property check: all neighbors share a label
    (reference: test_cc.hpp:58-95 SimpleVerifyCc)."""
    rp, ci, _, n = _csr(A)
    labels = np.asarray(labels)
    for u in range(n):
        for e in range(rp[u], rp[u + 1]):
            if labels[u] != labels[ci[e]]:
                return False
    return True


def tc_cpu(A) -> int:
    """Triangle count on a lower-triangular matrix L: Σ nnz-matching of
    L·Lᵀ masked by L (reference: test_tc.hpp SimpleReferenceTc)."""
    rp, ci, _, n = _csr(A)
    adj = [set(ci[rp[u]:rp[u + 1]].tolist()) for u in range(n)]
    count = 0
    for u in range(n):
        for w in adj[u]:
            count += len(adj[u] & adj[w])
    return count


def mis_cpu(A, seed: int = 0) -> np.ndarray:
    """Greedy maximal independent set; 1 = in set
    (reference: test_mis.hpp SimpleReferenceMis)."""
    rp, ci, _, n = _csr(A)
    state = np.zeros(n, dtype=np.int32)  # 0 unknown, 1 in set, -1 removed
    order = np.random.RandomState(seed).permutation(n)
    for u in order:
        if state[u] == 0:
            state[u] = 1
            state[ci[rp[u]:rp[u + 1]]] = np.where(
                state[ci[rp[u]:rp[u + 1]]] == 1, 1, -1)
    return (state == 1).astype(np.int32)


def verify_mis(A, in_set) -> bool:
    """Independence + maximality (reference: test_mis.hpp SimpleVerifyMis)."""
    rp, ci, _, n = _csr(A)
    s = np.asarray(in_set) != 0
    for u in range(n):
        nbrs = ci[rp[u]:rp[u + 1]]
        nbrs = nbrs[nbrs != u]
        if s[u] and s[nbrs].any():
            return False  # not independent
        if not s[u] and len(nbrs) and not s[nbrs].any():
            return False  # not maximal
        if not s[u] and len(nbrs) == 0:
            return False  # isolated vertex must be in the set
    return True


def gc_cpu(A, seed: int = 0) -> np.ndarray:
    """Greedy graph coloring, colors ≥ 1 (reference: test_gc.hpp)."""
    rp, ci, _, n = _csr(A)
    colors = np.zeros(n, dtype=np.int32)
    order = np.random.RandomState(seed).permutation(n)
    for u in order:
        used = set(colors[ci[rp[u]:rp[u + 1]]].tolist())
        c = 1
        while c in used:
            c += 1
        colors[u] = c
    return colors


def verify_gc(A, colors) -> bool:
    """Proper coloring: no edge endpoints share a color, all colored
    (reference: test_gc.hpp SimpleVerifyGc)."""
    rp, ci, _, n = _csr(A)
    colors = np.asarray(colors)
    if (colors <= 0).any():
        return False
    for u in range(n):
        nbrs = ci[rp[u]:rp[u + 1]]
        nbrs = nbrs[nbrs != u]
        if (colors[nbrs] == colors[u]).any():
            return False
    return True


def lgc_cpu(A, source: int, alpha: float = 0.15, eps: float = 1e-6,
            max_niter: int = 200) -> np.ndarray:
    """Andersen-Chung-Lang PPR push, matching the GraphBLAS formulation in
    lgc.hpp:14-163 (reference: test_lgc.hpp SimpleReferenceLgc):
      while ∃ frontier {r(v) ≥ d(v)·eps}:
        p += α·r.*f ; r_f = (1-α)/2 · r.*f ; r = r - r.*f + Aᵀ(r_f / d)
    """
    rp, ci, _, n = _csr(A)
    deg = np.diff(rp).astype(np.float32)
    p = np.zeros(n, dtype=np.float32)
    r = np.zeros(n, dtype=np.float32)
    r[source] = 1.0
    for _ in range(max_niter):
        f = r >= deg * eps
        f &= deg > 0
        if not f.any():
            break
        p[f] += alpha * r[f]
        spread = np.where(f, (1.0 - alpha) / 2.0 * r, 0.0)
        r = np.where(f, spread, r)
        push = np.zeros(n, dtype=np.float32)
        contrib = np.where(f, spread / np.maximum(deg, 1), 0.0)
        for u in range(n):
            if f[u]:
                push[ci[rp[u]:rp[u + 1]]] += contrib[u]
        r = r + push
    return p
