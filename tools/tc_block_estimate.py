#!/usr/bin/env python
"""Host-side feasibility estimate for block-sparse int8 MXU triangle
counting at rmat18 (VERDICT r4 next-#5): bucket L's edges into B×B blocks,
count the (I,J,K) block triples the MXU would have to run
(mask block (I,J) present × Σ_K presence[I,K]·presence[J,K]) and convert
to seconds at measured MXU rates. Pure numpy — no device work.

Usage: JAX_PLATFORM_NAME=cpu python tools/tc_block_estimate.py [scale]
"""
import sys

import numpy as np

sys.path.insert(0, ".")

scale = int(sys.argv[1]) if len(sys.argv) > 1 else 18

from graphblast_tpu.io.rmat import rmat_edges
from graphblast_tpu.io.mmio import canonicalize_coo

rows, cols = rmat_edges(scale, 16, seed=42)
vals = np.ones(len(rows), np.float32)
rows, cols, vals = canonicalize_coo(rows, cols, vals, undirected=True,
                                    remove_self_loops=True)
n = 1 << scale


def lanes(r, c, label):
    deg = np.bincount(r, minlength=n)
    exp_a = deg[r].astype(np.int64)
    exp_b = deg[c].astype(np.int64)   # transpose_b=True: B rows = L rows
    print(f"{label}: nnz={len(r):,} lanes A-side {exp_a.sum():,} "
          f"min-side {np.minimum(exp_a, exp_b).sum():,}", flush=True)


tri = rows > cols            # natural-order tril (bench.py convention)
lanes(rows[tri], cols[tri], f"rmat{scale} tril natural")

# degree-ordered orientation: relabel by increasing total degree, keep the
# high-rank -> low-rank direction — the standard wedge-minimizing TC trick
# (triangle count is invariant under relabeling)
degree = np.bincount(rows, minlength=n) + np.bincount(cols, minlength=n)
rank = np.empty(n, np.int64)
rank[np.argsort(degree, kind="stable")] = np.arange(n)
rr, rc = rank[rows], rank[cols]
tri = rr > rc
lanes(rr[tri], rc[tri], f"rmat{scale} tril degree-ordered")
rows, cols = rows[rows > cols], cols[rows > cols]

for B in (128, 256, 512, 1024):
    nb = n // B
    bi, bk = rows // B, cols // B
    # block presence P[I,K] (0/1) and per-block edge counts
    P = np.zeros((nb, nb), np.int64)
    np.add.at(P, (bi, bk), 1)
    pres = (P > 0)
    # triples per (I,J): T = pres @ pres.T  (Σ_K pres[I,K]·pres[J,K])
    T = pres.astype(np.int64) @ pres.astype(np.int64).T
    # mask blocks = blocks containing L edges (I=bi, J=bk of each edge)
    mask_blocks = np.unique(bi * nb + bk)
    mI, mJ = mask_blocks // nb, mask_blocks % nb
    triples = int(T[mI, mJ].sum())
    macs = triples * (B ** 3)
    # measured int8 MXU rate proxy: dense TC at rmat15 = 200.7 ms for
    # (32768/512)^2/2 block pairs x 512^2 x 32768 macs => derive
    # effective MACs/s from that measurement
    dense_macs = ((32768 // 512) * (32768 // 512 + 1) // 2) * 512 * 512 * 32768
    eff = dense_macs / 0.2007
    est_s = macs / eff
    print(f"B={B:5d}: nonempty blocks {int(pres.sum()):,}/{nb*nb:,} "
          f"mask blocks {len(mask_blocks):,} triples {triples:,} "
          f"macs {macs/1e12:.2f} T → ~{est_s:.1f}s at dense-TC-measured rate",
          flush=True)
