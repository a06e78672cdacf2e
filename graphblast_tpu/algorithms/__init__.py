"""Algorithm library (L4) — reference: graphblas/algorithm/ (SURVEY.md §2.5).

Each algorithm composes the GraphBLAS ops under jit with a lax.while_loop
convergence driver ("fused") or a host loop with per-iteration CSV timing
("stepped", the reference driver contract)."""

from .bfs import bfs, bfs_cpu
from .sssp import sssp, sssp_cpu
from .pr import pr, pr_cpu, prepare_pr_matrix
from .cc import cc, cc_cpu, verify_cc
from .tc import tc, tc_cpu, triangle_count
from .mis import mis, mis_cpu, mis_inner, verify_mis
from .gc import gc, gc_cpu, verify_gc
from .lgc import lgc, lgc_cpu
from .diameter import diameter
from . import reference
