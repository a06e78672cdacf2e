"""Algorithm library (L4) — reference: graphblas/algorithm/ (SURVEY.md §2.5).

Each algorithm composes the GraphBLAS ops under jit with a lax.while_loop
convergence driver ("fused") or a host loop with per-iteration CSV timing
("stepped", the reference driver contract)."""

from .bfs import bfs, bfs_cpu
from .sssp import sssp, sssp_cpu
from .pr import pr, pr_cpu, prepare_pr_matrix
from . import reference
