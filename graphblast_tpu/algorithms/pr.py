"""PageRank (reference: graphblas/algorithm/pr.hpp:15-94 + driver prep
example/gpr.cu:82-98).

The reference driver pre-scales the column-stochastic matrix
(A ← α·A/outdegree) and the algorithm iterates:
    p' = vxm(PlusMultiplies, p, A) + (1-α)/n        # rank propagation
    err = ‖p' - p‖₂                                 # PlusMinus eWiseMult +
                                                    # MultipliesMultiplies + reduce
until err ≤ eps. Pure dense pull — the MXU/VPU-friendliest loop in the
library; fused mode keeps the whole convergence loop on device.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..descriptor import Descriptor, DEFAULT
from ..matrix import Matrix
from ..semiring import PlusMultipliesSemiring, PlusMonoid, PlusDividesSemiring, PlusMultipliesSemiring as _PM
from ..types import INDEX_DTYPE
from ..vector import Vector
from ..ops.spmv import spmv_pull, spmv_pull_sorted
from .common import TightTimer, dense_result, print_iter_row


def prepare_pr_matrix(A: Matrix, alpha: float = 0.85) -> Matrix:
    """Driver prep: A ← α · A / outdegree(row) (example/gpr.cu:82-90:
    reduce to outdegrees, eWiseMult by α, eWiseMult-divide by outdegrees)."""
    from ..operations import (eWiseMult_matrix_scalar, reduce_matrix_to_vector,
                              scale_matrix_rows)

    outdeg = reduce_matrix_to_vector(A, PlusMonoid)
    scaled = eWiseMult_matrix_scalar(A, _PM, alpha)
    return scale_matrix_rows(scaled, outdeg, PlusDividesSemiring)


def _pr_step(A: Matrix, p, alpha: float, plan=None):
    # vxm(p_swap, PlusMultiplies, p_prev, A) — pr.hpp:69-71. vxm pull over CSC.
    # Fast path: the tiled one-hot bilinear kernel (no sort, no random
    # gather — ops/pallas/bilinear.py, measured 3x the sorted pipeline and
    # 20x more accurate). Fallback: monotone gather + key sort.
    from ..ops.gather_dispatch import use_pallas

    if plan is not None:
        from ..ops.pallas.bilinear import spmv_bilinear

        p_swap = spmv_bilinear(plan, p)
    elif use_pallas() and A.row_ind is not None:
        p_swap = spmv_pull_sorted(A.col_ptr, A.row_ind, A.col_ind, A.val, p,
                                  PlusMultipliesSemiring, A.ncols, A.nvals)
    else:
        p_swap = spmv_pull(A.col_ptr, A.csc_row_ind, A.csc_val, p,
                           PlusMultipliesSemiring, A.ncols)
    # eWiseAdd(p, PlusMultiplies, p_swap, (1-alpha)/n) — pr.hpp:72-73
    p_new = p_swap + (1.0 - alpha) / A.nrows
    # error = sqrt Σ (p-p_prev)² — pr.hpp:76-81
    r = p_new - p
    err = jnp.sqrt(jnp.sum(r * r))
    return p_new, err


@functools.partial(jax.jit, static_argnames=("alpha", "eps", "max_niter"))
def _pr_fused(A: Matrix, plan=None, *, alpha, eps, max_niter):
    n = A.nrows
    p0 = jnp.full((n,), 1.0 / n, jnp.float32)

    def cond(state):
        it, p, err = state
        return (err > eps) & (it <= max_niter)

    def body(state):
        it, p, _ = state
        p, err = _pr_step(A, p, alpha, plan)
        return it + 1, p, err

    it, p, err = jax.lax.while_loop(
        cond, body, (jnp.asarray(1, INDEX_DTYPE), p0,
                     jnp.asarray(1.0, jnp.float32)))
    return p, it - 1, err


def prepare_pr_plan(A: Matrix, alpha: float = 0.85):
    """Build the α-scaled vxm bilinear plan on the HOST (no device fetch):
    the plan carries csc values scaled by α/outdeg(row), i.e. the vxm pull
    of prepare_pr_matrix(A)'s result. Returns None when A lacks a host
    stash or exceeds the kernel's VMEM budget."""
    import numpy as np

    from ..ops.gather_dispatch import use_pallas
    from ..ops.pallas.bilinear import plan_for

    if not use_pallas():
        return None
    host_csr = getattr(A, "_host_csr", None)
    host_csc = getattr(A, "_host_csc", None)
    if host_csr is None or host_csc is None:
        return None
    # above the VMEM residency limit plan_for returns the windowed-DMA
    # plan, so fused PR stays on the bilinear path at any scale (r3)
    ptr, _, rvals = host_csr
    n = A.nrows
    outdeg = np.zeros(n, np.float64)
    np.add.at(outdeg, np.repeat(np.arange(n), np.diff(ptr.astype(np.int64))),
              rvals.astype(np.float64))
    scale = np.where(outdeg > 0, alpha / np.maximum(outdeg, 1e-300), 0.0)
    _, cind, cval = host_csc
    val_scaled = (cval.astype(np.float64) * scale[cind]).astype(np.float32)
    return plan_for(A, transpose=True, host_val=val_scaled)


_pr_step_jit = jax.jit(_pr_step, static_argnames=("alpha",))


def pr(A: Matrix, alpha: float = 0.85, eps: float = 1e-6,
       desc: Descriptor = DEFAULT, mode: str = "fused",
       prepared: bool = False) -> Vector:
    """PageRank vector. `prepared=True` means A is already α-scaled
    column-stochastic (the reference pr() contract); otherwise the driver
    prep runs first."""
    plan = None
    if not prepared:
        plan = prepare_pr_plan(A, alpha)
        if plan is None or mode != "fused":
            A = prepare_pr_matrix(A, alpha)
    n = A.nrows
    if mode == "fused":
        p, _, _ = _pr_fused(A, plan, alpha=alpha, eps=eps,
                            max_niter=desc.max_niter)
        return dense_result(n, p)

    timer = TightTimer()
    p = jnp.full((n,), 1.0 / n, jnp.float32)
    for it in range(1, desc.max_niter + 1):
        timer.start()
        p, err_t = _pr_step_jit(A, p, alpha)
        ms = timer.stop(p)
        err = float(err_t)
        print_iter_row(it, f"{err:.3e}", n, n, False, ms, desc.timing)
        if err <= eps:
            break
    return dense_result(n, p)


def pr_cpu(A: Matrix, alpha: float = 0.85, eps: float = 1e-6,
           max_niter: int = 100):
    from .reference import pr_cpu as _impl

    return _impl(A, alpha, eps, max_niter)
