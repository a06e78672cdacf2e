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


def _pr_step(A: Matrix, p, alpha: float):
    # vxm(p_swap, PlusMultiplies, p_prev, A) — pr.hpp:69-71. vxm pull over CSC.
    # On TPU: gather p at CSR row ids (monotone → near-free) and key-sort the
    # products into CSC order instead of a random gather (spmv_pull_sorted).
    from ..ops.gather_dispatch import use_pallas

    if use_pallas() and A.row_ind is not None:
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
def _pr_fused(A: Matrix, *, alpha, eps, max_niter):
    n = A.nrows
    p0 = jnp.full((n,), 1.0 / n, jnp.float32)

    def cond(state):
        it, p, err = state
        return (err > eps) & (it <= max_niter)

    def body(state):
        it, p, _ = state
        p, err = _pr_step(A, p, alpha)
        return it + 1, p, err

    it, p, err = jax.lax.while_loop(
        cond, body, (jnp.asarray(1, INDEX_DTYPE), p0,
                     jnp.asarray(1.0, jnp.float32)))
    return p, it - 1, err


_pr_step_jit = jax.jit(_pr_step, static_argnames=("alpha",))


def pr(A: Matrix, alpha: float = 0.85, eps: float = 1e-6,
       desc: Descriptor = DEFAULT, mode: str = "fused",
       prepared: bool = False) -> Vector:
    """PageRank vector. `prepared=True` means A is already α-scaled
    column-stochastic (the reference pr() contract); otherwise the driver
    prep runs first."""
    if not prepared:
        A = prepare_pr_matrix(A, alpha)
    n = A.nrows
    if mode == "fused":
        p, _, _ = _pr_fused(A, alpha=alpha, eps=eps,
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
