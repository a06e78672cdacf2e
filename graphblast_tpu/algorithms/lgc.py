"""Local graph clustering — Andersen-Chung-Lang PPR push
(reference: graphblas/algorithm/lgc.hpp:14-163).

Per iteration over the frontier f = {v : r(v) ≥ d(v)·eps}:
    p += α · r.*f                       (masked eWiseMult + eWiseAdd)
    r_f = (1-α)/2 · r.*f                (masked eWiseMult)
    r  = r off-frontier + r_f + A·(r_f / d)   (PlusDivides + accum mxv)

Semantics note: the reference's GPU loop zeroes OFF-frontier residual (its
masked eWiseMult writes identity on mask failure, kernels/ewisemult.hpp:80),
which leaks probability mass and disagrees with its own CPU golden
(test_lgc.hpp:14-80, which preserves it). We implement the golden
(mass-preserving) semantics.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..descriptor import Descriptor, DEFAULT
from ..matrix import Matrix
from ..semiring import PlusMultipliesSemiring, PlusMonoid
from ..types import INDEX_DTYPE
from ..vector import Vector
from ..ops.spmv import spmv_pull
from ..ops.elementwise import reduce_matrix_rows
from .common import dense_result


def _lgc_step(A: Matrix, p, r, deg, alpha: float, eps: float):
    n = A.nrows
    # frontier f = {v | r(v) >= d(v)·eps} (lgc.hpp:131-133); deg>0 guard keeps
    # isolated vertices out (they can never spread)
    f = (r >= deg * eps) & (deg > 0)
    succ = jnp.sum(f).astype(INDEX_DTYPE)
    # p = p + alpha * r .* f (lgc.hpp:105-110)
    p = p + jnp.where(f, alpha * r, 0.0)
    # r_f = (1-alpha)/2 * r on the frontier (lgc.hpp:113-114)
    spread = jnp.where(f, (1.0 - alpha) / 2.0 * r, 0.0)
    # r2 = r_f / d (PlusDivides eWiseMult, lgc.hpp:118-122)
    r2 = jnp.where(f, spread / jnp.maximum(deg, 1.0), 0.0)
    # r = (off-frontier r) + r_f + A·r2 (accum mxv, lgc.hpp:125-126)
    push = spmv_pull(A.row_ptr, A.col_ind, A.val, r2,
                     PlusMultipliesSemiring, n)
    r = jnp.where(f, spread, r) + push
    return p, r, succ


@functools.partial(jax.jit, static_argnames=("alpha", "eps", "max_niter"))
def _lgc_fused(A: Matrix, source, *, alpha, eps, max_niter):
    n = A.nrows
    deg = reduce_matrix_rows(A.row_ptr, A.val, PlusMonoid, n)
    p0 = jnp.zeros((n,), jnp.float32)
    r0 = jnp.zeros((n,), jnp.float32).at[
        jnp.asarray(source, INDEX_DTYPE)].set(1.0)

    def cond(st):
        it, p, r, succ = st
        return (succ > 0) & (it <= max_niter)

    def body(st):
        it, p, r, _ = st
        p, r, succ = _lgc_step(A, p, r, deg, alpha, eps)
        return it + 1, p, r, succ

    _, p, r, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(1, INDEX_DTYPE), p0, r0,
                     jnp.asarray(1, INDEX_DTYPE)))
    return p, r


def lgc(A: Matrix, source: int, alpha: float = 0.15, eps: float = 1e-6,
        desc: Descriptor = DEFAULT) -> Vector:
    """Approximate personalized-PageRank vector around `source`
    (reference: lgc.hpp signature — alpha is the teleport constant)."""
    p, _ = _lgc_fused(A, source, alpha=alpha, eps=eps,
                      max_niter=desc.max_niter)
    return dense_result(A.nrows, p)


def lgc_cpu(A: Matrix, source: int, alpha: float = 0.15, eps: float = 1e-6,
            max_niter: int = 200):
    from .reference import lgc_cpu as _impl

    return _impl(A, source, alpha, eps, max_niter)
