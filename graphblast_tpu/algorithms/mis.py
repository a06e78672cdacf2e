"""Maximal independent set — Luby's algorithm with random weights
(reference: graphblas/algorithm/mis.hpp:23-160).

Per round (dense int32, fully fused):
    m = vxm(mask=w, MaximumMultiplies, w, A)    # max candidate-neighbor weight
    f = w > m                                   # local maxima (GreaterPlus)
    v ← 1 where f ; w ← 0 where f               # admit to set, drop candidates
    m2 = vxm(mask=w, LogicalOrAnd, f, A)        # neighbors of new members
    w ← 0 where m2                              # remove from candidates

RNG: jax.random on device replaces the reference's host-sequential rand()
escape hatch (mis.hpp:129-133 toggling GrB_BACKEND=SEQUENTIAL — unnecessary
here, an aux-subsystem win)."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..descriptor import Descriptor, DEFAULT
from ..matrix import Matrix
from ..semiring import MaximumMultipliesSemiring, LogicalOrAndSemiring
from ..types import INDEX_DTYPE
from ..vector import Vector
from ..ops.spmv import spmv_pull
from .common import TightTimer, csc_int_arrays, dense_result, print_iter_row


def random_weights(n: int, seed: int) -> jnp.ndarray:
    """set_random equivalent (reference: common.hpp:8-23), strictly positive
    so weight-0 never blocks selection."""
    key = jax.random.PRNGKey(seed)
    return jax.random.randint(key, (n,), 1, 2 ** 30, dtype=jnp.int32)


def _mis_round(A: Matrix, v, w):
    n = A.nrows
    ptr, ind, val = csc_int_arrays(A)
    # vxm(m, mask=w, MaximumMultiplies, w, A) — mis.hpp:81-83. CSC pull.
    m = spmv_pull(ptr, ind, val, w,
                  MaximumMultipliesSemiring, n, mask_dense=w)
    # f = w > m (eWiseAdd GreaterPlus, mis.hpp:88-89)
    f = (w > m).astype(jnp.int32)
    # assign v←1, w←0 under mask f (mis.hpp:92-98)
    v = jnp.where(f != 0, 1, v)
    w = jnp.where(f != 0, 0, w)
    succ = jnp.sum(f).astype(INDEX_DTYPE)
    # neighbor removal (mis.hpp:105-109)
    m2 = spmv_pull(ptr, ind, val,
                   f, LogicalOrAndSemiring, n, mask_dense=w)
    w = jnp.where(m2 != 0, 0, w)
    return v, w, succ


@functools.partial(jax.jit, static_argnames=("max_niter",))
def _mis_fused(A: Matrix, w0, *, max_niter):
    n = A.nrows
    v0 = jnp.zeros((n,), jnp.int32)

    def cond(state):
        it, v, w, succ = state
        return (succ > 0) & (it <= max_niter)

    def body(state):
        it, v, w, _ = state
        v, w, succ = _mis_round(A, v, w)
        return it + 1, v, w, succ

    it, v, w, succ = jax.lax.while_loop(
        cond, body, (jnp.asarray(1, INDEX_DTYPE), v0, w0,
                     jnp.asarray(1, INDEX_DTYPE)))
    return v, it - 1


_mis_round_jit = jax.jit(_mis_round)


def mis_inner(A: Matrix, w0, max_niter: int = 10000):
    """misInner (reference: mis.hpp:23-141): MIS of the candidate set w0.
    Returns (membership 0/1 int32 array, remaining-candidate array)."""
    v, _ = _mis_fused(A, w0, max_niter=max_niter)
    return v


def mis(A: Matrix, seed: int = 0, desc: Descriptor = DEFAULT,
        mode: str = "fused") -> Vector:
    """MIS membership vector: 1 = in set (reference: mis.hpp:113-148)."""
    n = A.nrows
    w0 = random_weights(n, seed if seed else desc.seed)
    if mode == "fused":
        v, _ = _mis_fused(A, w0, max_niter=desc.max_niter)
        return dense_result(n, v)

    timer = TightTimer()
    v = jnp.zeros((n,), jnp.int32)
    w = w0
    for it in range(1, desc.max_niter + 1):
        timer.start()
        v, w, succ_t = _mis_round_jit(A, v, w)
        ms = timer.stop(v)
        succ = int(succ_t)
        print_iter_row(it, succ, n, n, False, ms, desc.timing)
        if succ == 0:
            break
    return dense_result(n, v)


def mis_cpu(A: Matrix, seed: int = 0):
    from .reference import mis_cpu as _impl

    return _impl(A, seed)


def verify_mis(A: Matrix, in_set) -> bool:
    from .reference import verify_mis as _impl

    return _impl(A, in_set)
