"""Graph coloring — IS / MIS / Jones-Plassmann variants
(reference: graphblas/algorithm/gc.hpp:16-406).

  gc_is   (gc.hpp:43-148):  Luby independent set per color; color = round id.
  gc_mis  (gc.hpp:151-254): full MIS per color (fewer colors, more work/round).
  gc_jp   (gc.hpp:257-406): Jones-Plassmann with the reference's GLOBAL
          min-unused-color trick (scatter neighbor colors into a dense
          max_colors array, min over color ids + ascending — gc.hpp:358-377).
  gc      dispatcher mirroring the driver's --gcalgo flag; the reference's
          gcCusparse (vendor csrcolor, gc.hpp:16-40) maps to gc_is, the same
          IS-coloring family.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..descriptor import Descriptor, DEFAULT
from ..matrix import Matrix
from ..semiring import (LogicalOrAndSemiring, MaximumMultipliesSemiring)
from ..types import INDEX_DTYPE
from ..vector import Vector
from ..ops.spmv import spmv_pull
from .common import csc_int_arrays, dense_result
from .mis import random_weights, _mis_fused


def _gc_is_round(A: Matrix, v, w, it):
    n = A.nrows
    ptr, ind, val = csc_int_arrays(A)
    # UNMASKED max-of-neighbors (gc.hpp:104-106)
    m = spmv_pull(ptr, ind, val, w, MaximumMultipliesSemiring, n)
    f = (w > m).astype(jnp.int32)  # eWiseAdd GreaterPlus (gc.hpp:112-113)
    succ = jnp.sum(f).astype(INDEX_DTYPE)
    v = jnp.where(f != 0, it.astype(jnp.int32), v)   # assign color (gc.hpp:123)
    w = jnp.where(f != 0, 0, w)                      # drop candidates
    return v, w, succ


@functools.partial(jax.jit, static_argnames=("max_niter",))
def _gc_is_fused(A: Matrix, w0, *, max_niter):
    n = A.nrows
    v0 = jnp.zeros((n,), jnp.int32)

    def cond(st):
        it, v, w, succ = st
        return (succ > 0) & (it <= max_niter)

    def body(st):
        it, v, w, _ = st
        v, w, succ = _gc_is_round(A, v, w, it)
        return it + 1, v, w, succ

    _, v, _, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(1, INDEX_DTYPE), v0, w0,
                     jnp.asarray(1, INDEX_DTYPE)))
    return v


def _gc_jp_round(A: Matrix, v, w, max_colors: int):
    n = A.nrows
    ptr, ind, val = csc_int_arrays(A)
    # masked max-of-neighbors (gc.hpp:337-339: vxm(m, mask=w, MaxMult, w, A))
    m = spmv_pull(ptr, ind, val, w, MaximumMultipliesSemiring, n, mask_dense=w)
    f = (w > m).astype(jnp.int32)
    succ = jnp.sum(f).astype(INDEX_DTYPE)
    # colored neighbors of the frontier (gc.hpp:354-356: mask = v)
    nbr = spmv_pull(ptr, ind, val, f, LogicalOrAndSemiring, n, mask_dense=v)
    # their colors (eWiseMult PlusMultiplies, gc.hpp:359-360)
    ncol = nbr * v
    # global min unused color: scatter colors into dense array, min of unused
    # slot ids (gc.hpp:363-377; color 0 excluded via setElement)
    d = jnp.zeros((max_colors,), jnp.int32).at[
        jnp.clip(ncol, 0, max_colors - 1)].set(max_colors, mode="drop")
    ids = jnp.arange(max_colors, dtype=jnp.int32)
    min_array = jnp.minimum(d + ids, max_colors).at[0].set(max_colors)
    min_color = jnp.min(min_array)
    v = jnp.where(f != 0, min_color, v)
    w = jnp.where(f != 0, 0, w)
    return v, w, succ


@functools.partial(jax.jit, static_argnames=("max_colors", "max_niter"))
def _gc_jp_fused(A: Matrix, w0, *, max_colors, max_niter):
    n = A.nrows
    v0 = jnp.zeros((n,), jnp.int32)

    def cond(st):
        it, v, w, succ = st
        return (succ > 0) & (it <= max_niter)

    def body(st):
        it, v, w, _ = st
        v, w, succ = _gc_jp_round(A, v, w, max_colors)
        return it + 1, v, w, succ

    _, v, _, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(1, INDEX_DTYPE), v0, w0,
                     jnp.asarray(1, INDEX_DTYPE)))
    return v


def gc(A: Matrix, seed: int = 0, max_colors: int = 128,
       desc: Descriptor = DEFAULT, algo: str = "is") -> Vector:
    """Vertex colors ≥ 1 (0 = uncolored). algo ∈ {is, mis, jp, cusparse}
    mirroring the driver's --gcalgo (reference: example/ggc.cu)."""
    n = A.nrows
    w0 = random_weights(n, seed if seed else desc.seed)
    if algo in ("is", "cusparse"):
        v = _gc_is_fused(A, w0, max_niter=desc.max_niter)
    elif algo == "jp":
        v = _gc_jp_fused(A, w0, max_colors=max_colors,
                         max_niter=desc.max_niter)
    elif algo == "mis":
        v = _gc_mis(A, w0, desc)
    else:
        raise ValueError(f"unknown gc algo {algo!r}")
    return dense_result(n, v)


def _gc_mis(A: Matrix, w0, desc: Descriptor):
    """gcMIS (gc.hpp:151-254): repeatedly peel a full MIS of the remaining
    candidates; host outer loop (color count is small), fused inner MIS."""
    n = A.nrows
    v = jnp.zeros((n,), jnp.int32)
    w = w0
    for color in range(1, desc.max_niter + 1):
        f, _ = _mis_fused(A, w, max_niter=desc.max_niter)
        succ = int(jnp.sum(f))
        if succ == 0:
            break
        v = jnp.where(f != 0, color, v)
        w = jnp.where(f != 0, 0, w)
    return v


def gc_cpu(A: Matrix, seed: int = 0):
    from .reference import gc_cpu as _impl

    return _impl(A, seed)


def verify_gc(A: Matrix, colors) -> bool:
    from .reference import verify_gc as _impl

    return _impl(A, colors)
