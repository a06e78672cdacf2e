"""Triangle counting (reference: graphblas/algorithm/tc.hpp:15-54 + driver
prep example/gtc.cu:80-82).

    L = tril(A)                       # driver preprocessing
    B = mxm(mask=L, PlusMultiplies, L, Lᵀ)   # masked SpGEMM
    ntris = reduce(+, B)

The masked SpGEMM is the vectorized binary-search intersection kernel
(ops/spgemm.py — re-derivation of kernels/spgemm.hpp:17-79).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..descriptor import Descriptor, DEFAULT
from ..matrix import Matrix
from ..semiring import PlusMultipliesSemiring
from ..vector import Vector
from .common import TightTimer


def tc(L: Matrix, desc: Descriptor = DEFAULT) -> int:
    """Triangle count of a lower-triangular matrix L (the reference tc()
    contract: caller runs tril first, gtc.cu:80-82)."""
    from ..operations import mxm

    # mxm(B, mask=A, PlusMultiplies, A, A) with INP1 transposed (tc.hpp:24-39)
    B = mxm(L, L, PlusMultipliesSemiring, mask=L,
            desc=desc.replace(transpose_inp1=True))
    # per-entry counts are f32-exact (< 2^24 each); the total is summed in
    # int32 so counts above 2^24 don't silently round (ADVICE r1)
    return int(jnp.sum(jnp.round(B.val).astype(jnp.int32)))


def triangle_count(A: Matrix, desc: Descriptor = DEFAULT) -> int:
    """Convenience: tril + tc on a full (symmetric) adjacency matrix."""
    from ..operations import tril

    return tc(tril(A), desc)


def tc_cpu(L: Matrix):
    from .reference import tc_cpu as _impl

    return _impl(L)
