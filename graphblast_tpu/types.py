"""Core type definitions for graphblast-tpu.

TPU-native re-expression of the reference type system
(reference: graphblas/types.hpp:18-78). The reference uses int32 indices and
float32 values by default; we keep both, with indices always int32 (TPU-friendly
and matches `Index=int32`, types.hpp:18).

Unlike the reference's error-code enum (`Info`, types.hpp:28-42) propagated via
CHECK macros, this framework is functional: errors raise Python exceptions at
trace time (shape/dim mismatches are static) and invalid numeric states are
impossible by construction.
"""
from __future__ import annotations

import enum

import jax.numpy as jnp

# The GraphBLAS `Index` type (reference: graphblas/types.hpp:18).
INDEX_DTYPE = jnp.int32

# Sentinel padding: lane-count multiple used to round up static edge capacity so
# Pallas kernels always see whole (8,128) float32 tiles.
LANE = 128
SUBLANE = 8
TILE = LANE * SUBLANE


class Info(enum.Enum):
    """Status/error codes (reference: types.hpp:28-42 Info, 15 codes).

    The reference returns these from every call and CHECK-macros them up
    the stack (util.hpp:18-32). Here errors are raised as exceptions at
    trace time; this enum names the mapping for API parity:
      DIMENSION_MISMATCH  → dimension.DimensionException (a ValueError)
      INVALID_VALUE/INDEX → ValueError (mmio banner, bad arguments)
      UNINITIALIZED_OBJECT→ AttributeError/TypeError on None containers
      OUT_OF_MEMORY       → the runtime's RESOURCE_EXHAUSTED
      NOT_IMPLEMENTED     → absent by design: every declared op is real
                            (the reference prints-and-returns it for its
                            stub paths, operations.hpp:317-319)
    SUCCESS is implicit (no exception).
    """

    SUCCESS = 0
    NO_VALUE = 1
    UNINITIALIZED_OBJECT = 2
    NULL_POINTER = 3
    INVALID_VALUE = 4
    INVALID_INDEX = 5
    DOMAIN_MISMATCH = 6
    DIMENSION_MISMATCH = 7
    OUTPUT_NOT_EMPTY = 8
    OUT_OF_MEMORY = 9
    INSUFFICIENT_SPACE = 10
    INVALID_OBJECT = 11
    INDEX_OUT_OF_BOUNDS = 12
    PANIC = 13
    NOT_IMPLEMENTED = 14


class Storage(enum.Enum):
    """Vector/Matrix storage state (reference: graphblas/types.hpp:21-23)."""

    UNKNOWN = 0
    SPARSE = 1
    DENSE = 2


class SparseFormat(enum.Enum):
    """Sparse matrix storage format (reference: backend/cuda/types.hpp:7-11).

    CSRCSC keeps both copies (required for direction-optimized mxv/vxm);
    CSRONLY/CSCONLY force a single direction like the reference's
    GRB_SPARSE_MATRIX_FORMAT env var.
    """

    CSRCSC = 0
    CSRONLY = 1
    CSCONLY = 2


class LoadBalanceMode(enum.Enum):
    """Push-kernel load-balance strategy (reference: backend/cuda/types.hpp:13-17).

    SIMPLE = scatter-add (XLA scatter with monoid combiner);
    MERGE  = merge-path: cumsum'd edge windows + searchsorted + sort/segment
             (deterministic; the TPU analog of spmspv_inner.hpp:62-320).
    TWC is accepted for parity but aliases MERGE (unimplemented in the
    reference as well, operations.hpp:167-168).
    """

    SIMPLE = 0
    TWC = 1
    MERGE = 2


class Direction(enum.Enum):
    """mxv/vxm execution mode (reference: types.hpp:62-64 GrB_PUSHPULL etc.)."""

    PUSHPULL = 0  # auto: frontier-density heuristic picks per iteration
    PUSHONLY = 1  # sparse-frontier SpMSpV
    PULLONLY = 2  # dense-frontier SpMV


def dtype_max(dtype) -> object:
    """numeric_limits<T>::max() equivalent (used as Minimum monoid identity).

    The reference uses FLT_MAX (not +inf) e.g. sssp.hpp:26; we match that so
    converged vectors compare bitwise-equal against the reference.
    """
    dtype = jnp.dtype(dtype)
    if dtype.kind == "f":
        return float(jnp.finfo(dtype).max)
    if dtype.kind in ("i", "u"):
        return int(jnp.iinfo(dtype).max)
    if dtype.kind == "b":
        return True
    raise TypeError(f"unsupported dtype {dtype}")


def dtype_lowest(dtype) -> object:
    """std::numeric_limits<T>::min() equivalent (GreaterMonoid identity).

    Quirk preserved from the reference (stddef.hpp:166): for floats this is the
    smallest *positive normal* value, not -inf — C++ semantics.
    """
    dtype = jnp.dtype(dtype)
    if dtype.kind == "f":
        return float(jnp.finfo(dtype).tiny)
    if dtype.kind in ("i", "u"):
        return int(jnp.iinfo(dtype).min)
    if dtype.kind == "b":
        return False
    raise TypeError(f"unsupported dtype {dtype}")


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
