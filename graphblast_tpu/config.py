"""Process-level configuration from environment variables.

Parity with the reference's env-var layer (docs/env_var.md:10-28; getEnv,
util.hpp:134-148):

  GRB_SPARSE_MATRIX_FORMAT   CSRCSC (default) | CSRONLY | CSCONLY
                             (sparse_matrix.hpp:34)
  GRB_LOAD_BALANCE_MODE      MERGE (default) | SIMPLE | TWC
                             (types.hpp:13-17, operations.hpp:110-111).
                             MERGE → sort + segmented-reduce push;
                             SIMPLE → XLA scatter-combiner push (the atomic
                             analog); TWC is accepted and treated as MERGE —
                             the reference declares it unimplemented too
                             (operations.hpp:167-168).
  GRB_UTIL_REMOVE_SELFLOOP   1 (default) | 0   (handled in io/mmio.py)
  GRB_SEED                   default RNG seed for MIS / graph coloring
                             (common.hpp:10-12)
  GRB_UNIFORM_START/END      uniform RNG range for set_uniform_random
                             (common.hpp:14-28)
  GRB_TPU_PALLAS             1 (default) | 0 — disable Pallas kernels
                             (this framework's addition)
  GRB_NATIVE                 1 (default) | 0 — disable the C++ ingest runtime
"""
from __future__ import annotations

import os

from .types import SparseFormat


def default_sparse_format() -> SparseFormat:
    # accepts the reference's numeric values (0/1) and symbolic names
    name = os.environ.get("GRB_SPARSE_MATRIX_FORMAT", "CSRCSC").upper()
    return {
        "0": SparseFormat.CSRCSC, "CSRCSC": SparseFormat.CSRCSC,
        "1": SparseFormat.CSRONLY, "CSRONLY": SparseFormat.CSRONLY,
        "2": SparseFormat.CSCONLY, "CSCONLY": SparseFormat.CSCONLY,
    }.get(name, SparseFormat.CSRCSC)


def default_load_balance():
    """GRB_LOAD_BALANCE_MODE → LoadBalanceMode. Accepts the reference's
    numeric values: 0 SIMPLE, 1 TWC, 2 MERGE (types.hpp:13-17)."""
    from .types import LoadBalanceMode

    mode = os.environ.get("GRB_LOAD_BALANCE_MODE", "MERGE").upper()
    return {
        "0": LoadBalanceMode.SIMPLE, "SIMPLE": LoadBalanceMode.SIMPLE,
        "1": LoadBalanceMode.TWC, "TWC": LoadBalanceMode.TWC,
        "2": LoadBalanceMode.MERGE, "MERGE": LoadBalanceMode.MERGE,
    }.get(mode, LoadBalanceMode.MERGE)


def default_sort_push() -> bool:
    """MERGE/TWC → sorted push; SIMPLE → scatter-combiner push."""
    from .types import LoadBalanceMode

    return default_load_balance() != LoadBalanceMode.SIMPLE


def default_seed() -> int:
    try:
        return int(os.environ.get("GRB_SEED", "0"))
    except ValueError:
        return 0


def uniform_range() -> tuple:
    try:
        lo = float(os.environ.get("GRB_UNIFORM_START", "0"))
        hi = float(os.environ.get("GRB_UNIFORM_END", "1"))
    except ValueError:
        lo, hi = 0.0, 1.0
    return lo, hi
