"""Shared algorithm-loop machinery: jitted step caching, timers, CSV output.

The reference embeds a "tight timer" and per-iteration CSV rows in every
algorithm (bfs.hpp:42-60 `iter, succ/n, unvisited, push|pull, ms`); stepped
mode reproduces that contract. Fused mode runs the whole convergence loop as
one `lax.while_loop` on device (the reference's minimum of one D→H scalar
sync per iteration, reduce.hpp:43, drops to zero).
"""
from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp

from ..descriptor import Descriptor
from ..matrix import Matrix
from ..types import round_up
from ..vector import Vector
from ..types import Storage


def edge_cap_for(A: Matrix, desc: Descriptor) -> int:
    """Static push workspace bound = memusage · nnz_pad
    (reference: spmspv_inner.hpp:51-59, util.hpp:91-92 --memusage)."""
    cap = int(round_up(max(int(A.nnz_pad * min(desc.memusage, 1.0)), 128), 128))
    return min(cap, A.nnz_pad)


class TightTimer:
    """Reference GpuTimer analog (backend/cuda/util.hpp:92-120): measures only
    the iteration loop, excluding graph build."""

    def __init__(self):
        self.total_ms = 0.0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, *sync_on):
        for x in sync_on:
            jax.block_until_ready(x)
        ms = (time.perf_counter() - self._t0) * 1000.0
        self.total_ms += ms
        return ms


def print_iter_row(it, succ, n, unvisited, used_push, ms, timing: int):
    """`iter, succ/n, unvisited, push|pull, ms` (reference: bfs.hpp:54-60)."""
    if timing >= 1:
        mode = "push" if used_push else "pull"
        print(f"{it}, {succ}/{n}, {unvisited}, {mode}, {ms:.4f}")


def print_dirinfo(nv, n, used_push, prev_push, dirinfo: bool):
    """Direction-switch announcements gated by the dirinfo knob (reference:
    vector.hpp:306-309, 334-335 — nnz ratio + sparse↔dense conversion
    messages). Stepped mode only; fused loops decide on-device."""
    if not dirinfo:
        return
    if prev_push is not None and bool(used_push) != bool(prev_push):
        conv = ("dense2sparse (pull→push)" if used_push
                else "sparse2dense (push→pull)")
        print(f"[dirinfo] {conv}")
    print(f"[dirinfo] frontier nnz/n = {nv}/{n} = {nv / max(n, 1):.4f} -> "
          f"{'push' if used_push else 'pull'}")


def dense_result(n, arr) -> Vector:
    return Vector(n, Storage.DENSE, dense=arr)


def csc_int_arrays(A: Matrix):
    """(ptr, ind, val-as-int32) of A's CSC, falling back to the CSR
    orientation for CSRONLY matrices (col_ptr=None) — the reference's
    forced-direction idiom for that format
    (backend/cuda/operations.hpp:131-140). Identical results on symmetric
    graphs, the normal domain of the MIS / coloring callers."""
    if A.col_ptr is None:
        return A.row_ptr, A.col_ind, A.val.astype(jnp.int32)
    return A.col_ptr, A.csc_row_ind, A.csc_val.astype(jnp.int32)
