"""Connected components — FastSV (reference: graphblas/algorithm/cc.hpp:17-136,
after Zhang/Azad/Hu SIAM PP20).

Per iteration (dense int32 vectors, fully fused):
  1. stochastic hooking   mnp_t = mxv(MinimumSelectSecond, A, grandparent)
                          mnp   = min(mnp, mnp_t)
                          parent[parent_temp] ← mnp     (assignScatter)
  2. aggressive hooking   parent = min(parent, mnp)
  3. shortcutting         parent = min(parent, parent_temp)
  4. grandparents         gp = parent[parent]           (extractGather)
  5. termination          succ = Σ (gp_temp != gp)
  6. filter               gp ← INT_MAX where unchanged  (scmp-masked assign)

Deviation from the reference (improvement): the hooking scatter uses a MIN
combiner instead of the reference's racy last-write-wins scatterIndexed
(scatter.hpp:85-123) — deterministic on TPU and converges at least as fast
(it is the FastSV paper's actual min-hook).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..descriptor import Descriptor, DEFAULT
from ..matrix import Matrix
from ..semiring import MinimumSelectSecondSemiring
from ..types import INDEX_DTYPE
from ..vector import Vector
from ..ops.spmv import spmv_pull
from .common import TightTimer, dense_result, print_iter_row

IMAX = jnp.iinfo(jnp.int32).max


def _cc_step(A: Matrix, parent, mnp, gp, gp_t, plan=None):
    n = A.nrows
    parent_temp = parent

    # 1) stochastic hooking: mnp_t[i] = min over j∈A(i,:) of gp[j].
    # With a MonoidPlan the pull rides the Pallas run-scan/select kernel
    # (ops/pallas/monopull.py): parent ids < n < 2^24 are f32-exact, the
    # IMAX unproductive sentinel maps to >= n both ways, and the f32→int
    # cast happens on a value clamped to n so it can never overflow.
    if plan is not None:
        from ..ops.pallas.monopull import spmv_monoid

        yf = spmv_monoid(plan, gp.astype(jnp.float32),
                         MinimumSelectSecondSemiring)
        mnp_t = jnp.where(yf >= jnp.float32(n),
                          IMAX,
                          jnp.minimum(yf, jnp.float32(n)).astype(jnp.int32))
    else:
        mnp_t = spmv_pull(A.row_ptr, A.col_ind, A.val, gp,
                          MinimumSelectSecondSemiring, n)
    mnp = jnp.minimum(mnp, mnp_t)
    # f[f[u]] = mngf[u] — min-combining scatter (see module docstring)
    parent = parent.at[parent_temp].min(mnp, mode="drop")

    # 2) aggressive hooking + 3) shortcutting (eWiseAdd Minimum, cc.hpp:90-98)
    parent = jnp.minimum(parent, mnp)
    parent = jnp.minimum(parent, parent_temp)

    # 4) grandparent: gp[u] = parent[parent[u]] (extractGather, cc.hpp:101-103)
    gp = parent[jnp.clip(parent, 0, n - 1)]

    # 5) termination (eWiseMult MinimumNotEqualTo + reduce, cc.hpp:106-109)
    diff = (gp_t != gp)
    succ = jnp.sum(diff).astype(INDEX_DTYPE)

    # 6) unproductive filter (scmp-masked assign INT_MAX, cc.hpp:115-119)
    gp_t_new = gp
    gp = jnp.where(diff, gp, IMAX)
    return parent, mnp, gp, gp_t_new, succ


@functools.partial(jax.jit, static_argnames=("max_niter",))
def _cc_fused(A: Matrix, plan=None, *, max_niter):
    n = A.nrows
    parent0 = jnp.arange(n, dtype=jnp.int32)  # fillAscending (cc.hpp:44)

    def cond(state):
        it, parent, mnp, gp, gp_t, succ = state
        return (succ > 0) & (it <= max_niter)

    def body(state):
        it, parent, mnp, gp, gp_t, _ = state
        parent, mnp, gp, gp_t, succ = _cc_step(A, parent, mnp, gp, gp_t,
                                                plan)
        return it + 1, parent, mnp, gp, gp_t, succ

    st = (jnp.asarray(1, INDEX_DTYPE), parent0, parent0, parent0, parent0,
          jnp.asarray(1, INDEX_DTYPE))
    it, parent, *_ = jax.lax.while_loop(cond, body, st)
    return parent, it - 1


_cc_step_jit = jax.jit(_cc_step)


def cc(A: Matrix, seed: int = 0, desc: Descriptor = DEFAULT,
       mode: str = "fused") -> Vector:
    """Component labels (min vertex id per component, like FastSV)."""
    import os

    n = A.nrows
    # Pallas monoid pull (CSR orientation — mxv): TPU-only by default
    # (interpret emulation is seconds/iter), id-exactness needs n < 2^24.
    # Built from the ORIGINAL matrix: _as_int_matrix's dataclasses.replace
    # drops the host stash, and select-second never reads edge values.
    from ..ops.pallas.monopull import plan_for_monoid

    use_plan = (n < (1 << 24)
                and (jax.default_backend() == "tpu"
                     or os.environ.get("GRB_MONOID_PULL_FORCE", "0") == "1"))
    plan = plan_for_monoid(A, transpose=False) if use_plan else None
    if A.dtype != jnp.int32:
        A = _as_int_matrix(A)
    if mode == "fused":
        parent, _ = _cc_fused(A, plan, max_niter=desc.max_niter)
        return dense_result(n, parent)

    timer = TightTimer()
    parent = jnp.arange(n, dtype=jnp.int32)
    mnp = gp = gp_t = parent
    for it in range(1, desc.max_niter + 1):
        timer.start()
        parent, mnp, gp, gp_t, succ_t = _cc_step_jit(A, parent, mnp, gp,
                                                     gp_t, plan)
        ms = timer.stop(parent)
        succ = int(succ_t)
        print_iter_row(it, succ, n, n, False, ms, desc.timing)
        if succ == 0:
            break
    return dense_result(n, parent)


def _as_int_matrix(A: Matrix) -> Matrix:
    import dataclasses

    return dataclasses.replace(
        A, val=A.val.astype(jnp.int32),
        csc_val=A.csc_val.astype(jnp.int32) if A.csc_val is not None else None)


def cc_cpu(A: Matrix):
    from .reference import cc_cpu as _impl

    return _impl(A)


def verify_cc(A: Matrix, labels) -> bool:
    from .reference import verify_cc as _impl

    return _impl(A, labels)
