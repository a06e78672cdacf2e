"""Descriptor: per-call static configuration.

TPU-native re-design of the reference Descriptor
(reference: graphblas/descriptor.hpp:17-60 + backend/cuda/descriptor.hpp:207-287).
The reference carries a mutable field array toggled in place around calls
(bfs.hpp:67-70 idiom); here the Descriptor is a frozen, hashable dataclass —
it is a *static* jit argument, so each distinct configuration compiles its own
specialized XLA program (the analog of the reference's template-parameter
kernel variants, e.g. spmvDenseMaskedOrKernel<UseScmp,UseEarlyExit,UseOpReuse>,
kernels/spmv.hpp:10).

`toggle`/`replace` return new descriptors (functional rebinding).
"""
from __future__ import annotations

import dataclasses

from .types import Direction, LoadBalanceMode


@dataclasses.dataclass(frozen=True)
class Descriptor:
    # --- mask handling (reference: types.hpp:44-55 GrB_MASK field) ---
    mask_scmp: bool = False        # structural complement (GrB_SCMP, types.hpp:59)
    structure_only: bool = False   # struconly knob (descriptor.hpp:50): mask/frontier
    #                                 treated as {0,1} structure; values ignored

    # --- output / input modifiers ---
    output_replace: bool = False   # GrB_REPLACE (types.hpp:60)
    transpose_inp0: bool = False   # GrB_INP0 ∘ GrB_TRAN (types.hpp:61)
    transpose_inp1: bool = False   # GrB_INP1 ∘ GrB_TRAN

    # --- mxv/vxm direction optimization (reference: vector.hpp:292-323) ---
    mxv_mode: Direction = Direction.PUSHPULL
    switchpoint: float = 0.01      # frontier-density threshold (descriptor.hpp:59)
    memusage: float = 1.0          # push edge-workspace factor: capacity =
    #                                 round_up(memusage * nnz) (spmspv_inner.hpp:51-59)

    # --- push/pull kernel knobs (reference: descriptor.hpp:50-60) ---
    # ACCEPTED NO-OPS on TPU (kept for reference CLI/flag parity; the single
    # authoritative list — grep "accepted-no-op" and tests/test_catalog.py):
    #   earlyexit — the reference breaks a per-thread row scan at the first
    #     frontier hit (kernels/spmv.hpp:10-59); TPU pulls are vectorized
    #     prefix/bilinear passes with no scalar row scan to exit early.
    #   opreuse — reads the mask as the frontier to skip a vector swap; the
    #     TPU DualFrontier keeps both images live, nothing to reuse.
    #   endbit — truncates CUB radix-sort passes to ceil(log2 n) bits
    #     (spmspv_inner.hpp:223-282); XLA's sort is comparison-based, so key
    #     width does not change its cost. The endbit-SPIRIT optimization
    #     (cut per-push sort work) is structural instead: Min/Max pushes
    #     sort with the value as a secondary key so the segment head/tail
    #     IS the reduction (no segmented scan — ops/spmspv.py:182-211),
    #     struconly pushes sort a single int32 key, and tiered workspaces
    #     (push_tiers) shrink the sorted array itself.
    #   fusedmask — masks ARE always fused on TPU (XLA fuses the select into
    #     the kernel epilogue); False has nothing cheaper to fall back to.
    earlyexit: bool = False        # accepted-no-op (see above)
    opreuse: bool = False          # accepted-no-op
    endbit: bool = False           # accepted-no-op
    fusedmask: bool = True         # accepted-no-op (always fused)
    sort_push: bool = None         # False = scatter-combine push (SIMPLE mode);
                                   # default from `load_balance` below
    push_tiers: tuple = (64, 8)    # workspace tier divisors (cap/d each);
                                   # fewer tiers = smaller compiled program
    load_balance: LoadBalanceMode = None  # MERGE → sort+segment push,
    #                                SIMPLE → scatter-combine push, TWC →
    #                                MERGE (unimplemented in the reference
    #                                too, operations.hpp:167-168); default
    #                                from GRB_LOAD_BALANCE_MODE (config.py)

    # --- algorithm loop controls (reference: descriptor.hpp:207-287 loadArgs) ---
    max_niter: int = 10000
    timing: int = 0                # 0: off, 1: per-iter CSV, 2: verbose CSV
    debug: bool = False
    dirinfo: bool = False          # announce push/pull switches
    seed: int = None               # default from GRB_SEED (common.hpp:10-12)

    # --- execution (reference: GrB_BACKEND runtime toggle, types.hpp:69-70,
    # used for apply with stateful host functors, apply.hpp:34-42, 102-111) ---
    backend: str = "tpu"           # "tpu" (traced jnp) | "cpu" (host-functor
    #                                 loop — consumed by apply/apply_matrix)

    def __post_init__(self):
        # resolve env-var-backed defaults (config.py) once at construction so
        # the descriptor stays a plain hashable static jit argument
        if self.load_balance is None:
            from .config import default_load_balance

            object.__setattr__(self, "load_balance", default_load_balance())
        if self.sort_push is None:
            # the load_balance field DRIVES the push kernel choice:
            # SIMPLE → scatter-combiner, MERGE/TWC → sort + segmented reduce
            object.__setattr__(self, "sort_push",
                               self.load_balance != LoadBalanceMode.SIMPLE)
        if self.seed is None:
            from .config import default_seed

            object.__setattr__(self, "seed", default_seed())

    def replace(self, **kw) -> "Descriptor":
        return dataclasses.replace(self, **kw)

    def toggle_mask(self) -> "Descriptor":
        """Scoped-complement idiom (reference: bfs.hpp:67-70 toggle(GrB_MASK))."""
        return self.replace(mask_scmp=not self.mask_scmp)

    def toggle_inp0(self) -> "Descriptor":
        return self.replace(transpose_inp0=not self.transpose_inp0)

    def toggle_inp1(self) -> "Descriptor":
        return self.replace(transpose_inp1=not self.transpose_inp1)


DEFAULT = Descriptor()

# Tuned BFS flags parity (reference: run_bfs.sh:8-24)
BFS_TUNED = Descriptor(structure_only=True, earlyexit=True, opreuse=True)
