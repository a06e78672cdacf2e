"""Vector container: dual dense / padded-sparse pytree.

TPU-native re-design of the reference vector stack:
  * frontend shell Vector<T>        (reference: graphblas/vector.hpp:12-221)
  * backend tagged union            (backend/cuda/vector.hpp:76-84)
  * SparseVector / DenseVector      (backend/cuda/{sparse,dense}_vector.hpp)

Design shifts for TPU/XLA:
  * Sparse vectors have a *fixed capacity* (= n) and a traced `nvals` scalar —
    XLA needs static shapes, so dynamic-nnz frontiers become padded arrays with
    a validity count (SURVEY.md §7 hard part (a)). Pad slots carry index
    sentinel n and are dropped by `mode="drop"` scatters.
  * `storage` is a *static* attribute: Python-level dispatch specializes the
    compiled program, mirroring the reference's storage-aware case analysis
    (backend/cuda/operations.hpp:331-410). Inside jitted while-loops the
    direction-optimization instead uses both representations live (see
    ops/dispatch.py DualFrontier) because storage cannot flip at trace time.
  * All methods are functional: they return new Vectors. The reference's O(1)
    `swap` (vector.hpp:429-450) becomes plain Python rebinding.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .types import INDEX_DTYPE, Storage


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Vector:
    """Dense or padded-sparse vector of logical size n.

    Leaves: dense (n,) | (sind (cap,), sval (cap,), snvals ()) depending on
    storage. Static: n, storage.
    """

    n: int
    storage: Storage
    dense: Optional[jnp.ndarray] = None
    sind: Optional[jnp.ndarray] = None
    sval: Optional[jnp.ndarray] = None
    snvals: Optional[jnp.ndarray] = None  # traced scalar int32

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        return (self.dense, self.sind, self.sval, self.snvals), (self.n, self.storage)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        n, storage = aux
        return cls(n, storage, *leaves)

    # -- constructors ---------------------------------------------------------
    @staticmethod
    def dense_from(values) -> "Vector":
        values = jnp.asarray(values)
        return Vector(int(values.shape[0]), Storage.DENSE, dense=values)

    @staticmethod
    def full(n: int, value, dtype=jnp.float32) -> "Vector":
        """fill() (reference: vector.hpp:131-141) — always yields dense."""
        return Vector(n, Storage.DENSE, dense=jnp.full((n,), value, dtype=dtype))

    @staticmethod
    def ascending(n: int, dtype=INDEX_DTYPE) -> "Vector":
        """fillAscending (reference: vector.hpp:143-151): v[i] = i."""
        return Vector(n, Storage.DENSE, dense=jnp.arange(n, dtype=dtype))

    @staticmethod
    def sparse_from(n: int, indices, values, dtype=jnp.float32, cap: Optional[int] = None) -> "Vector":
        """build() sparse (reference: vector.hpp:88-106). Capacity defaults to n."""
        indices = np.asarray(indices, dtype=np.int64)
        values = np.asarray(values)
        nv = len(indices)
        cap = n if cap is None else cap
        sind = np.full(cap, n, dtype=np.int32)
        sval = np.zeros(cap, dtype=np.dtype(dtype))
        sind[:nv] = indices
        sval[:nv] = values
        return Vector(n, Storage.SPARSE, sind=jnp.asarray(sind),
                      sval=jnp.asarray(sval), snvals=jnp.asarray(nv, INDEX_DTYPE))

    # -- properties -----------------------------------------------------------
    @property
    def dtype(self):
        return (self.dense if self.dense is not None else self.sval).dtype

    @property
    def cap(self) -> int:
        return int(self.sind.shape[0]) if self.sind is not None else self.n

    def nvals(self, identity=0):
        """Stored-entry count. Dense counts non-identity entries like the
        reference's computeNnz (dense_vector.hpp:42); sparse returns snvals.
        Returns a traced int32 scalar."""
        if self.storage == Storage.SPARSE:
            return self.snvals
        return jnp.sum(self.dense != jnp.asarray(identity, self.dense.dtype)).astype(INDEX_DTYPE)

    # -- invariants (the Vector analog of Matrix.check /
    # sparse_matrix.hpp:521-551) ------------------------------------------------
    def check(self, expect_sorted: bool = False):
        """Validate storage invariants on the host. Sparse: live indices
        in-bounds, snvals within capacity, pad slots carry the n sentinel;
        expect_sorted additionally requires ascending indices (true for
        compaction-produced frontiers, NOT for set_element-appended vectors
        — matching the reference's append-then-sort-on-demand contract).
        Dense: length n."""
        import numpy as np

        if self.storage == Storage.DENSE:
            assert self.dense.shape == (self.n,), "dense length"
            return True
        nv = int(self.snvals)
        assert 0 <= nv <= self.cap, "snvals within capacity"
        si = np.asarray(self.sind)
        live = si[:nv]
        assert live.min(initial=0) >= 0 and (nv == 0 or live.max() < self.n), \
            "sparse indices in bounds"
        if expect_sorted:
            assert np.all(np.diff(live) >= 0), "sparse indices ascending"
        assert np.all(si[nv:] >= self.n), "pad sentinel"
        return True

    # -- element ops (functional) ----------------------------------------------
    def set_element(self, value, index: int) -> "Vector":
        """setElement (reference: vector.hpp:153-167)."""
        if self.storage == Storage.DENSE:
            return dataclasses.replace(self, dense=self.dense.at[index].set(value))
        # sparse: append (reference appends / overwrites on gpu path)
        sind = self.sind.at[self.snvals].set(index)
        sval = self.sval.at[self.snvals].set(value)
        return dataclasses.replace(self, sind=sind, sval=sval, snvals=self.snvals + 1)

    # -- storage conversion -----------------------------------------------------
    def to_dense(self, identity=0) -> "Vector":
        """sparse2dense (reference: vector.hpp:326-364): fill(identity) + scatter."""
        if self.storage == Storage.DENSE:
            return self
        dense = dense_from_sparse(self.n, self.sind, self.sval, self.snvals, identity)
        return Vector(self.n, Storage.DENSE, dense=dense)

    def to_sparse(self, identity=0) -> "Vector":
        """dense2sparse (reference: vector.hpp:367-425): flag→scan→compact."""
        if self.storage == Storage.SPARSE:
            return self
        sind, sval, nv = sparse_from_dense(self.dense, identity)
        return Vector(self.n, Storage.SPARSE, sind=sind, sval=sval, snvals=nv)

    # -- host-side extraction -----------------------------------------------------
    def extract_tuples(self):
        """(indices, values) of stored entries (reference: vector.hpp:169-186)."""
        if self.storage == Storage.DENSE:
            d = np.asarray(self.dense)
            return np.arange(self.n), d
        nv = int(self.snvals)
        return np.asarray(self.sind)[:nv], np.asarray(self.sval)[:nv]

    def to_numpy(self, identity=0) -> np.ndarray:
        return np.asarray(self.to_dense(identity).dense)

    def count_unique(self):
        """countUnique (reference: vector.hpp:204-215)."""
        return len(np.unique(self.to_numpy()))

    def __repr__(self):
        return f"Vector(n={self.n}, storage={self.storage.name}, dtype={self.dtype})"


# ---------------------------------------------------------------------------
# Array-level conversion primitives (shared with ops/ and jit loops)
# ---------------------------------------------------------------------------


def dense_from_sparse(n, sind, sval, snvals, identity):
    """Scatter stored entries over an identity-filled dense array.

    Pad slots (slot >= snvals) are routed to index n and dropped — the XLA
    equivalent of the reference's scatter kernel bounds check
    (kernels/util.hpp scatter, vector.hpp:326-364).
    """
    cap = sind.shape[0]
    slot_valid = jnp.arange(cap, dtype=INDEX_DTYPE) < snvals
    tgt = jnp.where(slot_valid, sind, n)
    base = jnp.full((n,), identity, dtype=sval.dtype)
    return base.at[tgt].set(sval, mode="drop")


def sparse_from_dense(dense, identity, with_values: bool = True):
    """Stream-compact non-identity entries via sort, not scatter.

    Deterministic re-expression of flag→mgpu::Scan→streamCompact (reference:
    vector.hpp:367-425, kernels/util.hpp streamCompact*). On TPU a scatter
    costs ~4.8 ns/lane while a single-array sort is ~10× cheaper and the
    value fetch after it is a monotone gather (near-free in the Pallas lane
    kernel), so compaction is: sort(where(flag, idx, n)) — valid indices
    ascend to the front, pad slots carry the sentinel n. Output capacity = n
    (total), so overflow is impossible.
    """
    n = dense.shape[0]
    ident = jnp.asarray(identity, dense.dtype)
    flags = dense != ident
    arange = jnp.arange(n, dtype=INDEX_DTYPE)
    from .ops.gather_dispatch import take

    sind = jax.lax.sort(jnp.where(flags, arange, n))
    if with_values:
        sval = jnp.where(sind < n,
                         take(dense, jnp.minimum(sind, n - 1), sorted=True),
                         ident)
    else:
        sval = None  # structure-only callers (BFS frontiers) skip the fetch
    nv = jnp.sum(flags).astype(INDEX_DTYPE)
    return sind, sval, nv
