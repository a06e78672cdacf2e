"""Operator / monoid / semiring catalog.

TPU-native equivalent of the reference operator catalog
(reference: graphblas/stddef.hpp:14-213). Operators are frozen, hashable
dataclasses holding jnp-traceable callables so the *same* object parameterizes
XLA ops, `lax.associative_scan` segmented reduces, and Pallas kernels; being
hashable they ride through `jax.jit` static args without recompilation churn.

Semantics notes (parity with reference):
  * `eWiseAdd` applies the semiring's **add** op elementwise, `eWiseMult` the
    **mul** op (reference: backend/cuda/operations.hpp:331-631 — the algorithms
    rely on this, e.g. sssp.hpp:76-82 uses eWiseAdd(CustomLessPlus) as `<`).
  * Logical ops treat any nonzero as true and emit 0/1 in the output dtype,
    matching C++ implicit bool conversion in stddef.hpp:15-33.
  * Monoid identities replicate C++ numeric_limits choices exactly (FLT_MAX not
    +inf, etc.) so converged vectors match the reference bitwise.
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp

from .types import dtype_lowest, dtype_max

# ---------------------------------------------------------------------------
# Binary ops (reference: stddef.hpp:14-138)
# ---------------------------------------------------------------------------


def _as_bool(x):
    return x != 0


def _to_dtype_of(ref, x):
    return x.astype(ref.dtype) if hasattr(ref, "dtype") else x


@dataclasses.dataclass(frozen=True)
class BinaryOp:
    """A binary operator f(lhs, rhs) usable on jnp arrays or scalars."""

    name: str
    fn: Callable = dataclasses.field(compare=False, hash=False)

    def __call__(self, lhs, rhs):
        return self.fn(lhs, rhs)

    def __repr__(self):
        return f"BinaryOp({self.name})"


def _logical_or(a, b):
    out = jnp.logical_or(_as_bool(a), _as_bool(b))
    return out.astype(jnp.result_type(a, b)) if jnp.result_type(a, b) != jnp.bool_ else out


def _logical_and(a, b):
    out = jnp.logical_and(_as_bool(a), _as_bool(b))
    return out.astype(jnp.result_type(a, b)) if jnp.result_type(a, b) != jnp.bool_ else out


def _logical_xor(a, b):
    out = jnp.logical_xor(_as_bool(a), _as_bool(b))
    return out.astype(jnp.result_type(a, b)) if jnp.result_type(a, b) != jnp.bool_ else out


def _cmp(fn):
    def wrapped(a, b):
        out = fn(a, b)
        rt = jnp.result_type(a, b)
        return out.astype(rt) if rt != jnp.bool_ else out

    return wrapped


LogicalOr = BinaryOp("logical_or", _logical_or)
LogicalAnd = BinaryOp("logical_and", _logical_and)
LogicalXor = BinaryOp("logical_xor", _logical_xor)
Equal = BinaryOp("equal", _cmp(lambda a, b: a == b))
NotEqualTo = BinaryOp("not_equal_to", _cmp(lambda a, b: a != b))
Greater = BinaryOp("greater", _cmp(lambda a, b: a > b))
Less = BinaryOp("less", _cmp(lambda a, b: a < b))
GreaterEqual = BinaryOp("greater_equal", _cmp(lambda a, b: a >= b))
LessEqual = BinaryOp("less_equal", _cmp(lambda a, b: a <= b))
First = BinaryOp("first", lambda a, b: jnp.broadcast_to(a, jnp.broadcast_shapes(jnp.shape(a), jnp.shape(b))))
Second = BinaryOp("second", lambda a, b: jnp.broadcast_to(b, jnp.broadcast_shapes(jnp.shape(a), jnp.shape(b))))
Minimum = BinaryOp("minimum", jnp.minimum)
Maximum = BinaryOp("maximum", jnp.maximum)
Plus = BinaryOp("plus", lambda a, b: a + b)
Minus = BinaryOp("minus", lambda a, b: a - b)
Multiplies = BinaryOp("multiplies", lambda a, b: a * b)
Divides = BinaryOp("divides", lambda a, b: a / b)
SelectSecond = BinaryOp("select_second", lambda a, b: jnp.broadcast_to(b, jnp.broadcast_shapes(jnp.shape(a), jnp.shape(b))))

ALL_BINARY_OPS = [
    LogicalOr, LogicalAnd, LogicalXor, Equal, NotEqualTo, Greater, Less,
    GreaterEqual, LessEqual, First, Second, Minimum, Maximum, Plus, Minus,
    Multiplies, Divides, SelectSecond,
]

# ---------------------------------------------------------------------------
# Monoids (reference: stddef.hpp:142-172, REGISTER_MONOID)
# ---------------------------------------------------------------------------

# identity kinds resolved per-dtype at use sites
_IDENTITY_RESOLVERS = {
    "zero": lambda dt: jnp.asarray(0, dt),
    "one": lambda dt: jnp.asarray(1, dt),
    "false": lambda dt: jnp.asarray(0, dt),
    "max": lambda dt: jnp.asarray(dtype_max(dt), dt),
    "lowest": lambda dt: jnp.asarray(dtype_lowest(dt), dt),
}


@dataclasses.dataclass(frozen=True)
class Monoid:
    """Associative op + identity (reference: stddef.hpp:142-155)."""

    name: str
    op: BinaryOp
    identity_kind: str

    def __call__(self, lhs, rhs):
        return self.op(lhs, rhs)

    def identity(self, dtype):
        return _IDENTITY_RESOLVERS[self.identity_kind](jnp.dtype(dtype))

    def __repr__(self):
        return f"Monoid({self.name})"


PlusMonoid = Monoid("PlusMonoid", Plus, "zero")
MultipliesMonoid = Monoid("MultipliesMonoid", Multiplies, "one")
MinimumMonoid = Monoid("MinimumMonoid", Minimum, "max")
# NOTE: identity 0, not -inf — reference quirk (stddef.hpp:162), valid for the
# non-negative weights the algorithms use.
MaximumMonoid = Monoid("MaximumMonoid", Maximum, "zero")
LogicalOrMonoid = Monoid("LogicalOrMonoid", LogicalOr, "false")
# NOTE: identity false (reference stddef.hpp:164) — mathematically it should be
# true; preserved for parity, unused by any shipped algorithm.
LogicalAndMonoid = Monoid("LogicalAndMonoid", LogicalAnd, "false")
GreaterMonoid = Monoid("GreaterMonoid", Greater, "lowest")
CustomLessMonoid = Monoid("CustomLessMonoid", Less, "max")
NotEqualToMonoid = Monoid("NotEqualToMonoid", NotEqualTo, "max")

ALL_MONOIDS = [
    PlusMonoid, MultipliesMonoid, MinimumMonoid, MaximumMonoid,
    LogicalOrMonoid, LogicalAndMonoid, GreaterMonoid, CustomLessMonoid,
    NotEqualToMonoid,
]

# ---------------------------------------------------------------------------
# Semirings (reference: stddef.hpp:176-213, REGISTER_SEMIRING — all 17)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Semiring:
    """add monoid ⊕ and multiply op ⊗ (reference: stddef.hpp:176-191)."""

    name: str
    add: Monoid
    mul: BinaryOp

    def add_op(self, lhs, rhs):
        return self.add(lhs, rhs)

    def mul_op(self, lhs, rhs):
        return self.mul(lhs, rhs)

    def identity(self, dtype):
        return self.add.identity(dtype)

    def __repr__(self):
        return f"Semiring({self.name})"


def _sr(name, add, mul):
    return Semiring(name, add, mul)


LogicalOrAndSemiring = _sr("LogicalOrAnd", LogicalOrMonoid, LogicalAnd)
PlusMultipliesSemiring = _sr("PlusMultiplies", PlusMonoid, Multiplies)
MinimumPlusSemiring = _sr("MinimumPlus", MinimumMonoid, Plus)
MaximumMultipliesSemiring = _sr("MaximumMultiplies", MaximumMonoid, Multiplies)
PlusDividesSemiring = _sr("PlusDivides", PlusMonoid, Divides)
PlusGreaterSemiring = _sr("PlusGreater", PlusMonoid, Greater)
GreaterPlusSemiring = _sr("GreaterPlus", GreaterMonoid, Plus)
PlusMinusSemiring = _sr("PlusMinus", PlusMonoid, Minus)
PlusLessSemiring = _sr("PlusLess", PlusMonoid, Less)
CustomLessPlusSemiring = _sr("CustomLessPlus", CustomLessMonoid, Plus)
MinimumMultipliesSemiring = _sr("MinimumMultiplies", MinimumMonoid, Multiplies)
MultipliesMultipliesSemiring = _sr("MultipliesMultiplies", MultipliesMonoid, Multiplies)
NotEqualToPlusSemiring = _sr("NotEqualToPlus", NotEqualToMonoid, Plus)
MinimumSelectSecondSemiring = _sr("MinimumSelectSecond", MinimumMonoid, SelectSecond)
PlusNotEqualToSemiring = _sr("PlusNotEqualTo", PlusMonoid, NotEqualTo)
CustomLessLessSemiring = _sr("CustomLessLess", CustomLessMonoid, Less)
MinimumNotEqualToSemiring = _sr("MinimumNotEqualTo", MinimumMonoid, NotEqualTo)

ALL_SEMIRINGS = [
    LogicalOrAndSemiring, PlusMultipliesSemiring, MinimumPlusSemiring,
    MaximumMultipliesSemiring, PlusDividesSemiring, PlusGreaterSemiring,
    GreaterPlusSemiring, PlusMinusSemiring, PlusLessSemiring,
    CustomLessPlusSemiring, MinimumMultipliesSemiring,
    MultipliesMultipliesSemiring, NotEqualToPlusSemiring,
    MinimumSelectSecondSemiring, PlusNotEqualToSemiring,
    CustomLessLessSemiring, MinimumNotEqualToSemiring,
]


def extract_add(semiring: Semiring) -> Monoid:
    """Additive monoid of a semiring (reference: stddef.hpp:217-241 extractAdd)."""
    return semiring.add


def extract_mul(semiring: Semiring) -> BinaryOp:
    """Multiplicative op of a semiring (reference: stddef.hpp:244-277 extractMul)."""
    return semiring.mul
