"""graphblast-tpu: a TPU-native GraphBLAS-style graph analytics framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
gunrock/graphblast (the CUDA reference): semiring-generic sparse linear
algebra (mxv/vxm/mxm with masks, accumulators, and descriptors),
direction-optimized push/pull frontier traversal, and an algorithm library
(BFS, SSSP, PageRank, CC, TC, MIS, graph coloring, LGC, diameter) that runs
single-chip under `jax.jit` and scales across device meshes with
`shard_map` + XLA collectives.

Layer map (≈ reference layers, SURVEY.md §1):
  L5  examples/            CLI drivers
  L4  algorithms/          algorithm library + CPU golden references
  L3  operations.py        public GraphBLAS API (functional)
  L2  ops/dispatch.py      direction-optimized traced dispatch
  L1  ops/{spmv,spmspv,spgemm,segops}.py + ops/pallas/   kernels
      parallel/            multi-chip sharding (mesh, collectives)
"""

from .types import (
    Direction,
    INDEX_DTYPE,
    Info,
    LoadBalanceMode,
    SparseFormat,
    Storage,
)
from .descriptor import Descriptor, DEFAULT, BFS_TUNED
from .semiring import (
    ALL_BINARY_OPS,
    ALL_MONOIDS,
    ALL_SEMIRINGS,
    BinaryOp,
    Monoid,
    Semiring,
    extract_add,
    extract_mul,
    # binary ops
    LogicalOr, LogicalAnd, LogicalXor, Equal, NotEqualTo, Greater, Less,
    GreaterEqual, LessEqual, First, Second, Minimum, Maximum, Plus, Minus,
    Multiplies, Divides, SelectSecond,
    # monoids
    PlusMonoid, MultipliesMonoid, MinimumMonoid, MaximumMonoid,
    LogicalOrMonoid, LogicalAndMonoid, GreaterMonoid, CustomLessMonoid,
    NotEqualToMonoid,
    # semirings
    LogicalOrAndSemiring, PlusMultipliesSemiring, MinimumPlusSemiring,
    MaximumMultipliesSemiring, PlusDividesSemiring, PlusGreaterSemiring,
    GreaterPlusSemiring, PlusMinusSemiring, PlusLessSemiring,
    CustomLessPlusSemiring, MinimumMultipliesSemiring,
    MultipliesMultipliesSemiring, NotEqualToPlusSemiring,
    MinimumSelectSecondSemiring, PlusNotEqualToSemiring,
    CustomLessLessSemiring, MinimumNotEqualToSemiring,
)
from .matrix import Matrix
from .dense_matrix import DenseMatrix, gemm, gemv
from .vector import Vector
from .operations import (
    apply,
    apply_vxm,
    assign,
    assign_indexed,
    assign_matrix,
    assign_matrix_col,
    assign_matrix_row,
    assign_matrix_scalar,
    assign_scatter,
    eWiseAdd,
    eWiseAdd_matrix,
    eWiseMult,
    extract,
    extract_col,
    extract_gather,
    extract_matrix,
    mxm,
    mxm_dense,
    mxv,
    reduce_matrix,
    reduce_matrix_to_vector,
    reduce_vector,
    scale_matrix,
    scale_vector,
    scatter,
    trace_mxm_transpose,
    transpose,
    tril,
    vxm,
)

__version__ = "0.1.0"
