"""Array-level kernel layer (L1/L2): spmv (pull), spmspv (push), spgemm,
segmented reductions, elementwise ops, and the direction-optimized dispatch."""
