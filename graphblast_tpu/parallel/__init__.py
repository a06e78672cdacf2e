"""Multi-chip scale-out layer: 1D edge-partitioned shards + XLA collectives.

The reference is strictly single-GPU (SURVEY.md §2.8); this package is the
TPU framework's distributed axis. Test on CPU with
XLA_FLAGS=--xla_force_host_platform_device_count=N."""

from .partition import ShardedMatrix, partition, shard_vector
from .algorithms import (bfs_dist, cc_dist, pr_dist, sssp_dist, tc_dist,
                         mis_dist, gc_dist, diameter_dist, lgc_dist,
                         tc_prepare,
                         make_bfs_dist, make_pr_dist, make_pr_ring_dist,
                         make_pr_2d_dist, make_sssp_dist,
                         make_cc_dist, make_mis_dist, make_gc_dist,
                         make_lgc_dist)
from .bootstrap import init_distributed, global_mesh
from .partition2d import Sharded2D, partition_2d, mxv_2d
from .ring import RingShardedMatrix, partition_ring, mxv_ring, ring_mxv_pull
from . import ops
