"""Distribution layer: mesh, placement policies, distributed op modes.

Analog of the reference's multi-GPU machinery (OpenMP thread-per-GPU +
NCCL collectives inside the ops, spmm.h:101-189), rebuilt as SPMD
shard_map programs over a jax.sharding.Mesh."""

from .mesh import (DEFAULT_AXIS, init_distributed, make_mesh, pad_to_shards,
                   place_dense, replicate, shard_along, sync_to_host)  # noqa: F401
from .modes import (spmm_mode1, spmm_mode2, spmm_mode2_nocomm,  # noqa: F401
                    spmv_dist, spmv_dist_nocomm, spmv_halo)
from .planned import (HaloDiaShards, RowPlanShards, partition_halo_dia,  # noqa: F401
                      partition_row_plans, spmm_halo_planned,
                      spmm_mode2_planned, spmm_mode2_planned_nocomm,
                      spmv_dist_planned, spmv_dist_planned_nocomm,
                      spmv_halo_planned)
from .hier import (make_mesh2, spmm_mode2_hier,  # noqa: F401
                   spmv_dist_hier)
from .xfoot import (XFootShards, XFootStats, partition_xfoot,  # noqa: F401
                    spmv_xfoot, spmv_xfoot_nocomm, xfoot_stats)
