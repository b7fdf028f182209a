"""Scale-out layer: device mesh, shardings, distributed eval.

The reference is single-process single-GPU (SURVEY.md §2.4); this package is
the new capability: ``mesh`` (Mesh + NamedSharding placements for DP batches
and row-sharded embedding tables).
"""

from selfrec_tpu.parallel import mesh
from selfrec_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    build_mesh,
    edge_sharding,
    replicated,
    scan_batch_sharding,
    shard_params,
    table_sharding,
)

__all__ = [
    "mesh",
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "build_mesh",
    "edge_sharding",
    "replicated",
    "scan_batch_sharding",
    "shard_params",
    "table_sharding",
]
