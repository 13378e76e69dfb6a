"""Multi-chip scaling layer: device mesh, sharded gallery search, and
data-parallel training shardings.

The reference is single-process single-GPU (SURVEY.md §2.9 audit: no
torch.distributed anywhere); this layer is the TPU-native scaling design —
``jax.sharding.Mesh`` over ICI, XLA collectives, no NCCL/MPI.
"""

from facerecognition_tpu.parallel.mesh import (
    create_mesh,
    local_mesh,
    resolve_data_mesh,
)
from facerecognition_tpu.parallel.multihost import (
    create_hybrid_mesh,
    initialize_multihost,
)
from facerecognition_tpu.parallel.sharding import (
    ShardedGallery,
    replicate,
    shard_batch,
    sharded_topk,
    sharded_topk_int8,
)

__all__ = [
    "create_hybrid_mesh",
    "create_mesh",
    "initialize_multihost",
    "local_mesh",
    "resolve_data_mesh",
    "ShardedGallery",
    "replicate",
    "shard_batch",
    "sharded_topk",
    "sharded_topk_int8",
]
