from aha_tpu.parallel.mesh import (
    MeshConfig,
    MeshContext,
    get_mesh,
    make_mesh,
    shard_params,
    replicate,
)

__all__ = [
    "MeshConfig",
    "MeshContext",
    "get_mesh",
    "make_mesh",
    "shard_params",
    "replicate",
]
