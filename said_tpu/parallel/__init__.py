"""Device mesh construction and sharding rules (dp now, tp-ready)."""

from said_tpu.parallel.mesh import (
    MeshConfig,
    make_mesh,
    batch_sharding,
    replicated,
    shard_params,
    param_sharding_rules,
)

__all__ = [
    "MeshConfig",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_params",
    "param_sharding_rules",
]
