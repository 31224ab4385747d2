from dynam3d_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    phi3_param_specs,
    policy_param_specs,
    replicated_specs,
    shard_tree,
)

__all__ = [
    "data_sharding",
    "make_mesh",
    "phi3_param_specs",
    "policy_param_specs",
    "replicated_specs",
    "shard_tree",
]
