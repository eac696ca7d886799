from .mesh import MeshConfig, make_mesh, shard_canonical, CHAIN_AXIS, PARAM_AXIS
from .sharded import ess_rhat_sharded, rhat_nested_sharded

__all__ = [
    "MeshConfig",
    "make_mesh",
    "shard_canonical",
    "ess_rhat_sharded",
    "rhat_nested_sharded",
    "CHAIN_AXIS",
    "PARAM_AXIS",
]
