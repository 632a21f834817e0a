from .mesh import make_mesh, particle_sharding, map_sharding
from .sharded import shard_rbpf_state, sharded_step_fn

__all__ = [
    "make_mesh", "particle_sharding", "map_sharding",
    "shard_rbpf_state", "sharded_step_fn",
]
