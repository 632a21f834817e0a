from .distributed import initialize_distributed, make_hybrid_mesh
from .mesh import make_mesh, particle_sharding, map_sharding
from .resampling import sharded_resample_indices
from .sharded import shard_rbpf_state, sharded_step_fn

__all__ = [
    "initialize_distributed", "make_hybrid_mesh",
    "make_mesh", "particle_sharding", "map_sharding",
    "sharded_resample_indices",
    "shard_rbpf_state", "sharded_step_fn",
]
