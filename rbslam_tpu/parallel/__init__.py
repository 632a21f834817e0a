from .distributed import initialize_distributed, make_hybrid_mesh
from .map_axis import quad_form_rowsharded, woodbury_rank_ny_rowsharded
from .mesh import make_mesh, particle_sharding, map_sharding
from .resampling import sharded_resample_indices, sharded_resample_local
from .sharded import shard_rbpf_state, sharded_step_fn

__all__ = [
    "initialize_distributed", "make_hybrid_mesh",
    "make_mesh", "particle_sharding", "map_sharding",
    "quad_form_rowsharded", "woodbury_rank_ny_rowsharded",
    "sharded_resample_indices", "sharded_resample_local",
    "shard_rbpf_state", "sharded_step_fn",
]
