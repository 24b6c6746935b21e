from .mesh import cycle_mesh, shard_mle, unshard_mle
