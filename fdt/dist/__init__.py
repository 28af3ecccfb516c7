from fdt.dist import multihost
from fdt.dist.mesh import make_mesh, batch_sharding, replicated, shard_batch

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch",
           "multihost"]
