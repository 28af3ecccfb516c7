from fdt.dist import multihost
from fdt.dist.mesh import (make_mesh, make_mesh_2d, batch_sharding, replicated,
                           shard_batch, shard_train_batch, train_batch_specs)

__all__ = ["make_mesh", "make_mesh_2d", "batch_sharding", "replicated",
           "shard_batch", "shard_train_batch", "train_batch_specs",
           "multihost"]
