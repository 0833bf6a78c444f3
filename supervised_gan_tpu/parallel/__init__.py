from .mesh import (make_mesh, batch_sharding, replicated_sharding,
                   shard_train_step, init_distributed)

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding",
           "shard_train_step", "init_distributed"]
