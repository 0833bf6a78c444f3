from .mesh import make_mesh, batch_sharding, replicated_sharding, shard_train_step

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding",
           "shard_train_step"]
