from .mesh import make_mesh, shard_batch, replicate
from .train_step import make_sharded_train_step

__all__ = ["make_mesh", "shard_batch", "replicate", "make_sharded_train_step"]
