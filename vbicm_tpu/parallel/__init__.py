from .mesh import get_mesh, replicate, shard_batch, make_sharded_batch_fh

__all__ = ["get_mesh", "replicate", "shard_batch", "make_sharded_batch_fh"]
