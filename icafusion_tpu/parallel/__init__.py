from icafusion_tpu.parallel.mesh import (batch_sharding, make_mesh, replicate_tree,
                                         shard_batch)

__all__ = ["make_mesh", "batch_sharding", "shard_batch", "replicate_tree"]
