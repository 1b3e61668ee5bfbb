"""Device mesh construction, sharding policies, and collective merges."""

from genomicsbench_tpu.parallel.mesh import make_mesh, shard_batch, replicate

__all__ = ["make_mesh", "shard_batch", "replicate"]
