"""Device-mesh parallelism: sharded calibration and evaluation."""

from . import calibrate, mesh
from .mesh import (batch_sharding, channel_sharding, make_mesh,
                   replicate_tree, shard_batch)

__all__ = ["calibrate", "mesh", "batch_sharding", "channel_sharding",
           "make_mesh", "replicate_tree", "shard_batch"]
