"""Device-mesh parallelism: data-parallel shard_map training over ICI."""

from monkeynet_tpu.parallel.mesh import (
    make_mesh,
    make_sharded_train_step,
    shard_batch,
)

__all__ = ["make_mesh", "make_sharded_train_step", "shard_batch"]
