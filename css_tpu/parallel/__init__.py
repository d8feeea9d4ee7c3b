from css_tpu.parallel.mesh import (
    DATA_AXIS,
    data_mesh,
    distributed_init,
    shard_batch,
    sharded_train_step,
)

__all__ = [
    "DATA_AXIS",
    "data_mesh",
    "distributed_init",
    "shard_batch",
    "sharded_train_step",
]
