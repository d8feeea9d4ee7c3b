from css_tpu.parallel.mesh import (
    DATA_AXIS,
    cross_process_sum,
    data_mesh,
    distributed_init,
    shard_array,
    shard_batch,
    sharded_eval_step,
    sharded_train_step,
)

__all__ = [
    "DATA_AXIS",
    "cross_process_sum",
    "data_mesh",
    "distributed_init",
    "shard_array",
    "shard_batch",
    "sharded_eval_step",
    "sharded_train_step",
]
